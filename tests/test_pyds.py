"""Custom Python Data Source (tem_telemetry): batch parity, ordered
streaming replay with real offsets, checkpoint-restart idempotence."""

import tempfile
import time

import pytest

from amazonmsk_emr_tem_data_spark.sources.files import load_table
from amazonmsk_emr_tem_data_spark.sources.pyds import (
    TemTelemetryDataSource,
    offsets_json_roundtrip,
    register,
)


@pytest.fixture(scope="module")
def events_path(sf_dir):
    return f"{sf_dir}/events.parquet"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def test_batch_read_matches_native_parquet(spark, sf_dir, events_path):
    got = (
        spark.read.format("tem_telemetry")
        .option("path", events_path)
        .load()
    )
    exp = load_table(spark, sf_dir, "events")
    assert got.count() == exp.count()
    g = {r["event_id"]: (r["user_id"], r["event_type"]) for r in got.collect()}
    e = {r["event_id"]: (r["user_id"], r["event_type"]) for r in exp.collect()}
    assert g == e


def test_batch_read_is_partitioned(spark, events_path):
    # slice_rows=100 over sf0.001 (600 events) must produce >1 input
    # partition — the scan parallelizes across executors
    got = (
        spark.read.format("tem_telemetry")
        .option("path", events_path)
        .option("slice_rows", "100")
        .load()
    )
    from pyspark.sql import functions as F

    n_parts = got.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts > 1


def _drain(spark, events_path, checkpoint):
    # throttle off: availableNow latches the first latestOffset() as
    # its drain target, so a full drain needs the EOF answer
    stream = (
        spark.readStream.format("tem_telemetry")
        .option("path", events_path)
        .option("throttle", "false")
        .load()
    )
    name = f"pyds_{abs(hash((checkpoint, time.time_ns()))) % 10**9}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("tem_telemetry stream did not drain")
    return spark.table(name)


def test_stream_replays_every_row_exactly_once(spark, sf_dir, events_path):
    ckpt = tempfile.mkdtemp(prefix="ckpt_pyds_")
    got = _drain(spark, events_path, ckpt)
    exp = load_table(spark, sf_dir, "events")
    assert got.count() == exp.count()
    ids = [r["event_id"] for r in got.select("event_id").collect()]
    assert len(ids) == len(set(ids)), "no duplicates under ordered replay"


def test_stream_checkpoint_restart_emits_nothing_new(
    spark, sf_dir, events_path
):
    """Exactly-once via offsets + checkpoint: drain everything into a
    parquet sink, restart with the same checkpoint, row count must not
    change (the committed offset is EOF). Python sources fall back to
    single-batch under availableNow and can't recover there, so the
    restart contract is exercised on the real fault-tolerant path:
    processingTime trigger + file sink."""
    ckpt = tempfile.mkdtemp(prefix="ckpt_pyds_resume_")
    out = tempfile.mkdtemp(prefix="out_pyds_resume_")
    n_total = load_table(spark, sf_dir, "events").count()

    def run(seconds_after_done: float) -> int:
        stream = (
            spark.readStream.format("tem_telemetry")
            .option("path", events_path)
            .option("batch_rows", "250")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= n_total:
                        break
                except Exception:
                    pass
                time.sleep(0.5)
            time.sleep(seconds_after_done)
        finally:
            q.stop()
        return spark.read.parquet(out).count()

    assert run(1.0) == n_total
    # restart from the same checkpoint: committed offset == EOF, so
    # the resumed query must append ZERO rows
    assert run(3.0) == n_total


def test_throttled_replay_respects_batch_budget(spark, events_path):
    """Default (throttled) mode: each micro-batch inputs at most
    batch_rows rows — the reference's rate-capped ordered producer,
    expressed as an offset budget."""
    ckpt = tempfile.mkdtemp(prefix="ckpt_pyds_throttle_")
    stream = (
        spark.readStream.format("tem_telemetry")
        .option("path", events_path)
        .option("batch_rows", "150")
        .load()
    )
    name = "pyds_throttled"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= 600:
                break
            time.sleep(0.5)
        batches = [p.numInputRows for p in q.recentProgress]
    finally:
        q.stop()
    assert spark.table(name).count() >= 600
    assert batches and max(batches) <= 150, batches


def test_offsets_survive_json_wal():
    r = TemTelemetryDataSource(options={"path": "/dev/null"})
    assert offsets_json_roundtrip({"row": 12345}) == {"row": 12345}
