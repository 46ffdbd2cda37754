"""applyInPandasWithState: per-key EWMA carried across micro-batches."""

import pandas as pd

from amazonmsk_emr_tem_data_spark.sources.files import load_table
from amazonmsk_emr_tem_data_spark.streaming.pipelines import events_stream, run_to_memory
from amazonmsk_emr_tem_data_spark.streaming.stateful import ewma_per_user

ALPHA = 0.3


def expected_ewma(pdf: pd.DataFrame) -> dict[int, tuple[int, float]]:
    out = {}
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        ewma = None
        for x in g["value"]:
            ewma = x if ewma is None else ALPHA * x + (1 - ALPHA) * ewma
        out[int(uid)] = (len(g), ewma)
    return out


def test_ewma_state_matches_sequential_batch(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    exp = expected_ewma(batch.toPandas())

    stream = events_stream(spark, sf_dir)
    got = {
        int(r["user_id"]): (r["n_events"], r["ewma"])
        for r in run_to_memory(
            ewma_per_user(stream, ALPHA), output_mode="update"
        ).collect()
    }
    assert set(got) == set(exp)
    for uid, (n, ewma) in exp.items():
        gn, gewma = got[uid]
        assert gn == n, uid
        assert abs(gewma - ewma) < 1e-9, uid


def test_running_stats_tws_matches_batch_agg(spark, sf_dir):
    """transformWithStateInPandas (state API v2): the final drained
    state per user must equal the batch groupBy aggregate. Skips when
    the runtime lacks google.protobuf (the TWS driver worker's wire
    dependency) — the v1 twin above always runs."""
    import pytest

    from amazonmsk_emr_tem_data_spark.streaming.stateful import (
        has_tws_runtime,
        running_stats_per_user,
    )

    if not has_tws_runtime():
        pytest.skip("google.protobuf not installed: TWS driver worker "
                    "cannot start in this container")

    import pyspark.sql.functions as F

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    batch = load_table(spark, sf_dir, "events")
    exp = {
        int(r["user_id"]): (r["n"], r["total"], r["vmax"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }
    stream = events_stream(spark, sf_dir)
    got = {
        int(r["user_id"]): (r["n_events"], r["total_value"], r["max_value"])
        for r in run_to_memory(
            running_stats_per_user(stream), output_mode="update"
        ).collect()
    }
    assert set(got) == set(exp)
    for uid, (n, total, vmax) in exp.items():
        gn, gtotal, gvmax = got[uid]
        assert gn == n and abs(gtotal - total) < 1e-6 and gvmax == vmax, uid
