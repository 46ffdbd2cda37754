"""Structured Streaming pipelines (SURVEY.md §2.6, §7.1 M3).

Re-expresses the reference's streaming consumer
(``/root/reference/pyspark_scripts/03_temStreamEveryMin.py``) and fills
every gap its SURVEY audit found: the reference has a processing-time
trigger but **no watermarks, no event-time windows, no stateful ops, no
checkpointing** (§2.6). All four are first-class here.

Determinism without a broker: a parquet **file source** over the driver
fixtures plays the role of the Kafka topic (same micro-batch execution
path), and ``trigger(availableNow=True)`` drains it to completion
synchronously — so streaming results can be compared 1:1 against the
batch DuckDB oracle.

Output-mode semantics worth knowing (encoded in the helpers):

- ``append`` + watermark is the production pattern (state is evicted,
  late data beyond the watermark dropped) — but in a single-drain
  bounded run the windows newer than ``max(ts) − watermark`` are
  *withheld* (the watermark only advances between micro-batches), so a
  bounded append run is a strict subset of the batch answer.
- ``complete`` emits every window on the final batch — bit-equal to the
  batch aggregation, which is what the oracle-parity queries use.

Scale: the same pipeline definitions run unbounded on a Kafka source
(sources/kafka.kafka_stream_source) with ``maxOffsetsPerTrigger``
bounding batch size and a durable ``checkpointLocation`` giving
exactly-once state recovery — the two knobs the reference left unset.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: File-source schema for events: ``ts`` arrives as long nanos (the
#: fixtures are parquet TIMESTAMP(NANOS), which Spark 4 only reads via
#: the nanosAsLong legacy mode) and is restored to TimestampType below.
_EVENTS_NS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Unbounded view of the events table via the parquet file source —
    the broker-free stand-in for the reference's Kafka topic (S3)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.schema(_EVENTS_NS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(sf_dir).withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
    )


def run_to_memory(
    result: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
    checkpoint: bool = True,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain a streaming DataFrame to completion (availableNow) into a
    memory sink and return the materialized result.

    Adds the two lifecycle pieces the reference omitted: a named query
    (it had T3) AND a checkpoint location (it had none → full replay on
    every restart, SURVEY §2.6).
    """
    name = query_name or f"mem_{uuid.uuid4().hex[:12]}"
    writer = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option(
            "checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{name}_")
        )
    q = writer.start()
    q.awaitTermination(timeout_sec)
    return result.sparkSession.table(name)


def stream_tumbling_agg(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
    output_mode: str = "complete",
) -> DataFrame:
    """Event-time tumbling-window aggregation — the operator the
    reference's 1-minute *processing-time* trigger only imitated
    (SURVEY §2.6: 'Absent — event-time windows')."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias(
                "sum_value"
            ),
        )
    )
    return run_to_memory(agg, output_mode=output_mode).select(
        F.col("w.start").alias("bucket_ts"), "event_type", "n_events", "sum_value"
    )


def stream_sliding_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """Sliding event-time windows (each event lands in window/slide
    overlapping buckets)."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return run_to_memory(agg).select(
        F.col("w.start").alias("window_start"), "event_type", "n_events"
    )


def stream_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: ``dropDuplicates`` over the key columns — the
    stateful distinct the reference needed for its 755-duplicate-id
    fixture but never built (SURVEY §2.5). Bounded drain ⇒ exactly the
    batch DISTINCT."""
    ev = events_stream(spark, sf_dir)
    distinct = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return run_to_memory(distinct, output_mode="append")


def stream_session_windows(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Session windows: per-user activity sessions closed by a 30-min
    idle gap (``F.session_window`` — dynamic, data-driven windows)."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return run_to_memory(agg).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )
