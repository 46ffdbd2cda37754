"""Sinks: console, CSV, parquet, Kafka (K1–K5).

Fixes the reference's sink-chain bug: ``temReadFromTopic.py:98-102``
chains ``.mode("overwrite")`` AFTER ``.csv(...)`` — ``csv()`` returns
``None``, so the write runs in default (errorifexists) mode and the
script then crashes on ``NoneType.mode``. Here mode is set before the
terminal format call, always.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def console_sink(df: DataFrame, num_rows: int = 50, truncate: bool = False) -> None:
    """K3: batch console sink (temReadFromTopic.py:86-91 used
    ``write.format("console")``; ``show`` is the idiomatic equivalent)."""
    df.show(num_rows, truncate=truncate)


def csv_sink(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    sep: str = "|",
    header: bool = True,
) -> None:
    """K5: CSV sink — pipe-delimited with header, like the reference's
    s3a://…/spark_output/tem_calculated write (temReadFromTopic.py:98-101),
    with the mode chained correctly."""
    df.write.mode(mode).option("header", header).option("sep", sep).csv(path)


def parquet_sink(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar sink (engine default; the reference had none). At scale,
    ``partition_by`` on a low-cardinality time/bucket column enables
    partition pruning for downstream readers."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def orc_sink(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (built-in columnar alternative; Hive-ecosystem
    interop). Same partition-pruning story as parquet_sink — at scale
    the choice between the two is ecosystem, not plan shape. (Avro
    needs the external spark-avro package, absent here by design —
    gate any future avro_sink behind an import/classpath probe the way
    the media codecs are gated.)"""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def kafka_sink_options(
    bootstrap_servers: str,
    topic: str,
    security: dict[str, str] | None = None,
) -> dict[str, str]:
    """The exact writer option set for the Kafka sinks (K1), as a pure
    dict so tests can pin it against the reference's ``options_write``
    (temDataRead.py:60-75) without a broker. Bare security keys get the
    ``kafka.`` prefix the DataFrame writer requires."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
    for k, v in (security or {}).items():
        opts[k if k.startswith("kafka.") else f"kafka.{k}"] = v
    return opts


def kafka_stream_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    security: dict[str, str] | None = None,
    trigger_interval: str | None = None,
    query_name: str = "kafka_stream_sink",
    _format: str = "kafka",
):
    """Streaming Kafka produce — the sink the reference's per-row loop
    (K2) should have been. Envelope-form input; checkpointed offsets
    give exactly-once-per-record delivery into an idempotent/
    transactional topic setup.

    ``_format`` is a test seam: the sandbox has neither a broker nor
    the spark-sql-kafka package, so the checkpoint/restart behavior of
    THIS builder (options, checkpointLocation, queryName, trigger) is
    exercised end-to-end with ``_format="noop"`` (the one sink that
    tolerates the kafka option set AND supports checkpoint recovery —
    the memory sink refuses both) — everything but the terminal format
    string is the production path
    (tests/test_sinks_sources.py::test_kafka_stream_sink_checkpoint_resume).
    """
    writer = (
        df.writeStream.format(_format)
        .options(**kafka_sink_options(bootstrap_servers, topic, security))
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def kafka_batch_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    security: dict[str, str] | None = None,
) -> None:
    """K1: whole-DataFrame Kafka produce (temDataRead.py:77-83).

    ``df`` must already be in envelope form (string ``key`` + ``value``
    columns — see functions/codec.to_kafka_envelope). One distributed
    ``save()``; contrast with the reference's per-row loop (K2), which is
    replaced by sources/replay.replay_stream + a streaming Kafka sink.
    """
    df.write.format("kafka").options(
        **kafka_sink_options(bootstrap_servers, topic, security)
    ).save()
