"""Kafka sources (S2 batch, S3 streaming).

Re-expresses the reference's bounded and unbounded Kafka reads
(``/root/reference/pyspark_scripts/temReadFromTopic.py:36-59`` and
``03_temStreamEveryMin.py:41-64``) as option-builder functions. The
reference hard-wires SASL_SSL + AWS_MSK_IAM auth inline; here security
options are an opaque dict passed through, so the same code runs against
a plaintext local broker, MSK-IAM, or any SASL mechanism.

No broker exists in the test container: these builders are exercised by
unit tests up to ``.load()`` plan construction only; the envelope codec
(functions/codec.py) carries the actual semantics and is fully tested
broker-free via round-trips.

Scale notes:
- ``minPartitions`` lets a 1000-executor cluster split topic partitions
  into more Spark input splits than Kafka partitions.
- ``maxOffsetsPerTrigger`` bounds micro-batch size so a replay from
  ``earliest`` over years of history doesn't produce one giant batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _apply_common(reader, bootstrap_servers: str, security: dict[str, str] | None):
    reader = reader.format("kafka").option("kafka.bootstrap.servers", bootstrap_servers)
    for k, v in (security or {}).items():
        # e.g. kafka.security.protocol=SASL_SSL, kafka.sasl.mechanism=AWS_MSK_IAM
        reader = reader.option(k if k.startswith("kafka.") else f"kafka.{k}", v)
    return reader


def kafka_batch_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
    security: dict[str, str] | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """S2: bounded full-topic read (temReadFromTopic.py:36-59)."""
    reader = _apply_common(spark.read, bootstrap_servers, security)
    reader = (
        reader.option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
    )
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load()


def kafka_stream_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    security: dict[str, str] | None = None,
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """S3: unbounded streaming read (03_temStreamEveryMin.py:41-64)."""
    reader = _apply_common(spark.readStream, bootstrap_servers, security)
    reader = reader.option("subscribe", topic).option("startingOffsets", starting_offsets)
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load()
