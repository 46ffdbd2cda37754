"""Streaming-state observability: read a query's checkpointed state as
a DataFrame (Spark 4 State Data Source).

The reference's only visibility into its stream was the console sink.
At 100 TB-class state (billions of keys across stateful operators) the
questions that matter — WHICH keys dominate state size, is a watermark
stall pinning old windows, did a restart resume with the expected
state — need the state itself to be queryable without replaying the
stream. Spark 4 exposes every operator's state store as a read-only
batch source; these helpers wrap it:

- :func:`state_metadata` — one row per stateful operator/store in the
  checkpoint (operator name, state store name, partition counts, batch
  id range) — the catalog of what is inspectable;
- :func:`read_state` — the (key, value, partition_id) rows of one
  store at the last committed batch (or ``batch_id=``);
- :func:`grouped_agg_state` — flattens the struct key/value of a
  groupBy().agg() state into plain columns, ready to join/compare
  against batch results (the restart-audit pattern the tests pin:
  drained stream state == the same aggregate computed in batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
) -> DataFrame:
    reader = spark.read.format("statestore").option(
        "operatorId", operator_id
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load(checkpoint)


def grouped_agg_state(
    spark: SparkSession, checkpoint: str, **kwargs
) -> DataFrame:
    """Flatten a groupBy().agg() operator's state: key struct fields
    and value struct fields become top-level columns."""
    st = read_state(spark, checkpoint, **kwargs)
    key_cols = [
        F.col(f"key.{f}").alias(f)
        for f in st.schema["key"].dataType.fieldNames()
    ]
    val_cols = [
        F.col(f"value.{f}").alias(f)
        for f in st.schema["value"].dataType.fieldNames()
    ]
    return st.select(*key_cols, *val_cols, "partition_id")


def state_size_by_partition(
    spark: SparkSession, checkpoint: str, **kwargs
) -> DataFrame:
    """Key counts per state-store partition — the first thing to look
    at when one reducer's state store is the straggler."""
    return (
        read_state(spark, checkpoint, **kwargs)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
