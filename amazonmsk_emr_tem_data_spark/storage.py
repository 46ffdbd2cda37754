"""Bucketed + partitioned storage: pre-shuffled layouts for co-located
joins and partition pruning.

At 100 TB the single biggest shuffle in most pipelines is the fact-fact
join (lineitem ⋈ orders class). Bucketing removes it structurally: both
tables are written pre-hashed on the join key into the same number of
buckets, so the join plans as a SortMergeJoin over matched bucket files
with **zero Exchange** — the shuffle was paid once at write time and
amortizes over every subsequent join/agg on that key.

The reference stores everything as flat CSV on S3 (SURVEY.md §1.1) and
pays the shuffle on every read. Our layout contract:

- fact tables: ``bucketBy(N, join_key)`` + ``sortBy(join_key)`` —
  N sized so a bucket ≈ one task's comfortable input (128–512 MB);
- time-series tables: additionally ``partitionBy(date_col)`` for
  partition pruning on time predicates;
- dimension tables: plain parquet (they broadcast anyway).

Bucketed tables go through the session catalog (``saveAsTable`` — the
bucket metadata lives there), with an explicit ``path`` so data stays
in the caller's directory, not the default warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally partitioned) parquet table
    registered as ``table`` in the session catalog."""
    writer = df.write.mode(mode).format("parquet").option("path", path)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket counts Spark plans this with no Exchange on either
    side (verified by tests/test_storage.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
