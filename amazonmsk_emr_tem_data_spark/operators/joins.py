"""Join operators beyond Spark's built-ins: as-of and range joins.

The reference has no joins at all (SURVEY.md §2.5) — these are the
engine's additions for time-series analytics, designed scale-first:

- **as-of join**: the classic "latest right row at or before each left
  row per key". NOT implemented as an inequality join (O(n·m) nested
  loop) but as the union-merge pattern: tag both sides, union, ONE
  shuffle on the key, sort within partitions, carry the right side
  forward with ``last(..., ignorenulls=True)`` over a running frame.
  Cost at 100 TB = one shuffle of (left + right), same as any keyed agg.
- **range join**: "left rows within [start, end) of right rows" via
  bucketization: explode each right interval into the fixed-width
  buckets it overlaps, equi-join on (key, bucket), then exact-filter.
  Turns an inequality join into an equi-join whose fan-out is
  interval_width / bucket_width — the standard trick Spark itself uses
  for stream-stream interval joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``right_cols``
    from the latest right row with the same ``on`` key and
    ``right_ts <= left_ts`` (NULLs where no such row exists).

    Equal-timestamp rights sort before the left row (inclusive <=);
    among equal (key, ts) rights the one with the greatest ``tie_break``
    wins, making the result deterministic.
    """
    tie = tie_break or right_cols[0]
    l_tagged = left.withColumn("__tag", F.lit(1))
    for c in right_cols:
        if c not in left.columns:
            l_tagged = l_tagged.withColumn(c, F.lit(None))
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("__tag"),
        *[F.col(c) for c in right_cols],
    )
    l_cols = [c for c in l_tagged.columns if c not in right_cols]
    merged = l_tagged.select(
        *l_cols, *right_cols
    ).unionByName(
        r_tagged, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts).asc(), F.col("__tag").asc(), F.col(tie).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("__tag") == 1).drop("__tag", *right_cols)
    for c in right_cols:
        out = out.withColumnRenamed(f"__asof_{c}", c)
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_start: Column,
    right_end: Column,
    bucket: str = "1 day",
) -> DataFrame:
    """Equi-bucketized range join: left rows whose ``left_ts`` falls in
    the right row's [start, end) interval, matched on key ``on``.

    Each right row explodes into the ``bucket``-width time buckets its
    interval overlaps; the join is then an equi-join on (key, bucket)
    followed by the exact interval filter. Choose ``bucket`` on the
    order of the typical interval width: fan-out stays O(1) per row and
    no shuffle partition ever sees more than one bucket's worth of a
    key (skew = hot (key, bucket), handled by AQE skew-join splitting).
    """
    r = right.withColumn("__start", right_start).withColumn("__end", right_end)
    r_bucketed = r.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.unix_timestamp(F.date_trunc("day", F.col("__start"))),
                F.unix_timestamp(F.date_trunc("day", F.col("__end"))),
                F.lit(86400),
            )
        ),
    )
    l_bucketed = left.withColumn(
        "__bucket", F.unix_timestamp(F.date_trunc("day", F.col(left_ts)))
    )
    joined = l_bucketed.join(r_bucketed, [on, "__bucket"]).filter(
        (F.col(left_ts) >= F.col("__start")) & (F.col(left_ts) < F.col("__end"))
    )
    return joined.drop("__bucket", "__start", "__end")
