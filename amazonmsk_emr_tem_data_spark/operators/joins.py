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


_BUCKET_UNITS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _parse_bucket_seconds(bucket: str) -> int:
    """``"<n> <unit>"`` → stride in seconds (unit may be plural)."""
    parts = bucket.strip().split()
    if len(parts) != 2:
        raise ValueError(f"bucket must be '<n> <unit>', got {bucket!r}")
    n, unit = int(parts[0]), parts[1].lower().rstrip("s")
    if n <= 0 or unit not in _BUCKET_UNITS:
        raise ValueError(f"unsupported bucket interval {bucket!r}")
    return n * _BUCKET_UNITS[unit]


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

    ``bucket`` is an interval string ``"<n> <unit>"`` (seconds/minutes/
    hours/days/weeks); both sides bucketize by the same epoch-aligned
    integer stride, so the equi-join keys line up for any width.
    """
    step = _parse_bucket_seconds(bucket)
    r = right.withColumn("__start", right_start).withColumn("__end", right_end)
    r_bucketed = r.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col("__start")) / step) * step,
                F.floor(F.unix_timestamp(F.col("__end")) / step) * step,
                F.lit(step),
            )
        ),
    )
    l_bucketed = left.withColumn(
        "__bucket",
        F.floor(F.unix_timestamp(F.col(left_ts)) / step) * step,
    )
    joined = l_bucketed.join(r_bucketed, [on, "__bucket"]).filter(
        (F.col(left_ts) >= F.col("__start")) & (F.col(left_ts) < F.col("__end"))
    )
    return joined.drop("__bucket", "__start", "__end")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Interval×interval OVERLAP join: all (left, right) pairs sharing
    key ``on`` whose half-open intervals [start, end) intersect —
    the two-sided generalization of ``range_join`` (sessions × incident
    windows, span annotations × span annotations, ...).

    Physical strategy: both sides explode into the epoch-aligned
    ``bucket``-width buckets their interval covers, equi-join on
    (key, bucket), then keep each true pair EXACTLY ONCE with zero
    dedup exchange via a canonical-bucket predicate: an overlapping
    pair's later start max(ls, rs) lies inside both intervals, so its
    bucket is covered by both sides — the join keeps only the match in
    that one bucket (``bucket == floor(max(ls, rs)/step)``). A
    distinct() here would shuffle the full pair output; the predicate
    is free.

    Choose ``bucket`` near the typical interval width: per-row fan-out
    stays O(interval/bucket), and hot (key, bucket) cells are split by
    AQE at runtime. Exact overlap test is integer epoch-second math."""
    step = _parse_bucket_seconds(bucket)

    def bucketize(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(start)) / step) * step,
                    F.floor(F.unix_timestamp(F.col(end)) / step) * step,
                    F.lit(step),
                )
            ),
        )

    lb = bucketize(left, left_start, left_end).alias("l")
    rb = bucketize(right, right_start, right_end).alias("r")
    ls, le = F.col(f"l.{left_start}"), F.col(f"l.{left_end}")
    rs, re_ = F.col(f"r.{right_start}"), F.col(f"r.{right_end}")
    canonical = (
        F.floor(F.unix_timestamp(F.greatest(ls, rs)) / step) * step
    )
    joined = lb.join(
        rb,
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col("l.__bucket") == F.col("r.__bucket"))
        & (ls < re_)
        & (rs < le)
        & (F.col("l.__bucket") == canonical),
    )
    # collision-safe projection: a right column sharing a left column's
    # name (incl. the self-join case) comes out as r_<name>, and the
    # computed overlap column never shadows an input
    left_out = [c for c in left.columns if c != on]
    taken = {on, *left_out}
    right_names = {}
    for c in right.columns:
        if c == on:
            continue
        name = c if c not in taken else f"r_{c}"
        while name in taken:
            name = f"r_{name}"
        taken.add(name)
        right_names[c] = name
    overlap_name = "overlap_seconds"
    while overlap_name in taken:
        overlap_name = f"{overlap_name}_"
    return joined.select(
        F.col(f"l.{on}").alias(on),
        *[F.col(f"l.{c}").alias(c) for c in left_out],
        *[F.col(f"r.{c}").alias(n) for c, n in right_names.items()],
        F.greatest(
            F.lit(0).cast("long"),
            F.unix_timestamp(F.least(le, re_))
            - F.unix_timestamp(F.greatest(ls, rs)),
        ).alias(overlap_name),
    )
