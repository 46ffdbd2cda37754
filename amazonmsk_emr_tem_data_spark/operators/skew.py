"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.get_spark) handles most skew at
runtime; these operators are the *explicit* form for the cases AQE can't
re-plan — a single grouping key receiving a large share of all rows
(partial aggregation already combines map-side, but the final reduce for
that key still lands on one task), or a shuffle join where one key's
rows exceed an executor.

Both transforms are exact: salting only changes WHERE partial results
are computed, never what they are.

- **salted aggregation**: groupBy(keys ∪ salt) → partial aggs →
  groupBy(keys) → merge. Any algebraic aggregate (sum/count/min/max)
  decomposes this way; avg = sum/count at the merge.
- **salted join**: the skewed (large) side gets a deterministic salt in
  [0, n); the other side is replicated n× with every salt value, and
  the equi-join key becomes (key, salt). Fan-out cost: n copies of the
  small side's rows — choose n ≈ hot-key rows / target-partition rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: hash of the whole row, mod n.

    Deterministic (vs ``rand()``) so repeated runs of the same query on
    the same data produce identical partial-aggregate placement —
    keeps retries and AQE re-executions stable.
    """
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase grouped aggregation over ``sums`` (name → SUM-like
    column expression that is mergeable by further summation).

    Phase 1 shuffles on (keys, salt) — a hot key spreads over
    ``n_salts`` reducers; phase 2 shuffles only the tiny partial rows.
    """
    partial = df.withColumn(SALT, _row_salt(df, n_salts)).groupBy(
        *keys, SALT
    ).agg(*[expr.alias(name) for name, expr in sums.items()])
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in sums]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over
    ``n_salts`` partitions and ``other`` is replicated to meet them."""
    s = skewed.withColumn(SALT, _row_salt(skewed, n_salts))
    o = other.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return s.join(o, [*on, SALT], how).drop(SALT)
