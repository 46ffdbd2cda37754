"""2-D Pareto frontier (skyline) — exact, shuffle-bounded.

Dominance for (cost, gain): row b dominates row a iff
``b.cost <= a.cost AND b.gain >= a.gain`` with at least one strict.
The skyline is the set of non-dominated rows — the classic "cheapest
AND biggest" product query the reference's SQL surface cannot express
without an O(n²) NOT-EXISTS self-join.

Scale design (the reason this is an operator, not a query): skylines
decompose — ``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — but
the exact plan here needs no recursion. Band the cost axis into
fixed-width integer bands (a PARTITIONING of the sort order, not an
approximation: equal costs always share a band):

1. per-band max gain — a bounded aggregate (#bands rows);
2. running max over strictly-cheaper bands on that tiny table
   (single-partition window over #bands rows — model-state sized);
3. per-band windows (RANGE to current-1 for strictly-cheaper same-band
   rows, RANGE 0..0 for equal-cost peers) — partitioned by band, so no
   global single-partition sort ever touches the data.

Total cost at 100 TB: one (band) shuffle of the projected columns +
one tiny agg — same order as any groupBy. The O(n²) pair space is
never materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pareto_frontier_2d(
    df: DataFrame,
    cost: str,
    gain: str,
    band_width: int = 1000,
) -> DataFrame:
    """All rows of ``df`` not dominated on (min ``cost``, max ``gain``).

    ``cost`` and ``gain`` must be integer-valued columns (put money on
    the cent grid first); ``band_width`` trades band-table size against
    in-band window width. Ties: duplicate (cost, gain) points do not
    dominate each other — both survive.
    """
    p = df.withColumn("__band", F.floor(F.col(cost) / band_width))
    band_stats = p.groupBy("__band").agg(F.max(gain).alias("__band_max"))
    # pmod(band, 1) == constant 0 partition key, written so constant
    # folding can't collapse it to an empty spec; the window sorts only
    # #bands rows.
    w_bands = (
        Window.partitionBy(F.pmod(F.col("__band"), F.lit(1)))
        .orderBy("__band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = band_stats.select(
        "__band", F.max("__band_max").over(w_bands).alias("__prev_max")
    )
    w_cheaper = (
        Window.partitionBy("__band")
        .orderBy(cost)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_peer = Window.partitionBy("__band").orderBy(cost).rangeBetween(0, 0)
    flagged = (
        p.join(F.broadcast(prev_max), "__band")
        .withColumn(
            "__cheaper_max",
            F.greatest(
                F.coalesce(F.max(gain).over(w_cheaper), F.lit(-(1 << 62))),
                F.coalesce(F.col("__prev_max"), F.lit(-(1 << 62))),
            ),
        )
        .withColumn("__peer_max", F.max(gain).over(w_peer))
    )
    return flagged.filter(
        (F.col("__cheaper_max") < F.col(gain))
        & (F.col("__peer_max") <= F.col(gain))
    ).drop("__band", "__band_max", "__prev_max", "__cheaper_max", "__peer_max")
