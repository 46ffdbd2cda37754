"""Planted-skew join benchmark: salted_join vs plain shuffle join.

Builds a fact table where ONE key owns half of all rows (the
hot-partition shape AQE's skew splitting and salting both target), joins
it to a dim table too large to broadcast, and measures three plans:

1. plain sort-merge join, AQE skew handling OFF  (the failure mode)
2. plain join, AQE skew handling ON              (runtime mitigation)
3. salted_join, AQE skew handling OFF            (explicit mitigation)

All three are exact — row counts are asserted equal. Run:
    python scripts/bench_skew.py [n_fact_rows]
Results are recorded in SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amazonmsk_emr_tem_data_spark.operators.skew import salted_join
from amazonmsk_emr_tem_data_spark.session import get_spark


def run_skew_bench(spark, n_fact: int, n_keys: int = 100_000) -> dict[str, float]:
    """Measure the three plans (importable for the pytest -m scale
    suite); asserts all three are exact before timing. Leaves
    autoBroadcastJoinThreshold/-AQE-skew conf restored to defaults."""
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # fact: half the rows on key 0, the rest uniform over [1, n_keys)
    fact = (
        spark.range(n_fact)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys - 1)) + 1)
            .alias("k"),
            (F.col("id") % 97).alias("v"),
        )
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )

    def run(df) -> float:
        df.write.format("noop").mode("overwrite").save()  # warm/codegen
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    expected = fact.count()  # inner join on a complete dim keeps all rows

    def agg(j):
        return j.groupBy("k").agg(F.sum(F.col("v") + F.col("w")).alias("s"))

    results: dict[str, float] = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    plain = fact.join(dim, "k")
    assert plain.count() == expected
    results["plain_join_aqe_skew_off"] = run(agg(plain))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["plain_join_aqe_skew_on"] = run(agg(plain))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    salted = salted_join(fact, dim, on=["k"], n_salts=32)
    assert salted.count() == expected
    results["salted_join_32"] = run(agg(salted))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    if prev_bcast is not None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
    return results


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark("bench_skew")
    for name, sec in run_skew_bench(spark, n_fact).items():
        print(f"{name}: {sec:.2f} s")


if __name__ == "__main__":
    main()
