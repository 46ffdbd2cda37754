"""Round-12 scale study: 10× AND 100× rows for the query added this
(A-ES weighted priority sampling), so SCALING.md's
committed ratios always describe the shipped plans.

Same methodology as SCALING.md / bench.py: key-offset replicated
fixtures, steady state (one warm run, caches cleared), per-query
median of 3, one quiet process.

Usage:
    python scripts/bench_round12_scale.py [x10_dir] [x100_dir]
Prints one JSON line {query: {"sf01": s, "x10": s, "x100": s,
"r10": ratio, "r100": ratio}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonmsk_emr_tem_data_spark.session import get_spark  # noqa: E402
from amazonmsk_emr_tem_data_spark.queries import REGISTRY  # noqa: E402

#: added in round 12 → needs fresh 10× AND 100× rows
NEW_QUERIES = [
    "weighted_priority_sample",
    "stratified_priority_sample",
    "stream_priority_sample",
    "bbit_minhash_audit",
]


def _median3(fn, spark, sf_dir):
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    # nudge ContextCleaner so GC-scoped localCheckpoint blocks from
    # iterative queries are freed between runs
    spark.sparkContext._jvm.System.gc()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    times.sort()
    return times[1]


def main() -> None:
    src = "/root/testdata/sf0.1"
    x10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_scaled_10"
    x100 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled_100"
    for d, f in ((x10, 10), (x100, 100)):
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            from scripts.make_scaled_fixtures import build_scaled

            build_scaled(src, d, f)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("bench-scale-r12")
    out = {}
    for name in NEW_QUERIES:
        fn, _ = REGISTRY[name]
        rec = {"sf01": round(_median3(fn, spark, src), 2)}
        rec["x10"] = round(_median3(fn, spark, x10), 2)
        rec["r10"] = round(rec["x10"] / rec["sf01"], 2)
        rec["x100"] = round(_median3(fn, spark, x100), 2)
        rec["r100"] = round(rec["x100"] / rec["sf01"], 2)
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
