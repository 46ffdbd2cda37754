"""Ad-hoc single-query timer for optimization A/Bs (guide §1.4).

Same methodology as bench.py (noop sink, one warm rep, cache clear
between reps, per-query median) but for a chosen subset of queries in
one fresh session — the cheap inner loop between full bench runs.

Usage: python scripts/time_query.py q1[,q2,...] [reps]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonmsk_emr_tem_data_spark.session import get_spark  # noqa: E402
from amazonmsk_emr_tem_data_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_query")
    out = {}
    for name in names:
        fn, _ = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"rep{i}:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        st = sorted(times)
        out[name] = {"median": st[len(st) // 2], "times": times}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"loadavg": os.getloadavg()[0], "results": out}))


if __name__ == "__main__":
    main()
