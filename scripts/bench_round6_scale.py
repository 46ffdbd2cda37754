"""One-off 10x scale study for the round-5/6 operators that were never
in a 10x run (r5 VERDICT item 4): BM25, tf-idf top-terms, leakage-safe
split, length histogram, CDC upsert, outlier flagging, sequence
packing, plus the new composed curation pipeline.

Same methodology as SCALING.md / bench.py: key-offset 10x fixtures
(every document in a 10-copy identity group), steady-state (one warm
run, caches cleared), per-query median of 3, local[32].

Usage:
    python scripts/bench_round6_scale.py [scaled_dir] [query,query,...]
Prints one JSON line {query: {"sf01": s, "x10": s, "ratio": r}}.
The optional comma-separated query list overrides the default set
(used for the session-2 additions: pagerank, keep-best, bigram LM,
semantic decontamination, mixture resample).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonmsk_emr_tem_data_spark.session import get_spark  # noqa: E402
from amazonmsk_emr_tem_data_spark.queries import REGISTRY  # noqa: E402

QUERIES = [
    "doc_bm25_search",
    "corpus_tfidf_topterms",
    "doc_leakage_safe_split",
    "corpus_length_histogram",
    "events_upsert_latest",
    "event_value_outliers",
    "doc_sequence_packing",
    "corpus_curation_pipeline",
]


def _median3(fn, spark, sf_dir):
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache()
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
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_scaled_r6"
    if not os.path.exists(os.path.join(scaled, "documents.parquet")):
        from scripts.make_scaled_fixtures import build_scaled

        build_scaled(src, scaled, 10)
    queries = sys.argv[2].split(",") if len(sys.argv) > 2 else QUERIES
    spark = get_spark("bench-scale-r6")
    out = {}
    for name in queries:
        fn, _ = REGISTRY[name]
        t_small = _median3(fn, spark, src)
        t_big = _median3(fn, spark, scaled)
        out[name] = {
            "sf01": round(t_small, 2),
            "x10": round(t_big, 2),
            "ratio": round(t_big / t_small, 2),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
