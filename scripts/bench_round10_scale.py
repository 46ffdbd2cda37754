"""Round-10 scale study (r9 VERDICT asks #3): 10× AND 100× rows for
everything added since the round-9 table froze, plus the 100× column
for the round-9 operators that only had 10× rows.

Same methodology as SCALING.md / bench.py: key-offset replicated
fixtures (every document in an identity group of `factor` copies),
steady state (one warm run, caches cleared), per-query median of 3,
one quiet process. `query_cost_attribution` is excluded by design —
it reads plan metadata, so scaling rows would measure Catalyst, not
the engine.

Usage:
    python scripts/bench_round10_scale.py [x10_dir] [x100_dir]
Prints one JSON line {query: {"sf01": s, "x10": s, "x100": s,
"r10": ratio, "r100": ratio}} (x10 omitted for the r9 backfill set,
which already has committed 10× rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonmsk_emr_tem_data_spark.session import get_spark  # noqa: E402
from amazonmsk_emr_tem_data_spark.queries import REGISTRY  # noqa: E402

#: added after the round-9 scale table froze → need 10× AND 100×
NEW_QUERIES = [
    "copurchase_modularity",
    "stream_click_purchase_anti_join",
    "tokenizer_throughput_by_source",
    "embedding_hard_negatives",
    "nn_descent_knn_graph",
    "embedding_top_eigenvector",
    "doc_mojibake_audit",
    "kmeans_cluster_medoids",
    "embedding_spectral_outliers",
    "customer_l_diversity",
    "embedding_label_centroid_drift",
    "running_distinct_users",
    "session_event_trigrams",
    "part_harmonic_centrality",
    "incremental_curation_delta",
]

#: round-9 table rows that stopped at 10× → backfill the 100× column
R9_BACKFILL = [
    "stream_click_purchase_right_join",
    "stream_click_purchase_full_join",
    "stream_click_purchase_semi_join",
    "dedup_graph_degree_histogram",
    "curation_funnel_report",
    "order_fulfillment_latency",
    "simhash_bit_bias",
    "embedding_dimension_profile",
    "multimodal_audio",
    "decontamination_rate_by_source",
    "packing_efficiency_report",
]


def _median3(fn, spark, sf_dir):
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    # nudge ContextCleaner so GC-scoped localCheckpoint blocks from
    # iterative queries (NN-descent, CC) are freed between runs — at
    # 100x their accumulation OOMed an 8g heap
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
    spark = get_spark("bench-scale-r10")
    out = {}
    for name in NEW_QUERIES + R9_BACKFILL:
        fn, _ = REGISTRY[name]
        rec = {"sf01": round(_median3(fn, spark, src), 2)}
        if name in NEW_QUERIES:
            rec["x10"] = round(_median3(fn, spark, x10), 2)
            rec["r10"] = round(rec["x10"] / rec["sf01"], 2)
        rec["x100"] = round(_median3(fn, spark, x100), 2)
        rec["r100"] = round(rec["x100"] / rec["sf01"], 2)
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
