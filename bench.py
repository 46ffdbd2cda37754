"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is measured with the `noop` sink (full plan executes, nothing
is collected to the driver) — the honest cost of the distributed work.

Cross-round comparison rule: compare per-query MEDIANS between runs
taken under comparable ambient load (the JSON records loadavg before /
after and a timestamp) — never bare totals. On a shared sandbox,
unchanged plans swing 1.2-1.5x with host load; the r6 headline total
read as a 55% regression that a controlled re-run showed was flat.
``scripts/bench_compare.py OLD.json NEW.json`` applies this rule
mechanically (per-query ratios, median, load context, added/dropped).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazonmsk_emr_tem_data_spark.session import get_spark  # noqa: E402
from amazonmsk_emr_tem_data_spark.queries import REGISTRY  # noqa: E402

#: The queries that define the engine's headline throughput. A mix of
#: scan+agg, multi-join, window, codec, and (as they land) the
#: north-star dedup/similarity/text operators.
HEADLINE = [
    "tem_hourly_avg",
    "q1_pricing_summary",
    "revenue_by_segment",
    "nation_revenue",
    "topk_orders_per_priority",
    "running_total_per_customer",
    "dedup_first_event",
    "envelope_roundtrip",
    "json_props_extract",
    "distinct_users_per_type",
    "sessionize_events",
    "asof_latest_order",
    "range_join_order_events",
    "doc_text_features",
    "doc_fingerprint_groups",
    "minhash_lsh_pairs",
    "embedding_knn_join",
    # round-2 additions: the iterative (connected-components), the
    # explode-heavy (dup-n-gram repetition filter), and the
    # scalar-HAVING (two-pass global agg) paths
    "dedup_clusters",
    "doc_repetition_filter",
    "supplier_revenue_share",
    # round-2 additions: broadcast n-gram overlap (decontamination),
    # two-level prefix sum (packing), 7-table broadcast join (Q8 shape)
    "doc_decontamination",
    "doc_sequence_packing",
    "nation_market_share",
    # round-4 additions: coarse-quantized ANN (post expression-tree
    # fix), and two corpus-curation passes (hash shard shuffle, per-
    # source quality ranking). SemDeDup stays out: its 5 Lloyd's
    # rounds are driver-synchronized fixed cost that noise-dominates a
    # sub-minute bench (scale behavior covered by tests/test_scale.py
    # + clustering tests).
    "ivf_topk",
    "doc_shuffle_shards",
    "doc_quality_selection",
    # round-5 addition: BM25 after the top-k fix (global-sort window ->
    # TakeOrderedAndProject) — in the set to lock the improvement in
    "doc_bm25_search",
    # round-6 additions (the r5 verdict's bench-hygiene ask): the two
    # curation-tier representatives that went driver-green in r5 —
    # full-vocab tf-idf (widest (doc,term) shuffle in the registry)
    # and the map-only content-fingerprint split
    "corpus_tfidf_topterms",
    "doc_leakage_safe_split",
    # round-6 session-3 addition: the span-removal query after the
    # Generate-filter re-evaluation fix (positions-explode) — in the
    # set to lock the 4x improvement in, same rationale as BM25 in r5
    "doc_dup_span_removal",
    # round-7 addition: hybrid BM25+tf-idf RRF fusion after the
    # map-side tf rework (3.1x) — locks the shared-tf-relation shape in
    "hybrid_rrf_search",
    # round-7 additions: winnowing after the lambda-staging fix
    # (17x — in the set to lock it in), the directed containment
    # join (the new exact pair operator), and the Gopher-rule filter
    # (pure map-pass representative of the r7 corpus-monitor tier)
    "doc_winnowing_fingerprints",
    "containment_dup_pairs",
    "gopher_quality_filter",
    # round-7 session-5 additions: the banded skyline (window-prune
    # path), the FM register sketch (cardinality-sketch tier
    # representative), and last-touch attribution (as-of composition
    # over the event stream)
    "part_skyline",
    "user_distinct_sketch",
    "purchase_attribution",
    # the session-5 heavyweights: the bounded-round graph peel (join +
    # cascade representative) and session-set mining (sessionize +
    # bounded pair fan-out representative)
    "part_kcore_members",
    "session_association_rules",
    # r7 session-6: the sketch, clustering, anomaly, and window-trick
    # tiers' representatives
    "activity_overlap_kmv",
    "kmeans_lloyd_clusters",
    "event_seasonal_anomaly",
    "part_stock_balance",
    # round-8 additions: the one-pass combined-aggregate rollup
    # (min_by/max_by candle), the basket pair-mining representative,
    # and the kNN-sparsified wedge join (locks the 10.1x -> 1.8x
    # sparsification win in)
    "event_value_ohlc",
    "part_copurchase_lift",
    "copurchase_link_prediction",
    # round-9 additions: the rep-level-CC dedup win rides the existing
    # dedup_clusters entry; add the degree-histogram (a second
    # consumer of collapse-first LSH pairs), the 60-column sketch
    # combine, and the day-grid fulfillment percentiles
    "dedup_graph_degree_histogram",
    "simhash_bit_bias",
    "order_fulfillment_latency",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Ambient-load context (r6 verdict: a 25% total swing on unchanged
    # plans traced to host load the artifact didn't record). Snapshot
    # loadavg before AND after so a cross-round comparison can tell
    # "regression" from "busy box"; compare per-query MEDIANS under
    # comparable load, never bare totals.
    load_before = os.getloadavg()
    started_at = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    spark = get_spark("bench")

    results: dict[str, float] = {}
    # warm the JVM + parquet footers once with the cheapest query
    REGISTRY["tem_hourly_avg"][0](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Steady-state methodology: each plan executes once to pay one-time
    # costs (Janino codegen compile + JIT — seconds that amortize to zero
    # over a 100 TB run), then the measured run reports the recurring
    # distributed-execution cost. Caches created inside operators are
    # dropped between the warm and measured runs so the measured run
    # re-does ALL data work (shingling, scans, shuffles) — only compiled
    # code is reused.
    # Per-query median of REPS measured runs: round-over-round deltas on
    # a shared sandbox were dominated by load noise (1.2-1.5x swings on
    # unchanged plans); the median of three keeps one slow outlier from
    # reading as a regression.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    total = 0.0
    spread: dict[str, float] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        fn, _ = REGISTRY[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        times.sort()
        med = times[len(times) // 2]
        results[name] = round(med, 3)
        spread[name] = round(times[-1] - times[0], 3)
        total += med

    payload = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(total, 3),
            "unit": "sec",
            "queries": results,
            "spread": spread,
            "reps": reps,
            "sf": _sf_from_dir(sf_dir),
            "started_at": started_at,
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        }
    )
    # Truncation-proofing (r7: the driver kept only the TAIL of bench
    # stdout and the headline total was cut off): also persist the full
    # JSON to a git-tracked file so the totals survive any capture.
    # r9 hardening (r8 VERDICT ask #7): BENCH_LOCAL.json is the
    # latest-run snapshot AND every run appends to BENCH_HISTORY.jsonl
    # (git-tracked, append-only) — cross-round per-query medians never
    # depend on the driver's truncated tail or on a snapshot a later
    # run overwrote. Each line carries sf + timestamp + loadavg, so
    # comparisons can select quiet sf0.1 runs mechanically.
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
            f.write(payload + "\n")
        with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as f:
            f.write(payload + "\n")
    except OSError:
        pass  # a read-only checkout must not break the stdout contract
    print(payload)


if __name__ == "__main__":
    main()
