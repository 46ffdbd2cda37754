"""sf1 heavy-tier bench lane (r14, r13 VERDICT ask #6).

The 8-core/32-core inversion in PERF_r13 (40/59 scaling ratios < 1)
proved that sf0.1 measures the per-query driver/AQE/task-launch floor,
not parallel execution. This lane gives each round one number where
cores matter: a quiet, reps=1 run of the >= 1 s headline tier against
the 10x key-offset-replicated fixture (SCALING.md methodology,
deterministic — scripts/make_scaled_fixtures.py), appended to
BENCH_HISTORY.jsonl with ``"sf": 1`` so the driver can diff it
round-over-round.

Usage:
    python scripts/bench_sf1_lane.py [fixture_dir]
        fixture_dir defaults to /tmp/sf1 (built from /root/testdata/sf0.1
        x10 on first use; ~200 MB).

The run goes through bench.py itself (same timing methodology, same
JSON contract, same history append) via the additions-only env knobs:
SPARK_GRAFT_SF_DIR, SPARK_GRAFT_BENCH_REPS=1 and
SPARK_GRAFT_BENCH_ONLY=<heavy tier>. The heavy tier is derived from
the latest sf0.1 run in BENCH_HISTORY.jsonl (queries >= 1.0 s), with a
pinned fallback so the lane is runnable on a fresh checkout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

#: fallback heavy tier (the r14 baseline's >= 1 s set) for a checkout
#: with no usable history line
FALLBACK_HEAVY = [
    "nn_descent_knn_graph", "dedup_clusters", "part_kcore_members",
    "containment_dup_pairs", "minhash_lsh_pairs",
    "dedup_graph_degree_histogram", "copurchase_hyperball",
    "copurchase_link_prediction", "kmeans_lloyd_clusters",
    "stream_ann_ingest_dedup", "incremental_curation_delta",
    "part_copurchase_lift", "ivfpq_persisted_topk",
    "corpus_tfidf_topterms", "session_association_rules", "ivf_topk",
    "embedding_top_eigenvector", "doc_dup_span_removal",
    "doc_repetition_filter",
]


def heavy_tier() -> list[str]:
    """Queries >= 1.0 s in the latest quiet sf0.1 history line."""
    path = os.path.join(HERE, "BENCH_HISTORY.jsonl")
    best = None
    try:
        with open(path) as f:
            for line in f:
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                gate = d.get("quiet_gate") or {}
                if d.get("sf") == 0.1 and gate.get("satisfied"):
                    best = d
    except OSError:
        pass
    if not best:
        return list(FALLBACK_HEAVY)
    return [q for q, s in best["queries"].items() if s >= 1.0]


def main() -> int:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = os.environ.get("SPARK_GRAFT_SF_DIR_BASE", "/root/testdata/sf0.1")
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        from scripts.make_scaled_fixtures import build_scaled

        print(f"building 10x fixture {src} -> {dst}", file=sys.stderr)
        build_scaled(src, dst, 10)
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = dst
    env["SPARK_GRAFT_BENCH_REPS"] = "1"
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(heavy_tier())
    return subprocess.call(
        [sys.executable, os.path.join(HERE, "bench.py")], env=env
    )


if __name__ == "__main__":
    sys.exit(main())
