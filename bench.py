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
from amazonmsk_emr_tem_data_spark.queries import (  # noqa: E402
    BENCH_HEADLINE,
    REGISTRY,
)

#: Headline list lives in the package (queries.BENCH_HEADLINE) since
#: r10 so query_cost_attribution's rows join 1:1 with this bench's
#: per-query seconds; per-round rationale comments for r1-r9 live in
#: git history of this file.
HEADLINE = list(BENCH_HEADLINE)


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _quiet_gate() -> dict:
    """Wait (bounded) for ambient load to drain before measuring —
    r11 VERDICT ask #8: BENCH_r11 started at loadavg 6-8 and every
    such run pays a drift-investigation tax. Gating happens ONCE at
    start: per-rep gating would trip on the bench's own executor load
    (loadavg_after legitimately reads 5-7 mid-run). Tunables:
    SPARK_GRAFT_QUIET_LOADAVG (1-min loadavg threshold, default 2.0;
    0 disables) and SPARK_GRAFT_QUIET_WAIT_MAX (seconds, default 300).
    The returned metadata is recorded in the payload either way, so a
    comparison can mechanically drop non-quiet runs. r14 (r13 VERDICT
    ask #5): default lowered 4.0 → 2.0 — both r13 driver runs gated
    "satisfied" at loadavg 3.7-3.9 on a host documented to drift up to
    1.8× under that much ambient load, so "gate satisfied" must mean
    actually quiet; a run that proceeds after the bounded wait records
    satisfied:false as the explicit waiver."""
    threshold = float(os.environ.get("SPARK_GRAFT_QUIET_LOADAVG", "2.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT_MAX", "300"))
    waited = 0.0
    load = os.getloadavg()[0]
    while threshold > 0 and load > threshold and waited < max_wait:
        time.sleep(15.0)
        waited += 15.0
        load = os.getloadavg()[0]
    return {
        "threshold": threshold,
        "waited_sec": round(waited, 1),
        "loadavg_at_measure": round(load, 2),
        "satisfied": bool(threshold <= 0 or load <= threshold),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Ambient-load context (r6 verdict: a 25% total swing on unchanged
    # plans traced to host load the artifact didn't record). Snapshot
    # loadavg before AND after so a cross-round comparison can tell
    # "regression" from "busy box"; compare per-query MEDIANS under
    # comparable load, never bare totals.
    load_before = os.getloadavg()
    quiet_gate = _quiet_gate()
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
    # Optional subset filter (r14, additions-only: the default run is
    # unchanged). SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run to
    # those headline queries — the sf1 heavy-tier lane
    # (scripts/bench_sf1_lane.py) uses it so the 10x fixture run
    # measures the parallel tier without paying 40 sub-second queries.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = {q.strip() for q in only_env.split(",") if q.strip()}
    total = 0.0
    spread: dict[str, float] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        if only and name not in only:
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

    # Key order is deliberate (r12 VERDICT ask #3): the driver keeps only
    # a TAIL of bench stdout, so context-only fields (spread, loadavg,
    # timestamps) come FIRST and every verdict-relevant number — value,
    # sf, quiet_gate, the per-query dict — comes LAST. A tail-truncated
    # capture then still carries the grading facts.
    payload = json.dumps(
        {
            "metric": "headline_queries_total",
            "unit": "sec",
            "reps": reps,
            "started_at": started_at,
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            "spread": spread,
            "value": round(total, 3),
            "sf": _sf_from_dir(sf_dir),
            "quiet_gate": quiet_gate,
            "queries": results,
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
