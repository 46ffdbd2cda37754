"""Compare two bench JSON artifacts per-query, the way cross-round
comparison is supposed to be done (BENCH totals are ambient-load-
sensitive; the r6 verdict burned a controlled re-run discovering a
"55% regression" that was load noise).

Usage:
    python scripts/bench_compare.py BENCH_r06.json BENCH_r07.json

Accepts either the driver's wrapper JSON ({"parsed": {...}}) or
bench.py's raw one-line JSON. Prints per-query ratios (new/old) for
the shared query set, the MEDIAN ratio (the headline number), queries
only in one side, and each run's recorded load context if present.
Exits 1 if the median ratio exceeds 1.5 — a real, spread-surviving
regression signal, not a total-seconds artifact.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver wrapper: {"parsed": {...}} — but when the driver's stdout
    # capture truncated (r7), parsed is null; the git-tracked
    # BENCH_HISTORY.jsonl line for that run is the durable copy
    out = d.get("parsed", d)
    if out is None or "queries" not in out:
        raise SystemExit(
            f"{path}: no parsed queries (driver tail truncated?) — "
            "pick the matching line from BENCH_HISTORY.jsonl instead"
        )
    return out


#: An arm measured above this 1-min loadavg is not a quiet baseline on
#: this host (documented ~1.8x drift under ambient load); matches the
#: r14 bench.py quiet-gate default.
QUIET_LOADAVG = 2.0


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--allow-dirty"]
    allow_dirty = "--allow-dirty" in sys.argv[1:]
    if len(args) != 2:
        print(__doc__)
        print("    --allow-dirty: compare non-quiet arms anyway")
        return 2
    old, new = load(args[0]), load(args[1])
    if not allow_dirty:
        # r14 (r13 VERDICT ask #5): refuse non-quiet arms by default —
        # the r13 driver runs gated "satisfied" at loadavg 3.7-3.9 and
        # their heavy tail read ~2x off the quiet numbers. An arm with
        # no recorded gate (pre-r12 artifact) only warns below.
        for label, d in (("old", old), ("new", new)):
            gate = d.get("quiet_gate")
            if gate is None:
                continue
            if not gate["satisfied"] or (
                gate["loadavg_at_measure"] > QUIET_LOADAVG
            ):
                print(
                    f"REFUSED: {label} arm measured at loadavg "
                    f"{gate['loadavg_at_measure']} (quiet means <= "
                    f"{QUIET_LOADAVG}); re-run it gated or pass "
                    "--allow-dirty to compare anyway"
                )
                return 2
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    if not shared:
        print("no shared queries")
        return 2
    import statistics

    ratios = []
    print(f"{'query':<34} {'old':>7} {'new':>7} {'ratio':>6}")
    for q in shared:
        # a 0.000 old timing (3-decimal rounding) carries no ratio
        # information: 0/0 is "unchanged", new>0 is excluded rather
        # than letting an inf poison the median
        if qo[q] == 0:
            r = 1.0 if qn[q] == 0 else None
        else:
            r = qn[q] / qo[q]
        if r is not None:
            ratios.append(r)
        flag = "  <-- check" if r is not None and r > 1.5 else ""
        shown = f"{r:>6.2f}" if r is not None else "   n/a"
        print(f"{q:<34} {qo[q]:>7.3f} {qn[q]:>7.3f} {shown}{flag}")
    med = statistics.median(ratios)
    print(f"\nshared: {len(shared)}  median ratio: {med:.2f}  "
          f"sum old: {sum(qo[q] for q in shared):.2f}s  "
          f"sum new: {sum(qn[q] for q in shared):.2f}s")
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"dropped: {', '.join(only_old)}")
    if only_new:
        print(f"added:   {', '.join(only_new)} "
              f"(+{sum(qn[q] for q in only_new):.2f}s)")
    for label, d in (("old", old), ("new", new)):
        if "loadavg_before" in d:
            print(f"{label} load before/after: {d['loadavg_before']} / "
                  f"{d.get('loadavg_after')}")
        gate = d.get("quiet_gate")
        if gate is not None:
            # r12: bench.py records its start-of-run quiet gate — a run
            # with satisfied=False (or no gate at all, pre-r12) is a
            # weaker baseline; say so instead of letting a noisy arm
            # masquerade as a regression signal
            print(
                f"{label} quiet gate: loadavg {gate['loadavg_at_measure']}"
                f" vs threshold {gate['threshold']}"
                f" (waited {gate['waited_sec']}s,"
                f" {'quiet' if gate['satisfied'] else 'NOT QUIET'})"
            )
    gates = [d.get("quiet_gate") for d in (old, new)]
    if any(g is not None and not g["satisfied"] for g in gates):
        print("WARNING: at least one arm measured on a NOT-QUIET host — "
              "treat the median ratio as advisory, re-run gated")
    return 1 if med > 1.5 else 0


if __name__ == "__main__":
    sys.exit(main())
