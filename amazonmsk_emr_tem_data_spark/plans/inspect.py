"""Physical-plan inspection: the engine's scale-discipline instrument.

The reference delegates all planning to Catalyst and never looks at a
plan (SURVEY.md §4). At 100 TB that is not enough: a plan that silently
loses predicate pushdown, broadcasts nothing, or degenerates into a
cartesian product is a cluster-killer long before it is a wrong answer.
This module extracts the facts that matter from ``explain("formatted")``
output so tests (tests/test_plans.py) can ASSERT the plan shape every
query relies on:

- **pushed filters / read schema** — predicates and pruned columns must
  reach the parquet scan;
- **join strategies** — small dims broadcast; no accidental
  BroadcastNestedLoop/Cartesian on large-large joins;
- **exchange count** — each extra shuffle is a full pass over the data
  at scale; the count is part of an operator's contract;
- **partial aggregation** — map-side combine before the shuffle;
- **codegen spans** — expressions should sit inside WholeStageCodegen.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (DataFrame.explain only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode  # noqa: SLF001
    )


@dataclass
class PlanFacts:
    """Facts extracted from one physical plan."""

    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    has_partial_agg: bool = False
    has_final_agg: bool = False
    n_codegen_spans: int = 0
    has_cartesian: bool = False
    raw: str = ""


_JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def plan_facts(df: DataFrame) -> PlanFacts:
    text = explain_str(df, "formatted")
    facts = PlanFacts(raw=text)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            facts.pushed_filters.append(m.group(1).strip())
    facts.read_schemas = re.findall(r"ReadSchema: (.+)", text)
    facts.joins = [m.group(1) for m in _JOIN_RE.finditer(text)]
    facts.n_exchanges = len(re.findall(r"\(\d+\) Exchange", text))
    facts.has_partial_agg = "partial_" in text or bool(
        re.search(r"HashAggregate.*\n.*Functions \[\d+\]: \[partial", text)
    )
    # formatted mode lists agg mode inline in Keys/Functions lines
    facts.has_partial_agg = facts.has_partial_agg or "partial" in text
    facts.has_final_agg = "HashAggregate" in text or "SortAggregate" in text
    facts.n_codegen_spans = len(set(re.findall(r"codegen id : (\d+)", text)))
    facts.has_cartesian = "CartesianProduct" in text
    return facts


def cost_facts(df: DataFrame) -> dict:
    """Cost-attribution facts for one query plan: the shuffle count,
    join-family mix, and Catalyst's estimated scan bytes (sum of the
    optimized plan's leaf-relation size estimates — the same statistic
    AQE and the broadcast-threshold planner consume, so it is exactly
    the number a capacity planner should attribute I/O by).

    Driver-side plan introspection only — nothing here touches data;
    the py4j calls walk the already-analyzed logical plan."""
    jplan = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001
    leaves = jplan.collectLeaves()
    est_scan_bytes = 0
    n_unknown = 0
    for i in range(leaves.size()):
        # py4j maps scala BigInt to int for small values, to a Java
        # object otherwise — normalize through str(). Catalyst reports
        # "unknown" as defaultSizeInBytes (~Long.MaxValue); summing
        # those would overflow AND lie — count them separately.
        sz = int(str(leaves.apply(i).stats().sizeInBytes()))
        if sz >= 1 << 62:
            n_unknown += 1
        else:
            est_scan_bytes += sz
    f = plan_facts(df)
    return {
        "n_exchanges": f.n_exchanges,
        "n_joins": len(f.joins),
        "n_broadcast_joins": sum(
            1 for j in f.joins if j == "BroadcastHashJoin"
        ),
        "n_shuffle_joins": sum(
            1
            for j in f.joins
            if j in ("SortMergeJoin", "ShuffledHashJoin")
        ),
        "n_nested_loop_joins": sum(
            1 for j in f.joins if j == "BroadcastNestedLoopJoin"
        ),
        "has_cartesian": f.has_cartesian,
        "n_scans": leaves.size(),
        "est_scan_bytes": est_scan_bytes,
        "n_unknown_size_scans": n_unknown,
        "n_codegen_spans": f.n_codegen_spans,
        "n_pushed_scans": len(f.pushed_filters),
    }


def registry_plan_report(
    spark, sf_dir: str, tolerate_errors: bool = False
) -> dict[str, "PlanFacts | Exception"]:
    """Plan facts for every registry query (used by tests, by
    scripts/plan_report.py for PLANS.md, and for eyeballing `.explain`
    output en masse while tuning). With ``tolerate_errors`` a query
    whose plan construction raises maps to the exception instead of
    aborting the sweep — the single registry-walk implementation both
    consumers share."""
    from ..queries import REGISTRY

    out: dict[str, PlanFacts | Exception] = {}
    for name, (fn, _) in REGISTRY.items():
        try:
            out[name] = plan_facts(fn(spark, sf_dir))
        except Exception as e:
            if not tolerate_errors:
                raise
            out[name] = e
    return out
