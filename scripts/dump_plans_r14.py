"""Dump `.explain("formatted")` for headline queries to plans/r14/.

Usage: python scripts/dump_plans_r14.py <suffix> [--only a,b,c]
  suffix: "before" or "after" -> plans/r14/<query>_<suffix>.txt

Plans are built at sf0.001 like PLANS.md (plan SHAPE is scale-
independent; model-fitting operators run their bounded driver-side fit
during construction).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonmsk_emr_tem_data_spark.plans.inspect import explain_str  # noqa: E402
from amazonmsk_emr_tem_data_spark.queries import (  # noqa: E402
    BENCH_HEADLINE,
    REGISTRY,
)
from amazonmsk_emr_tem_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans-r14")
    for name in BENCH_HEADLINE:
        if name not in REGISTRY or (only is not None and name not in only):
            continue
        fn, _ = REGISTRY[name]
        try:
            txt = explain_str(fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - capture tool
            txt = f"ERROR building plan: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt + "\n")
        print(name, flush=True)


if __name__ == "__main__":
    main()
