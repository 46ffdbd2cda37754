"""Plan-shape assertions: the 100 TB scale contract, executable.

Each test pins a physical-plan property an operator's scale story
depends on. If a refactor silently drops predicate pushdown, spills a
broadcast into a shuffle, or introduces a cartesian product, these fail
before any benchmark does.
"""

import pytest

from amazonmsk_emr_tem_data_spark.plans.inspect import plan_facts
from amazonmsk_emr_tem_data_spark.queries import REGISTRY


def facts(spark, sf_dir, name):
    return plan_facts(REGISTRY[name][0](spark, sf_dir))


def test_filter_project_scan_pushdown(spark, sf_dir):
    f = facts(spark, sf_dir, "filter_project_scan")
    assert f.pushed_filters, "predicates must reach the parquet scan"
    assert f.n_exchanges == 0, "scan->filter->project must be shuffle-free"
    assert not f.joins


def test_q1_partial_aggregation(spark, sf_dir):
    f = facts(spark, sf_dir, "q1_pricing_summary")
    assert f.has_partial_agg, "map-side combine before the shuffle"
    assert f.n_exchanges == 1, "one shuffle on the grouping key"


def test_nation_revenue_broadcasts_dims(spark, sf_dir):
    f = facts(spark, sf_dir, "nation_revenue")
    assert f.joins, "expected joins in the plan"
    assert set(f.joins) == {"BroadcastHashJoin"}, (
        "all dims (nation/customer/supplier/orders-after-filter) must "
        f"broadcast, got {f.joins}"
    )
    assert f.pushed_filters, "date predicate must reach the orders scan"


def test_asof_join_single_shuffle(spark, sf_dir):
    f = facts(spark, sf_dir, "asof_latest_order")
    assert f.n_exchanges == 1, "union-merge as-of = exactly one key shuffle"
    assert not f.joins, "as-of must not plan an inequality join"


def test_knn_broadcasts_query_side(spark, sf_dir):
    f = facts(spark, sf_dir, "embedding_knn_join")
    assert all(j.startswith("Broadcast") for j in f.joins), (
        f"corpus must never shuffle for the knn join, got {f.joins}"
    )
    assert not f.has_cartesian


def test_returned_item_revenue_pushes_dates_broadcasts_nation(spark, sf_dir):
    f = facts(spark, sf_dir, "returned_item_revenue")
    assert f.pushed_filters, "quarter + returnflag predicates must reach scans"
    assert "BroadcastHashJoin" in f.joins, "nation must broadcast"
    assert not f.has_cartesian


def test_cheapest_supplier_rollup_before_window(spark, sf_dir):
    # Q2 shape: the window min must run over the (part, supplier)
    # rollup — ONE pre-window shuffle for the rollup, one for the
    # window partitioning, never a window over raw lineitem.
    f = facts(spark, sf_dir, "cheapest_supplier_per_part")
    assert f.has_partial_agg, "rollup must partial-aggregate map-side"
    assert "BroadcastHashJoin" in f.joins, "part filter + supplier broadcast"


def test_dup_span_frac_shuffles_hashes_not_text(spark, sf_dir):
    # the exploded span column must be hashed scan-side: no plan node
    # may carry the raw span string through an exchange
    fn, _ = REGISTRY["doc_dup_span_frac"]
    plan = (
        fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", plan):
        assert "span" not in m.group(1), "shuffle key must be the 64-bit hash"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_product_anywhere(spark, name):
    """No registry query may plan an unbroadcast cartesian product —
    the one join strategy that cannot survive a 100x scale-up."""
    fn, _ = REGISTRY[name]
    f = plan_facts(fn(spark, "/root/testdata/sf0.001"))
    assert not f.has_cartesian, name
