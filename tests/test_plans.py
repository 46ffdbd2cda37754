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


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_product_anywhere(spark, name):
    """No registry query may plan an unbroadcast cartesian product —
    the one join strategy that cannot survive a 100x scale-up."""
    fn, _ = REGISTRY[name]
    f = plan_facts(fn(spark, "/root/testdata/sf0.001"))
    assert not f.has_cartesian, name
