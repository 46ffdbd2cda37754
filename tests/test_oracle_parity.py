"""Every registry query with an oracle must match it exactly at sf0.001.

This is a stricter local version of the driver's t2 gate (which runs at
sf0.01): exact value equality instead of rounded hashes.
"""

import pytest

from amazonmsk_emr_tem_data_spark.queries import REGISTRY

from .oracle_utils import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


ORACLE_QUERIES = [name for name, (_, sql) in REGISTRY.items() if sql is not None]
ROWS_ONLY_QUERIES = [name for name, (_, sql) in REGISTRY.items() if sql is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, con, name):
    fn, sql = REGISTRY[name]
    compare(fn(spark, sf_dir), con, sql)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_driver_window_covers_round4_rotation():
    """The round driver hash-checks only the FIRST 50 registry entries.
    Round 4 rotated that window onto the 49 queries rounds 1-3 never
    checked (plus the tem_hourly_avg anchor); an accidental reorder —
    an alphabetized dict, an insert in the wrong half — would silently
    waste the round's correctness slots. Pin the window's composition,
    not its exact order."""
    from amazonmsk_emr_tem_data_spark.queries import REGISTRY

    window = list(REGISTRY)[:50]
    assert window[0] == "tem_hourly_avg"
    previously_checked = {
        "tem_horizontal_avg", "envelope_roundtrip", "q1_pricing_summary",
        "filter_project_scan", "revenue_by_segment", "nation_revenue",
        "topk_orders_per_priority", "running_total_per_customer",
        "rollup_lineitem_status", "cube_order_status",
        "customers_with_orders", "customers_without_orders",
        "set_ops_customers", "union_event_slices", "dedup_first_event",
        "case_bucket_quantity", "orders_by_month", "part_name_stats",
        "json_props_extract", "distinct_users_per_type", "top10_lineitems",
        "stream_tumbling_hourly", "stream_sliding_2h",
        "stream_distinct_users", "stream_session_windows",
        "stream_click_purchase_join", "stream_dedup_watermark",
        "stream_doc_quality", "sessionize_events", "doc_text_features",
        "doc_quality_langid", "doc_fingerprint_groups",
        "doc_rolling_fingerprint", "doc_exact_dedup", "ngram_jaccard_pairs",
        "minhash_lsh_pairs", "simhash_pairs", "embedding_cosine_topk",
        "embedding_knn_join", "embedding_near_dup_pairs", "lsh_ann_pairs",
        "ivf_topk", "multimodal_meta", "multimodal_decode",
        "multimodal_frames", "multimodal_near_dup", "bpe_vocab_merges",
        "asof_latest_order", "range_join_order_events",
    }
    overlap = set(window[1:]) & previously_checked
    assert not overlap, (
        f"round-4 window slots wasted on already-checked queries: {overlap}"
    )


@pytest.mark.parametrize(
    "name",
    [
        # float-aggregating queries: the micro-grid rule must make
        # results identical under any partitioning, not just lucky ones
        "doc_bm25_search",
        "doc_unigram_logprob",
        "semantic_dedup_vectors",
        "ivf_topk",
        "corpus_mixture_plan",
    ],
)
def test_partitioning_invariance(spark, sf_dir, name):
    """Same query, radically different shuffle/input partitioning →
    bit-identical rows. This is the determinism contract the DuckDB
    oracles rely on: float accumulation happens on integer grids, so
    partition order cannot leak into results."""
    from collections import Counter

    from amazonmsk_emr_tem_data_spark.queries import REGISTRY

    fn, _ = REGISTRY[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = Counter(tuple(r) for r in fn(spark, sf_dir).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "31")
        b = Counter(tuple(r) for r in fn(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
