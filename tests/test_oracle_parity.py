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


def test_every_query_has_an_oracle():
    """As of round 6 EVERY registry query has a DuckDB oracle — the
    last rows-only entry (approx_sketches) was restructured to emit
    exact stats + tolerance booleans its twin can recompute. Pin that:
    a new None-oracle entry needs the weaker rows-only check restored
    (and a documented reason it cannot be SQL-expressed)."""
    assert ROWS_ONLY_QUERIES == [], (
        f"queries without oracles appeared: {ROWS_ONLY_QUERIES} — "
        "restore a rows-only check for them or attach a twin"
    )


def test_driver_window_covers_round6_rotation():
    """The round driver hash-checks only the FIRST 50 registry entries.
    The round-6 window must contain every query whose driver evidence
    is missing, stale, or invalidated: the 5 queries whose semantics /
    oracle / implementation changed this round, the 3 entries the r5
    window overflow silently dropped (the marked r5 section held 53
    names, so positions 51-53 were never stamped — r5 ADVICE), and the
    15 queries whose newest stamp is round 3. An accidental reorder —
    an alphabetized dict, an insert in the wrong half — would silently
    waste the round's correctness slots."""
    from amazonmsk_emr_tem_data_spark.queries import REGISTRY

    window = set(list(REGISTRY)[:50])
    assert list(REGISTRY)[0] == "tem_hourly_avg"
    must_check = {
        # semantics/oracle/implementation changed in round 6
        "customers_without_orders",   # anti-join re-based (was 0-row vacuous)
        "approx_sketches",            # oracle attached (was rows-only)
        "corpus_curation_pipeline",   # new composed pipeline
        "corpus_tfidf_topterms",      # engine-exact idf rework
        "doc_bm25_search",            # engine-exact idf rework
        # new in round-6 session 2 — zero driver evidence yet, so they
        # outrank r4-green refresh fill for window slots
        "page_rank_pages", "doc_near_dedup_keep_best",
        "doc_bigram_lm_quality", "semantic_decontamination",
        "corpus_mixture_resample", "embedding_pq_adc_topk",
        "doc_quality_sort_shards", "embedding_ivfpq_topk",
        "page_graph_clustering", "user_type_scd2",
        "stratified_fixed_k_sample", "data_quality_audit",
        "events_table_profile", "tem_gap_fill_hourly",
        "event_value_outliers_mad",
        # new in round-6 session 3 — zero driver evidence yet
        "stream_static_segment_spend", "zorder_layout_stats",
        "dsir_importance_select", "embedding_pq_rerank_topk",
        "doc_dup_span_removal", "orders_incremental_agg",
        "key_skew_report", "hybrid_rrf_search",
        # dropped by the r5 53-name window overflow — never stamped
        "stream_distinct_users", "stream_dedup_watermark",
        "stream_doc_quality",
        # newest driver stamp is round 3 (three-rounds-stale evidence)
        "doc_text_features", "doc_quality_langid",
        "doc_fingerprint_groups", "doc_rolling_fingerprint",
        "doc_exact_dedup", "ngram_jaccard_pairs", "minhash_lsh_pairs",
        "simhash_pairs", "embedding_cosine_topk", "embedding_knn_join",
        "embedding_near_dup_pairs", "lsh_ann_pairs", "multimodal_meta",
        "asof_latest_order", "sessionize_events",
    }
    missing = must_check - window
    assert not missing, (
        f"round-6 window is missing stale/never-checked queries: {missing}"
    )
    # The r5 failure mode: the marked window section held 53 names, so
    # its last 3 were never stamped. Pin the window to EXACTLY the
    # first 50 by anchoring the entry that must sit at position 51.
    assert list(REGISTRY)[50] == "salted_customer_revenue", (
        "registry position 51 drifted — the driver stamps exactly "
        "list(REGISTRY)[:50]; an insert above this line silently pushes "
        "window entries below the checked range"
    )
    # r4-green queries must NOT burn window slots (their driver evidence
    # is current); stale-r3 and changed-query fills are what the
    # window is FOR.
    r5_green_outside = {
        "stratified_sample_docs", "doc_dup_span_frac",
        "doc_decontamination", "doc_sequence_packing",
        "props_variant_extract", "range_join_order_events",
        "doc_corpus_split", "doc_shuffle_shards", "corpus_mixture_plan",
        "doc_quality_selection", "doc_bpe_segmentation",
        "event_value_outliers", "events_upsert_latest", "ivf_topk",
        "bpe_vocab_merges", "multimodal_decode", "multimodal_frames",
        "multimodal_near_dup", "doc_leakage_safe_split",
        "corpus_length_histogram", "tem_horizontal_avg",
        "envelope_roundtrip", "q1_pricing_summary",
    }
    wasted = window & r5_green_outside
    assert not wasted, f"window slots wasted on r5-green queries: {wasted}"


def test_no_vacuous_queries(spark, sf_dir):
    """Every registry query must match >= 1 row at sf0.001 — NO
    exemptions. A 0-row result makes any oracle comparison vacuously
    green (round 4 shipped THREE queries whose fixed date predicates
    could never match the fixtures, and customers_without_orders rode
    a false 'non-empty at sf0.01' exemption comment through FIVE
    rounds of 0-row greens before its r6 re-base). Catches dead
    predicates (out-of-range date literals, impossible filters,
    disjoint join epochs) that a value-equality oracle cannot — both
    engines agree perfectly on an empty result."""
    empty = []
    for name, (fn, _) in REGISTRY.items():
        if fn(spark, sf_dir).limit(1).count() == 0:
            empty.append(name)
    assert not empty, (
        f"queries returning 0 rows at {sf_dir} — oracle checks on these "
        f"are vacuous: {empty}"
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
        "corpus_tfidf_topterms",
        "corpus_length_histogram",
        # the composed pipeline: per-row float quality + six chained
        # stages of windows/joins must stay deterministic under any
        # partitioning for its oracle to be meaningful
        "corpus_curation_pipeline",
        # r6 oracle-checkable sketch verdicts: the rank-bracket
        # booleans must not depend on partition order
        "approx_sketches",
        # r6 session-2: integer micro-unit PageRank mass, micro-nat
        # bigram log-prob sums, and order-independent max/count
        # decontamination verdicts must all survive repartitioning
        "page_rank_pages",
        "doc_bigram_lm_quality",
        "semantic_decontamination",
        # PQ: sample fit (total-ordered), encode argmins, and the ADC
        # fold must be partition-count-blind end to end
        "embedding_pq_adc_topk",
        # integer value-histogram shard map + within-shard ranks
        "doc_quality_sort_shards",
        # the full double-quantizer composition
        "embedding_ivfpq_topk",
        # r6 session-3: integer λ_micro sums (DSIR), pure-integer
        # Morton shard stats, integer RRF reciprocals, cent-grid
        # partial-merge, and floor-div skew shares must all be
        # partition-blind
        "dsir_importance_select",
        "zorder_layout_stats",
        "hybrid_rrf_search",
        "orders_incremental_agg",
        "key_skew_report",
        # r6 session-4: integer-rational jaccard/lift divisions and
        # df-ordered rank windows must not see partition order
        "prefix_filter_jaccard_pairs",
        "token_cooccurrence_lift",
        # the lead() sequence must be identical under any partitioning
        # (total order (ts, event_id) per user)
        "event_markov_transitions",
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
