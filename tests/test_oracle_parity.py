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
    """Every registry query has a DuckDB oracle, with ONE documented
    exception: query_cost_attribution reads Spark PHYSICAL-PLAN
    metadata (exchange counts, scan stats from .explain) — there is no
    DuckDB twin for another engine's plan, by construction. It gets
    the driver's weaker rows-only check plus the strict local pins in
    test_plans.py (its rows must agree with independently-parsed plan
    facts). Any OTHER None-oracle entry is a regression."""
    assert ROWS_ONLY_QUERIES == ["query_cost_attribution"], (
        f"unexpected oracle-less queries: {ROWS_ONLY_QUERIES} — "
        "attach a DuckDB twin or document why one cannot exist"
    )


def test_driver_window_rotation_invariant():
    """The round driver hash-stamps exactly ``list(REGISTRY)[:50]``.
    Since r11 the window derives itself from the committed
    CORRECTNESS_r*.json artifacts (r10 VERDICT ask #1: a standing
    invariant, not a hand-queue per round). This test pins the policy:

    - flagship anchor at position 0, explicit restamp tier next;
    - NO WASTED SLOT: every fill entry's latest stamp <= every
      below-window entry's latest stamp (fresh-evidence queries can
      never burn slots while staler ones wait);
    - never-stamped queries (stamp 0) always enter the window;
    - a staleness RATCHET: with W=50 slots and R registry entries a
      full refresh needs ceil(R/(W-1)) rounds, so the prospective
      worst stamp age (as of the round about to run) must stay within
      that quotient plus 1 round of restamp/new-query slack. If
      rotation ever stops, ages grow one per round and this fails.
    """
    import math

    from amazonmsk_emr_tem_data_spark.queries import (
        _RESTAMP,
        _latest_stamps,
        REGISTRY,
    )

    stamps = _latest_stamps()
    assert stamps, "committed CORRECTNESS_r*.json artifacts not found"
    order = list(REGISTRY)
    window, below = order[:50], order[50:]
    assert window[0] == "tem_hourly_avg"
    restamp = [
        n for n in _RESTAMP if n in REGISTRY and n != "tem_hourly_avg"
    ]
    assert window[1 : 1 + len(restamp)] == restamp
    assert len(_RESTAMP) <= 8, (
        "restamp tier is eating the window — it is for queries whose "
        "code changed since their stamp, not a general fresh list"
    )
    head = {window[0], *restamp}
    fill_max = max(stamps.get(n, 0) for n in window if n not in head)
    below_min = min(stamps.get(n, 0) for n in below)
    assert fill_max <= below_min, (
        f"window slot wasted: a fill entry carries stamp r{fill_max} "
        f"while an r{below_min}-stamped query sits below the window"
    )
    never = [n for n in order if stamps.get(n, 0) == 0]
    assert set(never) <= set(window) or len(never) > 50 - len(head), (
        f"never-stamped queries outside the window: "
        f"{sorted(set(never) - set(window))}"
    )
    current_round = max(stamps.values()) + 1
    cap = math.ceil(len(order) / 49) + 1
    prospective_worst = current_round - min(
        stamps.get(n, 0) for n in below
    )
    assert prospective_worst <= cap, (
        f"stamp-rotation stalled: oldest below-window stamp is "
        f"{prospective_worst} rounds old entering r{current_round}; "
        f"bound is ceil({len(order)}/49)+1 = {cap}"
    )


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
        # r7: integer ppm ratios (diversity, TVD drift), the 1e-9-grid
        # centroids + NULLS FIRST ranks, mergeable CMS bucket sums,
        # and the directed prefix-filter candidates must all be
        # partition-blind
        "corpus_ngram_diversity",
        "corpus_source_drift",
        "event_value_drift",
        "token_heavy_hitters_cms",
        "embedding_label_outliers",
        "containment_dup_pairs",
        "gopher_quality_filter",
        "doc_winnowing_fingerprints",
        # r7 session-6: bottom-k rank windows over unique md5 hashes
        # (KMV), long-sum delta re-aggregation (IVM), min-hop frontier
        # unions (BFS), integer-moment z-scores, and floor-div RAKE
        # micro-scores with a total top-50 tiebreak must all be
        # partition-blind
        "activity_overlap_kmv",
        "order_lineitem_ivm",
        "part_bfs_hops",
        "event_seasonal_anomaly",
        "rake_keyword_phrases",
        # r7 session-6b: integer min-plus relaxation, synchronous
        # vote-count argmax with total tie-breaks, hash argmax
        # resharding, micro-nat KL sums, and the micro-grid
        # exponential-race bottom-k must all be partition-blind
        "nation_min_latency_paths",
        "part_label_communities",
        "doc_shard_rebalance",
        "source_token_kl",
        "doc_weighted_sample",
        # r7 session-6c: 1e-9-grid centroid sums + fold-dot argmins,
        # per-bucket XOR digests, a total-order metadata cumsum, and
        # integer FIR lags over the dense grid must all be
        # partition-blind
        "kmeans_lloyd_clusters",
        "table_checksum_buckets",
        "shard_compaction_plan",
        "event_ewma_chart",
        # r7 session-6d: micro-nat KM log-survival sums, bitwise
        # OR/popcount set algebra, and cent-grid cumulative LTV must
        # all be partition-blind
        "customer_survival_km",
        "user_activity_bitmaps",
        "cohort_ltv_curves",
        # r7 session-6e: floor-bucket class counts, the integer clamp
        # identity over a total event order, the 2*cumw >= totw rank
        # threshold, and dense_rank ties must all be partition-blind
        "customer_k_anonymity",
        "part_stock_balance",
        "lineitem_weighted_median",
        "topk_orders_with_ties",
        # r7 session-6f: two-phase offset chains, sketch set
        # difference, and moment-derived t statistics must all be
        # partition-blind
        "doc_global_sequence",
        "activity_anotb_kmv",
        "welch_t_event_types",
        # r7 session-6g: integer PageRank mass over the word graph,
        # lag-window pair flags, and the two-phase descending revenue
        # cumsum must all be partition-blind
        "textrank_keywords",
        "orders_double_billing",
        "part_abc_classes",
        # r7 session-6h: hash-derived candidate draws and integer
        # margin buckets must be partition-blind
        "customer_negative_parts",
        "langid_margin_calibration",
        # r7 session-6i: seed-conditional integer PPR mass, the
        # two-phase median locator, and micro-grid Neyman weights with
        # largest-remainder ranks must all be partition-blind
        "ppr_part_recommendations",
        "event_value_imputation",
        "neyman_allocation_sample",
        "event_value_winsorize",
        # r7 session-6j: exact microsecond gaps over a per-user total
        # order and integer ppm shares over cent sums
        "inter_event_gaps",
        "region_nation_share",
        # r10: exact long inputs + the fixed four-op IEEE tail
        # (e/m, d/2m, square, subtract) must be partition-blind
        "copurchase_modularity",
        # r10 session-1: bit-parity fold cosines under broadcast +
        # window ranks (mining, descent rounds), the integer Gram /
        # bigint power iteration, and length-diff artifact counts
        # must all be partition-blind
        "embedding_hard_negatives",
        "nn_descent_knn_graph",
        "embedding_top_eigenvector",
        "doc_mojibake_audit",
        # r10 session-2: the Arrow d2 snap + struct-min medoid and the
        # integer spectral residuals must be partition-blind
        "kmeans_cluster_medoids",
        "embedding_spectral_outliers",
        # r10 session-3: micro-nat entropy terms, trunc-div centroid
        # means, and the first-occurrence running sum must be
        # partition-blind
        "customer_l_diversity",
        "embedding_label_centroid_drift",
        "running_distinct_users",
        # r10 session-4: gap-bounded lead triples with total tie-break
        # ranks, and the double curation chain + full-outer membership
        # join must be partition-blind
        "session_event_trigrams",
        "incremental_curation_delta",
        # r10 session-5: per-source frontier unions + integer micro
        # reciprocals must be partition-blind
        "part_harmonic_centrality",
        # r11: the KMV register evolution (distinct + bottom-k per
        # node on the shared md5 grid) and the integer Bar-Yossef
        # estimator must be partition-blind
        "copurchase_hyperball",
        # r11: the full-outer pair-key join of the two verified dup
        # relations + boolean-count aggs must be partition-blind
        "dedup_signal_agreement",
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
