"""Edge-case corpus parity: every documents-table oracle query must
match DuckDB on a planted pathological corpus — empty text, whitespace
only, single token, unicode, punctuation-only, huge repetition — the
shapes a real web crawl contains and the synthetic fixture omits.

Divergences here are real bugs (NULL-vs-NaN division semantics, empty
token lists, shingle windows longer than the doc), caught before 100 TB
of crawl data does.
"""

import os

import duckdb
import pytest

from amazonmsk_emr_tem_data_spark.queries import REGISTRY

from .oracle_utils import compare

EDGE_DOCS = [
    (0, "", "en", "edge", 0),
    (1, "   ", "en", "edge", 3),
    (2, "word", "en", "edge", 4),
    (3, "two words", "de", "edge", 9),
    (4, "the the the the the the the the", "en", "edge", 31),
    (5, "Ünïcödé tëxt with аccénts und ß", "de", "edge", 31),
    (6, "!!! ... ??? ;;; :::", "fr", "edge", 19),
    (7, "UPPER CASE SHOUTING TEXT ONLY", "en", "edge", 29),
    (8, "a b c d e f g h i j k l m n o p", "es", "edge", 31),
    (9, "the quick brown fox jumps over the lazy dog", "en", "edge", 43),
    (10, "the quick brown fox jumps over the lazy dog", "en", "edge", 43),
    (11, "mail x@y.io or 555-123-4567 from 10.0.0.1", "en", "edge", 41),
]

#: documents-table registry queries with an oracle (name list kept
#: explicit so a new doc query must OPT IN after checking its edge
#: behavior).
DOC_QUERIES = [
    "doc_text_features",
    "doc_quality_langid",
    "doc_fingerprint_groups",
    "doc_rolling_fingerprint",
    "doc_exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "doc_repetition_filter",
    "stratified_sample_docs",
    "doc_dup_span_frac",
    "doc_unigram_logprob",
    "corpus_vocab_stats",
    "doc_pii_redaction",
    "doc_word_positions",
    "doc_regex_extract",
    "doc_decontamination",
    "doc_sequence_packing",
    "doc_chunking",
    # round-4 curation ops: hash split/shard are text-independent
    # (id-hashed); mixture + selection exercise token counting and the
    # quality formula on empty/unicode text
    "doc_corpus_split",
    "doc_shuffle_shards",
    "corpus_mixture_plan",
    "doc_quality_selection",
    # BPE train + segment: unicode chars, empty words, punctuation
    # symbols all flow through the merge folds of both engines
    "bpe_vocab_merges",
    "doc_bpe_segmentation",
    # BM25: query terms absent/present on empty + unicode docs
    "doc_bm25_search",
    # inverted index: empty/whitespace docs contribute no postings;
    # unicode terms; padded posting order == numeric doc order
    "corpus_inverted_index",
    # confusion matrix over the mixed-label edge corpus (empty and
    # punctuation-only docs score 0 on every language -> the en
    # tie-break fires identically in both engines)
    "langid_confusion_matrix",
    # r6 session-2: bigram LM (docs shorter than 2 tokens drop from
    # the output in BOTH engines), mixture resampling (token counting
    # + integer rates on empty/unicode text), keep-best dedup (quality
    # formula + LSH + CC over planted exact dups and empty docs)
    "doc_bigram_lm_quality",
    "corpus_mixture_resample",
    "doc_near_dedup_keep_best",
    # exact-k per stratum: strata smaller than k must emit all members
    "stratified_fixed_k_sample",
    # round-5 additions: tf-idf on empty/unicode vocabularies; the
    # fingerprint-hash split on identical texts (the leakage case the
    # operator exists for); bin()-bucket histogram on empty text
    "corpus_tfidf_topterms",
    "doc_leakage_safe_split",
    "corpus_length_histogram",
    # r6 session-3: span-removal interval union over empty/short/
    # identical docs (9+10 are exact copies ⇒ 100% coverage; <8-token
    # docs collapse to one whole-text span); DSIR weights where the
    # target slice and several buckets are near-empty (add-one
    # smoothing keeps every ln argument positive in both engines)
    "doc_dup_span_removal",
    "dsir_importance_select",
    # r6 session-4: prefix filtering over <3-token docs (whole-text
    # shingle, prefix length 1) and exact copies (9+10 collapse to one
    # rep, jaccard 1.0); co-occurrence cap where docs have far fewer
    # than 24 distinct tokens and "" tokenizes from empty text
    "prefix_filter_jaccard_pairs",
    "token_cooccurrence_lift",
    # per-lang fertility: empty/punct-only docs still contribute one
    # whitespace token and zero-length words contribute zero pieces
    "tokenizer_fertility_by_lang",
    # r7: cross-corpus best-match filter — empty docs on BOTH sides of
    # the parity split collapse to whole-text shingles; identical
    # empties across the split must match at jaccard 1.0 with the
    # min-corpus-id tie-break
    "cross_corpus_near_dup",
    # r7: winnowing — docs shorter than k tokens collapse to one
    # whole-text fingerprint; shorter than w shingles to one window
    "doc_winnowing_fingerprints",
    # r7: diversity ppm on empty/short docs (whole-text gram fallback)
    "corpus_ngram_diversity",
    # r7: Gopher rules on empty/short docs (mean_word_len 0, stopword 0)
    "gopher_quality_filter",
    # r7: drift ppm when a source holds only degenerate docs
    "corpus_source_drift",
    # r7: CMS sketch over the edge vocabulary (incl. the '' token)
    "token_heavy_hitters_cms",
    # r7: directed containment — empty/whitespace docs collapse to one
    # shingle, identical docs contain each other both ways
    "containment_dup_pairs",
    # r7: snapshot diff — the query's own % 11 branch plants
    # whitespace-only edits (normalization ⇒ 'unchanged') and the
    # presence markers keep NULL-text docs correctly classified
    "corpus_snapshot_diff",
    # r7: winnowing pair matcher — degenerate docs collapse to one
    # fingerprint (min_shared=2 excludes them unless identical)
    "winnowing_match_pairs",
    # r7: edit-distance verify — empty and whitespace-only docs
    # normalize to the SAME block ("" prefix, lev 0 ⇒ a pair), <8-token
    # docs block on their whole prefix, 9+10 are an identity pair
    "fuzzy_dup_verify_pairs",
    # r7: Zipf head buckets over a tiny vocabulary (every rank in the
    # head; bit-length bucketing on ranks 1..n)
    "token_zipf_profile",
    # r7 session-6: RAKE — doc 4 is ALL stopwords (zero phrases), doc 8
    # opens with the 'a' delimiter, empty/whitespace docs contribute
    # nothing, identical docs 9+10 double a phrase's occurrence count
    "rake_keyword_phrases",
    # r7 session-6b: rendezvous scores are text-independent (argmax
    # over 17 hashes of each doc_id); single-source KL must be EXACTLY
    # 0 for every source==corpus token (here the whole corpus is one
    # source, so ln_src == ln_cor term-by-term); weighted sampling
    # with k larger than the corpus returns ALL docs in key order,
    # n_chars=0 clamping to weight 1
    "doc_shard_rebalance",
    "source_token_kl",
    "doc_weighted_sample",
    # r7 session-6c: doc 0 is absent from BOTH snapshots (%20 and %19
    # hit together) yet its bucket rows must still reconcile; the
    # %7/%11 edits land on docs 7 and 11; compaction packs 12 tiny
    # files into one bin (degenerate-but-exact single-bin plan)
    # NB kmeans_lloyd_clusters is NOT here: its fixed dim=64 grid
    # reads past the 4-dim edge vectors (same exclusion as
    # embedding_label_outliers)
    "table_checksum_buckets",
    "shard_compaction_plan",
    # r7 session-6f: 12 docs in one source — every bucket holds a
    # handful of rows, offsets must still chain to the exact global
    # row_number
    "doc_global_sequence",
    # r7 session-6g: TextRank on a degenerate word graph — doc 4's
    # all-'the' text yields only excluded self-pairs, single-word docs
    # are DANGLING nodes (rank arrives only via redistribution), and
    # unicode tokens order identically under both engines' binary
    # collation in the tie-break
    "textrank_keywords",
    # r7 session-6h: margin buckets where most scores tie at 0 (the
    # 0-margin bucket carries the en tie-break) and the 5+ cap
    "langid_margin_calibration",
    # r7 session-6i: one source holds the whole budget, capped at its
    # 12 members (n_alloc = min path); variance from 12 tiny docs
    "neyman_allocation_sample",
    # r8: gibberish heuristics on empty / punctuation-only / unicode
    # docs (0-letter guards; non-ASCII letters count as symbols in
    # BOTH engines' [a-z] classes); burstiness where doc 4's 8x'the'
    # is the bursty extreme and VMR's zero-count docs dominate N
    "doc_gibberish_filter",
    "token_burstiness",
    # r8: quantile normalization on ONE source (identity mapping —
    # p = r exactly) with tied scores broken by doc_id
    "quantile_normalize_quality",
    # r8: dup-rate where docs 9+10 are exact copies (one group of 2)
    # and everything else is distinct
    "doc_dedup_rate_by_source",
    # r9: the degree histogram over this corpus (9+10 the only pair;
    # empty/whitespace docs are degree-0 mass), the per-bit bias
    # monitor (tiny shingle population stresses the majority votes),
    # and the stage funnel (eval slice %97 is EMPTY here, so the
    # eval_withheld stage must retain 100%)
    "dedup_graph_degree_histogram",
    "simhash_bit_bias",
    "curation_funnel_report",
    # r9: audio pseudo-decode byte twin on empty/unicode payloads
    "multimodal_audio",
    # r9: per-source contamination where the eval slice (%97) is
    # EMPTY -> zero contamination in every source
    "decontamination_rate_by_source",
    # r9: packing budget over 12 tiny docs (every shard's lone
    # sequence is mostly padding -> waste ppm near 10^6)
    "packing_efficiency_report",
    # r10: per-source token volume where empty/whitespace docs still
    # count one whitespace token (split('') = ['']) and contribute 0
    # BPE pieces — both engines' conventions, and the zero-guarded
    # milli-ratios exercise the bpe_tokens = 0 branch
    "tokenizer_throughput_by_source",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_corpus"))
    df = spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_edge_corpus_parity(spark, edge_dir, edge_con, name):
    fn, sql = REGISTRY[name]
    assert sql is not None
    compare(fn(spark, edge_dir), edge_con, sql)


def test_simhash_bit_bias_empty_corpus(spark, tmp_path):
    """Empty corpus (r9 ADVICE): Spark's global agg emits one row
    (n_docs=0, NULL sums) which stack() would fan to 60 NULL rows,
    while the DuckDB twin's GROUP BY emits zero — both engines must
    agree on ZERO rows when there are no documents."""
    d = str(tmp_path)
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    fn, sql = REGISTRY["simhash_bit_bias"]
    assert fn(spark, d).count() == 0
    compare(fn(spark, d), con, sql)
    con.close()


EDGE_VECS = [
    (0, [0.0, 0.0, 0.0, 0.0], "zero"),        # zero vector: cosine NULL
    (1, [1e-7, -1e-7, 1e-7, -1e-7], "tiny"),
    (2, [1.0, 2.0, -3.0, 0.5], "normal"),
    (3, [-1.0, -2.0, 3.0, -0.5], "negated"),   # cosine -1 vs vec 2
    (4, [1.0, 2.0, -3.0, 0.5], "dup"),         # exact dup of vec 2
    (5, [127.0, 0.0, 0.0, 0.0], "axis"),
]

EMB_QUERIES = [
    "embedding_stats",
    "embedding_cosine_topk",
    "embedding_knn_join",
    "embedding_near_dup_pairs",
    "embedding_int8_quantize",
    # r6 session-2: eval slice (vec_id % 50 == 0) is EMPTY on this
    # fixture — every corpus row must come back clean, not crash
    "semantic_decontamination",
    # r7: truncation slice longer than the 4-dim edge vectors (slice
    # past the end == whole array in both engines), zero-vector query
    # -> all-NULL ordering resolved by the vec_id tie-break
    "matryoshka_recall_audit",
    # r8: MMR where query 0 is the zero vector (all-NULL relevance —
    # DESC NULLS LAST pinned on BOTH engines, selection falls to the
    # vec_id tie-break) and vec 4 duplicates vec 2 (sim 1.0 ⇒ maximal
    # redundancy penalty: MMR must NOT pick the dup right after 2)
    "mmr_diverse_topk",
    # r9: per-dimension profile over 4-dim edge vectors (zero vector
    # drags min to 0; duplicated vec 4 doubles its component mass)
    "embedding_dimension_profile",
]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_emb"))
    df = spark.createDataFrame(
        EDGE_VECS, "vec_id long, embedding array<double>, label string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


@pytest.fixture(scope="module")
def edge_emb_con(edge_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{edge_emb_dir}/embeddings.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_edge_embeddings_parity(spark, edge_emb_dir, edge_emb_con, name):
    """Zero vectors, exact duplicates, sign-flipped pairs: the cosine
    stack must NULL out (never throw) on the zero vector and agree with
    DuckDB on everything else."""
    fn, sql = REGISTRY[name]
    assert sql is not None
    compare(fn(spark, edge_emb_dir), edge_emb_con, sql)


# --- events + orders: timestamp ties, boundaries, malformed JSON ---

EDGE_EVENTS = [
    # exact (user, type, ts) triplicate with different ids — dedup must
    # tie-break deterministically on event_id
    (1, "2024-01-01 10:00:00", 1, "click", 1.0, '{"k": "v"}'),
    (2, "2024-01-01 10:00:00", 1, "click", 2.0, "{}"),
    (3, "2024-01-01 10:00:00", 1, "click", 3.0, "not json"),
    # hour-boundary events (tumbling window edges)
    (4, "2024-01-01 11:00:00", 1, "click", -5.25, ""),
    (5, "2024-01-01 10:59:59.999999", 1, "view", 0.0, None),
    # session gaps: exactly 30 min, just under, just over
    (6, "2024-01-01 11:30:00", 1, "click", 1.5, '{"a": 1}'),
    (7, "2024-01-01 11:59:59", 1, "click", 2.5, '{"a": {"b": 2}}'),
    (8, "2024-01-01 12:30:00", 1, "click", 3.5, "[1, 2, 3]"),
    # click→purchase exactly 1 h apart (stream-stream join boundary is
    # inclusive) and 1 h + 1 µs (exclusive)
    (9, "2024-01-02 00:00:00", 2, "click", 10.0, "{}"),
    (10, "2024-01-02 01:00:00", 2, "purchase", 20.0, "{}"),
    (11, "2024-01-02 01:00:00.000001", 2, "purchase", 30.0, "{}"),
    # lone event, negative value ending on a .5-cent rounding edge
    (12, "2024-01-03 23:59:59", 3, "view", -100.125, '{"deep": {"x": [1]}}'),
    # NULL value: the numeric-drift monitor must EXCLUDE it (no bin)
    # in both engines, and value aggs must skip it identically
    (13, "2024-01-03 23:59:59.500000", 3, "view", None, "{}"),
    # r7 attribution edges: user 4 purchases with NO prior touch ever
    # (the 'none' bucket; one with NULL value — revenue sum must skip
    # it while the purchase still counts)
    (14, "2024-01-04 00:00:00", 4, "purchase", 40.0, "{}"),
    (17, "2024-01-04 00:00:01", 4, "purchase", None, "{}"),
    # touches at EXACTLY the purchase-10 timestamp: equal-ts touches
    # count (inclusive as-of), and among them the greatest event_id
    # (16, the click) must win the tie in both engines
    (15, "2024-01-02 01:00:00", 2, "view", 5.0, "{}"),
    (16, "2024-01-02 01:00:00", 2, "click", 6.0, "{}"),
    # 30-min gap crossed by 400ms only (prior user-4 event at
    # 00:00:01): second-truncated timestamp math would merge the
    # session the micros-exact compare splits
    (19, "2024-01-04 00:30:01.400000", 4, "view", 1.0, "{}"),
]

EDGE_ORDERS = [
    # two orders at the SAME timestamp == an event's timestamp: as-of
    # inclusivity + deterministic tie-break on o_orderkey
    (100, 1, "O", 50.0, "2024-01-01 10:00:00", "1-URGENT"),
    (101, 1, "F", 60.0, "2024-01-01 10:00:00", "2-HIGH"),
    (102, 1, "O", 70.0, "2024-01-01 11:30:00", "5-LOW"),
    # interval start exactly at an event's ts (range join includes it)
    (103, 2, "O", 80.0, "2024-01-02 01:00:00", "3-MEDIUM"),
    # event at start + 23:59:59 — inside [start, start + 1 day)
    (104, 3, "O", 90.0, "2024-01-03 00:00:00", "4-NOT SPECIFIED"),
]

EVENTS_QUERIES = [
    "tem_hourly_avg",
    # z-score outliers: duplicate timestamps, single-event types
    # (zero variance -> try_divide NULL, no rows) must match DuckDB
    "event_value_outliers",
    # CDC merge: identical-ts version ties resolved by the value key
    "events_upsert_latest",
    "envelope_roundtrip",
    "union_event_slices",
    "dedup_first_event",
    "json_props_extract",
    "distinct_users_per_type",
    "sessionize_events",
    "asof_latest_order",
    "range_join_order_events",
    # r7: interval-overlap pairs under duplicate-ts sessions and
    # boundary-touching windows (half-open: touch is NOT overlap)
    "session_incident_overlap",
    # r7: numeric drift with NULL values excluded and single-type bins
    "event_value_drift",
    "stream_tumbling_hourly",
    "stream_sliding_2h",
    "stream_distinct_users",
    "stream_session_windows",
    "stream_click_purchase_join",
    "stream_dedup_watermark",
    "props_variant_extract",
    "event_funnel",
    "retention_cohorts",
    # r6 session-2: no row carries an integer $.k -> the page graph is
    # EMPTY; the fixed-point loop must short-circuit to an empty
    # result (not divide by zero) in both engines
    "page_rank_pages",
    # empty graph -> 0 rows from both engines; degenerate degrees must
    # not divide by zero in the clustering coefficient
    "page_graph_clustering",
    # triplicate-ts ties, single-event users, type flip at the exact
    # same timestamp -> event_id tie-break decides interval boundaries
    "user_type_scd2",
    # typed-then-rendered MIN/MAX: microsecond timestamps and negative
    # doubles must render identically in both engines
    "events_table_profile",
    # microsecond-offset readings, single-reading users (emit the
    # grid point only when the reading lands exactly on the hour),
    # negative values through the integer interpolation formula
    "tem_gap_fill_hourly",
    # single-event types: MAD = 0 must exclude the type via the shared
    # predicate in BOTH engines, never divide by zero (or Inf-vs-NULL)
    "event_value_outliers_mad",
    # r7: autocorrelation over a mostly-zero dense grid (sparse types
    # still have variance; the zero-fill IS the series) and spike
    # baselines where the trailing frame is partially filled
    "event_hourly_autocorr",
    "event_rate_spikes",
    # r7 session-5: FM registers on a 4-user corpus (most registers
    # empty -> the zero-filled grid and small-range behavior), binned
    # quantiles over negative values (negative cents floor-divide to
    # negative bins) and single-value types, last-touch attribution
    # ('none' bucket, NULL-value purchase, equal-ts tie on event_id)
    "user_distinct_sketch",
    "stream_user_distinct_sketch",
    "value_quantile_histogram",
    "purchase_attribution",
    # CUSUM over a tiny dense grid (argmax ties resolved to the
    # earliest hour; all-zero types; post-level NULL when the argmax
    # is the final hour) and association rules across exact-boundary
    # session gaps and single-type sessions
    "event_cusum_changepoint",
    "session_association_rules",
    # trimmed stats over NULL/negative/tied values; deciles with
    # fewer customers than buckets (ntile gives short buckets 1..n)
    "event_value_trimmed_stats",
    "customer_spend_deciles",
    # r7 session-6: KMV sketches far smaller than k=64 — every pair
    # takes the exact branch (the sketch IS the set), and the estimate
    # must equal the true distinct counts in both engines
    "activity_overlap_kmv",
    # seasonal z-scores where no (type, hour) cell can reach |z|>3
    # (max |z| over n samples is (n-1)/sqrt(n)): the n>=2 / var>0
    # guards must agree on an EMPTY result, never divide by zero
    "event_seasonal_anomaly",
    # r7 session-6c: EWMA over a sparse multi-day grid — the series
    # head's partial weights (den < 255) and long zero-filled
    # stretches must match the oracle hour-for-hour
    "event_ewma_chart",
    # r7 session-6d: bitmaps over 4 tiny users (all in bucket 0) with
    # multi-day gaps — the dense (bucket x day) grid must keep silent
    # days' WAU alive; the streaming baseline on NULL values (event
    # 13/17 excluded) and duplicate-ts cells
    "user_activity_bitmaps",
    "stream_seasonal_baseline",
    # r7 session-6f: A-not-B on all-exact sketches (difference IS the
    # set difference); Welch pairs where one side's variance comes
    # from 2 samples and the NULL-value events drop out
    "activity_anotb_kmv",
    "welch_t_event_types",
    # r7 session-6i: NULL values (events 13/17) fill with their type's
    # median; a type with no observed value at all keeps NULL filled
    # (left join miss) in both engines
    "event_value_imputation",
    # winsorize with tiny per-type samples: p5 == p95 == the few
    # observed values (everything clamps to a near-constant), negative
    # values floor-bucket downward, NULLs pass through unclamped
    "event_value_winsorize",
    # r7 session-6j: sub-second gaps (the triplicate-ts events give
    # gap 0 -> bucket 0), the 400 ms boundary gap, and single-event
    # users contributing nothing
    "inter_event_gaps",
    # r8: OHLC open/close must pick identically under duplicate
    # timestamps (the padded event_id tie-break) and skip NULL
    # values/types; the streaming twin drains to the same candles
    "event_value_ohlc",
    "stream_hourly_ohlc",
    # r8: RFM quintiles on a 4-customer corpus — every rank formula
    # boundary (N not divisible by 5) fires; ties break on custkey
    "customer_rfm_segments",
    # r8: regularity on users with duplicate timestamps (gap 0 rides
    # the s=0 perfectly-regular branch) and too few gaps to flag
    "bot_regularity_score",
    # r8: exact percentiles where types have a handful of values (all
    # four cuts collapse onto few rows; negative floor-buckets)
    "event_type_percentiles",
    # r8: left-outer stream-stream join — the final-watermark cutoff
    # (min of both sides' max ts) decides which unmatched clicks emit
    "stream_click_purchase_left_join",
    # r8: all-or-nothing session sampling across exact-boundary gaps
    # (same segmentation as the assoc rules); churn labels where the
    # feature window excludes some users entirely (inner join drops
    # label-only users in both engines)
    "session_coherent_sample",
    "user_churn_labels",
    # r8: conversion latency where same-ts click/purchase pairs ride
    # the (ts, event_id) tie-break (lat 0) and tiny totals put every
    # quantile cut in one bucket
    "conversion_latency_quantiles",
]


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory):
    import pandas as pd

    d = str(tmp_path_factory.mktemp("edge_events"))
    ev = pd.DataFrame(
        EDGE_EVENTS,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    # timestamp[ns], like the fixtures; mixed: some rows carry microseconds
    ev["ts"] = pd.to_datetime(ev["ts"], format="mixed")
    ev.to_parquet(f"{d}/events.parquet", index=False)
    orders = pd.DataFrame(
        EDGE_ORDERS,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    )
    orders["o_orderdate"] = pd.to_datetime(orders["o_orderdate"])
    orders.to_parquet(f"{d}/orders.parquet", index=False)
    return d


@pytest.fixture(scope="module")
def edge_events_con(edge_events_dir):
    con = duckdb.connect()
    for t in ["events", "orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_events_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_edge_events_parity(spark, edge_events_dir, edge_events_con, name):
    """Duplicate-timestamp ties, window/session/interval boundaries,
    malformed and NULL JSON props — batch AND streaming variants must
    match DuckDB value-for-value."""
    fn, sql = REGISTRY[name]
    assert sql is not None
    compare(fn(spark, edge_events_dir), edge_events_con, sql)


def test_winsorize_null_values_pass_through(spark, edge_events_dir):
    """A NULL-valued event must emit value_wins NULL, never a
    fabricated p5 clamp. GREATEST/LEAST skip NULLs identically in
    Spark and DuckDB, so the parity test alone cannot catch an
    unguarded clamp — assert the semantics directly (r7 ADVICE)."""
    fn, _ = REGISTRY["event_value_winsorize"]
    rows = fn(spark, edge_events_dir).filter("value IS NULL").collect()
    assert rows, "edge corpus lost its NULL-value events"
    for r in rows:
        assert r["value_wins"] is None
        assert r["was_clamped"] is False


# --- relational tables: rounding edges, filter boundaries, ties ---

EDGE_REGION = [(0, "AMERICA"), (1, "EUROPE")]
EDGE_NATION = [(0, "BRAZIL", 0), (1, "FRANCE", 1), (2, "GERMANY", 1)]
EDGE_CUSTOMER = [
    # acctbal at zero / negative; duplicated mktsegment; name ties
    (1, "Customer#1", 0, 0.0, "BUILDING"),
    (2, "Customer#2", 1, -999.99, "BUILDING"),
    (3, "Customer#3", 2, 9999.995, "AUTOMOBILE"),   # half-cent edge
    (4, "Customer#4", 1, 100.005, "MACHINERY"),     # half-cent edge
    (5, "Customer#5", 2, 100.005, "MACHINERY"),     # tie with 4
    (6, "Customer#6", 0, 50.0, "HOUSEHOLD"),        # no orders
]
EDGE_SUPPLIER = [
    (10, "Supplier#10", 0, -1.0),   # negative acctbal (Q16 exclusion)
    (11, "Supplier#11", 1, 0.0),
    (12, "Supplier#12", 2, 500.5),
]
EDGE_PART = [
    # sizes exactly at the Q16/Q2/Q19 filter boundaries; brand/type hits
    (20, "azure part one", "Brand#12", "PROMO BRUSHED", 1, 10.005),
    (21, "blue part two", "Brand#23", "PROMO PLATED", 15, 20.0),
    (22, "green part", "Brand#45", "ECONOMY BURNISHED", 5, 30.0),
    (23, "red part", "Brand#7", "STANDARD PLATED", 20, 40.995),
    (24, "white part", "Brand#12", "PROMO ANODIZED", 21, 15.0),
    (25, "black part", "Brand#23", "ECONOMY BRUSHED", 50, 25.0),
]
EDGE_ORDERS = [
    # dates exactly at every filter boundary used by the queries
    (30, 1, "F", 100.005, "1993-10-01", "1-URGENT"),    # Q10 window start
    (31, 2, "O", 200.995, "1993-12-31", "2-HIGH"),      # Q10 last day
    (32, 3, "F", 300.0, "1994-01-01", "3-MEDIUM"),      # == Q10 end (out)
    (33, 1, "P", 100.005, "1995-09-01", "4-NOT SPECIFIED"),  # tie totalprice
    (34, 4, "O", 400.5, "1996-01-01", "5-LOW"),         # window start
    (35, 5, "F", 400.5, "1997-12-31", "1-URGENT"),      # tie totalprice
    (36, 2, "O", 0.0, "1994-06-15", "2-HIGH"),          # zero order
    (37, 3, "O", 500.0, "1998-01-01", "3-MEDIUM"),      # == window end (out)
]
EDGE_LINEITEM = [
    # (okey, pkey, skey, line, qty, extprice, disc, tax, rflag, lstat, shipdate)
    # quantities on half-cent grid edges; Q19 bounds 1.00/11.00/10.00/20.00/
    # 20.00/30.00 exact; shipdates at 1994/1995 filter boundaries
    (30, 20, 10, 1, 1.0, 100.005, 0.0, 0.0, "R", "F", "1994-01-01"),
    (30, 21, 11, 2, 11.0, 200.995, 0.05, 0.08, "R", "F", "1994-12-31"),
    (31, 22, 12, 1, 10.0, 300.5, 0.1, 0.0, "A", "F", "1995-01-01"),
    (31, 23, 10, 2, 20.0, 150.25, 0.0, 0.07, "N", "O", "1995-08-31"),
    (32, 24, 11, 1, 30.0, 99.995, 0.02, 0.01, "R", "F", "1995-09-01"),
    (33, 25, 12, 1, 2.115, 49.005, 0.04, 0.02, "N", "O", "1995-09-30"),
    (33, 20, 10, 2, 45.5, 75.0, 0.06, 0.03, "A", "F", "1995-10-01"),
    (34, 21, 11, 1, 50.0, 500.0, 0.1, 0.08, "N", "O", "1996-06-15"),
    (35, 22, 12, 1, 0.0, 0.0, 0.0, 0.0, "R", "O", "1997-01-01"),
    (35, 23, 10, 2, 1.005, 10.005, 0.05, 0.04, "N", "F", "1997-06-01"),
    (36, 24, 11, 1, 7.5, 60.5, 0.03, 0.06, "A", "O", "1994-06-16"),
    (37, 25, 12, 1, 12.25, 80.25, 0.07, 0.05, "R", "F", "1998-01-02"),
    # second supplier on order 30, NOT returned → sole-blame EXISTS case
    (30, 22, 12, 3, 3.0, 30.0, 0.01, 0.0, "N", "F", "1994-02-01"),
    # order 31: two suppliers BOTH returned → NOT-EXISTS kills both
    (31, 24, 11, 2, 4.0, 40.0, 0.02, 0.01, "A", "F", "1995-02-01"),
]

TPCH_QUERIES = [
    # Benford over a tiny order set with boundary prices (half-cent
    # totals land on their integer-cent first digit identically)
    "orders_benford_profile",
    # Gini with single-customer segments (n=1 -> exactly 0), tied
    # spends (rank tie-break on custkey), half-cent totals
    "segment_spend_gini",
    "q1_pricing_summary",
    "filter_project_scan",
    "revenue_by_segment",
    "nation_revenue",
    "topk_orders_per_priority",
    "running_total_per_customer",
    "rollup_lineitem_status",
    "cube_order_status",
    "grouping_sets_lineitem",
    "pivot_status_by_flag",
    "customers_with_orders",
    "customers_without_orders",
    "set_ops_customers",
    "case_bucket_quantity",
    "orders_by_month",
    "part_name_stats",
    "top10_lineitems",
    "exact_quantiles",
    "salted_customer_revenue",
    "outer_join_order_coverage",
    "price_lag_lead_frames",
    "small_quantity_revenue",
    "conditional_agg_orders",
    "order_price_distribution",
    "systematic_sample_revenue",
    "customer_order_histogram",
    "top_supplier_revenue",
    "large_quantity_orders",
    "nation_trade_flows",
    "idle_rich_customers",
    "promo_revenue_share",
    "disjunctive_predicate_revenue",
    "supplier_revenue_share",
    "returned_item_revenue",
    "priority_lines_by_returnflag",
    "cheapest_supplier_per_part",
    "supplier_counts_by_part_attrs",
    "sole_blame_suppliers",
    # r6 session-3: half-cent prices hit the incremental rollup's cent
    # grid; tied order counts exercise the skew report's deterministic
    # tie-break; tiny key domains stress the 16-bit Morton scaling
    "orders_incremental_agg",
    "key_skew_report",
    "zorder_layout_stats",
    # r7 session-6: the IVM delta split puts order 35 in ΔO while ΔL is
    # EMPTY (no linenumber >= 4 here) — the four-way delta union must
    # still equal the from-scratch view; BFS sees a one-edge graph
    # (22—23, co-ordered in orders 31+35) with NO seed (% 53 misses) —
    # the empty-frontier rounds must no-op identically in both engines
    "order_lineitem_ivm",
    "part_bfs_hops",
    # r7 session-6b: Bellman-Ford over the 3-nation edge fixture
    # (supplier nations 0/1/2 → customer nations, positive day
    # delays); LPA on the one-edge graph (22—23) OSCILLATES — each
    # sync round swaps the two labels, so the fixed-round unroll must
    # agree exactly with the oracle's, not with a fixpoint
    "nation_min_latency_paths",
    "part_label_communities",
    # r10: modularity on the one-edge graph — two communities of one
    # node each after the oscillating LPA unroll, each with e_c = 0
    # (the 22—23 edge is inter-community at round 4), so Q_c =
    # -(d/2m)^2 exercises the negative-contribution tail exactly
    "copurchase_modularity",
    # r7 session-6d: KM where customer 6 never ordered (absent from
    # the risk set entirely), single-order customers censor at the
    # 1998-01-01 max date, and customer 1's two same-window orders
    # exercise the rn tie-break; LTV cohorts of mostly single months
    "customer_survival_km",
    "cohort_ltv_curves",
    # r7 session-6e: negative acctbal floor-buckets downward
    # (customer 2 at -999.99 -> bucket -1 boundary), the zero-quantity
    # line is a no-op delta, draws on an empty shelf clamp at 0, tied
    # totalprices (33=30, 34=35) force dense_rank WITH-TIES rows, and
    # the weighted median's 2*cumw >= totw threshold crosses on
    # half-cent quantities
    "customer_k_anonymity",
    "part_stock_balance",
    "lineitem_weighted_median",
    "topk_orders_with_ties",
    # r7 session-6g: every customer's consecutive orders here are
    # years apart (the 3-day candidate window is EMPTY — both engines
    # must agree on that); ABC classes over boundary-tied revenues
    "orders_double_billing",
    "part_abc_classes",
    # r7 session-6h: sparse partkey domain (20..25 with maxpk 25) —
    # most hash candidates name nonexistent parts and the semi join
    # must prune them; some customers end up with < k negatives
    "customer_negative_parts",
    # r7 session-6i: PPR on the one-edge graph with an EMPTY seed set
    # (% 53 misses) — all-zero ranks, no division by zero, ordering
    # resolved by the part tie-break
    "ppr_part_recommendations",
    # r7 session-6j: two regions, three nations — ppm shares on a
    # handful of exact cent sums
    "region_nation_share",
    # r8: FK audit on the handcrafted star (all parents resolvable —
    # 7 zero-orphan rows, counts still compared); basket pairs where
    # min_count=2 may leave zero qualifying pairs (both engines must
    # agree on that, possibly-empty, set); the sweep line over orders
    # whose close date precedes more opens
    "referential_integrity_audit",
    "part_copurchase_lift",
    "open_orders_daily",
    "copurchase_link_prediction",
    # r8: priority mix over two months x few priorities — every share
    # window runs over single-digit cells
    "orders_priority_drift",
    # r8: HHI where parts are single-sourced (hhi = 1e6 exactly) and
    # quantity ties split across suppliers
    "part_supplier_hhi",
    # r8: OLS on boundary rows (half-cent discounts; per-flag groups
    # of 1-2 rows where varx can be 0 -> both engines must agree on
    # the degenerate result); DOW shares over single-digit cells;
    # clustering coefficient where min_count=2 may empty the graph
    "discount_quantity_regression",
    "orders_seasonality_dow",
    "copurchase_clustering_coefficient",
    # r8: RANGE frame over a 2-month sparse date grid — calendar gaps
    # must SHORTEN windows identically in both engines
    "daily_revenue_rolling_7d",
    # r8: basket histogram where every boundary basket size (1..n)
    # appears once
    "order_basket_size_histogram",
]


@pytest.fixture(scope="module")
def edge_tpch_dir(tmp_path_factory):
    import pandas as pd

    d = str(tmp_path_factory.mktemp("edge_tpch"))

    def w(name, rows, cols, ts_cols=()):
        df = pd.DataFrame(rows, columns=cols)
        for c in ts_cols:
            df[c] = pd.to_datetime(df[c])
        df.to_parquet(f"{d}/{name}.parquet", index=False)

    w("region", EDGE_REGION, ["r_regionkey", "r_name"])
    w("nation", EDGE_NATION, ["n_nationkey", "n_name", "n_regionkey"])
    w("customer", EDGE_CUSTOMER,
      ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])
    w("supplier", EDGE_SUPPLIER,
      ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    w("part", EDGE_PART,
      ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
    w("orders", EDGE_ORDERS,
      ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
       "o_orderdate", "o_orderpriority"], ts_cols=["o_orderdate"])
    w("lineitem", EDGE_LINEITEM,
      ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
       "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
       "l_linestatus", "l_shipdate"], ts_cols=["l_shipdate"])
    return d


@pytest.fixture(scope="module")
def edge_tpch_con(edge_tpch_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_tpch_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_edge_tpch_parity(spark, edge_tpch_dir, edge_tpch_con, name):
    """Half-cent rounding edges, filter-boundary dates, tied
    aggregates/prices, multi-supplier blame shapes: every relational
    oracle query must hash-match DuckDB on handcrafted boundary rows."""
    fn, sql = REGISTRY[name]
    assert sql is not None
    compare(fn(spark, edge_tpch_dir), edge_tpch_con, sql)


def test_edge_anti_join_is_non_vacuous(spark, edge_tpch_dir):
    """customers_without_orders rode a 0-row vacuous green through five
    rounds before its r6 re-base (both engines agree perfectly on an
    empty result). Pin that the edge corpus keeps BOTH anti-join
    sub-cases populated, so a fixture edit can't silently re-vacuate
    the parity check above:
      - customer 6: no orders at all (the pure NOT-EXISTS case)
      - customers 2/3/4: have orders, none 1-URGENT (the predicate case)
      - customers 1/5: hold a 1-URGENT order and must be excluded."""
    fn, _ = REGISTRY["customers_without_orders"]
    got = sorted(r["c_custkey"] for r in fn(spark, edge_tpch_dir).collect())
    assert got == [2, 3, 4, 6]


def test_global_sequence_numbers_null_source_docs(spark, tmp_path):
    """Regression (r7 review): a NULL source must neither drop a doc
    from the global sequence (the offset equi-join null-rejects raw
    NULLs) nor shift the survivors' numbers. Both engines coalesce the
    sort key to '', so NULL-source docs sort FIRST and everything
    still numbers densely 1..n."""
    import duckdb

    rows = [
        (1, "a", None, "s1", 1),
        (2, "b", "en", "s2", 1),
        (3, "c", None, "s1", 1),
        (4, "d", "en", "s0", 1),
    ]
    d = str(tmp_path / "nullsrc")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).selectExpr(
        "doc_id", "text", "lang",
        "CASE WHEN lang IS NULL THEN NULL ELSE source END AS source",
        "n_chars",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    fn, sql = REGISTRY["doc_global_sequence"]
    got = {(r["doc_id"], r["source"], r["seq"]) for r in fn(spark, d).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    con.close()
    assert got == want
    assert len(got) == 4, "NULL-source docs must not drop"
    assert {s for (_, _, s) in got} == {1, 2, 3, 4}, "dense 1..n"
