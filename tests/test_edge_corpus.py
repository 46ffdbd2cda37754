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
    "envelope_roundtrip",
    "union_event_slices",
    "dedup_first_event",
    "json_props_extract",
    "distinct_users_per_type",
    "sessionize_events",
    "asof_latest_order",
    "range_join_order_events",
    "stream_tumbling_hourly",
    "stream_sliding_2h",
    "stream_distinct_users",
    "stream_session_windows",
    "stream_click_purchase_join",
    "stream_dedup_watermark",
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
