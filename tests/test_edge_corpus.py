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
