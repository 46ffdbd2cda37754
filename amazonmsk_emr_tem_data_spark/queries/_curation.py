"""Corpus curation: splits, shuffle shards, mixture plans, quality selection, cost attribution.

Split from the former single-module queries.py (r12); execution order and
namespace semantics preserved via explicit cross-part imports.
"""

from __future__ import annotations

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.codec import from_kafka_envelope, to_kafka_envelope
from ..functions.tem import horizontal_mean
from ..schemas import EVENTS_SCHEMA
from ..sources.files import (
    checkpoint_stage,
    ensure_parallelism,
    load_table,
)
from ._core import QueryFn
from ._core import (
    _ranked_topk,
)
from ._northstar import (
    _HASH64_SQL,
    _NORM_SQL,
    _QUALITY_SQL_PARTS,
    _TOKS_SQL,
)
from ._timeseries import (
    _bucket_split,
)



# ---------------------------------------------------------------------------
# corpus curation: split / shuffle-shards / mixture plan / quality select
# (round 4 — the post-dedup steps that turn a cleaned corpus into
# training input: reproducible partitioning, ordering, and mixing)
# ---------------------------------------------------------------------------


def doc_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (98/1/1): bucket = 60-bit
    md5 hash of doc_id, mod 1000. Hash-membership splits are the
    reproducible way to partition a 100 TB corpus — no shuffle, no
    global sort, any worker computes membership standalone, and newly
    ingested data never moves existing docs across splits (the property
    a random() split lacks). Stratification across sources falls out of
    hash uniformity."""
    from ..functions.text import md5_hash64

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(md5_hash64(F.col("doc_id").cast("string")), F.lit(1000))
    return docs.select(
        "doc_id",
        "source",
        "lang",
        bucket.alias("split_bucket"),
        F.when(bucket < 980, "train")
        .when(bucket < 990, "val")
        .otherwise("test")
        .alias("split"),
    )


_CORPUS_SPLIT_SQL = f"""
SELECT doc_id, source, lang, b AS split_bucket,
       CASE WHEN b < 980 THEN 'train'
            WHEN b < 990 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, source, lang,
             {_HASH64_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 1000 AS b
      FROM documents)
"""


def doc_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-aware train/val/test split: the bucket hash runs
    over the CONTENT fingerprint (md5 of normalized text), not the doc
    id — every exact duplicate of a document lands in the same split,
    so eval can never hold a verbatim copy of a training document (the
    leakage mode a doc_id-hash split permits; web crawls carry ~10%
    exact copies under distinct ids, and so do these fixtures by
    construction at 10x). Same virtues as doc_corpus_split otherwise:
    map-only, shuffle-free, membership computable standalone on any
    worker, ingest-stable. The near-dup-safe variant is the same plan
    with the dedup-cluster representative label as the hash input."""
    from ..functions.text import fingerprint, md5_hash64

    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint("text")
    bucket = F.pmod(md5_hash64(fp), F.lit(1000))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        bucket.alias("split_bucket"),
        _bucket_split(bucket).alias("split"),
    )


_LEAKAGE_SPLIT_SQL = f"""
SELECT doc_id, fp AS fingerprint, b AS split_bucket,
       CASE WHEN b < 980 THEN 'train'
            WHEN b < 990 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, md5({_NORM_SQL}) AS fp,
             {_HASH64_SQL.format(x=f"md5({_NORM_SQL})")} % 1000 AS b
      FROM documents)
"""


def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram on power-of-2 buckets — the batch-shape
    planning pass (how much of the corpus fits a 2048 context? what
    does bucketed batching pay in padding?) that sizes sequence packing
    and curriculum schedules.

    The bucket is ``length(bin(n)) - 1`` — floor(log2 n) computed as
    pure integer/string logic, identical in Spark and DuckDB by
    construction (a libm ``log2`` could straddle a power-of-two
    boundary differently per engine). One map-side-combinable agg onto
    ~30 bucket keys; the share window runs over those ~30 rows."""
    from ..functions.text import token_count

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    n = token_count("text")
    bucket = (
        F.when(n <= 0, F.lit(-1).cast("long"))
        .otherwise((F.length(F.bin(n)) - 1).cast("long"))
    )
    per = (
        docs.select(bucket.alias("bucket"), n.alias("n_tokens"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    w = Window.partitionBy()
    return per.select(
        "bucket",
        F.when(F.col("bucket") < 0, F.lit(0.0))
        .otherwise(F.pow(F.lit(2.0), F.col("bucket")))
        .cast("long")
        .alias("bucket_lo"),
        "n_docs",
        "total_tokens",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("doc_share"),
    )


_LENGTH_HISTOGRAM_SQL = f"""
WITH per AS (
  SELECT CASE WHEN n <= 0 THEN -1
              ELSE length(bin(n)) - 1 END AS bucket, n
  FROM (SELECT CAST(len({_TOKS_SQL}) AS BIGINT) AS n FROM documents)
), agg AS (
  SELECT bucket, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens
  FROM per GROUP BY bucket
)
SELECT bucket,
       CAST(CASE WHEN bucket < 0 THEN 0.0 ELSE pow(2.0, bucket) END
            AS BIGINT) AS bucket_lo,
       n_docs, total_tokens,
       CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE)
         AS doc_share
FROM agg
"""


def doc_shuffle_shards(spark: SparkSession, sf_dir: str, n_shards: int = 8) -> DataFrame:
    """Deterministic global shuffle into training shards: shard =
    salted-hash(doc_id) mod n_shards; position = rank of the hash
    within the shard. This is the scalable 'shuffled corpus' recipe —
    no global sort: shard assignment is map-only, within-shard order is
    a local sort after the one partition-by-shard shuffle, and the
    permutation is reproducible (salt-seeded) across reruns and cluster
    sizes. Downstream, write with partitionBy(shard) and readers stream
    shards in pos order."""
    from ..functions.text import md5_hash64

    docs = load_table(spark, sf_dir, "documents")
    h = md5_hash64(F.concat(F.lit("shuf1:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", h.alias("h"))
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


_SHUFFLE_SHARDS_SQL = f"""
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC)
            AS BIGINT) AS pos
FROM (SELECT doc_id, h, h % 8 AS shard
      FROM (SELECT doc_id,
                   {_HASH64_SQL.format(x="'shuf1:' || CAST(doc_id AS VARCHAR)")} AS h
            FROM documents))
"""


def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture planning (The Pile / DoReMi-shape): per-source
    token mass, natural corpus share, and the repeat factor that
    rebalances the mixture to uniform across sources
    (epochs_to_uniform = target_share / natural_share — >1 repeats the
    source, <1 subsamples it). One map-side-combinable aggregation;
    the window totals run over the ~|sources| aggregated rows, not the
    corpus."""
    from ..functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    return (
        per.withColumn(
            "corpus_share", F.col("n_tokens") / F.sum("n_tokens").over(w)
        )
        .withColumn(
            "epochs_to_uniform",
            (F.lit(1.0) / F.count(F.lit(1)).over(w)) / F.col("corpus_share"),
        )
        .select(
            "source", "n_docs", "n_tokens", "corpus_share", "epochs_to_uniform"
        )
    )


_MIXTURE_PLAN_SQL = f"""
SELECT source, n_docs, n_tokens,
       n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE) AS corpus_share,
       (1.0 / count(*) OVER ())
         / (n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE)) AS epochs_to_uniform
FROM (SELECT source, count(*) AS n_docs,
             CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source)
"""

#: quality_score's SQL twin (same weighted sum as functions/text.py).
_QUALITY_SCORE_SQL = (
    f"0.4 * least({_QUALITY_SQL_PARTS['stop_ratio']} * 4, 1.0)"
    f" + 0.3 * least({_QUALITY_SQL_PARTS['avg_tok']} / 8, 1.0)"
    f" + 0.2 * (1.0 - least({_QUALITY_SQL_PARTS['punct_ratio']} * 10, 1.0))"
    f" + 0.1 * (1.0 - least({_QUALITY_SQL_PARTS['upper_ratio']} * 10, 1.0))"
)


def doc_quality_selection(
    spark: SparkSession, sf_dir: str, top_frac: float = 0.2
) -> DataFrame:
    """Per-source quality selection: keep the top 20% of documents per
    source by composite quality score (ties broken deterministically:
    score desc, doc_id asc) — the FineWeb/DCLM-style 'train on the best
    slice' curation step. One shuffle on source + a within-partition
    sort; no global ordering, so the plan is unchanged at 100 TB."""
    from ..functions import text as tx

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source")
    wr = w.orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    return (
        docs.select(
            "doc_id", "source", tx.quality_score("text").alias("quality")
        )
        .withColumn("quality_rank", F.row_number().over(wr).cast("long"))
        .withColumn("n_src", F.count(F.lit(1)).over(w))
        .filter(
            F.col("quality_rank") <= F.ceil(F.col("n_src") * F.lit(top_frac))
        )
        .select("doc_id", "source", "quality", "quality_rank")
    )


_QUALITY_SELECTION_SQL = f"""
WITH q AS (
  SELECT doc_id, source, {_QUALITY_SCORE_SQL} AS quality FROM documents
), r AS (
  SELECT doc_id, source, quality,
         CAST(row_number() OVER (PARTITION BY source
                ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS quality_rank,
         count(*) OVER (PARTITION BY source) AS n_src
  FROM q
)
SELECT doc_id, source, quality, quality_rank
FROM r WHERE quality_rank <= ceil(n_src * 0.2)
"""


def _curation_stages(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
):
    """The curation pipeline's first five stage relations (corpus →
    quality-selected → exact-deduped → eval-withheld candidates →
    decontaminated), shared by corpus_curation_pipeline (which shards
    and packs the survivors), curation_funnel_report (which counts
    the stages), and incremental_curation_delta (which runs the chain
    on two snapshot variants via ``docs``). One definition so the
    stage semantics cannot drift between the pipeline and its
    observability twins."""
    from ..functions import text as tx
    from ..operators.dedup import ngram_overlap_decontaminate

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    wsrc = Window.partitionBy("source")
    wr = wsrc.orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    selected = (
        docs.select(
            "doc_id", "source", "text", tx.quality_score("text").alias("quality")
        )
        .withColumn("quality_rank", F.row_number().over(wr).cast("long"))
        .withColumn("n_src", F.count(F.lit(1)).over(wsrc))
        .filter(F.col("quality_rank") <= F.ceil(F.col("n_src") * F.lit(0.2)))
        .drop("n_src", "quality_rank")
    )
    wfp = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    deduped = (
        selected.withColumn("fingerprint", tx.fingerprint("text"))
        .withColumn("rn", F.row_number().over(wfp))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    candidates = deduped.filter(F.col("doc_id") % 97 != 0)
    flags = ngram_overlap_decontaminate(
        candidates, docs.filter(F.col("doc_id") % 97 == 0)
    )
    clean = candidates.join(
        flags.filter(~F.col("is_contaminated")).select("doc_id"), "doc_id"
    )
    return docs, selected, deduped, candidates, clean


def _curation_sharded(clean: DataFrame) -> DataFrame:
    """Stages 4-5 of the curation pipeline (leakage-safe split on the
    content fingerprint + deterministic shuffle into 8 shards, with
    per-doc token counts and the two-level subshard index) — shared by
    corpus_curation_pipeline (which packs the result) and
    packing_efficiency_report (which budgets it)."""
    from ..functions import text as tx

    bucket = F.pmod(tx.md5_hash64(F.col("fingerprint")), F.lit(1000))
    h = tx.md5_hash64(
        F.concat(F.lit("shuf1:"), F.col("doc_id").cast("string"))
    )
    wshard = Window.partitionBy("split", "shard").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        clean.withColumn("split_bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("split_bucket") < 980, "train")
            .when(F.col("split_bucket") < 990, "val")
            .otherwise("test"),
        )
        .withColumn("h", h)
        .withColumn("shard", F.pmod(F.col("h"), F.lit(8)))
        .withColumn("pos", F.row_number().over(wshard).cast("long"))
        .withColumn("n_tokens", tx.token_count("text"))
        .withColumn("subshard", F.floor((F.col("pos") - 1) / 1000))
    )


def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composition a real 100 TB
    training-data build actually runs, chaining the operators the
    standalone registry queries verify individually:

      quality-select (top 20% per source) -> exact dedup (keep-first
      by content fingerprint) -> decontaminate vs the held-out eval
      slice (doc_id % 97 == 0; eval members leave the pool, then the
      8-gram overlap rule drops contaminated docs) -> leakage-safe
      split (bucket on the CONTENT fingerprint so copies can never
      straddle train/eval) -> deterministic shuffle into 8 shards per
      split -> sequence packing of each (split, shard) stream into
      2048-token sequences.

    Being one query proves the per-stage contracts (column names,
    types, deterministic tie-breaks) hold under composition. Per-stage
    shuffle budget is unchanged from the standalone queries: one
    window shuffle on source, one on fingerprint, the (doc, gram-hash)
    shuffle with a broadcast eval-gram join, a map-only split, one
    shuffle on (split, shard), and the packing prefix-sum re-uses that
    same (split, shard) partitioning via the two-level scan (per-task
    windows <= 1000 rows, sub-shard offsets broadcast back). At 100 TB
    you would persist the curated set between stages 3 and 5 instead
    of recomputing lineage — a materialization choice, not a plan
    change."""
    # stages 1-3 (quality selection, exact dedup, decontamination)
    # come from the shared stage builder
    _docs, _selected, _deduped, _candidates, clean = _curation_stages(
        spark, sf_dir
    )
    sharded = _curation_sharded(clean)

    # 6. pack each (split, shard) stream: two-level prefix sum so no
    # task windows more than 1000 rows
    subtot = sharded.groupBy("split", "shard", "subshard").agg(
        F.sum("n_tokens").alias("total")
    )
    wsub = (
        Window.partitionBy("split", "shard")
        .orderBy("subshard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    suboff = subtot.select(
        "split",
        "shard",
        "subshard",
        F.coalesce(F.sum("total").over(wsub), F.lit(0)).alias("off"),
    )
    win = (
        Window.partitionBy("split", "shard", "subshard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sharded.join(F.broadcast(suboff), ["split", "shard", "subshard"])
        .withColumn(
            "start_token",
            F.col("off") + F.sum("n_tokens").over(win) - F.col("n_tokens"),
        )
        .select(
            "doc_id",
            "source",
            "quality",
            "fingerprint",
            "split",
            "shard",
            "pos",
            "n_tokens",
            "start_token",
            F.floor(F.col("start_token") / 2048).alias("pack_id"),
        )
    )


#: Stage CTEs (corpus → clean) shared by the pipeline oracle and the
#: funnel-report oracle — one definition, zero drift.
def _curation_stage_ctes(base: str = "documents", sfx: str = "") -> str:
    """The stage CTE chain (corpus -> clean), parameterized on the
    base relation and a CTE-name suffix so the incremental delta
    twin can run TWO chains (old/new snapshots) in one query. The
    unsuffixed default is string-identical to the pre-r10 literal
    consumed by the pipeline/funnel/packing oracles."""
    return f"""q{sfx} AS (
  SELECT doc_id, source, text, {_QUALITY_SCORE_SQL} AS quality FROM {base}
), ranked{sfx} AS (
  SELECT doc_id, source, text, quality,
         CAST(row_number() OVER (PARTITION BY source
                ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS quality_rank,
         count(*) OVER (PARTITION BY source) AS n_src
  FROM q{sfx}
), selected{sfx} AS (
  SELECT doc_id, source, text, quality FROM ranked{sfx}
  WHERE quality_rank <= ceil(n_src * 0.2)
), deduped{sfx} AS (
  SELECT doc_id, source, text, quality, fingerprint FROM (
    SELECT s.*, md5({_NORM_SQL}) AS fingerprint,
           row_number() OVER (PARTITION BY md5({_NORM_SQL})
                              ORDER BY doc_id ASC) AS rn
    FROM selected{sfx} s) WHERE rn = 1
), candidates{sfx} AS (
  SELECT * FROM deduped{sfx} WHERE doc_id % 97 <> 0
), cand_grams{sfx} AS (
  SELECT doc_id, {_HASH64_SQL.format(x='gram')} AS gh
  FROM (SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(w) >= 8
                THEN list_transform(generate_series(1, len(w)-7),
                                    i -> array_to_string(w[i:i+7], ' '))
                ELSE [array_to_string(w, ' ')] END)) AS gram
        FROM (SELECT doc_id, {_TOKS_SQL} AS w FROM candidates{sfx}))
), eval_grams{sfx} AS (
  SELECT DISTINCT {_HASH64_SQL.format(x='gram')} AS gh
  FROM (SELECT unnest(list_distinct(
           CASE WHEN len(w) >= 8
                THEN list_transform(generate_series(1, len(w)-7),
                                    i -> array_to_string(w[i:i+7], ' '))
                ELSE [array_to_string(w, ' ')] END)) AS gram
        FROM (SELECT {_TOKS_SQL} AS w FROM {base} WHERE doc_id % 97 = 0))
), contaminated{sfx} AS (
  SELECT doc_id FROM (
    SELECT g.doc_id, count(*) AS n_grams,
           sum(CASE WHEN e.gh IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
    FROM cand_grams{sfx} g LEFT JOIN eval_grams{sfx} e ON g.gh = e.gh
    GROUP BY g.doc_id)
  WHERE n_hits * 5 >= n_grams
), clean{sfx} AS (
  SELECT c.* FROM candidates{sfx} c
  WHERE NOT EXISTS (SELECT 1 FROM contaminated{sfx} x WHERE x.doc_id = c.doc_id)
)"""


#: Stage CTEs (corpus -> clean) shared by the pipeline oracle and the
#: funnel-report oracle - one definition, zero drift.
_CURATION_STAGE_CTES = _curation_stage_ctes()

#: The split+shard CTE (stages 4-5), shared by the pipeline oracle and
#: the packing-efficiency oracle.
_CURATION_SPLIT_CTE = f"""splitted AS (
  SELECT doc_id, source, quality, fingerprint,
         CASE WHEN b < 980 THEN 'train'
              WHEN b < 990 THEN 'val'
              ELSE 'test' END AS split,
         h, h % 8 AS shard,
         CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
  FROM (SELECT c.*,
               {_HASH64_SQL.format(x='fingerprint')} % 1000 AS b,
               {_HASH64_SQL.format(x="'shuf1:' || CAST(doc_id AS VARCHAR)")} AS h
        FROM clean c)
)"""

#: One oracle chaining the SAME CTE per stage — the cross-engine proof
#: that the composed pipeline, not just its pieces, is deterministic.
_CURATION_PIPELINE_SQL = f"""
WITH {_CURATION_STAGE_CTES}, {_CURATION_SPLIT_CTE}, pos_assigned AS (
  SELECT doc_id, source, quality, fingerprint, split, shard, n_tokens,
         CAST(row_number() OVER (PARTITION BY split, shard
                ORDER BY h ASC, doc_id ASC) AS BIGINT) AS pos,
         (CAST(row_number() OVER (PARTITION BY split, shard
                ORDER BY h ASC, doc_id ASC) AS BIGINT) - 1) // 1000 AS subshard
  FROM splitted
), suboff AS (
  SELECT split, shard, subshard,
         CAST(COALESCE(SUM(total) OVER (PARTITION BY split, shard
                  ORDER BY subshard
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM (SELECT split, shard, subshard, SUM(n_tokens) AS total
        FROM pos_assigned GROUP BY 1, 2, 3)
)
SELECT p.doc_id, p.source, p.quality, p.fingerprint, p.split, p.shard,
       p.pos, p.n_tokens,
       CAST(o.off + SUM(p.n_tokens) OVER (PARTITION BY p.split, p.shard,
                p.subshard ORDER BY p.pos ROWS UNBOUNDED PRECEDING)
            - p.n_tokens AS BIGINT) AS start_token,
       CAST((o.off + SUM(p.n_tokens) OVER (PARTITION BY p.split, p.shard,
                p.subshard ORDER BY p.pos ROWS UNBOUNDED PRECEDING)
            - p.n_tokens) // 2048 AS BIGINT) AS pack_id
FROM pos_assigned p JOIN suboff o USING (split, shard, subshard)
"""


def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-pipeline cost attribution in ROW terms (round 9, the
    r8 verdict's pipeline-observability ask): how many documents
    survive each stage of the curation composition — corpus →
    quality-selected → exact-deduped → eval-withheld →
    decontaminated — with the per-stage retention in ppm. This is the
    funnel every production data team publishes next to the pipeline
    ("where do documents die"), built from the SAME stage relations as
    corpus_curation_pipeline (_curation_stages — one definition, zero
    drift) and the SAME stage CTEs in the oracle.

    Exactness: counts are exact longs; retained_ppm = 10⁶·n div
    prev_n, guarded for an empty predecessor (NULL, matching both
    engines). Scale: five counts over progressively smaller relations
    plus a 5-row window — at 100 TB you'd cache the stage outputs the
    pipeline run materializes anyway and read the counts off them; the
    funnel itself never shuffles more than one row per stage."""
    docs, selected, deduped, candidates, clean = _curation_stages(
        spark, sf_dir
    )
    stages = [
        ("corpus", docs),
        ("quality_selected", selected),
        ("exact_deduped", deduped),
        ("eval_withheld", candidates),
        ("decontaminated", clean),
    ]
    counts = None
    for ordinal, (stage, rel) in enumerate(stages, start=1):
        row = rel.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs")
        ).select(
            F.lit(ordinal).cast("long").alias("stage_ord"),
            F.lit(stage).alias("stage"),
            "n_docs",
        )
        counts = row if counts is None else counts.unionByName(row)
    return counts.select(
        "stage_ord",
        "stage",
        "n_docs",
        F.expr(
            "CASE WHEN lag(n_docs) OVER (ORDER BY stage_ord) IS NULL"
            " THEN CAST(1000000 AS BIGINT)"
            " WHEN lag(n_docs) OVER (ORDER BY stage_ord) > 0"
            " THEN (1000000 * n_docs)"
            " div lag(n_docs) OVER (ORDER BY stage_ord) END"
        ).alias("retained_ppm"),
    )


_CURATION_FUNNEL_SQL = f"""
WITH {_CURATION_STAGE_CTES}, counts AS (
  SELECT 1 AS stage_ord, 'corpus' AS stage,
         (SELECT COUNT(*) FROM documents) AS n_docs
  UNION ALL SELECT 2, 'quality_selected', (SELECT COUNT(*) FROM selected)
  UNION ALL SELECT 3, 'exact_deduped', (SELECT COUNT(*) FROM deduped)
  UNION ALL SELECT 4, 'eval_withheld', (SELECT COUNT(*) FROM candidates)
  UNION ALL SELECT 5, 'decontaminated', (SELECT COUNT(*) FROM clean)
)
SELECT CAST(stage_ord AS BIGINT) AS stage_ord, stage,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(CASE WHEN lag(n_docs) OVER (ORDER BY stage_ord) IS NULL
              THEN 1000000
              WHEN lag(n_docs) OVER (ORDER BY stage_ord) > 0
              THEN (1000000 * n_docs)
                   // lag(n_docs) OVER (ORDER BY stage_ord) END
            AS BIGINT) AS retained_ppm
FROM counts
"""

def packing_efficiency_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequence-packing budget per (split, shard) (round 9,
    observability tier, training side): documents, tokens, the number
    of 2048-token sequences the shard's contiguous packing fills, and
    the padding waste in ppm — the number that says how many
    accelerator-hours the last partial sequence of every shard burns,
    and whether shard sizes are balanced enough for even data-loader
    throughput. Third consumer of the shared curation stage builders
    (_curation_stages + _curation_sharded — one definition for
    pipeline, funnel, and budget).

    Exactness: all integer — n_seqs = (Σtokens + 2047) div 2048 (the
    packing is a contiguous prefix sum, so the stream fills sequences
    back-to-back and only the final one pads), waste_ppm =
    10⁶·(n_seqs·2048 − Σtokens) div (n_seqs·2048), guarded for an
    empty shard. Scale: one map-side-combined rollup over the sharded
    relation — 24 output rows regardless of corpus size."""
    _d, _s, _dd, _c, clean = _curation_stages(spark, sf_dir)
    sharded = _curation_sharded(clean)
    agg = sharded.groupBy("split", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    return agg.select(
        "split",
        F.col("shard").cast("long").alias("shard"),
        "n_docs",
        "n_tokens",
        F.expr("(n_tokens + 2047) div 2048").alias("n_seqs"),
        F.expr(
            "CASE WHEN n_tokens > 0 THEN"
            " 1000000 * (((n_tokens + 2047) div 2048) * 2048 - n_tokens)"
            " div (((n_tokens + 2047) div 2048) * 2048)"
            " ELSE 0 END"
        ).alias("pad_waste_ppm"),
    )


_PACKING_EFFICIENCY_SQL = f"""
WITH {_CURATION_STAGE_CTES}, {_CURATION_SPLIT_CTE}
SELECT split, CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST((SUM(n_tokens) + 2047) // 2048 AS BIGINT) AS n_seqs,
       CAST(CASE WHEN SUM(n_tokens) > 0 THEN
              1000000 * (((SUM(n_tokens) + 2047) // 2048) * 2048
                         - SUM(n_tokens))
              // (((SUM(n_tokens) + 2047) // 2048) * 2048)
            ELSE 0 END AS BIGINT) AS pad_waste_ppm
FROM splitted
GROUP BY 1, 2
"""


def tokenizer_throughput_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source tokenizer-throughput monitor (round 10, r8 VERDICT
    ask #8 / r9 ask #4): for each provenance, the document count,
    byte/char volume, whitespace- and BPE-ish-token totals, and the
    integer intensity ratios a throughput dashboard divides wall time
    into — tokens-per-doc and chars-per-BPE-token (milli-units). The
    "per second" denominators live OUTSIDE the query by design: wall
    time is nondeterministic, so the engine emits the deterministic
    numerators (what was tokenized) and BENCH_r{{N}}.json's per-query
    seconds supply the clock — docs/sec and tokens/sec per source are
    one division away, and the query itself stays hash-checkable
    against the DuckDB twin.

    The BPE-ish count is the engine's budget-planning token proxy
    (functions/text.bpeish_token_count: ceil(len/4) pieces per word),
    so the tokens/sec this monitor supports is the same unit the
    mixture planner and packing budget consume — one token convention
    across the training-data tier.

    Exactness: counts and sums are longs; ratios are integer
    milli-divisions (1000·x div y), zero-guarded. Scale: ONE
    map-side-combined hash-agg on source — per-row token counts are
    codegen'd folds, the shuffle carries |sources| rows of five longs,
    text never shuffles."""
    from ..functions import text as tx

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text").cast("long")).alias("n_chars"),
        F.sum(tx.token_count("text")).alias("ws_tokens"),
        F.sum(tx.bpeish_token_count("text")).alias("bpe_tokens"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_chars",
        "ws_tokens",
        "bpe_tokens",
        F.expr(
            "CASE WHEN n_docs > 0 THEN 1000 * bpe_tokens div n_docs"
            " ELSE 0 END"
        ).alias("tokens_per_doc_milli"),
        F.expr(
            "CASE WHEN bpe_tokens > 0 THEN 1000 * n_chars div bpe_tokens"
            " ELSE 0 END"
        ).alias("chars_per_token_milli"),
    )


_TOKENIZER_THROUGHPUT_SQL = f"""
WITH t AS (
  SELECT source, CAST(length(text) AS BIGINT) AS nc,
         CAST(len(w) AS BIGINT) AS ws,
         CAST(list_sum(list_transform(w,
              x -> CAST(ceil(length(x)/4.0) AS BIGINT))) AS BIGINT) AS bpe
  FROM (SELECT source, text, {_TOKS_SQL} AS w FROM documents)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nc) AS BIGINT) AS n_chars,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       CAST(CASE WHEN COUNT(*) > 0
            THEN 1000 * SUM(bpe) // COUNT(*) ELSE 0 END AS BIGINT)
         AS tokens_per_doc_milli,
       CAST(CASE WHEN SUM(bpe) > 0
            THEN 1000 * SUM(nc) // SUM(bpe) ELSE 0 END AS BIGINT)
         AS chars_per_token_milli
FROM t GROUP BY source
"""


def query_cost_attribution(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> DataFrame:
    """Per-query plan-cost attribution (round 10, r8 VERDICT ask #8 /
    r9 ask #4): one row per query with its shuffle count, join-family
    mix, Catalyst's estimated scan bytes (the optimizer's own leaf
    statistics — what AQE and the broadcast planner consume), codegen
    span count, and pushdown coverage. This is PLANS.md as a QUERY —
    the capacity-planning view that says which queries own the
    shuffles and the scan bytes before any of them runs at 100 TB,
    pairing BENCH_r{{N}}.json's wall seconds with the plan-side cost
    drivers.

    Default scope is the bench headline set (BENCH_HEADLINE — exactly
    the queries whose seconds the driver records each round, so the
    join of this output with the bench JSON is total); pass ``names``
    for any other slice, including the full registry (the scale suite
    runs that nightly-shaped sweep — building all ~250 plans runs the
    iterative operators' bounded fits, ~3 min at sf0.01, too heavy
    for a default registry entry).

    No DuckDB twin by nature: the facts ARE Spark plan internals
    (exchange nodes, Catalyst size estimates), which no other engine
    can recompute — this is the registry's documented rows-only
    entry; the pytest contract instead cross-checks each row against
    plan_facts and pins the no-cartesian invariant.

    Driver-side metadata only: plans are built, never executed (the
    iterative queries run their bounded model fits during
    construction, as everywhere); the result is a createDataFrame of
    ≤ |registry| metadata rows — bounded by the registry size, not
    data."""
    from ..plans.inspect import cost_facts

    # call-time import: REGISTRY is defined (and rebound by the stamp
    # rotation) after this function's module executes — binding it at
    # call time sees the post-rotation object regardless of module
    # layout (r12 split-readiness)
    from ..queries import BENCH_HEADLINE, REGISTRY

    chosen = names if names is not None else list(BENCH_HEADLINE)
    rows = []
    for name in chosen:
        if name == "query_cost_attribution" or name not in REGISTRY:
            continue  # self-recursion guard; tolerate stale lists
        fn, _sql = REGISTRY[name]
        c = cost_facts(fn(spark, sf_dir))
        rows.append(
            (
                name,
                c["n_exchanges"],
                c["n_joins"],
                c["n_broadcast_joins"],
                c["n_shuffle_joins"],
                c["n_nested_loop_joins"],
                c["has_cartesian"],
                c["n_scans"],
                c["est_scan_bytes"],
                c["n_unknown_size_scans"],
                c["n_codegen_spans"],
                c["n_pushed_scans"],
            )
        )
    out = spark.createDataFrame(
        rows,
        "query string, n_exchanges long, n_joins long,"
        " n_broadcast_joins long, n_shuffle_joins long,"
        " n_nested_loop_joins long, has_cartesian boolean,"
        " n_scans long, est_scan_bytes long,"
        " n_unknown_size_scans long, n_codegen_spans long,"
        " n_pushed_scans long",
    )
    return out.orderBy(
        F.col("n_exchanges").desc(),
        F.col("est_scan_bytes").desc(),
        F.col("query").asc(),
    )


def decontamination_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source contamination monitor (round 9, observability tier):
    for each source, how many curation candidates the 8-gram eval
    overlap rule drops and the contamination rate in ppm — the
    per-provenance view of the funnel's decontamination stage (a
    source spiking here is scraping the eval benchmark; the global
    funnel row can't say WHICH one). Shares _curation_stages with the
    pipeline and the funnel — one stage definition, three consumers.

    Exactness: counts and 10⁶·dropped div candidates are all-integer.
    Scale: the candidate/clean relations are the pipeline's own; the
    rollup adds one |sources|-row combine over doc ids (a left
    anti-join marks the dropped set — hash-only, text never enters
    the new shuffles)."""
    _docs, _sel, _ded, candidates, clean = _curation_stages(
        spark, sf_dir
    )
    dropped = candidates.join(
        clean.select("doc_id"), "doc_id", "left_anti"
    )
    per_cand = candidates.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    per_drop = dropped.groupBy(F.col("source").alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("n_contaminated")
    )
    return (
        per_cand.join(
            per_drop, per_cand["source"] == per_drop["__s"], "left_outer"
        )
        .select(
            "source",
            "n_candidates",
            F.coalesce("n_contaminated", F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_ppm",
            F.expr("1000000 * n_contaminated div n_candidates"),
        )
    )


_DECONTAM_RATE_SQL = f"""
WITH {_CURATION_STAGE_CTES}
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN k.doc_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(1000000 * SUM(CASE WHEN k.doc_id IS NULL THEN 1 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS contamination_ppm
FROM candidates c LEFT JOIN clean k ON c.doc_id = k.doc_id
GROUP BY 1
"""

#: Fixed retrieval query for the BM25 demo (terms present in the
#: word-soup fixtures and in real prose alike).
_BM25_TERMS = ["spark", "table", "fast"]

#: The same list as a SQL IN-list literal, so every oracle that scopes
#: to the query terms derives from the ONE _BM25_TERMS definition.
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


def _bm25_per_doc_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-once per-doc term-frequency relation for the fixed
    query: ``(doc_id, dl, tf_0 .. tf_{|terms|-1})`` — 2+|terms| longs
    per doc, each ``tf_i`` counted straight off the token array
    (``size(filter(toks, = term_i))``), so NO explode and NO
    (doc, term) shuffle ever happens. The token array is aliased in
    its own projection so CollapseProject keeps one tokenization per
    row instead of inlining the regex split into every consumer.

    Persisted MEMORY_AND_DISK: the relation is scanned by the stats
    job, the scoring job, and (inside hybrid_rrf_search) the tf-idf
    ranker. The plan is deterministic and identical across callers, so
    Spark's CacheManager dedupes every persist() of it to ONE session
    entry of ~(2+|terms|)·8 bytes/doc — bounded model-adjacent state,
    3 orders smaller than the text column it replaces. This per-term
    column layout is the 100 TB shape for short queries (|terms| <=
    a few dozen); a thousand-term query would switch back to a
    (doc, term) explode + broadcast-idf join."""
    from pyspark import StorageLevel

    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")

    def _eq(term: str):
        return lambda x: x == F.lit(term)

    return (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select(
            "doc_id",
            F.size("_toks").cast("long").alias("dl"),
            *[
                F.size(F.filter("_toks", _eq(t))).cast("long").alias(f"tf_{i}")
                for i, t in enumerate(_BM25_TERMS)
            ],
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def doc_bm25_search(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """BM25 retrieval scoring (k1=1.2, b=0.75) of a fixed 3-term query
    over the corpus — the lexical-retrieval half of a RAG stack (and
    the candidate generator for retrieval-based decontamination).

    Shape at 100 TB (r7 rework — zero wide shuffles): per-doc tf for
    each query term comes straight off the token array in one map pass
    (`_bm25_per_doc_tf`), (n_docs, avgdl, df_0..df_n) return as ONE
    map-side-combined 1-row aggregate (one driver action — r6 paid two
    collect jobs here, a measured 1.73x regression), and the score is
    a pure per-row expression over the cached tf columns, so the final
    plan is scan → project → TakeOrderedAndProject (per-partition
    heaps, driver merges #partitions*k rows) — no explode, no
    (doc, term) shuffle, no join, no global sort; the rank window runs
    over the <= k rows the limit already selected.
    Deterministic ties: score desc, doc_id asc. Per-term scores land on
    a micro grid (round(s*1e6) as long) before the per-doc sum, so the
    accumulation is exact integer math — the same order-invariance rule
    doc_unigram_logprob uses — and the score reproduces bit-for-bit
    across engines and partitionings.

    Engine-exact idf (r6): ln() is libm-dependent in the last ulp, and
    a JVM-vs-DuckDB divergence landing exactly on a 1e-6 grid boundary
    would flip a score bit. So the |terms| idf values are computed ONCE
    on the driver with Python's math.log — CPython calls the C
    library's log(), the same libm DuckDB's ln() links on any
    same-host oracle — and folded into the score expression as
    literals. Everything else in the score is +,*,/ over identical
    expression trees, which are IEEE-deterministic across engines."""
    import math

    per_doc = _bm25_per_doc_tf(spark, sf_dir)
    n = len(_BM25_TERMS)
    # ONE bounded driver action: 1 row of corpus stats + per-term df.
    st = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(n)
        ],
    ).collect()[0]
    n_docs, avgdl = st["n_docs"], st["avgdl"]
    idf = [
        math.log((n_docs - st[f"df_{i}"] + 0.5) / (st[f"df_{i}"] + 0.5) + 1.0)
        for i in range(n)
    ]
    # Same per-(doc, term) expression tree as the join formulation:
    # s_i = idf_i * (tf*2.2) / (tf + 1.2*(1-0.75+0.75*dl/avgdl)),
    # micro-rounded per term, integer-summed per doc (tf=0 rounds to
    # an exact 0, matching the rows the explode+join version dropped).
    score_micro = None
    for i in range(n):
        s = (
            F.lit(idf[i])
            * (F.col(f"tf_{i}") * 2.2)
            / (
                F.col(f"tf_{i}")
                + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.lit(avgdl))
            )
        )
        term_micro = F.round(s * 1e6).cast("long")
        score_micro = term_micro if score_micro is None else score_micro + term_micro
    any_match = None
    for i in range(n):
        m = F.col(f"tf_{i}") > 0
        any_match = m if any_match is None else any_match | m
    scored = per_doc.filter(any_match).select(
        "doc_id", (score_micro / F.lit(1e6)).alias("bm25")
    )
    return (
        _ranked_topk(
            scored,
            [F.col("bm25").desc(), F.col("doc_id").asc()],
            "doc_id",
            k,
            "rank",
        ).select("doc_id", "bm25", "rank")
    )


def _bm25_sql(k: int = 10) -> str:
    return f"""
WITH stats AS (
  SELECT count(*) AS n_docs, avg(len({_TOKS_SQL})) AS avgdl FROM documents
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, len({_TOKS_SQL}) AS dl, unnest({_TOKS_SQL}) AS term
        FROM documents)
  WHERE term IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, dl, term
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         sum(CAST(round((ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))) * 1e6)
             AS BIGINT)) / 1000000.0 AS bm25
  FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, bm25, rank FROM (
  SELECT doc_id, bm25,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT)
           AS rank
  FROM scored) t
WHERE rank <= {k}
"""


_BM25_SQL = _bm25_sql(10)


def corpus_tfidf_topterms(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic keyword-extraction
    / document-signature pass (the unsupervised sibling of BM25: same
    tf/df statistics, document-centric instead of query-centric; feeds
    tagging, near-dup triage, and topic drift monitors over a corpus).

    Shape at 100 TB: the (doc_id, term) explode + groupBy is the exact
    term-frequency lower bound (same shuffle doc_repetition_filter
    pays); df aggregates the already-rolled-up tf rows (one narrow
    shuffle on term, map-side combinable since (doc,term) rows are
    distinct); N is a 1-row broadcast; the top-k window partitions by
    doc_id so no task ever sees more than one document's vocabulary.

    Scores land on a 1e-6 grid via floor(x*1e6 + 0.5) — the engine's
    one rounding convention — BEFORE ranking, so rank order (and the
    score itself) is bit-identical across engines; ties break on the
    term string.

    Engine-exact idf (r6): the grid fixes summation order but not
    transcendental drift — a last-ulp JVM-vs-libm ln() divergence
    landing exactly on a grid boundary would flip score_micro. So
    ln(N/df) is computed ONCE per DISTINCT df value on the driver with
    Python's math.log (CPython calls the C library log(), the same
    libm DuckDB's ln() links on a same-host oracle) and broadcast back
    as a (df -> idf) lookup. Driver traffic is the distinct df VALUES
    — never terms: bounded by the df of the most common term and
    Zipf-sparse above ~sqrt(N) in practice (hundreds at any corpus
    size), the same bounded-model-state contract the k-means collect
    follows. Residual assumption: driver Python and the oracle share
    libm (true same-host); even where they don't, drift is confined to
    the per-distinct-df constants, not per (doc, term) row."""
    import math

    from ..functions.text import tokens

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # cache(): the (doc, term) rollup feeds THREE consumers (df agg,
    # the distinct-df driver collect, and the scored join). Implicit
    # shuffle-stage reuse does NOT cover the third: AQE re-plans the
    # final two-join stage graph so its exchanges differ from the
    # collect job's (measured A/B: cache is ~20% faster here, while the
    # same cache on BM25's reused-verbatim lineage is 20% slower).
    # MEMORY_AND_DISK, so a vocabulary-scale intermediate spills
    # instead of evicting.
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        # eager checkpoint (r13): consumers include broadcast builds
        # that race a lazy cache and re-run the tokenize+explode agg
        .transform(checkpoint_stage)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # ONE driver action for both bounded stats (r7 job fold, the BM25
    # shape): the 1-row corpus count ∪ the distinct df VALUES.
    rows = (
        docs.agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(None).cast("long").alias("df"), "n")
        .unionByName(
            df_.select("df")
            .distinct()
            .select("df", F.lit(None).cast("long").alias("n"))
        )
        .collect()
    )
    n_docs = next(r["n"] for r in rows if r["df"] is None)
    idf_lookup = spark.createDataFrame(
        [
            (r["df"], math.log(n_docs / r["df"]))
            for r in rows
            if r["df"] is not None
        ],
        "df long, idf double",
    )
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(idf_lookup), "df")
        .withColumn(
            "score_micro",
            F.floor(
                F.col("tf") * F.col("idf") * F.lit(1e6) + F.lit(0.5)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            (F.col("score_micro") / F.lit(1e6)).alias("tfidf"),
            "term_rank",
        )
    )


_TFIDF_TOPTERMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT t.doc_id, t.term, t.tf,
         CAST(floor(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df) * 1e6 + 0.5)
              AS BIGINT) AS score_micro
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN nd n
)
SELECT doc_id, term, tf, score_micro / 1e6 AS tfidf, term_rank
FROM (
  SELECT doc_id, term, tf, score_micro,
         CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY score_micro DESC, term ASC) AS BIGINT) AS term_rank
  FROM scored) r
WHERE term_rank <= 5
"""


def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry anomaly flagging: per-event-type z-scores of the value
    reading, emitting only |z| >= 3 outliers — the monitoring pass the
    reference's averaging pipeline feeds in production. Two aggregation
    passes over the same partitioning (per-type moments, then the
    flagging scan); population std (DuckDB stddev_pop twin); zero-
    variance types yield no rows via try_divide NULL."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", F.try_divide(F.col("value") - F.col("mu"), F.col("sigma")))
        .filter(F.abs(F.col("z")) >= 3.0)
        .select("event_id", "event_type", "value", "z")
    )


_EVENT_OUTLIERS_SQL = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value, (e.value - s.mu) / s.sigma AS z
FROM events e JOIN stats s USING (event_type)
WHERE abs((e.value - s.mu) / s.sigma) >= 3.0
"""


def events_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-wins merge (the lakehouse MERGE INTO shape): a
    correction batch (every 100th event re-emitted 1 hour later with a
    doubled value — a deterministic stand-in for late-arriving fixes)
    is unioned with the base table and collapsed to the newest version
    per key (ties: higher value wins, making the pick total).

    At 100 TB this is one union + one shuffle on the key — and with
    both sides bucketed on event_id (storage.write_bucketed) the
    shuffle disappears; the window never sees more than
    |versions-per-key| rows per key."""
    ev = load_table(spark, sf_dir, "events")
    updates = ev.filter(F.col("event_id") % 100 == 0).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        "user_id",
        "event_type",
        (F.col("value") * 2).alias("value"),
        "props",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("ts").desc(), F.col("value").desc()
    )
    return (
        ev.unionByName(updates)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


_UPSERT_LATEST_SQL = """
WITH merged AS (
  SELECT event_id, ts, user_id, event_type, value, props FROM events
  UNION ALL
  SELECT event_id, ts + INTERVAL 1 HOUR, user_id, event_type, value * 2,
         props
  FROM events WHERE event_id % 100 = 0
)
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT merged.*,
         row_number() OVER (PARTITION BY event_id
           ORDER BY ts DESC, value DESC) AS rn
  FROM merged) t
WHERE rn = 1
"""
