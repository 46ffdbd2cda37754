"""Round-12 regression tests: the ADVICE.md items closed this round.

Each test pins a failure mode the round-11 advisor found — the
batch-composition-dependent scoreability in ``score_pairs_cosine`` and
the poisonable/raceable IVF-PQ model-cache keying.
"""

import pytest

from pyspark.sql import functions as F


def test_score_pairs_cosine_batch_independent(spark):
    """A pair of equal-length-but-short vectors must score even when a
    longer vector shares the Arrow batch; ragged pairs stay NULL; the
    result must equal the JVM ``cosine`` expression row-for-row
    (r11 ADVICE medium #1)."""
    from amazonmsk_emr_tem_data_spark.operators.similarity import (
        cosine,
        score_pairs_cosine,
    )

    rows = [
        # equal-length short pair in the same batch as the len-8 row
        (1, [1.0, 2.0, 3.0, 4.0], [4.0, 3.0, 2.0, 1.0]),
        # long pair sets the batch max
        (2, [1.0] * 8, [0.5] * 8),
        # ragged pair -> NULL (zip_with NULL-fold)
        (3, [1.0, 2.0, 3.0, 4.0], [1.0] * 8),
        # NULL side -> NULL
        (4, None, [1.0, 2.0, 3.0, 4.0]),
        # zero vector -> NULL (try_divide)
        (5, [0.0, 0.0, 0.0, 0.0], [1.0, 2.0, 3.0, 4.0]),
        # another short pair, different length again
        (6, [2.0, 2.0], [3.0, 5.0]),
    ]
    pairs = spark.createDataFrame(
        rows, "pid long, a array<double>, b array<double>"
    ).coalesce(1)  # force one Arrow batch: the r11 bug needs co-residency

    got = {
        r["pid"]: r["cos_sim"]
        for r in score_pairs_cosine(pairs, "a", "b", ("pid",)).collect()
    }
    want = {
        r["pid"]: r["cos_sim"]
        for r in pairs.select(
            "pid", cosine(F.col("a"), F.col("b")).alias("cos_sim")
        ).collect()
    }
    assert set(got) == set(want)
    for pid in want:
        if want[pid] is None:
            assert got[pid] is None, pid
        else:
            assert got[pid] == want[pid], pid  # bit-identical
    assert want[1] is not None and want[6] is not None
    assert want[3] is None and want[4] is None and want[5] is None


def test_ivfpq_cache_keyed_on_content(spark, tmp_path):
    """Two datasets whose sf_dir shares a BASENAME but holds different
    embeddings must never share a persisted-model cache entry: the
    served top-k for the second dataset must equal its own fresh-fit
    results, not the first dataset's (r11 ADVICE medium #2)."""
    import duckdb

    from amazonmsk_emr_tem_data_spark.queries import (
        embedding_ivfpq_topk,
        ivfpq_persisted_topk,
    )

    con = duckdb.connect()
    for tag, pred in (("a", "vec_id < 400"), ("b", "vec_id >= 100")):
        d = tmp_path / tag / "sf_same"  # identical basename on purpose
        d.mkdir(parents=True)
        con.execute(
            "COPY (SELECT * FROM "
            "'/root/testdata/sf0.001/embeddings.parquet' "
            f"WHERE {pred}) TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
        )
    dir_a = str(tmp_path / "a" / "sf_same")
    dir_b = str(tmp_path / "b" / "sf_same")
    # prime the cache on dataset a, then serve dataset b
    ivfpq_persisted_topk(spark, dir_a).collect()
    served_b = sorted(
        map(tuple, ivfpq_persisted_topk(spark, dir_b).collect())
    )
    fresh_b = sorted(
        map(tuple, embedding_ivfpq_topk(spark, dir_b).collect())
    )
    assert served_b == fresh_b


def test_weighted_priority_sample_semantics(spark):
    """A-ES invariants on the sf0.001 fixture: keys are the iterated
    sqrt of the grid draw (so in (0,1]), the quantization band is the
    exact integer floor(log2(w)), and the weighted sample
    overrepresents heavy documents vs the corpus mean."""
    import math

    import duckdb

    from amazonmsk_emr_tem_data_spark.queries import (
        weighted_priority_sample,
    )

    rows = weighted_priority_sample(
        spark, "/root/testdata/sf0.001", n=80
    ).collect()
    assert len(rows) == 80
    assert len({r["doc_id"] for r in rows}) == 80  # without replacement
    for r in rows:
        assert 0.0 < r["aes_key"] <= 1.0
        w = max(r["n_chars"] or 1, 1)
        assert r["w_log2"] == min(int(math.log2(w)), 16)
    corpus_mean = duckdb.sql(
        "SELECT avg(n_chars) FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean, (
        "weighted sampling must favor long documents"
    )
