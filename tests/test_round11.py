"""Round-11 regression tests: the ADVICE.md items closed this round.

Each test pins a failure mode the round-10 advisor found — empty-corpus
TypeErrors on `.first()[0]` and the JPEG non-interleaved multi-scan
gate — so the guards cannot silently regress.
"""

import struct

import pytest


def _empty_embeddings(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label string"
    )


def test_nn_descent_empty_corpus(spark):
    """nn_descent_graph on an empty embeddings table returns the
    documented empty (vec_id, nbr_id, cos_sim, rank) frame instead of
    TypeError on first()[0] (r10 ADVICE)."""
    from amazonmsk_emr_tem_data_spark.operators.similarity import (
        nn_descent_graph,
    )

    out = nn_descent_graph(_empty_embeddings(spark))
    assert out.columns == ["vec_id", "nbr_id", "cos_sim", "rank"]
    assert out.count() == 0


def test_power_model_empty_corpus(spark):
    """power_model honors its 'None on an empty corpus' contract, and
    top_eigenvector_power's empty-schema branch (formerly dead code)
    actually runs (r10 ADVICE)."""
    from amazonmsk_emr_tem_data_spark.operators.clustering import (
        power_model,
        top_eigenvector_power,
    )

    emb = _empty_embeddings(spark)
    assert power_model(emb) is None
    out = top_eigenvector_power(spark, emb)
    assert out.columns == [
        "dim_idx", "eig_e6", "explained_ppm", "var_mean_e12",
    ]
    assert out.count() == 0


def test_jpeg_multiscan_gate(spark):
    """A baseline JPEG whose SOS covers only a subset of the frame
    components (legal non-interleaved multi-scan, T.81 B.2.3) raises
    the uniform guarded gate — not an opaque numpy reshape error, and
    never a silent zeros plane (r10 ADVICE)."""
    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        decode_images,
    )

    from .test_northstar import _jpeg_bytes

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    full = _jpeg_bytes(arr, quality=92)
    sos_at = full.find(b"\xff\xda")
    assert sos_at > 0
    old_len = struct.unpack_from(">H", full, sos_at + 2)[0]
    # splice in a single-component SOS (component 1 only) in place of
    # the interleaved 3-component one; entropy data is untouched — the
    # gate must fire before any entropy decode
    new_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes(
        [1, 1, 0x00, 0, 63, 0]
    )
    patched = full[:sos_at] + new_sos + full[sos_at + 2 + old_len:]
    df = spark.createDataFrame(
        [(1, bytearray(patched))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="non-interleaved|NotImplemented"):
        decode_images(df, fake=False).collect()
    # and the interleaved original still decodes
    ok = spark.createDataFrame(
        [(1, bytearray(full))], "doc_id long, payload binary"
    )
    assert decode_images(ok, fake=False).count() == 1


def test_ann_model_roundtrip(spark, tmp_path):
    """save_ann_model -> load_ann_model is bit-exact: every float in
    centroids, codebooks, and planes comes back IEEE-identical (the
    property the persisted-serve query's shared oracle relies on)."""
    from amazonmsk_emr_tem_data_spark.operators.similarity import (
        load_ann_model,
        save_ann_model,
    )

    # awkward doubles on purpose: subnormal-adjacent, non-dyadic,
    # negative zero, huge/tiny exponents
    cents = [[0.1, -0.0, 1e-300], [2.0 / 3.0, 5e300, -1.5e-17]]
    books = [
        [[0.1 + 0.2, 1.0 / 3.0], [7e-12, -3.25]],
        [[1e16 + 1.0, 0.30000000000000004], [-0.1, 2.2250738585072014e-308]],
    ]
    planes = [[0.5, -1.0 / 7.0, 9.9], [1.25, 0.0, -5e-5]]
    path = str(tmp_path / "annmodel")
    save_ann_model(
        spark, path, centroids=cents, codebooks=books, planes=planes
    )
    model = load_ann_model(spark, path)
    assert model["centroids"] == cents
    assert model["codebooks"] == books
    assert model["planes"] == planes
    # partial models load only what exists
    path2 = str(tmp_path / "annmodel2")
    save_ann_model(spark, path2, centroids=cents)
    assert set(load_ann_model(spark, path2)) == {"centroids"}


def test_ivfpq_persisted_matches_fit_path(spark, sf_dir):
    """The persisted-serve query returns row-identical results to the
    in-memory fit path — fit-once/serve-many loses nothing."""
    from amazonmsk_emr_tem_data_spark.queries import REGISTRY

    fit = REGISTRY["embedding_ivfpq_topk"][0](spark, sf_dir)
    served = REGISTRY["ivfpq_persisted_topk"][0](spark, sf_dir)
    assert sorted(map(tuple, fit.collect())) == sorted(
        map(tuple, served.collect())
    )


def test_hyperball_registers_are_exact_ball_bottomk(spark):
    """On a hand graph, the iterated KMV register equals bottom-k of
    the EXACT ball's hashes (merge losslessness), sub-k balls report
    exact sizes, and the saturated estimator is the integer
    Bar-Yossef formula."""
    from amazonmsk_emr_tem_data_spark.operators.graph import hyperball_kmv

    # path 1-2-3-4-5-6-7-8-9-10 plus a clique 20..29: node 5's 2-ball
    # is {3,4,5,6,7} (exact, < k); clique nodes saturate k=4
    path = [(i, i + 1) for i in range(1, 10)]
    clique = [
        (i, j) for i in range(20, 30) for j in range(i + 1, 30)
    ]
    edges = spark.createDataFrame(path + clique, "a long, b long")
    out = {
        r["node"]: r
        for r in hyperball_kmv(edges, rounds=2, k=4).collect()
    }
    assert out[5]["n_regs"] == 4  # capped at k even though ball is 5
    assert out[1]["n_regs"] == 3 and out[1]["est_ball"] == 3  # {1,2,3}
    # clique node: ball = all 10 clique nodes -> saturated estimate
    r = out[25]
    assert r["n_regs"] == 4
    assert r["est_ball"] == (3 * (1 << 60)) // (r["kmin_max"] + 1)


def test_hyperball_register_is_bottomk_of_exact_ball(spark):
    """Cross-check the distributed register content itself: node 5's
    register must be exactly the k smallest hashes of its true 2-ball
    {3,4,5,6,7}."""
    from amazonmsk_emr_tem_data_spark.functions.text import md5_hash64
    from amazonmsk_emr_tem_data_spark.operators.graph import hyperball_kmv
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "a long, b long"
    )
    reg = (
        hyperball_kmv(edges, rounds=2, k=4)
        .filter(F.col("node") == 5)
        .first()
    )
    ball = spark.createDataFrame(
        [(n,) for n in (3, 4, 5, 6, 7)], "w long"
    ).select(
        md5_hash64(F.concat_ws("|", F.lit("hb1"), F.col("w"))).alias("h")
    )
    hs = sorted(r["h"] for r in ball.collect())
    assert reg["kmin_max"] == hs[3]
    assert reg["n_regs"] == 4
