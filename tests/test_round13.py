"""Round-13 additions: crash-atomic reservoir generations, the IMA
ADPCM stereo block-align guard, and even frame sampling (r12 ADVICE
items), plus the round's new operators."""

from __future__ import annotations

import os
import struct

import pytest


# ---------------------------------------------------------------------------
# r12 ADVICE #1: reservoir store crash-atomicity (generation + manifest)
# ---------------------------------------------------------------------------


def _docs_parts(spark):
    from amazonmsk_emr_tem_data_spark.sources.files import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return [
        docs.filter(f"doc_id % 3 = {i}").localCheckpoint(eager=True)
        for i in range(3)
    ]


def test_reservoir_generation_commit_and_gc(spark, tmp_path):
    """Each batch publishes a FRESH generation and swaps the manifest;
    the superseded generation is swept, so steady state is one
    committed generation + MANIFEST."""
    from amazonmsk_emr_tem_data_spark.streaming.pipelines import (
        priority_sample_batch,
        read_priority_store,
    )

    store = str(tmp_path / "reservoir")
    parts = _docs_parts(spark)
    priority_sample_batch(parts[0], store, n=50)
    assert open(os.path.join(store, "MANIFEST")).read().strip() == "1"
    priority_sample_batch(parts[1], store, n=50)
    assert open(os.path.join(store, "MANIFEST")).read().strip() == "2"
    gens = sorted(d for d in os.listdir(store) if d.startswith("gen-"))
    assert gens == ["gen-000002"]  # gen-000001 swept after commit
    assert read_priority_store(spark, store).count() == 50


def test_reservoir_crashed_overwrite_keeps_prior_state(spark, tmp_path):
    """The r12 ADVICE scenario: a crash mid-write must NOT reset the
    reservoir. A torn (uncommitted) generation dir left next to a
    committed one is invisible to readers and replaced by the replay,
    and the final state equals the batch sampler's answer."""
    from amazonmsk_emr_tem_data_spark.queries import (
        weighted_priority_sample,
    )
    from amazonmsk_emr_tem_data_spark.streaming.pipelines import (
        _reservoir_read,
        priority_sample_batch,
        read_priority_store,
    )

    store = str(tmp_path / "reservoir")
    parts = _docs_parts(spark)
    priority_sample_batch(parts[0], store, n=100)
    priority_sample_batch(parts[1], store, n=100)
    committed = sorted(
        map(tuple, read_priority_store(spark, store).collect())
    )
    # simulate batch 3 crashing mid-write: torn gen dir, manifest not
    # swapped (the manifest replace IS the commit point)
    torn = os.path.join(store, "gen-000003")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-junk.parquet"), "wb") as f:
        f.write(b"\x00not parquet")
    df, gen = _reservoir_read(spark, store)
    assert gen == 2
    assert sorted(map(tuple, df.collect())) == committed  # prior state
    # the replayed batch replaces the torn dir and commits cleanly
    priority_sample_batch(parts[2], store, n=100)
    assert open(os.path.join(store, "MANIFEST")).read().strip() == "3"
    got = sorted(map(tuple, read_priority_store(spark, store).collect()))
    want = sorted(
        map(
            tuple,
            weighted_priority_sample(
                spark, "/root/testdata/sf0.001", n=100
            ).collect(),
        )
    )
    assert got == want


def test_reservoir_crash_before_first_commit_is_first_batch(
    spark, tmp_path
):
    """A first-generation write that crashed before the manifest swap
    leaves gen dirs but no MANIFEST: logically nothing ever committed,
    so the replay rebuilds from scratch instead of erroring out."""
    from amazonmsk_emr_tem_data_spark.streaming.pipelines import (
        _reservoir_read,
        priority_sample_batch,
        read_priority_store,
    )

    store = str(tmp_path / "reservoir")
    torn = os.path.join(store, "gen-000001")
    os.makedirs(torn)
    df, gen = _reservoir_read(spark, store)
    assert df is None and gen == 1
    parts = _docs_parts(spark)
    priority_sample_batch(parts[0], store, n=25)
    assert read_priority_store(spark, store).count() == 25


def test_reservoir_empty_existing_dir_still_corrupt(spark, tmp_path):
    """An existing dir with neither MANIFEST nor generations is a
    mis-pointed store (e.g. the bare-mkdtemp footgun) — refuse loudly
    rather than silently treating it as an empty reservoir."""
    from amazonmsk_emr_tem_data_spark.streaming.pipelines import (
        _reservoir_read,
    )

    empty = tmp_path / "pre_created"
    empty.mkdir()
    with pytest.raises(ValueError, match="no MANIFEST"):
        _reservoir_read(spark, str(empty))


# ---------------------------------------------------------------------------
# r12 ADVICE #2: IMA ADPCM stereo block-align guard
# ---------------------------------------------------------------------------


def test_ima_adpcm_bad_stereo_block_align_clean_error():
    """n_ch=2, blk_align=12 passed the old `%4` guard and died inside
    a numpy reshape; the guard now requires whole 4-byte-per-channel
    data units and raises the documented error instead."""
    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    blk_align, n_ch = 12, 2
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, n_ch, 8000, 8000, blk_align, 4, 2, 3
    )
    body = bytes(blk_align * 2)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    with pytest.raises(ValueError, match="block align"):
        _pure_decoders()["wav"](wav)


def test_ima_adpcm_minimal_valid_stereo_align_still_decodes():
    """blk_align = 4*n_ch + 4*n_ch (one data unit per channel) is the
    smallest legal stereo block and must still decode (guard is tight,
    not over-broad): 9 samples/block, predictors = sample 0."""
    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    n_ch, blk_align = 2, 16
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, n_ch, 8000, 8000, blk_align, 4, 2, 9
    )
    # header: per channel int16 predictor + step index 0 + reserved;
    # data: one 4-byte unit per channel, all-zero nibbles (code 0 ->
    # pred += step>>3 with step 7 -> pred stays close to 0)
    hdr = struct.pack("<hBB", 100, 0, 0) + struct.pack("<hBB", -100, 0, 0)
    body = hdr + bytes(8)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    rate, out = _pure_decoders()["wav"](wav)
    assert rate == 8000
    assert out.shape == (9, 2)
    assert out[0].tolist() == [100, -100]
    assert np.abs(out[:, 0] - 100).max() <= 8  # code-0 drift only


# ---------------------------------------------------------------------------
# r12 ADVICE #3: sample_frames(fake=False) even spread
# ---------------------------------------------------------------------------


def test_sample_frames_spread_covers_back_half(spark):
    """7 planted frames, n_frames=4: the old head-biased stride picked
    frames 0-3; even spacing must hit 0,2,4,6 — first AND last."""
    import hashlib

    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        sample_frames,
    )

    from .test_northstar import _jpeg_bytes
    from .test_round12 import _mjpeg_avi_bytes

    rng = np.random.default_rng(13)
    frames = [
        _jpeg_bytes(rng.integers(0, 255, (8, 8, 3)).astype(np.uint8))
        for _ in range(7)
    ]
    avi = _mjpeg_avi_bytes(frames)
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id long, payload binary"
    )
    got = sorted(
        (r["frame_idx"], r["frame_sha256"])
        for r in sample_frames(df, n_frames=4, fake=False).collect()
    )
    want = [
        (fi, hashlib.sha256(
            frames[p].hex().upper().encode("ascii")
        ).hexdigest())
        for fi, p in enumerate([0, 2, 4, 6])
    ]
    assert got == want


# ---------------------------------------------------------------------------
# r12 VERDICT ask #6: streaming ANN ingest near-dedup
# ---------------------------------------------------------------------------


def _ann_parts(spark, sf):
    from amazonmsk_emr_tem_data_spark.queries._registry import (
        _persisted_ann_model,
    )
    from amazonmsk_emr_tem_data_spark.sources.files import load_table

    emb = load_table(spark, sf, "embeddings")
    model = _persisted_ann_model(spark, sf)
    return emb, model["centroids"]


def _ann_state(spark, store):
    from amazonmsk_emr_tem_data_spark.streaming.pipelines import (
        read_ann_ingest_store,
    )

    return sorted(map(tuple, read_ann_ingest_store(spark, store).collect()))


def test_ann_ingest_multibatch_out_of_order_replay_equals_batch(
    spark, tmp_path
):
    """The order-insensitivity proof: three id-interleaved micro-batches
    folded out of id order WITH one batch replayed land on exactly the
    single-batch state — the within-batch / store-vs-arrival /
    retro-demotion cases all fire and still compose to 'duplicate iff
    ANY smaller-id same-cell neighbor'."""
    from amazonmsk_emr_tem_data_spark.streaming.pipelines import (
        ann_ingest_batch,
    )

    sf = "/root/testdata/sf0.001"
    emb, cents = _ann_parts(spark, sf)
    parts = [
        emb.filter(f"vec_id % 3 = {i}").localCheckpoint(eager=True)
        for i in range(3)
    ]
    store_multi = str(tmp_path / "multi")
    for b in [parts[2], parts[0], parts[0], parts[1]]:  # replay part 0
        ann_ingest_batch(b, store_multi, cents)
    store_single = str(tmp_path / "single")
    ann_ingest_batch(emb, store_single, cents)
    got = _ann_state(spark, store_multi)
    want = _ann_state(spark, store_single)
    assert got == want
    # non-vacuous: the fixture has near-dups, so both flags exist
    flags = {r[2] for r in want}
    assert flags == {True, False}


def test_ann_ingest_retro_demotion(spark, tmp_path):
    """A smaller-id vector arriving AFTER its larger-id near-dup must
    retro-demote the earlier arrival: ingest high ids first, then low
    ids, and compare against the id-ordered schedule."""
    from amazonmsk_emr_tem_data_spark.streaming.pipelines import (
        ann_ingest_batch,
    )

    sf = "/root/testdata/sf0.001"
    emb, cents = _ann_parts(spark, sf)
    hi = emb.filter("vec_id >= 100").localCheckpoint(eager=True)
    lo = emb.filter("vec_id < 100").localCheckpoint(eager=True)
    s1 = str(tmp_path / "rev")
    ann_ingest_batch(hi, s1, cents)
    mid = _ann_state(spark, s1)
    ann_ingest_batch(lo, s1, cents)
    s2 = str(tmp_path / "fwd")
    ann_ingest_batch(lo, s2, cents)
    ann_ingest_batch(hi, s2, cents)
    final = _ann_state(spark, s1)
    assert final == _ann_state(spark, s2)
    # at least one high-id vector was canonical mid-stream and got
    # demoted by a later-arriving smaller-id neighbor
    mid_canon = {r[0] for r in mid if r[2]}
    final_canon = {r[0] for r in final if r[2]}
    assert mid_canon - final_canon, "schedule exercised no retro-demotion"


def test_ann_ingest_torn_append_crash_recovers(spark, tmp_path, monkeypatch):
    """Crash-atomicity of the two-append commit: tear exactly the
    vectors-committed/demotions-missing window, then replay the batch —
    the replay re-derives the demotions from the full batch while the
    vector append anti-joins to a no-op, landing on the clean-schedule
    state."""
    from amazonmsk_emr_tem_data_spark.streaming import pipelines as pl

    sf = "/root/testdata/sf0.001"
    emb, cents = _ann_parts(spark, sf)
    hi = emb.filter("vec_id >= 100").localCheckpoint(eager=True)
    lo = emb.filter("vec_id < 100").localCheckpoint(eager=True)
    store = str(tmp_path / "torn")
    pl.ann_ingest_batch(hi, store, cents)

    real = pl._ann_append_demotions

    def torn(demoted, dem_dir):
        raise RuntimeError("injected crash between the two appends")

    monkeypatch.setattr(pl, "_ann_append_demotions", torn)
    with pytest.raises(RuntimeError, match="injected crash"):
        pl.ann_ingest_batch(lo, store, cents)
    monkeypatch.setattr(pl, "_ann_append_demotions", real)
    pl.ann_ingest_batch(lo, store, cents)  # the foreachBatch replay
    clean = str(tmp_path / "clean")
    pl.ann_ingest_batch(hi, clean, cents)
    pl.ann_ingest_batch(lo, clean, cents)
    assert _ann_state(spark, store) == _ann_state(spark, clean)


def test_ann_ingest_store_never_shuffles(spark, tmp_path):
    """Plan contract: the per-batch near-dup join broadcasts the
    arrivals against the store scan — no Exchange on the store side,
    no SortMergeJoin, no CartesianProduct."""
    from amazonmsk_emr_tem_data_spark.operators.similarity import (
        cosine,
        with_ivf_cell,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    emb, cents = _ann_parts(spark, sf)
    from amazonmsk_emr_tem_data_spark.streaming.pipelines import (
        ann_ingest_batch,
    )

    store = str(tmp_path / "plan")
    ann_ingest_batch(emb.filter("vec_id >= 100"), store, cents)
    arr = with_ivf_cell(emb.filter("vec_id < 100"), cents).select(
        F.col("vec_id").alias("b_id"),
        "ivf_cell",
        F.col("embedding").alias("b_emb"),
    )
    j = (
        spark.read.parquet(os.path.join(store, "vectors"))
        .select(
            F.col("vec_id").alias("s_id"),
            "ivf_cell",
            F.col("embedding").alias("s_emb"),
        )
        .join(F.broadcast(arr), "ivf_cell")
        .filter(cosine(F.col("s_emb"), F.col("b_emb")) >= 0.45)
        .select("s_id", "b_id")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sample_frames_fewer_frames_than_requested(spark):
    """m <= n_frames returns every frame exactly once (no duplicate
    picks from index rounding)."""
    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        sample_frames,
    )

    from .test_northstar import _jpeg_bytes
    from .test_round12 import _mjpeg_avi_bytes

    rng = np.random.default_rng(14)
    frames = [
        _jpeg_bytes(rng.integers(0, 255, (8, 8, 3)).astype(np.uint8))
        for _ in range(2)
    ]
    df = spark.createDataFrame(
        [(1, bytearray(_mjpeg_avi_bytes(frames)))],
        "doc_id long, payload binary",
    )
    out = sample_frames(df, n_frames=4, fake=False).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 1]
