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
# r12 VERDICT ask #8: MS ADPCM (WAV format 2)
# ---------------------------------------------------------------------------

_MS_COEFF1 = [256, 512, 0, 192, 240, 460, 392]
_MS_COEFF2 = [0, -256, 0, 64, 0, -208, -232]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]


def _ms_decode_code(code, s1, s2, c1, c2, idelta):
    """Scalar MS ADPCM step — the independent reference for both the
    in-test encoder and the engine decoder."""
    signed = code - 16 if code >= 8 else code
    pred = ((s1 * c1 + s2 * c2) >> 8) + signed * idelta
    pred = max(-32768, min(32767, pred))
    idelta = max(16, (_MS_ADAPT[code] * idelta) >> 8)
    return pred, idelta


def _ms_wav_bytes(samples, rate=8000, bpred=None, spb=500):
    """Encode an (n, ch) int16 array as an MS ADPCM WAV (format 2):
    per-channel predictor byte + idelta/sample1/sample2 header, then
    high-nibble-first channel-interleaved 4-bit codes."""
    import numpy as np

    samples = np.asarray(samples, dtype=np.int64)
    n, ch = samples.shape
    bpred = bpred or [0] * ch
    blk_align = 7 * ch + (spb - 2) * ch // 2
    blocks = b""
    for b0 in range(0, n, spb):
        blk = samples[b0 : b0 + spb]
        if len(blk) < spb:
            blk = np.vstack([blk, np.repeat(blk[-1:], spb - len(blk), 0)])
        idelta = [32] * ch
        s2 = [int(blk[0, c]) for c in range(ch)]
        s1 = [int(blk[1, c]) for c in range(ch)]
        hdr = bytes(bpred)
        for arr in (idelta, s1, s2):
            for c in range(ch):
                hdr += struct.pack("<h", arr[c])
        codes = []
        st1, st2, sid = list(s1), list(s2), list(idelta)
        for t in range(2, spb):
            for c in range(ch):
                c1, c2 = _MS_COEFF1[bpred[c]], _MS_COEFF2[bpred[c]]
                base = (st1[c] * c1 + st2[c] * c2) >> 8
                want = int(blk[t, c])
                code = max(-8, min(7, round((want - base) / sid[c])))
                code &= 0x0F
                pred, sid[c] = _ms_decode_code(
                    code, st1[c], st2[c], c1, c2, sid[c]
                )
                st2[c] = st1[c]
                st1[c] = pred
                codes.append(code)
        body = bytearray()
        for j in range(0, len(codes), 2):
            body.append((codes[j] << 4) | codes[j + 1])
        blocks += hdr + bytes(body)
    byte_rate = rate * blk_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 2, ch, rate, byte_rate, blk_align, 4, 2, spb
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(blocks))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(blocks)) + blocks
    )


def test_wav_ms_adpcm_decode():
    """The vectorized MS ADPCM decoder must reproduce the scalar
    reference decode bit-for-bit — mono and stereo, multiple blocks,
    per-channel predictor coefficients — and track the waveform."""
    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    wav_array = _pure_decoders()["wav"]
    t = np.arange(1500)
    mono = (np.sin(t / 11.0) * 9000 + np.sin(t / 97.0) * 7000).astype(
        np.int64
    ).reshape(-1, 1)
    stereo = np.stack(
        [mono[:, 0], (np.cos(t / 29.0) * 12000).astype(np.int64)], axis=1
    )
    for arr, rate, bpred in (
        (mono, 8000, [1]),
        (stereo, 22050, [0, 4]),
    ):
        n, ch = arr.shape
        payload = _ms_wav_bytes(arr, rate=rate, bpred=bpred)
        got_rate, got = wav_array(payload)
        assert got_rate == rate
        # scalar reference decode of the SAME bytes
        spb = 500
        blk_align = 7 * ch + (spb - 2) * ch // 2
        data_at = payload.index(b"data") + 8
        want = []
        pos = data_at
        while pos + blk_align <= len(payload):
            bp = list(payload[pos : pos + ch])
            vals = struct.unpack_from(f"<{3 * ch}h", payload, pos + ch)
            idelta = list(vals[:ch])
            s1 = list(vals[ch : 2 * ch])
            s2 = list(vals[2 * ch :])
            want.append(list(s2))
            want.append(list(s1))
            nibbles = []
            for byte in payload[pos + 7 * ch : pos + blk_align]:
                nibbles.append(byte >> 4)
                nibbles.append(byte & 0x0F)
            row = []
            for j, code in enumerate(nibbles):
                c = j % ch
                pred, idelta[c] = _ms_decode_code(
                    code, s1[c], s2[c],
                    _MS_COEFF1[bp[c]], _MS_COEFF2[bp[c]], idelta[c],
                )
                s2[c] = s1[c]
                s1[c] = pred
                row.append(pred)
                if c == ch - 1:
                    want.append(row)
                    row = []
            pos += blk_align
        assert got.tolist() == want
        err = np.abs(np.asarray(want)[:n] - arr).mean()
        assert err < 600, err


def test_wav_ms_adpcm_malformed_block_align():
    """Short or non-integral block aligns raise the documented error,
    not a numpy reshape crash."""
    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    fmt = struct.pack("<HHIIHHHH", 2, 2, 8000, 8000, 14, 4, 2, 2)
    body = bytes(28)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    with pytest.raises(ValueError, match="MS ADPCM block align"):
        _pure_decoders()["wav"](wav)


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


# ---------------------------------------------------------------------------
# r12 VERDICT ask #2: int8 prefilter for NN-Descent — kept opt-in
# (measured-rejected as the default at dim=64; see the A/B numbers at
# operators/similarity.py nn_descent_graph). The certificate claim is
# that prefilter=True is LOSSLESS: bit-identical output.
# ---------------------------------------------------------------------------


def test_nn_descent_prefilter_bit_identical(spark):
    from amazonmsk_emr_tem_data_spark.operators.similarity import (
        nn_descent_graph,
    )
    from amazonmsk_emr_tem_data_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = nn_descent_graph(emb, k=4, iters=2, prefilter=False)
    pref = nn_descent_graph(emb, k=4, iters=2, prefilter=True)
    cols = base.columns
    assert pref.columns == cols
    a = [tuple(r) for r in base.orderBy(*cols).collect()]
    b = [tuple(r) for r in pref.orderBy(*cols).collect()]
    assert a == b and len(a) > 0


def test_nn_descent_prefilter_bounds_certificate(spark):
    """The int8 bounds actually bracket the exact cosine on real
    vectors — the inequality the pruning proof rests on."""
    import pyspark.sql.functions as F

    from amazonmsk_emr_tem_data_spark.operators.similarity import (
        _approx_pair_bounds,
        _int8_sig_table,
        cosine,
    )
    from amazonmsk_emr_tem_data_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(
        64
    )
    norm = emb.select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("v")
    )
    sig = _int8_sig_table(norm)
    pairs = (
        norm.alias("x")
        .join(norm.alias("y"), F.col("x.vid") < F.col("y.vid"))
        .select(
            F.col("x.vid").alias("a"),
            F.col("y.vid").alias("b"),
            F.col("x.v").alias("va"),
            F.col("y.v").alias("vb"),
        )
        .limit(500)
    )
    siga = sig.select(
        F.col("vid").alias("a"),
        F.col("sig").alias("sa"),
        F.col("sig_r").alias("ra"),
    )
    sigb = sig.select(
        F.col("vid").alias("b"),
        F.col("sig").alias("sb"),
        F.col("sig_r").alias("rb"),
    )
    exact = pairs.withColumn(
        "cs", cosine(F.col("va"), F.col("vb"))
    ).select("a", "b", "cs")
    bounds = _approx_pair_bounds(
        pairs.select("a", "b").join(siga, "a").join(sigb, "b")
    )
    rows = exact.join(bounds, ["a", "b"]).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["lb"] - 1e-9 <= r["cs"] <= r["ub"] + 1e-9, (
            r["a"],
            r["b"],
            r["lb"],
            r["cs"],
            r["ub"],
        )
