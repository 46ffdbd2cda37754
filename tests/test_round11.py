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


def _chunk(ctype, body):
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_rows(byte_rows, bpp, filters):
    """PNG-filter a (rows, stride) uint8 byte raster (the encoder
    mirror of the decoder's byte-level unfilter)."""
    import numpy as np

    h, stride = byte_rows.shape
    flat = byte_rows.astype(np.int64)
    out = b""
    for y in range(h):
        ft = filters[y % len(filters)]
        line = flat[y]
        prior = flat[y - 1] if y > 0 else np.zeros(stride, np.int64)
        if ft == 0:
            enc = line
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
            enc = (line - left) & 0xFF
        elif ft == 2:
            enc = (line - prior) & 0xFF
        elif ft == 3:
            left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
            enc = (line - ((left + prior) >> 1)) & 0xFF
        else:
            enc = np.zeros(stride, np.int64)
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (int(line[x]) - pred) & 0xFF
        out += bytes([ft]) + enc.astype("uint8").tobytes()
    return out


_ADAM7_GRID = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png16_bytes(arr16, interlace=0):
    """16-bit PNG encoder for fixtures: big-endian samples, filter
    types cycling 0..4 per scanline, optional Adam7."""
    import struct
    import zlib

    import numpy as np

    h, w, c = arr16.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = 2 * c
    be = arr16.astype(">u2")

    def rows(sub):
        sh, sw, _ = sub.shape
        return np.frombuffer(sub.tobytes(), np.uint8).reshape(
            sh, sw * bpp
        )

    if interlace == 0:
        raster = _filter_rows(rows(be), bpp, [0, 1, 2, 3, 4])
    else:
        raster = b""
        for x0, y0, dx, dy in _ADAM7_GRID:
            sub = be[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raster += _filter_rows(rows(sub), bpp, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raster))
        + _chunk(b"IEND", b"")
    )


def _png8_adam7_bytes(arr):
    """8-bit Adam7 PNG encoder: each pass filtered independently with
    the full 0..4 filter cycle."""
    import struct
    import zlib

    import numpy as np

    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raster = b""
    for x0, y0, dx, dy in _ADAM7_GRID:
        sub = arr[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            byte_rows = sub.reshape(sub.shape[0], sub.shape[1] * c)
            raster += _filter_rows(byte_rows, c, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raster))
        + _chunk(b"IEND", b"")
    )


def test_png_16bit_decode():
    """16-bit PNGs (gray and RGB, every filter type) decode exactly:
    the output is the per-sample high byte of the true 16-bit data
    (r11; formerly a guarded gate)."""
    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    png = _pure_decoders()["png"]
    rng = np.random.default_rng(16)
    for c in (1, 3, 4):
        arr16 = rng.integers(0, 65536, (13, 11, c), dtype=np.uint16)
        out = png(_png16_bytes(arr16))
        assert out.shape == (13, 11, c)
        assert (out == (arr16 >> 8).astype(np.uint8)).all()


def test_png_adam7_decode():
    """Adam7-interlaced PNGs (8- and 16-bit, odd dimensions so passes
    are partial) deinterlace to the exact raster (r11; formerly a
    guarded gate)."""
    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    png = _pure_decoders()["png"]
    rng = np.random.default_rng(7)
    for h, w, c in ((13, 11, 3), (9, 17, 1), (8, 8, 4), (1, 1, 3),
                    (3, 19, 2)):
        arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        out = png(_png8_adam7_bytes(arr))
        assert out.shape == (h, w, c)
        assert (out == arr).all(), (h, w, c)
    arr16 = rng.integers(0, 65536, (13, 11, 3), dtype=np.uint16)
    out = png(_png16_bytes(arr16, interlace=1))
    assert (out == (arr16 >> 8).astype(np.uint8)).all()


def test_png_sub8_decode():
    """1/2/4-bit gray and palette PNGs (interlace 0 and Adam7) decode
    natively (r11): MSB-first unpack, byte-aligned row padding, exact
    255/(2^d-1) gray expansion, PLTE lookup — PNG IHDR coverage is
    now complete."""
    import struct
    import zlib

    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    png = _pure_decoders()["png"]
    rng = np.random.default_rng(4)

    def pack_rows(vals, depth):
        # (h, w) sample values -> packed MSB-first byte rows
        h, w = vals.shape
        bits = (
            (vals[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
        ).reshape(h, w * depth).astype(np.uint8)
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.concatenate(
                [bits, np.zeros((h, pad), np.uint8)], axis=1
            )
        return np.packbits(bits, axis=1)

    def sub8_png(vals, depth, color_type, plte=b"", interlace=0):
        h, w = vals.shape
        if interlace == 0:
            raster = _filter_rows(pack_rows(vals, depth), 1, [0, 1, 2, 3, 4])
        else:
            raster = b""
            for x0, y0, dx, dy in _ADAM7_GRID:
                sub = vals[y0::dy, x0::dx]
                if sub.shape[0] and sub.shape[1]:
                    raster += _filter_rows(
                        pack_rows(sub, depth), 1, [0, 1, 2, 3, 4]
                    )
        ihdr = struct.pack(
            ">IIBBBBB", w, h, depth, color_type, 0, 0, interlace
        )
        out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        if plte:
            out += _chunk(b"PLTE", plte)
        return out + _chunk(
            b"IDAT", zlib.compress(raster)
        ) + _chunk(b"IEND", b"")

    for depth in (1, 2, 4):
        for interlace in (0, 1):
            vals = rng.integers(0, 1 << depth, (13, 11), dtype=np.uint8)
            out = png(sub8_png(vals, depth, 0, interlace=interlace))
            scale = 255 // ((1 << depth) - 1)
            assert out.shape == (13, 11, 1)
            assert (out[:, :, 0] == (vals * scale).astype(np.uint8)).all()
    # palette at 4-bit, both interlace modes
    plte = bytes(rng.integers(0, 256, 16 * 3, dtype=np.uint8))
    pal = np.frombuffer(plte, np.uint8).reshape(16, 3)
    for interlace in (0, 1):
        vals = rng.integers(0, 16, (9, 17), dtype=np.uint8)
        out = png(sub8_png(vals, 4, 3, plte=plte, interlace=interlace))
        assert out.shape == (9, 17, 3)
        assert (out == pal[vals]).all()


def test_png_remaining_gates():
    """Illegal IHDR combinations are flagged, never mis-decoded:
    sub-8-bit truecolor and 16-bit palette violate the spec."""
    import struct
    import zlib

    import pytest

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    png = _pure_decoders()["png"]

    def hdr(bit_depth, color_type):
        ihdr = struct.pack(">IIBBBBB", 4, 4, bit_depth, color_type, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", b"\x00" * 9)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 32))
            + _chunk(b"IEND", b"")
        )

    with pytest.raises(ValueError, match="illegal sub-8-bit"):
        png(hdr(4, 2))
    with pytest.raises(ValueError, match="illegal 16-bit palette"):
        png(hdr(16, 3))
    with pytest.raises(NotImplementedError, match="unrecognized"):
        png(hdr(3, 0))


def _wav_raw(raw, fmt_code, n_ch, rate, bits, extensible=False):
    import struct

    if extensible:
        ext = struct.pack("<HIH", bits, 0, fmt_code) + b"\x00" * 14
        fmt = struct.pack(
            "<HHIIHHH", 0xFFFE, n_ch, rate, rate * n_ch * bits // 8,
            n_ch * bits // 8, bits, len(ext),
        ) + ext
    else:
        fmt = struct.pack(
            "<HHIIHH", fmt_code, n_ch, rate, rate * n_ch * bits // 8,
            n_ch * bits // 8, bits,
        )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    if len(raw) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_extended_formats_decode():
    """24/32-bit integer PCM, IEEE float32/64, and
    WAVE_FORMAT_EXTENSIBLE WAVs decode onto the documented 16-bit
    grid (r11; formerly guarded gates)."""
    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    wav = _pure_decoders()["wav"]
    vals16 = np.array([[-32768], [-1], [0], [1], [32767]], np.int64)

    # 24-bit: samples are vals16 << 8; grid reduction recovers vals16
    b3 = bytearray()
    for v in (vals16[:, 0] << 8):
        b3 += int(v & 0xFFFFFF).to_bytes(3, "little")
    rate, out = wav(_wav_raw(bytes(b3), 1, 1, 8000, 24))
    assert rate == 8000 and (out[:, 0] == vals16[:, 0]).all()

    # 32-bit int: vals16 << 16
    raw32 = (vals16[:, 0].astype("<i8") << 16).astype("<i4").tobytes()
    _, out = wav(_wav_raw(raw32, 1, 1, 8000, 32))
    assert (out[:, 0] == vals16[:, 0]).all()

    # float32/64: x in [-1, 1] -> rint(clip(x)*32767); +2.0 clips
    f = np.array([-1.0, -0.5, 0.0, 0.25, 1.0, 2.0])
    want = np.rint(np.clip(f, -1, 1) * 32767.0).astype(np.int64)
    for dt, bits in (("<f4", 32), ("<f8", 64)):
        _, out = wav(_wav_raw(f.astype(dt).tobytes(), 3, 1, 44100, bits))
        assert (out[:, 0] == want).all(), bits

    # extensible wrapper around float32 and around 16-bit PCM, stereo
    _, out = wav(
        _wav_raw(f.astype("<f4").tobytes(), 3, 2, 22050, 32,
                 extensible=True)
    )
    assert out.shape == (3, 2) and (out.reshape(-1) == want).all()
    st = np.array([[100, -200], [300, -400]], np.int64)
    _, out = wav(
        _wav_raw(st.astype("<i2").tobytes(), 1, 2, 22050, 16,
                 extensible=True)
    )
    assert (out == st).all()


def test_wav_g711_decode():
    """G.711 A-law/µ-law WAVs decode via the canonical expansion:
    published extreme/zero codes map to their exact linear values
    (A-law ±32256 full scale, ±8 minimum step at code 0x55/0xD5;
    µ-law ±32124 full scale, exact 0 at codes 0xFF/0x7F)."""
    import numpy as np

    from amazonmsk_emr_tem_data_spark.operators.multimodal import (
        _pure_decoders,
    )

    wav = _pure_decoders()["wav"]
    # (format, {code: linear})
    cases = [
        (6, {0x55: -8, 0xD5: 8, 0x2A: -32256, 0xAA: 32256}),
        (7, {0xFF: 0, 0x7F: 0, 0x00: -32124, 0x80: 32124}),
    ]
    for fmt_code, table in cases:
        codes = bytes(table)
        rate, out = wav(_wav_raw(codes, fmt_code, 1, 8000, 8))
        assert rate == 8000
        assert out[:, 0].tolist() == list(table.values()), fmt_code
