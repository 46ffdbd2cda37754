"""Multimodal column plumbing (north-star).

Pattern for 100 TB media corpora: media lives as opaque ``binary``
columns (or object-store URIs) beside a typed metadata struct; decode /
feature-extract / frame-sample run as Arrow-batched pandas iterators
(``mapInPandas``) so bytes never round-trip through Python row by row.

``decode_images(fake=False)`` is a REAL pure-NumPy decoder for
uncompressed formats (BMP BI_RGB, binary PPM/PGM) AND for 8-bit
non-interlaced PNG (stdlib zlib inflate + NumPy scanline unfilter) —
no native codecs needed. The container lacks image/audio codec
libraries, so decode of the REMAINING compressed formats
(JPEG/WebP/16-bit/palette/Adam7 PNG), ``embed_media``'s encoder forward
pass, and video frame extraction remain clearly-marked stubs
(`NotImplementedError` unless ``fake=True``); the Spark-side contract —
schemas, batch iteration, partitioning, output explosion — is real and
tested. Swapping those stubs for PIL/ffmpeg/ONNX is a pure function
replacement.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct carried beside every payload column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def with_binary_payload(
    df: DataFrame, source_col: str = "text", mime: str = "application/octet-stream"
) -> DataFrame:
    """Attach a binary payload + typed metadata struct. (Fixtures have
    no real media, so the payload is the UTF-8 encoding of a source
    column — the column *types and plumbing* are the deliverable.)"""
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_images(df: DataFrame, id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """Decode binary payloads to image features via an Arrow-batched
    pandas iterator. Each batch stays columnar driver→executor; Python
    touches bytes only inside the vectorized iterator.

    ``fake=False`` is a REAL decoder for the formats a pure
    stdlib+NumPy implementation can handle with zero native codecs:
    BMP (BITMAPINFOHEADER, BI_RGB 8/24/32-bit, bottom-up or top-down,
    4-byte row padding), binary PPM/PGM (P6/P5, maxval <= 255, ``#``
    comments), and PNG (8-bit gray/gray-alpha/RGB/RGBA,
    non-interlaced: zlib inflate + per-scanline None/Sub/Up/Average/
    Paeth unfilter). The remaining compressed formats (JPEG/WebP,
    palette/16-bit/Adam7 PNG) still raise NotImplementedError — that
    branch is where PIL/libvips plugs in. ``fake=True`` keeps the
    deterministic pseudo-decode for fixtures whose payloads aren't
    images at all.

    The closure is deliberately self-contained (no references to this
    module): executor Python workers unpickle it by value, so the
    operator works even when the package isn't importable on the
    workers' sys.path (e.g. driver launched from another directory
    without shipping a pyFiles zip).
    """

    def decode_iter(batches) -> Iterator:
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def png_array(data: bytes):
            # Pure stdlib+NumPy PNG decode: zlib inflate + per-scanline
            # unfilter (None/Sub/Up/Average/Paeth). 8-bit gray /
            # gray+alpha / RGB / RGBA, non-interlaced — the subset a
            # real corpus hits first; palette, 16-bit, and Adam7 stay
            # behind the explicit stub (PIL territory).
            if data[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("bad PNG signature")
            pos, width, idat = 8, None, []
            height = bit_depth = color_type = interlace = None
            while pos + 8 <= len(data):
                length = struct.unpack_from(">I", data, pos)[0]
                ctype = data[pos + 4 : pos + 8]
                body = data[pos + 8 : pos + 8 + length]
                if ctype == b"IHDR":
                    (width, height, bit_depth, color_type,
                     _comp, _filt, interlace) = struct.unpack(
                        ">IIBBBBB", body
                    )
                elif ctype == b"IDAT":
                    idat.append(body)
                elif ctype == b"IEND":
                    break
                pos += 12 + length  # length + type + payload-less CRC
            if width is None:
                raise ValueError("PNG missing IHDR")
            if (
                bit_depth != 8
                or interlace != 0
                or color_type not in (0, 2, 4, 6)
            ):
                raise NotImplementedError(
                    "only 8-bit non-interlaced gray/gray-alpha/RGB/RGBA "
                    "PNG decodes natively (got bit_depth="
                    f"{bit_depth}, color_type={color_type}, "
                    f"interlace={interlace}); palette/16-bit/Adam7 "
                    "need PIL here"
                )
            n_ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
            raw = zlib.decompress(b"".join(idat))
            stride = width * n_ch
            if width <= 0 or len(raw) != (stride + 1) * height:
                raise ValueError("inconsistent PNG raster size")
            raw = np.frombuffer(raw, dtype=np.uint8).reshape(
                height, stride + 1
            )
            img = np.zeros((height, stride), dtype=np.uint8)
            bpp = n_ch  # bytes per pixel at bit depth 8
            for y in range(height):
                ft = int(raw[y, 0])
                line = raw[y, 1:].astype(np.int64)
                prior = (
                    img[y - 1].astype(np.int64)
                    if y > 0
                    else np.zeros(stride, np.int64)
                )
                if ft == 0:  # None
                    rec = line
                elif ft == 2:  # Up — vectorized
                    rec = (line + prior) & 0xFF
                elif ft == 1:  # Sub — cumsum per pixel phase
                    cols = line.reshape(width, bpp)
                    rec = (np.cumsum(cols, axis=0) & 0xFF).reshape(
                        stride
                    )
                elif ft in (3, 4):  # Average / Paeth: left-recurrent
                    # rec[x] needs rec[x-bpp] AFTER the mod-256 wrap,
                    # so no closed-form numpy expression over x exists.
                    # Pure-Python ints over bytes/bytearray (~30x
                    # faster than per-element numpy indexing) keep the
                    # envelope honest: Average/Paeth rows cost
                    # O(width*channels) interpreted steps — fine for
                    # fixtures and thumbnail tiers; bulk decode of
                    # photo-scale corpora is PIL/libvips territory.
                    ln = raw[y, 1:].tobytes()
                    pr = (
                        img[y - 1].tobytes()
                        if y > 0
                        else b"\x00" * stride
                    )
                    out = bytearray(stride)
                    if ft == 3:
                        for x in range(stride):
                            a = out[x - bpp] if x >= bpp else 0
                            out[x] = (
                                ln[x] + ((a + pr[x]) >> 1)
                            ) & 0xFF
                    else:
                        for x in range(stride):
                            a = out[x - bpp] if x >= bpp else 0
                            b = pr[x]
                            c = pr[x - bpp] if x >= bpp else 0
                            p = a + b - c
                            pa = p - a if p >= a else a - p
                            pb = p - b if p >= b else b - p
                            pc = p - c if p >= c else c - p
                            if pa <= pb and pa <= pc:
                                pred = a
                            elif pb <= pc:
                                pred = b
                            else:
                                pred = c
                            out[x] = (ln[x] + pred) & 0xFF
                    rec = np.frombuffer(
                        bytes(out), dtype=np.uint8
                    ).astype(np.int64)
                else:
                    raise ValueError(f"bad PNG filter type {ft}")
                img[y] = rec.astype(np.uint8)
            return img.reshape(height, width, n_ch)

        def decode_bmp(data: bytes) -> tuple[int, int, int, float]:
            # BITMAPFILEHEADER (14B): magic, file size, reserved,
            # pixel-array offset; then BITMAPINFOHEADER.
            if len(data) < 54:
                raise ValueError("truncated BMP header")
            pix_off = struct.unpack_from("<I", data, 10)[0]
            width, height = struct.unpack_from("<ii", data, 18)
            bpp = struct.unpack_from("<H", data, 28)[0]
            compression = struct.unpack_from("<I", data, 30)[0]
            if compression != 0 or bpp not in (8, 24, 32):
                raise NotImplementedError(
                    f"only BI_RGB 8/24/32-bit BMP is supported natively "
                    f"(got compression={compression}, bpp={bpp})"
                )
            n_ch = bpp // 8
            abs_h = abs(height)  # negative height = top-down row order
            row_bytes = (width * n_ch + 3) // 4 * 4  # 4-byte padded
            need = pix_off + row_bytes * abs_h
            if width <= 0 or abs_h == 0 or len(data) < need:
                raise ValueError("inconsistent BMP dimensions")
            rows = np.frombuffer(
                data, dtype=np.uint8, count=row_bytes * abs_h, offset=pix_off
            ).reshape(abs_h, row_bytes)[:, : width * n_ch]
            # row order (bottom-up vs top-down) doesn't affect the
            # orientation-invariant features we emit
            return width, abs_h, n_ch, float(rows.mean())

        def decode_pnm(data: bytes) -> tuple[int, int, int, float]:
            # P6 (RGB) / P5 (gray), binary, '#' comments, maxval<=255
            n_ch = 3 if data[:2] == b"P6" else 1
            pos, fields = 2, []
            while len(fields) < 3:
                if pos >= len(data):
                    raise ValueError("truncated PNM header")
                c = data[pos : pos + 1]
                if c == b"#":
                    pos = data.index(b"\n", pos) + 1
                elif c.isspace():
                    pos += 1
                elif c.isdigit():
                    end = pos
                    while data[end : end + 1].isdigit():
                        end += 1
                    fields.append(int(data[pos:end]))
                    pos = end
                else:
                    raise ValueError(f"bad PNM header byte {c!r}")
            width, height, maxval = fields
            if maxval > 255:
                raise NotImplementedError("16-bit PNM not supported natively")
            pos += 1  # single whitespace after maxval, then raster
            n = width * height * n_ch
            if width <= 0 or height <= 0 or len(data) < pos + n:
                raise ValueError("inconsistent PNM dimensions")
            pix = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
            return width, height, n_ch, float(pix.mean())

        def decode_one(payload: bytes) -> tuple[int, int, int, float]:
            if not fake:
                # real pure-NumPy path: uncompressed formats + PNG
                if payload[:2] == b"BM":
                    return decode_bmp(payload)
                if payload[:2] in (b"P6", b"P5"):
                    return decode_pnm(payload)
                if payload[:8] == b"\x89PNG\r\n\x1a\n":
                    arr = png_array(payload)
                    h, w, c = arr.shape
                    return w, h, c, float(arr.mean())
                raise NotImplementedError(
                    "only uncompressed BMP, binary PPM/PGM, and 8-bit "
                    "non-interlaced PNG decode natively; JPEG/WebP/... "
                    "need PIL/libvips here"
                )
            # fake=True: deterministic pseudo-dimensions from the bytes
            # so the distributed plumbing is testable on non-image
            # fixture payloads.
            n = len(payload)
            width = 16 + (n % 64)
            height = 16 + ((n // 64) % 64)
            mean = (sum(payload[:256]) / min(n, 256)) if n else 0.0
            return width, height, 3, float(mean)

        for pdf in batches:
            feats = [decode_one(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_intensity": [f[3] for f in feats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode_iter, _DECODE_SCHEMA)


_EMBED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def embed_media(
    df: DataFrame, dim: int = 16, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Media → embedding vectors via an Arrow-batched pandas iterator —
    the feature-extraction stage between decode and similarity search.

    STUB model: an L2-normalized byte-histogram (dim buckets) stands in
    for a CLIP-style encoder; deterministic, so near-dup results are
    reproducible and identical payloads embed identically. The real
    version replaces the histogram with an ONNX/torch forward pass over
    the SAME batch iterator — the Spark contract (columnar batches in,
    (id, vector) rows out, no driver round-trip) is what's tested.
    """

    def embed_iter(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = []
            for payload in pdf["payload"]:
                if not fake:
                    raise NotImplementedError(
                        "no media models in this environment; plug in an "
                        "ONNX/torch encoder here"
                    )
                data = payload if payload is not None else b""
                h = np.zeros(dim, dtype=np.float64)
                if data:
                    arr = np.frombuffer(data, dtype=np.uint8)
                    h = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                    n = np.linalg.norm(h)
                    if n > 0:
                        h = h / n
                vecs.append(h.tolist())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "embedding": vecs}
            )

    return df.select(id_col, "payload").mapInPandas(embed_iter, _EMBED_SCHEMA)


def media_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    dim: int = 16,
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """End-to-end multimodal near-dup: payload → embedding
    (Arrow-batched stub encoder) → cosine pair join with exact-dup
    collapse (operators/similarity.cosine_near_dup_pairs). The full
    'dedup an image corpus' composition: every stage is the same
    operator a real encoder would feed, so swapping the stub changes
    recall characteristics, not the plan."""
    from .similarity import cosine_near_dup_pairs

    emb = embed_media(df, dim=dim, id_col=id_col, fake=fake)
    return cosine_near_dup_pairs(
        emb, threshold=threshold, id_col=id_col, vec_col="embedding"
    ).withColumnRenamed("vec_a", "doc_a").withColumnRenamed("vec_b", "doc_b")


_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def ahash_images(
    df: DataFrame, id_col: str = "doc_id", fake: bool = True, hash_size: int = 8
) -> DataFrame:
    """64-bit average-hash (aHash) perceptual fingerprint per image:
    decode → channel-mean grayscale → nearest-neighbor 8×8 downsample →
    bit i = pixel_i > mean. The standard cheap perceptual feature for
    image near-dup — robust to re-encoding and small pixel noise,
    unlike the byte-level sha/byte-histogram tiers.

    ``fake=False`` consumes REAL decoded pixels via the same pure-NumPy
    BMP/PPM/PGM parsing as decode_images; ``fake=True`` hashes a
    deterministic byte grid so the distributed plumbing runs on
    non-image fixture payloads. The hash lands as a signed int64
    (two's-complement wrap) so downstream bit_count/xor stay in Spark
    long math. The decode helpers are nested for the same
    pickle-by-value isolation decode_images documents."""

    def ahash_iter(batches):
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def png_array(data: bytes):
            # same pure zlib+NumPy PNG subset as decode_images
            # (duplicated for the closure's pickle-by-value isolation)
            if data[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("bad PNG signature")
            pos, width, idat = 8, None, []
            height = bit_depth = color_type = interlace = None
            while pos + 8 <= len(data):
                length = struct.unpack_from(">I", data, pos)[0]
                ctype = data[pos + 4 : pos + 8]
                body = data[pos + 8 : pos + 8 + length]
                if ctype == b"IHDR":
                    (width, height, bit_depth, color_type,
                     _c, _f, interlace) = struct.unpack(">IIBBBBB", body)
                elif ctype == b"IDAT":
                    idat.append(body)
                elif ctype == b"IEND":
                    break
                pos += 12 + length
            if width is None:
                raise ValueError("PNG missing IHDR")
            if (
                bit_depth != 8
                or interlace != 0
                or color_type not in (0, 2, 4, 6)
            ):
                raise NotImplementedError(
                    "only 8-bit non-interlaced gray/gray-alpha/RGB/RGBA"
                    " PNG decodes natively"
                )
            n_ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
            raw = zlib.decompress(b"".join(idat))
            stride = width * n_ch
            if width <= 0 or len(raw) != (stride + 1) * height:
                raise ValueError("inconsistent PNG raster size")
            raw = np.frombuffer(raw, dtype=np.uint8).reshape(
                height, stride + 1
            )
            img = np.zeros((height, stride), dtype=np.uint8)
            bpp = n_ch
            for y in range(height):
                ft = int(raw[y, 0])
                line = raw[y, 1:].astype(np.int64)
                prior = (
                    img[y - 1].astype(np.int64)
                    if y > 0
                    else np.zeros(stride, np.int64)
                )
                if ft == 0:
                    rec = line
                elif ft == 2:
                    rec = (line + prior) & 0xFF
                elif ft == 1:
                    rec = (
                        np.cumsum(line.reshape(width, bpp), axis=0)
                        & 0xFF
                    ).reshape(stride)
                elif ft in (3, 4):  # Average / Paeth: left-recurrent
                    # (same fast-int formulation as decode_images —
                    # the closure stays self-contained by design, see
                    # that function's docstring)
                    ln = raw[y, 1:].tobytes()
                    pr = (
                        img[y - 1].tobytes()
                        if y > 0
                        else b"\x00" * stride
                    )
                    out = bytearray(stride)
                    if ft == 3:
                        for x in range(stride):
                            a = out[x - bpp] if x >= bpp else 0
                            out[x] = (
                                ln[x] + ((a + pr[x]) >> 1)
                            ) & 0xFF
                    else:
                        for x in range(stride):
                            a = out[x - bpp] if x >= bpp else 0
                            b = pr[x]
                            c = pr[x - bpp] if x >= bpp else 0
                            p = a + b - c
                            pa = p - a if p >= a else a - p
                            pb = p - b if p >= b else b - p
                            pc = p - c if p >= c else c - p
                            if pa <= pb and pa <= pc:
                                pred = a
                            elif pb <= pc:
                                pred = b
                            else:
                                pred = c
                            out[x] = (ln[x] + pred) & 0xFF
                    rec = np.frombuffer(
                        bytes(out), dtype=np.uint8
                    ).astype(np.int64)
                else:
                    raise ValueError(f"bad PNG filter type {ft}")
                img[y] = rec.astype(np.uint8)
            return img.reshape(height, width, n_ch)

        def bmp_array(data: bytes):
            pix_off = struct.unpack_from("<I", data, 10)[0]
            width, height = struct.unpack_from("<ii", data, 18)
            bpp = struct.unpack_from("<H", data, 28)[0]
            compression = struct.unpack_from("<I", data, 30)[0]
            if compression != 0 or bpp not in (8, 24, 32):
                raise NotImplementedError("only BI_RGB 8/24/32-bit BMP")
            n_ch = bpp // 8
            abs_h = abs(height)
            row_bytes = (width * n_ch + 3) // 4 * 4
            rows = np.frombuffer(
                data, dtype=np.uint8, count=row_bytes * abs_h, offset=pix_off
            ).reshape(abs_h, row_bytes)[:, : width * n_ch]
            arr = rows.reshape(abs_h, width, n_ch)
            return arr if height < 0 else arr[::-1]

        def pnm_array(data: bytes):
            n_ch = 3 if data[:2] == b"P6" else 1
            pos, fields = 2, []
            while len(fields) < 3:
                c = data[pos : pos + 1]
                if c == b"#":
                    pos = data.index(b"\n", pos) + 1
                elif c.isspace():
                    pos += 1
                else:
                    end = pos
                    while data[end : end + 1].isdigit():
                        end += 1
                    fields.append(int(data[pos:end]))
                    pos = end
            width, height, _maxval = fields
            pos += 1
            n = width * height * n_ch
            return np.frombuffer(data, dtype=np.uint8, count=n, offset=pos).reshape(
                height, width, n_ch
            )

        def ahash_one(payload: bytes) -> int:
            if fake:
                data = (payload or b"\x00") * (
                    1 + (hash_size * hash_size) // max(1, len(payload or b"\x00"))
                )
                gray = (
                    np.frombuffer(
                        data[: hash_size * hash_size], dtype=np.uint8
                    )
                    .reshape(hash_size, hash_size)
                    .astype(np.float64)
                )
            else:
                if payload[:2] == b"BM":
                    arr = bmp_array(payload)
                elif payload[:2] in (b"P6", b"P5"):
                    arr = pnm_array(payload)
                elif payload[:8] == b"\x89PNG\r\n\x1a\n":
                    arr = png_array(payload)
                else:
                    raise NotImplementedError(
                        "only uncompressed BMP, binary PPM/PGM, and "
                        "8-bit non-interlaced PNG decode natively; "
                        "JPEG/WebP/... need PIL here"
                    )
                full = arr.astype(np.float64).mean(axis=2)
                h, w = full.shape
                ys = np.minimum((np.arange(hash_size) * h) // hash_size, h - 1)
                xs = np.minimum((np.arange(hash_size) * w) // hash_size, w - 1)
                gray = full[np.ix_(ys, xs)]
            bits = (gray.reshape(-1) > gray.mean()).astype(np.uint64)
            val = np.uint64(0)
            for b in bits:
                val = (val << np.uint64(1)) | b
            return int(val.astype(np.int64))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "ahash": [
                        ahash_one(p if p is not None else b"")
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(ahash_iter, _AHASH_SCHEMA)


def media_phash_near_dup(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Perceptual near-dup pairs over image payloads: aHash fingerprint
    → pigeonhole chunk-bucketed Hamming join (the SimHash machinery,
    reused via operators/dedup.hamming_chunk_pairs). The image
    counterpart of text SimHash: candidates equi-join on exact hash
    chunks — never a cross join — and verify with one bit_count(xor)."""
    from .dedup import hamming_chunk_pairs

    # cache: the chunk join consumes the hash relation three times
    # (bucket counts + both self-join sides) — uncached, the Arrow
    # decode+hash pipeline would re-run for each (see simhash_pairs)
    sk = ahash_images(df, id_col=id_col, fake=fake).cache()
    return hamming_chunk_pairs(
        sk, id_col, "ahash", bits=64, max_hamming=max_hamming
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset_bytes", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Frame sampling for video payloads: 1 input row → N frame rows.
    STUB decoder (byte-range slices stand in for decoded frames); the
    real version replaces the slicer with ffmpeg keyframe extraction.
    Output explosion happens executor-side — the driver never sees
    frame data."""

    def frames_iter(batches) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "video codecs are not available; plug in ffmpeg here"
                    )
                data = payload if payload is not None else b""
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step]
                    # fingerprint the canonical UPPER-hex encoding of
                    # the chunk (not the raw bytes): same collision
                    # properties, but text-typed — so the value is
                    # reproducible by engines whose hash functions
                    # only take strings (the DuckDB oracle)
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            i * step,
                            hashlib.sha256(
                                chunk.hex().upper().encode("ascii")
                            ).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset_bytes", "frame_sha256"]
            )

    return df.select(id_col, "payload").mapInPandas(frames_iter, _FRAME_SCHEMA)
