"""Multimodal column plumbing (north-star).

Pattern for 100 TB media corpora: media lives as opaque ``binary``
columns (or object-store URIs) beside a typed metadata struct; decode /
feature-extract / frame-sample run as Arrow-batched pandas iterators
(``mapInPandas``) so bytes never round-trip through Python row by row.

``decode_images(fake=False)`` is a REAL pure-NumPy decoder for
uncompressed formats (BMP BI_RGB, binary PPM/PGM), COMPLETE PNG
(every legal IHDR: depths 1/2/4/8/16, all five color types,
interlace 0 or Adam7 — stdlib zlib inflate + NumPy scanline
unfilter; 16-bit reduces to the high byte for the uint8 contract),
and — new r9 — baseline sequential JPEG (Huffman decode + dequant +
vectorized IDCT, DRI/RSTn restarts, chroma subsampling, JFIF
YCbCr→RGB) — no native codecs needed. ``decode_audio(fake=False)`` is
the audio member: real RIFF/WAVE decode (integer PCM 8/16/24/32-bit,
IEEE float 32/64, G.711 A-law/µ-law, IMA/DVI ADPCM — new r12 —
WAVE_FORMAT_EXTENSIBLE, multi-channel)
plus a gain-invariant energy-envelope fingerprint for audio near-dup.
The container lacks media codec libraries, so decode of the REMAINING
formats (WebP/TIFF, progressive JPEG, MP3/FLAC/OGG, MS ADPCM), ``embed_media``'s encoder
forward pass, and video frame extraction remain clearly-marked stubs
(`NotImplementedError` unless ``fake=True``) — except MJPEG-in-AVI,
whose frames ARE baseline JPEGs: ``sample_frames(fake=False)`` walks
the RIFF tree and samples real frames natively (r12); the Spark-side contract —
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


def _pure_decoders():
    """Self-contained pure stdlib+NumPy image decoders, built once on
    the driver and captured by the operator closures below. Defined as
    NESTED functions (not module-level) deliberately: cloudpickle
    ships nested functions BY VALUE, so executor Python workers can
    unpickle the operators even when this package is not importable on
    their sys.path (e.g. driver launched from another directory
    without shipping a pyFiles zip) — the same isolation the closures
    had when each carried its own copy of every decoder, without the
    duplication.

    Returns {"png", "jpeg", "bmp", "pnm", "wav", "any"}. Every image
    decoder returns an (H, W, C) uint8 array in top-down row order;
    ``wav`` returns (sample_rate, int32 samples of shape
    (n, channels)); ``any`` dispatches images on magic bytes and
    raises a guarded NotImplementedError for formats that need a
    native codec (WebP/TIFF, progressive JPEG) — raising beats
    silently-wrong decode.

    Performance envelope, measured at 1 MP (SCALING.md "Image-codec
    envelope" row; scripts/bench_codec_envelope.py reproduces it):
    BMP ~memcpy; PNG Up/Sub rows ~40 Mpx/s (vectorized); PNG
    Average/Paeth rows ~1.7 Mpx/s (the mod-256 left recurrence has no
    closed numpy form — interpreted bytes loop); baseline JPEG
    ~2.0 Mpx/s (table-driven Huffman: peek-16 LUT + int bit
    accumulator + batched IDCT — 9x over the r8 per-bit reader).
    Still 1-2 orders off a native codec on the recurrent/entropy
    paths, so bulk decode of photo-scale corpora belongs to
    PIL/libvips plugged into this same dispatch; these decoders are
    correctness-first for fixtures and thumbnail-scale tiers.
    """
    import struct
    import zlib

    import numpy as np

    def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int):
        # Per-scanline unfilter (None/Sub/Up/Average/Paeth) over a
        # (stride+1)-byte-per-row raster. PNG filters operate on raw
        # BYTES regardless of bit depth (bpp = bytes per complete
        # pixel), so 8- and 16-bit rasters and every Adam7 pass share
        # this one loop. Returns (height, stride) uint8.
        raw = np.frombuffer(raw, dtype=np.uint8).reshape(
            height, stride + 1
        )
        img = np.zeros((height, stride), dtype=np.uint8)
        for y in range(height):
            ft = int(raw[y, 0])
            if ft == 0:  # None
                img[y] = raw[y, 1:]
            elif ft == 2:  # Up — vectorized
                prior = img[y - 1] if y > 0 else np.zeros(
                    stride, np.uint8
                )
                img[y] = (
                    raw[y, 1:].astype(np.int64) + prior
                ).astype(np.uint8)
            elif ft == 1:  # Sub — cumsum per pixel phase
                width_px = stride // bpp
                cols = raw[y, 1:].astype(np.int64).reshape(
                    width_px, bpp
                )
                img[y] = (
                    (np.cumsum(cols, axis=0) & 0xFF)
                    .reshape(stride)
                    .astype(np.uint8)
                )
            elif ft in (3, 4):  # Average / Paeth: left-recurrent —
                # rec[x] needs rec[x-bpp] AFTER the mod-256 wrap, so
                # no closed-form numpy expression over x exists. Pure
                # Python ints over bytes/bytearray (~30x faster than
                # per-element numpy indexing) keep the envelope
                # honest: O(width*channels) interpreted steps per
                # Average/Paeth row.
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
                        out[x] = (ln[x] + ((a + pr[x]) >> 1)) & 0xFF
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
                img[y] = np.frombuffer(bytes(out), dtype=np.uint8)
            else:
                raise ValueError(f"bad PNG filter type {ft}")
        return img

    #: Adam7 pass grid: (x_start, y_start, x_step, y_step)
    _ADAM7 = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )

    def png_array(data: bytes):
        # Pure stdlib+NumPy PNG decode: zlib inflate + per-scanline
        # unfilter (None/Sub/Up/Average/Paeth). EVERY legal IHDR shape
        # decodes natively as of r11: depths 1/2/4/8/16, gray /
        # gray+alpha / RGB / RGBA / palette, interlace 0 or Adam7.
        # 16-bit samples decode exactly, then reduce to their high
        # byte for the uniform (H, W, C) uint8 contract (PIL's
        # I;16→L convention); sub-8-bit gray expands on the exact
        # 255/(2^d−1) integer grid; sub-8-bit rows unpack MSB-first
        # with byte-aligned row padding per the spec.
        if data[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("bad PNG signature")
        pos, width, idat, plte = 8, None, [], None
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
            elif ctype == b"PLTE":
                if len(body) % 3:
                    raise ValueError("bad PNG PLTE length")
                plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat.append(body)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + payload-less CRC
        if width is None:
            raise ValueError("PNG missing IHDR")
        if (
            bit_depth not in (1, 2, 4, 8, 16)
            or interlace not in (0, 1)
            or color_type not in (0, 2, 3, 4, 6)
        ):
            raise NotImplementedError(
                "unrecognized PNG shape (bit_depth="
                f"{bit_depth}, color_type={color_type}, "
                f"interlace={interlace})"
            )
        if bit_depth < 8 and color_type not in (0, 3):
            raise ValueError("illegal sub-8-bit PNG color type")
        if color_type == 3 and bit_depth == 16:
            raise ValueError("illegal 16-bit palette PNG")
        if color_type == 3 and plte is None:
            raise ValueError("palette PNG missing PLTE")
        n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
        sub8 = bit_depth < 8
        bs = max(1, bit_depth // 8)  # bytes per sample (>= 8-bit)
        #: filter offset: bytes per complete pixel, floored at 1 for
        #: packed sub-byte rows (RFC 2083 §6.3)
        bppf = max(1, (bit_depth * n_ch) // 8)
        raw = zlib.decompress(b"".join(idat))
        if width <= 0 or height <= 0:
            raise ValueError("inconsistent PNG raster size")

        def row_bytes(w: int) -> int:
            return -(-(w * bit_depth * n_ch) // 8)

        def to_samples(img_b, w: int):
            # unfiltered byte rows -> (rows, w, channel-bytes) sample
            # array; sub-byte rows unpack MSB-first and drop the
            # byte-alignment padding bits
            if not sub8:
                return img_b.reshape(-1, w, n_ch * bs)
            bits = np.unpackbits(img_b, axis=1)[:, : w * bit_depth]
            vals = bits.reshape(-1, w, bit_depth).astype(np.int64)
            weights = 1 << np.arange(bit_depth - 1, -1, -1)
            return (
                (vals * weights).sum(axis=2).astype(np.uint8)[..., None]
            )

        ch_bytes = 1 if sub8 else n_ch * bs
        if interlace == 0:
            stride = row_bytes(width)
            if len(raw) != (stride + 1) * height:
                raise ValueError("inconsistent PNG raster size")
            samples = to_samples(
                _png_unfilter(raw, height, stride, bppf), width
            )
        else:  # Adam7: 7 independently-filtered sub-rasters
            samples = np.zeros(
                (height, width, ch_bytes), dtype=np.uint8
            )
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = max(0, -(-(width - x0) // dx))
                ph = max(0, -(-(height - y0) // dy))
                if pw == 0 or ph == 0:
                    continue  # empty pass contributes no bytes
                pstride = row_bytes(pw)
                need = (pstride + 1) * ph
                if off + need > len(raw):
                    raise ValueError("inconsistent PNG raster size")
                sub = _png_unfilter(
                    raw[off : off + need], ph, pstride, bppf
                )
                off += need
                samples[y0::dy, x0::dx] = to_samples(sub, pw)
            if off != len(raw):
                raise ValueError("inconsistent PNG raster size")
        if bs == 2:
            # exact big-endian 16-bit samples, reduced to the high
            # byte for the uniform uint8 contract
            out = samples.reshape(height, width, n_ch, 2)[:, :, :, 0]
        elif sub8 and color_type == 0:
            # exact integer expansion: 255/(2^d-1) is integral for
            # d in {1, 2, 4} (255, 85, 17)
            out = (
                samples[:, :, 0].astype(np.int64)
                * (255 // ((1 << bit_depth) - 1))
            ).astype(np.uint8)[..., None]
        else:
            out = samples
        if color_type == 3:  # palette lookup: indices -> RGB rows
            idx = out[:, :, 0]
            if int(idx.max(initial=0)) >= len(plte):
                raise ValueError("PNG palette index out of range")
            out = plte[idx]  # (H, W, 3)
        return out

    def bmp_array(data: bytes):
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
        arr = rows.reshape(abs_h, width, n_ch)
        return arr if height < 0 else arr[::-1]

    def pnm_array(data: bytes):
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
        return pix.reshape(height, width, n_ch)

    # ---- baseline JPEG (ITU T.81 sequential DCT, Huffman) ----------
    # Zigzag position k -> raster index in the flattened 8x8 block.
    _ZZ = np.array(
        [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
            28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
            37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
            54, 47, 55, 62, 63,
        ],
        dtype=np.int64,
    )
    # Orthonormal IDCT-II basis: pixel = M.T @ coeff @ M (vectorized;
    # the per-block 8x8 matmuls are the fast path — only the Huffman
    # bit reader is interpreted).
    _u = np.arange(8).reshape(8, 1)
    _x = np.arange(8).reshape(1, 8)
    _M = 0.5 * np.cos((2 * _x + 1) * _u * np.pi / 16)
    _M[0, :] *= 1 / np.sqrt(2.0)

    def jpeg_array(data: bytes):
        """Baseline sequential JPEG decode (SOI/DQT/SOF0/DHT/SOS,
        optional DRI/RSTn, 0xFF00 byte unstuffing, interleaved MCUs
        with arbitrary h×v sampling, nearest-neighbor chroma
        upsample, JFIF YCbCr→RGB). Progressive (SOF2), arithmetic,
        hierarchical, and 12-bit variants raise the guarded stub."""
        if data[:2] != b"\xff\xd8":
            raise ValueError("bad JPEG signature")
        qt = {}        # table id -> 64 int32, zigzag order
        huff = {}      # (class, id) -> {(length, code): symbol}
        frame = None   # (height, width, [(cid, h, v, qid), ...])
        restart = 0
        scan = None    # [(cid, dc_id, ac_id), ...]
        pos = 2
        while pos + 2 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError("bad JPEG marker alignment")
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede
            # the marker code — skip them rather than misreading a
            # second 0xFF as marker code 0xFF.
            while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
                pos += 1
            if pos + 2 > len(data):
                raise ValueError("truncated JPEG stream")
            m = data[pos + 1]
            pos += 2
            if m == 0xD8 or m == 0x01 or 0xD0 <= m <= 0xD7:
                continue
            if m == 0xD9:  # EOI
                break
            if pos + 2 > len(data):
                raise ValueError("truncated JPEG segment header")
            seglen = struct.unpack_from(">H", data, pos)[0]
            seg = data[pos + 2 : pos + seglen]
            pos += seglen
            if m == 0xDB:  # DQT (may hold several tables)
                o = 0
                while o < len(seg):
                    pq, tq = seg[o] >> 4, seg[o] & 15
                    if pq != 0:
                        raise NotImplementedError(
                            "16-bit quantization tables (12-bit JPEG)"
                        )
                    qt[tq] = np.frombuffer(
                        seg, np.uint8, 64, o + 1
                    ).astype(np.int32)
                    o += 65
            elif m == 0xC4:  # DHT (may hold several tables)
                o = 0
                while o < len(seg):
                    tc, th = seg[o] >> 4, seg[o] & 15
                    counts = seg[o + 1 : o + 17]
                    o += 17
                    tbl, code = {}, 0
                    for ln in range(1, 17):
                        for _ in range(counts[ln - 1]):
                            tbl[(ln, code)] = seg[o]
                            o += 1
                            code += 1
                        code <<= 1
                    huff[(tc, th)] = tbl
            elif m in (0xC0, 0xC1):  # baseline / extended sequential
                prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8:
                    raise NotImplementedError("only 8-bit JPEG")
                comps = [
                    (seg[6 + 3 * i], seg[7 + 3 * i] >> 4,
                     seg[7 + 3 * i] & 15, seg[8 + 3 * i])
                    for i in range(nc)
                ]
                frame = (h, w, comps)
            elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                       0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    "only baseline sequential JPEG decodes natively "
                    f"(got SOF marker 0x{m:02X}: progressive/"
                    "arithmetic/hierarchical need PIL here)"
                )
            elif m == 0xDD:  # DRI
                restart = struct.unpack_from(">H", seg, 0)[0]
            elif m == 0xDA:  # SOS — entropy-coded data follows
                ns = seg[0]
                scan = [
                    (seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                     seg[2 + 2 * i] & 15)
                    for i in range(ns)
                ]
                break
            # APPn/COM/others: skipped
        if frame is None or scan is None:
            raise ValueError("JPEG missing SOF/SOS")
        height, width, comps = frame
        # Legal baseline JPEGs may carry multiple SOS segments, each
        # covering a subset of the frame components (non-interleaved
        # multi-scan, T.81 B.2.3). This decoder reads one interleaved
        # scan only: a scan/frame component mismatch must raise the
        # uniform guarded gate up front, not die mid-scatter with an
        # opaque numpy reshape error (or emit a zeros plane).
        if {c for c, _, _ in scan} != {c for c, *_ in comps}:
            raise NotImplementedError(
                "non-interleaved multi-scan JPEG (SOS covers "
                f"{sorted(c for c, _, _ in scan)} of frame components "
                f"{sorted(c for c, *_ in comps)}): needs PIL here"
            )
        if width <= 0 or height <= 0:
            raise ValueError("inconsistent JPEG dimensions")
        by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
        h_max = max(hs for _, hs, _, _ in comps)
        v_max = max(vs for _, _, vs, _ in comps)
        mcux = -(-width // (8 * h_max))
        mcuy = -(-height // (8 * v_max))

        # --- entropy-coded data: split at RSTn + unstuff ONCE -------
        # The r9 envelope row (SCALING.md "codec envelope") measured
        # the per-BIT closure reader at ~0.22 Mpx/s on a 1 MP photo —
        # 4.7 s/image, all interpreter overhead. This pass trades it
        # for the standard table-driven design: one bytes-level
        # unstuffing pass per restart interval, a machine-int bit
        # accumulator, a flat 65536-entry peek-16 Huffman LUT (one
        # list index per SYMBOL instead of 1-16 function calls per
        # bit), and batched dequant/de-zigzag/IDCT/scatter per
        # component (three (8,8)@(n,8,8)@(8,8) matmuls instead of two
        # tiny matmuls per block). Same T.81 semantics, same guarded
        # errors; ~9x on the 1 MP row.
        parts: list[bytes] = []
        i = pos
        start = i
        n = len(data)
        while True:
            j = data.find(b"\xff", i)
            if j < 0 or j + 1 >= n:
                # no terminating marker: keep the tail — bit
                # exhaustion below raises the uniform ValueError
                parts.append(
                    data[start:].replace(b"\xff\x00", b"\xff")
                )
                break
            nxt = data[j + 1]
            if nxt == 0x00:  # stuffed data 0xFF
                i = j + 2
                continue
            if nxt == 0xFF:  # fill byte before a marker (B.1.1.2)
                i = j + 1
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: interval boundary
                # trailing bare 0xFFs in the slice are fill bytes
                parts.append(
                    data[start:j]
                    .rstrip(b"\xff")
                    .replace(b"\xff\x00", b"\xff")
                )
                i = j + 2
                start = i
                continue
            # EOI or any other marker ends the scan
            parts.append(
                data[start:j]
                .rstrip(b"\xff")
                .replace(b"\xff\x00", b"\xff")
            )
            break

        def _lut(tbl) -> list:
            # flat peek-16 table: entry = (symbol << 5) | code_len;
            # 0 marks an invalid prefix. Built with slice assignment
            # (≤256 slices), read with one list index per symbol.
            lut = [0] * 65536
            for (ln, code), sym in tbl.items():
                base = code << (16 - ln)
                span = 1 << (16 - ln)
                lut[base : base + span] = [(sym << 5) | ln] * span
            return lut

        luts = {key: _lut(tbl) for key, tbl in huff.items()}

        # bit reader state over the current part: `acc` holds the
        # next `nbits` undecoded bits (masked at refill, so it stays
        # a machine-word-sized int); each part carries a 2-byte zero
        # sentinel so peek-16 never over-reads at the legal ≤7-bit
        # byte-alignment tail — `real_bits` catches consumption past
        # the true end (truncation) at part switch/scan end.
        part_idx = 0
        pb = parts[0] + b"\x00\x00" if parts else b"\x00\x00"
        real_bits = 8 * (len(pb) - 2)
        bp = acc = nbits = 0

        def _part_overrun() -> bool:
            return 8 * bp - nbits > real_bits

        planes = {}
        dc_pred = {cid: 0 for cid, *_ in comps}
        #: per component: flat list of 64-int zigzag rows, MCU order
        coef_rows = {cid: [] for cid, *_ in comps}
        n_mcu = mcux * mcuy
        for m_idx in range(n_mcu):
            if restart and m_idx and m_idx % restart == 0:
                if _part_overrun():
                    raise ValueError("truncated JPEG entropy data")
                part_idx += 1
                if part_idx >= len(parts):
                    raise ValueError("missing JPEG restart marker")
                pb = parts[part_idx] + b"\x00\x00"
                real_bits = 8 * (len(pb) - 2)
                bp = acc = nbits = 0
                for cid in dc_pred:
                    dc_pred[cid] = 0
            for cid, dc_id, ac_id in scan:
                hs, vs, _tq = by_id[cid]
                dct, act = luts[(0, dc_id)], luts[(1, ac_id)]
                rows = coef_rows[cid]
                for _blk in range(vs * hs):
                    row = [0] * 64
                    # DC: one LUT probe + magnitude bits
                    while nbits < 16:
                        k4 = pb[bp : bp + 4]
                        if not k4:
                            raise ValueError(
                                "truncated JPEG entropy data"
                            )
                        bp += len(k4)
                        nbits += 8 * len(k4)
                        acc = (
                            (acc << (8 * len(k4)))
                            | int.from_bytes(k4, "big")
                        ) & ((1 << nbits) - 1)
                    v = dct[(acc >> (nbits - 16)) & 0xFFFF]
                    t = v & 31
                    if not t:
                        raise ValueError("bad JPEG huffman code")
                    nbits -= t
                    t = v >> 5
                    if t:
                        while nbits < t:
                            k4 = pb[bp : bp + 4]
                            if not k4:
                                raise ValueError(
                                    "truncated JPEG entropy data"
                                )
                            bp += len(k4)
                            nbits += 8 * len(k4)
                            acc = (
                                (acc << (8 * len(k4)))
                                | int.from_bytes(k4, "big")
                            ) & ((1 << nbits) - 1)
                        nbits -= t
                        diff = (acc >> nbits) & ((1 << t) - 1)
                        if diff < (1 << (t - 1)):  # EXTEND (F.2.2.1)
                            diff += 1 - (1 << t)
                        dc_pred[cid] += diff
                    row[0] = dc_pred[cid]
                    k = 1
                    while k < 64:
                        while nbits < 16:
                            k4 = pb[bp : bp + 4]
                            if not k4:
                                raise ValueError(
                                    "truncated JPEG entropy data"
                                )
                            bp += len(k4)
                            nbits += 8 * len(k4)
                            acc = (
                                (acc << (8 * len(k4)))
                                | int.from_bytes(k4, "big")
                            ) & ((1 << nbits) - 1)
                        v = act[(acc >> (nbits - 16)) & 0xFFFF]
                        ln = v & 31
                        if not ln:
                            raise ValueError("bad JPEG huffman code")
                        nbits -= ln
                        rs = v >> 5
                        s = rs & 15
                        if s == 0:
                            if rs == 0xF0:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        if nbits < s:
                            k4 = pb[bp : bp + 4]
                            if not k4:
                                raise ValueError(
                                    "truncated JPEG entropy data"
                                )
                            bp += len(k4)
                            nbits += 8 * len(k4)
                            acc = (
                                (acc << (8 * len(k4)))
                                | int.from_bytes(k4, "big")
                            ) & ((1 << nbits) - 1)
                        nbits -= s
                        val = (acc >> nbits) & ((1 << s) - 1)
                        if val < (1 << (s - 1)):
                            val += 1 - (1 << s)
                        row[k] = val
                        k += 1
                    rows.append(row)
        if _part_overrun():
            raise ValueError("truncated JPEG entropy data")

        # batched dequant -> de-zigzag -> IDCT -> plane scatter: block
        # order within coef_rows is (my, mx, byi, bxi), so one
        # transpose lays the MCU grid out as the plane raster
        for cid, hs, vs, tq in comps:
            zzc = np.asarray(coef_rows[cid], dtype=np.float64)
            zzc = zzc.reshape(-1, 64) * qt[tq][None, :].astype(
                np.float64
            )
            blocks = np.zeros_like(zzc)
            blocks[:, _ZZ] = zzc
            px = (
                _M.T @ blocks.reshape(-1, 8, 8) @ _M
            ) + 128.0
            planes[cid] = (
                px.reshape(mcuy, mcux, vs, hs, 8, 8)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(mcuy * vs * 8, mcux * hs * 8)
            )
        # nearest-neighbor upsample each component to full res, crop
        chans = []
        for cid, hs, vs, _ in comps:
            p = planes[cid]
            if hs != h_max or vs != v_max:
                p = p.repeat(v_max // vs, axis=0).repeat(
                    h_max // hs, axis=1
                )
            chans.append(p[:height, :width])
        if len(chans) == 1:
            out = chans[0][:, :, None]
        elif len(chans) == 3:  # JFIF YCbCr -> RGB
            y, cb, cr = chans
            r = y + 1.402 * (cr - 128.0)
            g = (
                y
                - 0.344136 * (cb - 128.0)
                - 0.714136 * (cr - 128.0)
            )
            b = y + 1.772 * (cb - 128.0)
            out = np.stack([r, g, b], axis=2)
        else:
            raise NotImplementedError(
                f"{len(chans)}-component JPEG (CMYK?) needs PIL"
            )
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    def _ima_adpcm_array(data, body_at, n, n_ch, blk_align):
        """IMA/DVI ADPCM (WAV format 0x11) → int16-grid samples,
        shape (n_samples, n_ch). Standard IMA tables (IMA ADPCM
        Reference, 1992; identical constants in every g72x/dvi
        implementation). Block layout: per channel a 4-byte header
        (int16 predictor = sample 0, uint8 step index), then 4-byte
        nibble groups round-robin per channel, low nibble first.
        Blocks are self-contained, so decoding vectorizes across
        blocks×channels; the only sequential axis is the ~samples-
        per-block nibble recursion (numpy ops per step)."""
        # The data-section reshape below needs the post-header bytes to
        # split into whole 4-byte-per-channel units: (blk_align - 4*n_ch)
        # must be a multiple of 4*n_ch (r12 advice: n_ch=2, blk_align=12
        # passed the old %4 check and died in numpy reshape instead).
        if blk_align < 4 * n_ch or (blk_align - 4 * n_ch) % (4 * n_ch):
            raise ValueError("inconsistent IMA ADPCM block align")
        n_blocks = n // blk_align
        if n_blocks == 0:
            raise ValueError("IMA ADPCM data shorter than one block")
        spb = (blk_align - 4 * n_ch) * 2 // n_ch + 1
        blocks = np.frombuffer(
            data, np.uint8, count=n_blocks * blk_align, offset=body_at
        ).reshape(n_blocks, blk_align)
        hdr = blocks[:, : 4 * n_ch].reshape(n_blocks, n_ch, 4)
        pred = hdr[:, :, 0].astype(np.int32) | (
            hdr[:, :, 1].astype(np.int32) << 8
        )
        pred = np.where(pred >= 1 << 15, pred - (1 << 16), pred)
        idx = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)
        # data: 4-byte units, channels round-robin; 2 nibbles/byte,
        # low first → per channel a stream of spb-1 codes
        units = blocks[:, 4 * n_ch :].reshape(n_blocks, -1, n_ch, 4)
        nib = np.empty(units.shape[:3] + (8,), np.int32)
        nib[..., 0::2] = units & 0x0F
        nib[..., 1::2] = units >> 4
        codes = nib.transpose(0, 2, 1, 3).reshape(n_blocks, n_ch, -1)
        step_table = np.array(
            [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28,
             31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
             118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
             337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876,
             963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
             2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
             5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
             12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
             27086, 29794, 32767], np.int32,
        )
        index_table = np.array(
            [-1, -1, -1, -1, 2, 4, 6, 8] * 2, np.int32
        )
        out = np.empty((n_blocks, n_ch, spb), np.int32)
        out[:, :, 0] = pred
        for t in range(spb - 1):
            code = codes[:, :, t]
            step = step_table[idx]
            diff = (
                (step >> 3)
                + np.where(code & 1, step >> 2, 0)
                + np.where(code & 2, step >> 1, 0)
                + np.where(code & 4, step, 0)
            )
            pred = np.clip(
                np.where(code & 8, pred - diff, pred + diff),
                -32768, 32767,
            )
            idx = np.clip(idx + index_table[code], 0, 88)
            out[:, :, t + 1] = pred
        return out.transpose(0, 2, 1).reshape(-1, n_ch)

    def _ms_adpcm_array(data, body_at, n, n_ch, blk_align):
        """MS ADPCM (WAV format 2) → int16-grid samples, shape
        (n_samples, n_ch). Standard Microsoft tables (MSDN WAVE
        format spec; identical constants in every msadpcm.c). Block
        layout: per channel a predictor index byte, then per channel
        int16 idelta / sample1 / sample2 (7 bytes/channel header; the
        two header samples are emitted as the block's first two
        outputs, sample2 first), then 4-bit codes high-nibble-first,
        channel-interleaved per sample. Blocks are self-contained, so
        decoding vectorizes across blocks×channels; the sequential
        axis is the samples-per-block recursion (numpy ops per
        step)."""
        hdr_sz = 7 * n_ch
        if blk_align <= hdr_sz or (2 * (blk_align - hdr_sz)) % n_ch:
            raise ValueError("inconsistent MS ADPCM block align")
        n_blocks = n // blk_align
        if n_blocks == 0:
            raise ValueError("MS ADPCM data shorter than one block")
        spb = (blk_align - hdr_sz) * 2 // n_ch + 2
        blocks = np.frombuffer(
            data, np.uint8, count=n_blocks * blk_align, offset=body_at
        ).reshape(n_blocks, blk_align)

        def _i16(lo, hi):
            v = lo.astype(np.int32) | (hi.astype(np.int32) << 8)
            return np.where(v >= 1 << 15, v - (1 << 16), v)

        bpred = blocks[:, :n_ch].astype(np.int32)
        if (bpred >= 7).any():
            raise ValueError("MS ADPCM predictor index out of range")
        base = n_ch
        idelta = _i16(
            blocks[:, base : base + 2 * n_ch : 2],
            blocks[:, base + 1 : base + 2 * n_ch : 2],
        )
        base += 2 * n_ch
        samp1 = _i16(
            blocks[:, base : base + 2 * n_ch : 2],
            blocks[:, base + 1 : base + 2 * n_ch : 2],
        )
        base += 2 * n_ch
        samp2 = _i16(
            blocks[:, base : base + 2 * n_ch : 2],
            blocks[:, base + 1 : base + 2 * n_ch : 2],
        )
        coeff1 = np.array(
            [256, 512, 0, 192, 240, 460, 392], np.int32
        )[bpred]
        coeff2 = np.array(
            [0, -256, 0, 64, 0, -208, -232], np.int32
        )[bpred]
        adapt = np.array(
            [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230], np.int32,
        )
        # nibble stream: high nibble first, channels round-robin per
        # sample → (n_blocks, n_ch, spb-2) code planes
        body = blocks[:, hdr_sz:]
        nib = np.empty(body.shape + (2,), np.int32)
        nib[..., 0] = body >> 4
        nib[..., 1] = body & 0x0F
        codes = (
            nib.reshape(n_blocks, -1)
            .reshape(n_blocks, spb - 2, n_ch)
            .transpose(0, 2, 1)
        )
        out = np.empty((n_blocks, n_ch, spb), np.int32)
        out[:, :, 0] = samp2
        out[:, :, 1] = samp1
        for t in range(spb - 2):
            code = codes[:, :, t]
            signed = np.where(code >= 8, code - 16, code)
            pred = (
                (samp1 * coeff1 + samp2 * coeff2) >> 8
            ) + signed * idelta
            pred = np.clip(pred, -32768, 32767)
            samp2 = samp1
            samp1 = pred
            idelta = np.maximum((adapt[code] * idelta) >> 8, 16)
            out[:, :, t + 2] = pred
        return out.transpose(0, 2, 1).reshape(-1, n_ch)

    def wav_array(data: bytes):
        """RIFF/WAVE decode, any channel count: integer PCM at
        8/16/24/32-bit, IEEE float at 32/64-bit (format 3),
        G.711 A-law/µ-law (formats 6/7, canonical expansion),
        IMA/DVI ADPCM (format 0x11) and MS ADPCM (format 2) — the
        4-bit block codecs (r12/r13) — and WAVE_FORMAT_EXTENSIBLE
        (0xFFFE) wrappers; only entropy-coded audio (MP3/FLAC/OGG)
        still raises the guarded stub. Returns
        (sample_rate, int32 array of shape (n_samples, n_channels))
        with every depth aligned onto ONE documented 16-bit grid:
        8-bit → (v−128)·256, 16-bit verbatim, 24/32-bit → arithmetic
        shift down (high 16 bits), float → rint(clip(x, −1, 1)·32767),
        IMA predictor values verbatim (they ARE int16) — so downstream
        features (RMS, envelope hash) are depth-invariant by
        construction. IMA blocks decode independently (that is the
        format's design point), so the nibble recursion vectorizes
        across blocks×channels with numpy and — at 100 TB — across
        Arrow batches with zero cross-row state."""
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("bad WAV signature")
        pos = 12
        fmt = None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            clen = struct.unpack_from("<I", data, pos + 4)[0]
            body_at = pos + 8
            if cid == b"fmt ":
                (audio_fmt, n_ch, rate, _br, blk_align,
                 bits) = struct.unpack_from("<HHIIHH", data, body_at)
                if audio_fmt == 0xFFFE and clen >= 40:
                    # WAVE_FORMAT_EXTENSIBLE: the real format code is
                    # the first two bytes of the SubFormat GUID
                    audio_fmt = struct.unpack_from(
                        "<H", data, body_at + 24
                    )[0]
                if not (
                    (audio_fmt == 1 and bits in (8, 16, 24, 32))
                    or (audio_fmt == 3 and bits in (32, 64))
                    or (audio_fmt in (6, 7) and bits == 8)
                    or (audio_fmt in (2, 0x11) and bits == 4)
                ):
                    raise NotImplementedError(
                        "only integer PCM 8/16/24/32-bit, IEEE-float "
                        "32/64-bit, G.711 A-law/µ-law, and IMA/MS "
                        f"ADPCM WAV decode natively (got format="
                        f"{audio_fmt}, bits={bits}); MP3/FLAC/OGG "
                        "need ffmpeg here"
                    )
                fmt = (n_ch, rate, bits, audio_fmt, blk_align)
            elif cid == b"data":
                if fmt is None:
                    raise ValueError("WAV data chunk before fmt")
                n_ch, rate, bits, audio_fmt, blk_align = fmt
                if n_ch == 0 or rate == 0:
                    raise ValueError("inconsistent WAV fmt")
                if audio_fmt == 0x11:
                    return rate, _ima_adpcm_array(
                        data, body_at,
                        min(clen, len(data) - body_at),
                        n_ch, blk_align,
                    )
                if audio_fmt == 2:
                    return rate, _ms_adpcm_array(
                        data, body_at,
                        min(clen, len(data) - body_at),
                        n_ch, blk_align,
                    )
                width = bits // 8
                n = min(clen, len(data) - body_at)
                n -= n % (width * n_ch)
                if audio_fmt in (6, 7):
                    # G.711 companded bytes -> linear 16-bit grid via
                    # the canonical 256-entry expansion (the exact
                    # Sun/CCITT g711.c formulas; A-law tops at ±32256,
                    # µ-law at ±32124 on this grid)
                    lut = np.empty(256, np.int32)
                    for code in range(256):
                        if audio_fmt == 6:  # A-law
                            a = code ^ 0x55
                            t = (a & 0x0F) << 4
                            seg = (a & 0x70) >> 4
                            if seg == 0:
                                t += 8
                            elif seg == 1:
                                t += 0x108
                            else:
                                t = (t + 0x108) << (seg - 1)
                            lut[code] = t if a & 0x80 else -t
                        else:  # µ-law
                            u = ~code & 0xFF
                            t = (((u & 0x0F) << 3) + 0x84) << (
                                (u & 0x70) >> 4
                            )
                            lut[code] = (
                                0x84 - t if u & 0x80 else t - 0x84
                            )
                    raw = lut[
                        np.frombuffer(
                            data, dtype=np.uint8, count=n,
                            offset=body_at,
                        )
                    ]
                elif audio_fmt == 3:
                    f = np.frombuffer(
                        data,
                        dtype="<f4" if bits == 32 else "<f8",
                        count=n // width,
                        offset=body_at,
                    )
                    raw = np.rint(
                        np.clip(f, -1.0, 1.0) * 32767.0
                    ).astype(np.int32)
                elif bits == 16:
                    raw = np.frombuffer(
                        data, dtype="<i2", count=n // 2, offset=body_at
                    ).astype(np.int32)
                elif bits == 8:
                    raw = (
                        np.frombuffer(
                            data, dtype=np.uint8, count=n,
                            offset=body_at,
                        ).astype(np.int32)
                        - 128
                    ) * 256  # align 8-bit onto the 16-bit grid
                elif bits == 24:
                    b3 = np.frombuffer(
                        data, dtype=np.uint8, count=n, offset=body_at
                    ).reshape(-1, 3).astype(np.int32)
                    v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
                    v = np.where(v >= 1 << 23, v - (1 << 24), v)
                    raw = v >> 8  # high 16 bits (arithmetic)
                else:  # 32-bit integer PCM
                    raw = (
                        np.frombuffer(
                            data, dtype="<i4", count=n // 4,
                            offset=body_at,
                        )
                        >> 16
                    ).astype(np.int32)
                return rate, raw.reshape(-1, n_ch)
            pos = body_at + clen + (clen & 1)  # chunks are word-aligned
        raise ValueError("WAV missing data chunk")

    def any_array(data: bytes):
        if data[:2] == b"BM":
            return bmp_array(data)
        if data[:2] in (b"P6", b"P5"):
            return pnm_array(data)
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            return png_array(data)
        if data[:2] == b"\xff\xd8":
            return jpeg_array(data)
        raise NotImplementedError(
            "only uncompressed BMP, binary PPM/PGM, 8-bit "
            "non-interlaced PNG, and baseline JPEG decode natively; "
            "WebP/TIFF/... need PIL/libvips here"
        )

    return {
        "png": png_array,
        "jpeg": jpeg_array,
        "bmp": bmp_array,
        "pnm": pnm_array,
        "wav": wav_array,
        "any": any_array,
    }


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
    comments), PNG (8-bit gray/gray-alpha/RGB/RGBA, non-interlaced:
    zlib inflate + per-scanline None/Sub/Up/Average/Paeth unfilter),
    and baseline sequential JPEG (Huffman + dequant + IDCT, DRI/RSTn,
    chroma subsampling — new r9). The remaining compressed formats
    (WebP/TIFF, progressive JPEG) raise NotImplementedError — that
    branch is where PIL/libvips plugs in.
    ``fake=True`` keeps the deterministic pseudo-decode for fixtures
    whose payloads aren't images at all.

    The operator ships self-contained: the decoders come from
    ``_pure_decoders()`` — nested functions cloudpickle serializes BY
    VALUE — so executor Python workers unpickle everything even when
    the package isn't importable on their sys.path (e.g. driver
    launched from another directory without shipping a pyFiles zip).
    """
    decode_any = _pure_decoders()["any"]

    def decode_iter(batches) -> Iterator:
        import pandas as pd

        def decode_one(payload: bytes) -> tuple[int, int, int, float]:
            if not fake:
                arr = decode_any(payload)
                h, w, c = arr.shape
                return w, h, c, float(arr.mean())
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
    unlike the byte-level sha/byte-histogram tiers (the
    JPEG-vs-BMP-of-the-same-raster parity test pins exactly that
    robustness, bit for bit).

    ``fake=False`` consumes REAL decoded pixels via the same
    ``_pure_decoders()`` set as decode_images (BMP/PPM/PGM/PNG +
    baseline JPEG); ``fake=True`` hashes a deterministic byte grid so
    the distributed plumbing runs on non-image fixture payloads. The
    hash lands as a signed int64 (two's-complement wrap) so downstream
    bit_count/xor stay in Spark long math. The decoders are shipped
    by value for the same pickle isolation decode_images documents."""
    decode_any = _pure_decoders()["any"]

    def ahash_iter(batches):
        import numpy as np
        import pandas as pd

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
                arr = decode_any(payload)
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
    Output explosion happens executor-side — the driver never sees
    frame data.

    ``fake=False`` does REAL container-aware sampling for MJPEG-in-AVI
    (r12): the RIFF/AVI chunk tree is walked to the ``movi`` payload,
    the ``##dc``/``##db`` video-stream chunks ARE the frames (each one
    a complete baseline JPEG that ``decode_images`` can decode), and
    ``n_frames`` are picked evenly across the real frame sequence —
    offsets and fingerprints refer to actual frames, not byte ranges.
    Entropy-coded inter-frame codecs (H.264/VP9/...) still raise the
    guarded stub; that branch is where ffmpeg plugs in. ``fake=True``
    keeps the deterministic byte-range pseudo-sampler for non-video
    fixture payloads, exact down to the DuckDB hex twin."""

    def _avi_video_frames(data: bytes):
        """(offset, size) of every video-stream chunk in an AVI, in
        file order — a linear RIFF walk, no index required (players
        fall back to exactly this scan when idx1 is absent)."""
        frames = []
        stack = [(12, len(data))]  # after RIFF size + 'AVI '
        while stack:
            pos, end = stack.pop()
            while pos + 8 <= end:
                cid = data[pos : pos + 4]
                clen = struct.unpack_from("<I", data, pos + 4)[0]
                body = pos + 8
                if cid in (b"RIFF", b"LIST"):
                    stack.append((body + 4, min(body + clen, end)))
                elif (
                    cid[2:4] in (b"dc", b"db")
                    and cid[:2].isdigit()
                    and clen
                ):
                    frames.append((body, min(clen, end - body)))
                pos = body + clen + (clen & 1)
        frames.sort()
        return frames

    import struct

    def frames_iter(batches) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                data = payload if payload is not None else b""
                if not fake:
                    if bytes(data[:4]) != b"RIFF" or bytes(
                        data[8:12]
                    ) != b"AVI ":
                        raise NotImplementedError(
                            "only MJPEG-in-AVI frame extraction is "
                            "native (RIFF walk + baseline JPEG "
                            "frames); inter-frame codecs need ffmpeg "
                            "here"
                        )
                    data = bytes(data)
                    found = _avi_video_frames(data)
                    if not found:
                        raise ValueError("AVI contains no video chunks")
                    # Evenly spaced across the WHOLE frame sequence
                    # (first and last frame included): the old
                    # found[::max(1, len//n)][:n] biased toward the
                    # file head when the division truncated (7 frames,
                    # n=4 yielded 0-3, never the back half — r12
                    # advice). round(i*(m-1)/(n-1)) spreads picks and
                    # never duplicates when m >= n.
                    m = len(found)
                    if m <= n_frames:
                        picks = list(range(m))
                    elif n_frames == 1:
                        picks = [0]
                    else:
                        picks = [
                            round(i * (m - 1) / (n_frames - 1))
                            for i in range(n_frames)
                        ]
                    for fi, (off, sz) in enumerate(
                        found[p] for p in picks
                    ):
                        rows.append(
                            (
                                int(doc_id),
                                fi,
                                off,
                                hashlib.sha256(
                                    data[off : off + sz]
                                    .hex()
                                    .upper()
                                    .encode("ascii")
                                ).hexdigest(),
                            )
                        )
                    continue
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


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio(
    df: DataFrame, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Decode binary audio payloads to waveform features via the same
    Arrow-batched ``mapInPandas`` shape as decode_images — the audio
    member of the multimodal tier (round 9).

    ``fake=False`` is a REAL pure-NumPy decoder for RIFF/WAVE PCM
    (8-bit unsigned and 16-bit signed LE, any channel count, chunked
    containers with word alignment): sample rate, channel count,
    per-channel sample count, duration, and RMS amplitude on the
    [-1, 1) grid (8-bit aligned onto the 16-bit lattice so the same
    waveform at either depth yields the same features up to
    quantization). Compressed audio (MP3/FLAC/OGG) and non-PCM WAV
    raise the guarded NotImplementedError — that branch is where
    ffmpeg/soundfile plugs in. ``fake=True`` keeps a deterministic
    byte-level pseudo-decode for non-audio fixture payloads, exact
    down to the DuckDB hex twin (_MULTIMODAL_AUDIO_SQL)."""
    wav = _pure_decoders()["wav"]

    def audio_iter(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        def decode_one(payload: bytes):
            if not fake:
                if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    rate, samples = wav(payload)
                    n, ch = samples.shape
                    x = samples.astype(np.float64) / 32768.0
                    rms = float(np.sqrt((x * x).mean())) if n else 0.0
                    return (
                        rate, ch, n, n * 1000 // max(rate, 1), rms
                    )
                raise NotImplementedError(
                    "only PCM WAV decodes natively; MP3/FLAC/OGG need "
                    "ffmpeg/soundfile here"
                )
            n = len(payload)
            rate = 8000 + (n % 8) * 1000
            ch = 1 + (n % 2)
            mean = (sum(payload[:256]) / min(n, 256)) if n else 0.0
            return (rate, ch, n, n * 1000 // rate, mean / 255.0)

        for pdf in batches:
            feats = [
                decode_one(p if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sample_rate": [f[0] for f in feats],
                    "n_channels": [f[1] for f in feats],
                    "n_samples": [f[2] for f in feats],
                    "duration_ms": [f[3] for f in feats],
                    "rms": [f[4] for f in feats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(audio_iter, _AUDIO_SCHEMA)


def envelope_hash_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    fake: bool = True,
    n_windows: int = 64,
) -> DataFrame:
    """64-bit energy-envelope fingerprint per audio payload — the
    audio counterpart of the image aHash: decode → mono mix → split
    into ``n_windows`` equal windows → per-window RMS → bit i =
    rms_i > mean(rms). Mean-thresholding makes the hash invariant to
    uniform gain (amplitude scaling scales every window and the mean
    alike) and robust to requantization (8-bit vs 16-bit of the same
    waveform hash identically, pinned in tests) — the cheap
    perceptual feature for audio near-dup ahead of byte-level sha.
    Lands as signed int64 so downstream bit_count/xor stay in Spark
    long math (audio_near_dup_pairs reuses the SimHash Hamming
    machinery)."""
    wav = _pure_decoders()["wav"]

    def env_iter(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        def hash_one(payload: bytes) -> int:
            if fake:
                data = (payload or b"\x00") * (
                    1 + n_windows // max(1, len(payload or b"\x00"))
                )
                env = np.frombuffer(
                    data[:n_windows], dtype=np.uint8
                ).astype(np.float64)
            else:
                _rate, samples = wav(payload)
                mono = samples.astype(np.float64).mean(axis=1)
                n = len(mono)
                if n == 0:
                    env = np.zeros(n_windows)
                else:
                    # pad to a multiple so every window is equal-size
                    pad = (-n) % n_windows
                    mono = np.concatenate([mono, np.zeros(pad)])
                    w = mono.reshape(n_windows, -1)
                    env = np.sqrt((w * w).mean(axis=1))
            bits = (env > env.mean()).astype(np.uint64)
            val = np.uint64(0)
            for b in bits:
                val = (val << np.uint64(1)) | b
            return int(val.astype(np.int64))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "envelope_hash": [
                        hash_one(p if p is not None else b"")
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        env_iter,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("envelope_hash", T.LongType()),
            ]
        ),
    )


def audio_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Perceptual near-dup pairs over audio payloads: envelope hash →
    pigeonhole chunk-bucketed Hamming join — the exact machinery
    media_phash_near_dup uses for images, applied to the audio
    fingerprint. Candidates equi-join on exact hash chunks, never a
    cross join; one bit_count(xor) verifies."""
    from .dedup import hamming_chunk_pairs

    sk = envelope_hash_audio(df, id_col=id_col, fake=fake).cache()
    return hamming_chunk_pairs(
        sk, id_col, "envelope_hash", bits=64, max_hamming=max_hamming
    )
