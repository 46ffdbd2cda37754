"""Measure the pure-Python image-codec envelope at a realistic size
(r9 VERDICT ask #2): decode ONE ~1 MP image per codec path through the
exact decoders `decode_images(fake=False)` dispatches to, and report
pixels/sec — quantifying the cliff between the vectorized paths (BMP,
PNG None/Sub/Up rows) and the interpreted-loop paths (PNG Average/
Paeth unfilter, JPEG Huffman bit reader) that SCALING.md's codec row
records. Encoders are the committed fixture twins in
tests/test_northstar.py, so the bytes are bit-faithful to what the
test suite decodes.

Usage: python scripts/bench_codec_envelope.py [side]   # default 1024
Prints one JSON line {codec: {"sec": s, "px_per_sec": n}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonmsk_emr_tem_data_spark.operators.multimodal import (  # noqa: E402
    _pure_decoders,
)
from tests.test_northstar import _jpeg_bytes, _png_bytes  # noqa: E402
from tests.test_round13 import (  # noqa: E402
    _flac_bytes,
    _jpeg_progressive_bytes,
    _tiff_bytes,
    _walk_signal,
)


def _photo(side: int) -> np.ndarray:
    """Deterministic photo-ish RGB content: smooth gradients + seeded
    texture, so PNG filters neither trivially zero out nor degenerate
    to noise (both would misstate real-corpus cost)."""
    rng = np.random.default_rng(20260816)
    yy, xx = np.mgrid[0:side, 0:side]
    base = (
        128
        + 60 * np.sin(yy / 37.0)
        + 50 * np.cos(xx / 23.0)
        + rng.normal(0, 12, (side, side))
    )
    img = np.stack(
        [base, np.roll(base, side // 7, axis=1), base[::-1]], axis=-1
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def _bmp_bytes(arr: np.ndarray) -> bytes:
    """24-bit bottom-up BMP twin of tests' fixture encoder (inline so
    this script stays runnable without the Spark test fixtures)."""
    import struct

    h, w, _ = arr.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(
        arr[y, :, ::-1].tobytes() + b"\x00" * pad
        for y in range(h - 1, -1, -1)
    )
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + info + body


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    img = _photo(side)
    px = side * side
    dec = _pure_decoders()
    cases = {
        # worst-case PNG: every row Average or Paeth (the interpreted
        # per-byte recurrence) — a photo encoder's usual pick
        "png_avg_paeth": (
            dec["png"],
            _png_bytes(img, filters=[3 + (y & 1) for y in range(side)]),
        ),
        # best-case PNG: every row Up (vectorized numpy unfilter)
        "png_up": (dec["png"], _png_bytes(img, filters=[2] * side)),
        "jpeg_q92_420": (dec["jpeg"], _jpeg_bytes(img, 92, True)),
        # progressive re-serializes the same coefficients over ~10
        # scans — prices the multi-pass Huffman walk (r13)
        "jpeg_prog_q92_420": (
            dec["jpeg"],
            _jpeg_progressive_bytes(img, 92, True),
        ),
        "tiff_packbits": (
            dec["tiff"],
            _tiff_bytes(img, rows_per_strip=64, packbits=True),
        ),
        "bmp": (dec["bmp"], _bmp_bytes(img)),
    }
    out = {}
    for name, (fn, blob) in cases.items():
        fn(blob)  # warm (first call pays numpy/zlib import-side caches)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            arr = fn(blob)
            times.append(time.perf_counter() - t0)
        assert arr.shape[:2] == (side, side)
        sec = sorted(times)[1]
        out[name] = {
            "sec": round(sec, 3),
            "px_per_sec": int(px / sec),
            "mpx": round(px / 1e6, 2),
        }
    # FLAC: samples/sec at one "realistic minute" of 16-bit stereo
    n = side * side // 4  # scale the clip with the image budget
    clip = _walk_signal(n, 2, seed=20260816)
    blob = _flac_bytes(clip, rate=44100, block=4096)
    dec["flac"](blob)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _rate, got = dec["flac"](blob)
        times.append(time.perf_counter() - t0)
    assert got.shape == clip.shape
    sec = sorted(times)[1]
    out["flac_16b_stereo"] = {
        "sec": round(sec, 3),
        "samples_per_sec": int(n / sec),
        "n_samples": n,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
