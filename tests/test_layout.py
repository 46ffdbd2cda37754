"""Z-order (Morton) layout operator: cross-engine bit-exactness and
the pruning property the layout exists to provide."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from amazonmsk_emr_tem_data_spark.operators.layout import (
    morton16,
    morton16_sql,
    scale_to_16bit,
    spread_bits16,
    spread_bits16_sql,
)


def _py_spread(x: int) -> int:
    x &= 0xFFFF
    for sh, m in (
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ):
        x = (x | (x << sh)) & m
    return x


def _py_morton(a: int, b: int) -> int:
    return _py_spread(a) | (_py_spread(b) << 1)


SAMPLES = [0, 1, 2, 3, 255, 256, 4095, 12345, 32768, 65535, 70000]


def test_spread_bits_reference_and_sql_twin():
    """Spark column, DuckDB SQL twin, and the bit-by-bit Python
    reference agree on every sample — including the >16-bit input
    that must be masked."""
    for v in SAMPLES:
        expected = _py_spread(v)
        got_sql = duckdb.sql(
            f"SELECT {spread_bits16_sql(str(v))}"
        ).fetchone()[0]
        assert got_sql == expected, f"duckdb spread({v})"


def test_morton_spark_matches_python_reference(spark):
    pairs = [(a, b) for a in SAMPLES for b in SAMPLES[:5]]
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", morton16(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _py_morton(r["a"], r["b"]), (r["a"], r["b"])


def test_morton_sql_twin_matches_python_reference():
    for a, b in [(0, 0), (1, 0), (0, 1), (65535, 65535), (123, 456)]:
        got = duckdb.sql(
            f"SELECT {morton16_sql(str(a), str(b))}"
        ).fetchone()[0]
        assert got == _py_morton(a, b), (a, b)


def test_morton_interleave_structure():
    """a occupies even bit positions, b odd — so z-order locality holds
    for both dimensions symmetrically."""
    assert _py_morton(0xFFFF, 0) == 0x55555555
    assert _py_morton(0, 0xFFFF) == 0xAAAAAAAA
    assert _py_morton(0xFFFF, 0xFFFF) == 0xFFFFFFFF


def test_scale_to_16bit_order_preserving_and_full_range(spark):
    df = spark.range(0, 2000).select(
        F.col("id"), scale_to_16bit(F.col("id"), 1999).alias("s")
    )
    rows = sorted((r["id"], r["s"]) for r in df.collect())
    vals = [s for _, s in rows]
    assert vals == sorted(vals), "scaling must preserve order"
    assert vals[0] == 0
    assert 65536 - 64 <= vals[-1] < 65536, "must use the full 16-bit range"


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    """The layout's reason to exist: after Morton sharding, a selective
    range predicate on EITHER key prunes a majority of shards. A
    single-key sort would leave one of the two columns unprunable
    (every shard spans the full other-key domain)."""
    from amazonmsk_emr_tem_data_spark.queries import REGISTRY

    rows = REGISTRY["zorder_layout_stats"][0](spark, sf_dir).collect()
    n = len(rows)
    part_hits = sum(r["scans_for_part_range"] for r in rows)
    supp_hits = sum(r["scans_for_supp_range"] for r in rows)
    assert n >= 16, f"expected a sharded layout, got {n} shards"
    assert part_hits <= n / 2, (
        f"part-range predicate should prune >=half the shards "
        f"({part_hits}/{n} scanned)"
    )
    assert supp_hits <= n / 2, (
        f"supp-range predicate should prune >=half the shards "
        f"({supp_hits}/{n} scanned)"
    )


def test_scale_to_16bit_signed_domain(spark):
    """Negative keys shift by the domain minimum: scaled values stay in
    [0, 65536) and order is preserved — without the shift the mask in
    spread_bits16 would send negatives to the TOP of the domain."""
    df = spark.range(-1000, 1000).select(
        F.col("id"), scale_to_16bit(F.col("id"), 999, -1000).alias("s")
    )
    rows = sorted((r["id"], r["s"]) for r in df.collect())
    vals = [s for _, s in rows]
    assert vals == sorted(vals)
    assert vals[0] == 0 and 65536 - 64 <= vals[-1] < 65536


# ---------------------------------------------------------------------------
# Hilbert-curve layout (operators/hilbert.py)
# ---------------------------------------------------------------------------


def test_hilbert_fsm_tables_match_reference_exhaustively():
    """The 4-state FSM tables must reproduce the classic rotate/
    reflect xy2d algorithm for EVERY point of the full 256x256 grid —
    a mechanical re-derivation of the equivalence the tables were
    built from (any typo in either 16-entry table fails hundreds of
    cells)."""
    from amazonmsk_emr_tem_data_spark.operators.hilbert import (
        NEXT_TABLE,
        OUT_TABLE,
        xy2d_reference,
    )

    def fsm_d(p, x, y):
        st, d = 0, 0
        for lvl in range(p - 1, -1, -1):
            idx = st * 4 + ((x >> lvl) & 1) * 2 + ((y >> lvl) & 1)
            d = (d << 2) | OUT_TABLE[idx]
            st = NEXT_TABLE[idx]
        return d

    for x in range(256):
        for y in range(256):
            assert fsm_d(8, x, y) == xy2d_reference(256, x, y), (x, y)


def test_hilbert_spark_matches_python_reference(spark):
    """The unrolled 16-step column expression == the pure-Python
    reference at full 16-bit depth, on a key sample crossing every
    state transition (corners, diagonals, adjacent cells, high bits)."""
    from amazonmsk_emr_tem_data_spark.operators.hilbert import (
        hilbert16,
        xy2d_reference,
    )

    pts = [
        (0, 0), (0, 65535), (65535, 0), (65535, 65535),
        (1, 0), (0, 1), (32768, 32767), (32767, 32768),
        (12345, 54321), (40000, 2), (257, 65280), (21845, 43690),
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hd"]
        for r in df.select(
            "x", "y", hilbert16(F.col("x"), F.col("y")).alias("hd")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == xy2d_reference(1 << 16, x, y), (x, y)


def test_hilbert_adjacency_no_seams():
    """The property Z-order lacks: consecutive Hilbert positions are
    ADJACENT grid cells (|dx|+|dy| == 1), so range-sharding the index
    gives contiguous rectangles-ish regions and tighter per-shard
    bounding boxes. Checked over a full 64x64 walk via the reference
    (d2xy inverse derived by sorting)."""
    from amazonmsk_emr_tem_data_spark.operators.hilbert import (
        xy2d_reference,
    )

    n = 64
    by_d = {}
    for x in range(n):
        for y in range(n):
            by_d[xy2d_reference(n, x, y)] = (x, y)
    assert len(by_d) == n * n  # bijection
    for d in range(n * n - 1):
        x0, y0 = by_d[d]
        x1, y1 = by_d[d + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1, (d, (x0, y0), (x1, y1))


def test_hilbert_prunes_both_dimensions_at_least_as_well_as_zorder(
    spark, sf_dir
):
    """Same shards, same predicates, same scaling as the Z-order audit
    — the Hilbert layout must ALSO prune a majority of shards on each
    key, and in total scan no more shards than Morton (the
    adjacent-walk locality argument, measured)."""
    from amazonmsk_emr_tem_data_spark.queries import REGISTRY

    def hits(name):
        rows = REGISTRY[name][0](spark, sf_dir).collect()
        return (
            len(rows),
            sum(r["scans_for_part_range"] for r in rows),
            sum(r["scans_for_supp_range"] for r in rows),
        )

    n_h, part_h, supp_h = hits("hilbert_layout_stats")
    n_z, part_z, supp_z = hits("zorder_layout_stats")
    assert n_h >= 16
    assert part_h <= n_h / 2
    assert supp_h <= n_h / 2
    assert part_h + supp_h <= part_z + supp_z, (
        f"hilbert scanned {part_h}+{supp_h} shards vs zorder "
        f"{part_z}+{supp_z}"
    )
