"""Multidimensional data layout: Z-order (Morton) clustering keys.

The 100 TB problem this solves: a table physically sorted on ONE key
gives file-level min/max pruning on that key only — a predicate on any
other column scans everything. Interleaving the bits of two keys into a
single Morton code and range-sharding on it keeps rows that are close
in EITHER dimension close on disk, so per-shard (per-file) min/max
statistics stay tight on BOTH columns and a range predicate on either
one prunes ~sqrt-fraction of the files. This is the layout strategy
behind Delta/Iceberg `ZORDER BY` compaction, re-expressed as plain
Spark column algebra (no UDFs — every step is a shifted mask, fully
inside whole-stage codegen, and bit-identical in any engine).

Reference parity: the reference has no layout management at all (its
sink is a single CSV fold, `temReadFromTopic.py:98-102`); this module
is part of the 100 TB superset tier, with the same role as
storage.compact_small_files.

Algorithm (classic magic-number bit spreading): a 16-bit value is
spread onto the even bit positions of a 32-bit word in four
mask-and-shift steps, the second key lands on the odd positions, and
the OR of the two is the Morton code. Everything is BIGINT math with
decimal mask constants so the DuckDB oracle can run the identical
expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (shift, mask) steps spreading a 16-bit int onto even bit positions.
#: Masks in decimal so the same literals paste into DuckDB SQL:
#: 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 16711935),
    (4, 252645135),
    (2, 858993459),
    (1, 1431655765),
)


def spread_bits16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` onto even bit positions (0, 2,
    …, 30) of a 32-bit-wide BIGINT."""
    x = c.cast("long").bitwiseAND(F.lit(65535))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton16(a: Column, b: Column) -> Column:
    """32-bit Morton (Z-order) code interleaving two 16-bit keys:
    ``a`` on even bit positions, ``b`` on odd."""
    return spread_bits16(a).bitwiseOR(F.shiftleft(spread_bits16(b), 1))


def scale_to_16bit(c: Column, max_val: int, min_val: int = 0) -> Column:
    """Map a key in [min_val, max_val] onto the full 16-bit domain
    while preserving order (so the interleave uses all its bits even
    when the natural key range is narrow). Integer math:
    floor((c − min_val) * 65536 / (max_val − min_val + 1)).

    ``min_val`` matters for signed domains: spread_bits16 masks to the
    low 16 bits, so a NEGATIVE scaled value's two's-complement bits
    would land at the TOP of the domain and silently destroy locality
    — shifting by the domain minimum keeps every scaled key in
    [0, 65535]."""
    lo = int(min_val)
    # least(): the double intermediate loses integer precision past
    # 2^53, where (c-lo)*65536/(range+1) can round UP to exactly
    # 65536.0 for the domain max — spread_bits16's mask would then send
    # that key to 0, the wrong END of the layout. One extra codegen op
    # removes the edge entirely.
    return F.least(
        F.lit(65535),
        F.floor(
            (c.cast("long") - F.lit(lo))
            * F.lit(65536)
            / F.lit(int(max_val) - lo + 1)
        ).cast("long"),
    )


def spread_bits16_sql(expr: str) -> str:
    """DuckDB/ANSI twin of :func:`spread_bits16` — textually expands the
    four mask-and-shift steps (16 leaf copies of ``expr``; trivial for
    the integer exprs this is used with)."""
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def morton16_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB twin of :func:`morton16`."""
    return f"({spread_bits16_sql(a_expr)} | ({spread_bits16_sql(b_expr)} << 1))"
