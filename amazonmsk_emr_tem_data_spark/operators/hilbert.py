"""Hilbert-curve clustering keys: the locality upgrade over Z-order.

Same 100 TB problem as ``operators/layout.py`` (multi-column min/max
pruning after compaction), better constant: the Hilbert curve visits
every cell of the 2^16 × 2^16 grid through ADJACENT cells only (no
Morton "seams" — Z-order jumps across the key space every time a high
bit flips), so consecutive curve positions differ in one key by one
step, per-file bounding boxes are tighter, and range predicates prune
more files at the same file count. Delta Lake's OPTIMIZE offers
exactly this switch (ZORDER → Hilbert as "liquid clustering") for the
same reason.

Implementation is the 4-state finite-state machine equivalent of the
classic per-level rotate/reflect loop (xy2d): process one bit from
each key MSB→LSB, 16 unrolled steps of two literal 16-entry table
lookups — pure BIGINT column algebra inside whole-stage codegen, no
UDF, no recursion. The tables are DERIVED mechanically from the
reference algorithm and verified exhaustively over the full 256×256
grid at import-derivation time (tests/test_layout.py re-runs both the
derivation and the exhaustive equivalence).

The chained state expressions grow quadratically in the step count
(state_i appears in the output lookup and the next state — ~16²
nodes total), which stays trivially small; the exponential
expression-tree blowup class (r4's lesson) would only appear if each
step referenced the previous state more than additively.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 4-state Hilbert FSM over input quadrant bits (bx, by), flattened as
#: state*4 + bx*2 + by. Derived from the standard xy2d rotate/reflect
#: loop and verified exhaustively (tests/test_layout.py).
NEXT_TABLE: list[int] = [1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2]
OUT_TABLE: list[int] = [0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0]

BITS = 16


def _compose_two_level() -> tuple[list[int], list[int]]:
    """Square the one-bit FSM: tables over (state, bx1, by1, bx2, by2)
    — two curve levels per lookup, flattened as state*16 + bx1*8 +
    by1*4 + bx2*2 + by2. Halves the expression chain (8 steps instead
    of 16), which matters because each step's state feeds TWO
    consumers and the tree grows with the square of the step count."""
    nxt2, out2 = [], []
    for s in range(4):
        for bits in range(16):
            bx1, by1 = (bits >> 3) & 1, (bits >> 2) & 1
            bx2, by2 = (bits >> 1) & 1, bits & 1
            i1 = s * 4 + bx1 * 2 + by1
            q1, s1 = OUT_TABLE[i1], NEXT_TABLE[i1]
            i2 = s1 * 4 + bx2 * 2 + by2
            q2, s2 = OUT_TABLE[i2], NEXT_TABLE[i2]
            out2.append(q1 * 4 + q2)
            nxt2.append(s2)
    return nxt2, out2


NEXT2_TABLE, OUT2_TABLE = _compose_two_level()


def hilbert16(a: Column, b: Column) -> Column:
    """32-bit Hilbert index of two 16-bit keys (``a`` = x, ``b`` = y):
    8 two-level FSM steps, each consuming two bits of each key
    MSB-first and emitting the 4-bit curve position (the squared
    tables of the canonical 1-bit FSM — bit-identical output, half
    the expression chain)."""
    x = a.cast("long").bitwiseAND(F.lit(65535))
    y = b.cast("long").bitwiseAND(F.lit(65535))
    nxt = F.lit(NEXT2_TABLE)
    out = F.lit(OUT2_TABLE)
    st: Column = F.lit(0).cast("long")
    d: Column = F.lit(0).cast("long")
    for lvl in range(BITS - 2, -1, -2):
        bx = F.shiftright(x, lvl).bitwiseAND(F.lit(3))
        by = F.shiftright(y, lvl).bitwiseAND(F.lit(3))
        # interleave the two bits of bx/by into bx1 by1 bx2 by2
        hi = F.shiftright(bx, 1) * 8 + F.shiftright(by, 1) * 4
        lo = bx.bitwiseAND(F.lit(1)) * 2 + by.bitwiseAND(F.lit(1))
        idx = (st * 16 + hi + lo + 1).cast("int")
        d = d * 16 + F.element_at(out, idx)
        st = F.element_at(nxt, idx)
    return d


def hilbert16_sql(a_expr: str, b_expr: str, base_from: str) -> str:
    """DuckDB twin of :func:`hilbert16` as a chain of 8 two-level CTE
    steps (``hstep0`` … ``hstep8`` over ``base_from``), ending with a
    CTE ``hilbert_coded`` exposing the base columns plus ``hd``.
    Chained CTEs keep the SQL text linear in the step count — a single
    nested expression would textually duplicate the state subtree
    exponentially."""
    nxt = "[" + ", ".join(str(v) for v in NEXT2_TABLE) + "]"
    out = "[" + ", ".join(str(v) for v in OUT2_TABLE) + "]"
    ctes = [
        f"hstep0 AS (SELECT *, CAST({a_expr} AS BIGINT) & 65535 AS hx,"
        f" CAST({b_expr} AS BIGINT) & 65535 AS hy,"
        f" CAST(0 AS BIGINT) AS st, CAST(0 AS BIGINT) AS hd"
        f" FROM {base_from})"
    ]
    for i, lvl in enumerate(range(BITS - 2, -1, -2)):
        idx = (
            f"(st * 16"
            f" + ((hx >> {lvl + 1}) & 1) * 8 + ((hy >> {lvl + 1}) & 1) * 4"
            f" + ((hx >> {lvl}) & 1) * 2 + ((hy >> {lvl}) & 1) + 1)"
        )
        ctes.append(
            f"hstep{i + 1} AS (SELECT * REPLACE ("
            f"hd * 16 + ({out})[{idx}] AS hd,"
            f" CAST(({nxt})[{idx}] AS BIGINT) AS st)"
            f" FROM hstep{i})"
        )
    ctes.append(f"hilbert_coded AS (SELECT * FROM hstep{BITS // 2})")
    return ",\n".join(ctes)


def xy2d_reference(n: int, x: int, y: int) -> int:
    """The classic rotate/reflect Hilbert d-index (pure Python) — the
    independent reference the FSM tables are tested against."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d
