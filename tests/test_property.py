"""Property-based tests: custom operators vs brute-force reference
implementations on randomized small inputs.

The oracle-parity suite pins each operator to ONE fixture distribution;
hypothesis explores the edges that distribution misses (empty sides,
all-equal timestamps, single-key data, interval boundaries). Brute
force is plain Python over collected rows — authoritative by
construction. Examples are kept small (Spark per-example overhead) but
each run samples fresh shapes.
"""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amazonmsk_emr_tem_data_spark.operators.joins import asof_join, range_join
from amazonmsk_emr_tem_data_spark.operators.skew import salted_agg, salted_join

BASE = datetime(2024, 1, 1)

# (key, ts_offset_minutes, payload)
left_rows = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 120),
        st.integers(-100, 100),
    ),
    min_size=0,
    max_size=12,
)
right_rows = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 120),
        st.integers(0, 50),
    ),
    min_size=0,
    max_size=12,
)

prop = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@prop
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    left = spark.createDataFrame(
        [
            (i, k, BASE + timedelta(minutes=m), p)
            for i, (k, m, p) in enumerate(lrows)
        ],
        "lid long, k long, ts timestamp, lp long",
    )
    right = spark.createDataFrame(
        [(k, BASE + timedelta(minutes=m), v) for (k, m, v) in rrows],
        "k long, rts timestamp, rv long",
    )
    out = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rv"],
        ).collect()
    }
    assert len(out) == len(lrows)  # exactly one row per left row
    for i, (k, m, _) in enumerate(lrows):
        lt = BASE + timedelta(minutes=m)
        cands = [
            (BASE + timedelta(minutes=rm), rv)
            for (rk, rm, rv) in rrows
            if rk == k and BASE + timedelta(minutes=rm) <= lt
        ]
        # operator tie-break: latest ts, then greatest tie_break col (rv)
        expect = max(cands)[1] if cands else None
        assert out[i] == expect, (i, lrows, rrows)


@prop
@given(lrows=left_rows, rrows=right_rows, dur=st.integers(1, 90))
def test_range_join_matches_bruteforce(spark, lrows, rrows, dur):
    left = spark.createDataFrame(
        [
            (i, k, BASE + timedelta(minutes=m))
            for i, (k, m, _) in enumerate(lrows)
        ],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (j, k, BASE + timedelta(minutes=m))
            for j, (k, m, _) in enumerate(rrows)
        ],
        "rid long, k long, start timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join(
            left, right, on="k", left_ts="ts",
            right_start=F.col("start"),
            right_end=F.col("start") + F.expr(f"INTERVAL {dur} MINUTES"),
            bucket="1 hour",
        ).collect()
    }
    expect = set()
    for i, (lk, lm, _) in enumerate(lrows):
        for j, (rk, rm, _) in enumerate(rrows):
            if lk == rk and rm <= lm < rm + dur:
                expect.add((i, j))
    assert got == expect, (lrows, rrows, dur)


@prop
@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(-50, 50)),
                     min_size=0, max_size=20),
       n_salts=st.integers(1, 5))
def test_salted_agg_matches_plain(spark, rows, n_salts):
    df = spark.createDataFrame(rows or [(0, 0)], "k long, v long")
    if not rows:
        df = df.limit(0)
    out = {
        r["k"]: (r["s"], r["n"])
        for r in salted_agg(
            df, ["k"],
            {"s": F.sum("v"), "n": F.count(F.lit(1))},
            n_salts=n_salts,
        ).collect()
    }
    expect = {}
    for k, v in rows:
        s, n = expect.get(k, (0, 0))
        expect[k] = (s + v, n + 1)
    assert out == expect


@prop
@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 9)),
                     min_size=0, max_size=15),
       dim=st.lists(st.integers(0, 2), min_size=0, max_size=3, unique=True),
       n_salts=st.integers(1, 4))
def test_salted_join_matches_plain(spark, rows, dim, n_salts):
    fact = spark.createDataFrame(rows or [(0, 0)], "k long, v long")
    if not rows:
        fact = fact.limit(0)
    d = spark.createDataFrame([(k, k * 10) for k in dim] or [(0, 0)],
                              "k long, w long")
    if not dim:
        d = d.limit(0)
    got = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(fact, d, on=["k"], n_salts=n_salts).collect()
    )
    expect = sorted(
        (k, v, k * 10) for (k, v) in rows if k in set(dim)
    )
    assert got == expect


def _py_greedy_merge(symbols, a, b):
    """Reference greedy left-to-right non-overlapping BPE merge."""
    out, jm = [], False
    for x in symbols:
        if not jm and out and out[-1] == a and x == b:
            out[-1] = a + b
            jm = True
        else:
            out.append(x)
            jm = False
    return out


_sym = st.sampled_from(["a", "b", "ab", "aa", "</w>", "x"])


@prop
@given(
    symbols=st.lists(_sym, min_size=1, max_size=8),
    a=_sym,
    b=_sym,
)
def test_bpe_merge_fold_three_way_agreement(spark, symbols, a, b):
    """The Spark array fold (_merge_pair), the DuckDB VARCHAR-packed
    fold (the oracle's workaround for list_reduce's broken struct
    accumulators), and a plain-python reference must agree on arbitrary
    symbol runs — including adjacent self-merges (aa), merged tokens
    colliding with raw ones (ab vs a+b), and marker symbols."""
    import duckdb

    from amazonmsk_emr_tem_data_spark.operators.bpe import _merge_pair

    want = _py_greedy_merge(symbols, a, b)

    df = spark.createDataFrame([(symbols,)], "symbols array<string>")
    got_spark = df.select(
        _merge_pair(F.col("symbols"), a, b).alias("m")
    ).first()["m"]
    assert got_spark == want, f"spark fold: {got_spark} != {want}"

    con = duckdb.connect()
    syms_sql = "[" + ", ".join("'" + s + "'" for s in symbols) + "]"
    fold = f"""SELECT string_split(substr(list_reduce({syms_sql},
      (st, e) -> CASE WHEN strpos(st, chr(31)) = 0 THEN
          CASE WHEN st = '{a}' AND e = '{b}'
               THEN '1' || chr(31) || '{a}' || '{b}'
               ELSE '0' || chr(31) || st || chr(31) || e END
        ELSE CASE WHEN substr(st, 1, 1) = '0'
                   AND right(st, 1 + length('{a}')) = chr(31) || '{a}'
                   AND e = '{b}'
               THEN '1' || substr(st, 2, length(st) - 1 - length('{a}'))
                    || '{a}' || '{b}'
               ELSE '0' || substr(st, 2) || chr(31) || e END END
    ), 3), chr(31))"""
    got_duck = con.execute(fold).fetchone()[0]
    # single-symbol lists never enter the lambda: list_reduce returns
    # the raw element, which substr/split mangle — normalize that case
    if len(symbols) == 1:
        got_duck = symbols
    assert got_duck == want, f"duckdb fold: {got_duck} != {want}"


@prop
@given(
    xs=st.lists(
        st.one_of(
            st.floats(-1.0, 1.0, allow_nan=False),
            # exact grid-edge shapes: (k + 0.5) / G lands x*G + 0.5 on
            # an integer boundary, the one place rounding modes diverge
            st.integers(-10**9, 10**9).map(lambda k: (k + 0.5) / 1e9),
            st.integers(-10**9, 10**9).map(lambda k: k / 1e9),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_floor_grid_three_engine_agreement(spark, xs):
    """The engine's one rounding convention — floor(x*G + 0.5) — must
    produce the identical long in numpy, Spark, and DuckDB for any
    double, INCLUDING exact .5 grid points (where np.round's
    half-to-even, F.round's HALF_UP, and duckdb round's
    half-away-from-zero all disagree; that three-way divergence is why
    the k-means fits standardized on floor). All three receive the
    same IEEE double, so product/add/floor must agree bit-for-bit."""
    import duckdb
    import numpy as np

    want = [int(v) for v in np.floor(np.array(xs, dtype=np.float64) * 1e9 + 0.5)]

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, x double")
    rows = df.select(
        "i", F.floor(F.col("x") * 1e9 + F.lit(0.5)).cast("long").alias("g")
    ).collect()
    got_spark = [r["g"] for r in sorted(rows, key=lambda r: r["i"])]
    assert got_spark == want, f"spark floor grid: {got_spark} != {want}"

    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT CAST(floor(? * 1e9 + 0.5) AS BIGINT)", [x]
        ).fetchone()[0]
        for x in xs
    ]
    assert got_duck == want, f"duckdb floor grid: {got_duck} != {want}"
