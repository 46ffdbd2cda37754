"""Local replica of the driver's oracle comparison.

Runs a Spark query and its DuckDB oracle SQL over the same parquet
tables and compares row count, sorted column names, and an
order-insensitive multiset of normalized row values. Stricter than the
driver (exact value equality, not a rounded hash) — the engine's
determinism rules (decimal sums, UTC, total orderings) are designed to
make exact equality hold.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from amazonmsk_emr_tem_data_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact by design; repr keeps full precision
        return repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con, sql: str, sort_cols: bool = True) -> None:
    sdf = spark_df
    s_cols = list(sdf.columns)
    s_rows = sdf.collect()

    res = con.execute(sql)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()

    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count differs: {len(s_rows)} vs {len(o_rows)}"

    from collections import Counter

    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_set = Counter(tuple(_norm(r[i]) for i in s_idx) for r in s_rows)
    o_set = Counter(tuple(_norm(r[i]) for i in o_idx) for r in o_rows)
    only_s = list((s_set - o_set).items())[:3]
    only_o = list((o_set - s_set).items())[:3]
    assert s_set == o_set, f"values differ; spark-only: {only_s}; oracle-only: {only_o}"
