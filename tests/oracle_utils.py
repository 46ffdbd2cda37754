"""Local replica of the driver's oracle comparison.

Runs a Spark query and its DuckDB oracle SQL over the same parquet
tables and compares row count, sorted column names, per-column TYPE
CATEGORIES, and an order-insensitive multiset of normalized row values.
Stricter than the driver (exact value equality, not a rounded hash) —
the engine's determinism rules (integer-grid sums, UTC, total
orderings) are designed to make exact equality hold.

TYPE-STRICT by design (round-5 hardening, after the round-4 driver
hash-fails): the oracle result is fetched through Arrow, NOT
``fetchall()`` — DuckDB's Python fetchall() converts HUGEINT (the
result of ``SUM(int)``) to a plain int, hiding the decimal128-vs-int64
divergence the driver's Arrow-level hash sees. ``_norm`` keeps Decimal
as its own type (never comparing equal to an int or float), and
``compare`` additionally asserts the per-column type categories match.
No Spark query in the registry outputs DecimalType, so any decimal in
an oracle output is an oracle bug (an uncast integer SUM).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import pyarrow as pa

from amazonmsk_emr_tem_data_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        # type-strict: never collapse to float/int (driver distinguishes
        # decimal128 from int64 — the round-4 HUGEINT hash-fail class)
        return ("decimal", str(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact by design; repr keeps full precision
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def arrow_type_category(t: pa.DataType):
    """Collapse an Arrow type to the category the driver's value hash
    distinguishes: int widths collapse, float widths collapse, decimal
    stays its own (incompatible) category."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", arrow_type_category(t.value_type))
    if pa.types.is_struct(t):
        return ("struct",) + tuple(
            (t.field(i).name, arrow_type_category(t.field(i).type))
            for i in range(t.num_fields)
        )
    if pa.types.is_null(t):
        return "null"
    return str(t)


def spark_type_category(dtype):
    """pyspark DataType -> same category space as arrow_type_category."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.BooleanType):
        return "bool"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dtype, T.DecimalType):
        return "decimal"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dtype, T.DateType):
        return "date"
    if isinstance(dtype, T.StringType):
        return "str"
    if isinstance(dtype, T.BinaryType):
        return "bytes"
    if isinstance(dtype, T.ArrayType):
        return ("list", spark_type_category(dtype.elementType))
    if isinstance(dtype, T.StructType):
        return ("struct",) + tuple(
            (f.name, spark_type_category(f.dataType)) for f in dtype.fields
        )
    if isinstance(dtype, T.NullType):
        return "null"
    return str(dtype)


def oracle_arrow(con, sql: str) -> pa.Table:
    """Run oracle SQL and return the Arrow table (decimal-preserving)."""
    return con.execute(sql).arrow()


def assert_type_parity(spark_df, oracle_tbl: pa.Table) -> None:
    """Assert per-column type-category equality (sorted by name)."""
    s_types = {
        f.name: spark_type_category(f.dataType)
        for f in spark_df.schema.fields
    }
    o_types = {
        oracle_tbl.schema.field(i).name: arrow_type_category(
            oracle_tbl.schema.field(i).type
        )
        for i in range(len(oracle_tbl.schema))
    }
    assert sorted(s_types) == sorted(o_types), (
        f"columns differ: {sorted(s_types)} vs {sorted(o_types)}"
    )
    bad = {
        c: (s_types[c], o_types[c])
        for c in s_types
        if s_types[c] != o_types[c]
    }
    assert not bad, (
        "type-category mismatch (spark, oracle) — an uncast oracle "
        f"aggregate (HUGEINT/decimal128)? {bad}"
    )


def compare(spark_df, con, sql: str, sort_cols: bool = True) -> None:
    sdf = spark_df
    s_cols = list(sdf.columns)
    s_rows = sdf.collect()

    tbl = oracle_arrow(con, sql)
    o_cols = list(tbl.column_names)
    o_rows = tbl.to_pylist()

    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert_type_parity(sdf, tbl)
    assert len(s_rows) == len(o_rows), f"row count differs: {len(s_rows)} vs {len(o_rows)}"

    from collections import Counter

    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    names = sorted(o_cols)
    s_set = Counter(tuple(_norm(r[i]) for i in s_idx) for r in s_rows)
    o_set = Counter(tuple(_norm(r[c]) for c in names) for r in o_rows)
    only_s = list((s_set - o_set).items())[:3]
    only_o = list((o_set - s_set).items())[:3]
    assert s_set == o_set, f"values differ; spark-only: {only_s}; oracle-only: {only_o}"
