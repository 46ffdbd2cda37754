"""Data-independent oracle type contracts (the round-4 HUGEINT lesson).

DuckDB's ``SUM(int)`` — including windowed SUMs and SUM(CASE...1...0) —
returns HUGEINT, which surfaces as Arrow decimal128. The driver's value
hash is type-sensitive, so an oracle output column that is an uncast
integer SUM hash-fails against Spark's int64 even when every value is
equal (exactly the 5 round-4 driver failures). No Spark query in the
registry outputs a DecimalType, so ANY hugeint/decimal anywhere in an
oracle's result schema is an oracle bug by construction.

``DESCRIBE`` resolves the oracle's output types without executing the
query, so this contract is independent of fixture data (a 0-row result
at one scale factor can't hide a type bug, the way
priority_lines_by_returnflag's vacuous r4 pass did). The exact
value-level cross-check lives in test_oracle_parity (type-strict since
round 5 via oracle_utils.compare).
"""

import pytest

from amazonmsk_emr_tem_data_spark.queries import REGISTRY

from .oracle_utils import duckdb_connection, spark_type_category

ORACLE_QUERIES = [name for name, (_, sql) in REGISTRY.items() if sql is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_output_never_hugeint_or_decimal(con, name):
    _, sql = REGISTRY[name]
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    # column_type is the full nested type string (e.g. BIGINT[],
    # STRUCT(a HUGEINT)), so a substring scan covers nested cases too.
    bad = {
        col: typ
        for col, typ, *_ in desc
        if "HUGEINT" in typ.upper() or "DECIMAL" in typ.upper()
    }
    assert not bad, (
        f"oracle '{name}' emits driver-hash-incompatible types "
        f"(uncast integer SUM? wrap in CAST(... AS BIGINT)): {bad}"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_columns_and_coarse_types_match_spark(spark, sf_dir, con, name):
    """Column names + top-level type categories, without running a
    Spark job (df.schema is analysis-only) or fetching oracle rows."""
    fn, sql = REGISTRY[name]
    df = fn(spark, sf_dir)
    s_types = {
        f.name: spark_type_category(f.dataType) for f in df.schema.fields
    }
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    o_types = {col: _duck_category(typ) for col, typ, *_ in desc}
    assert sorted(s_types) == sorted(o_types), (
        f"columns differ: {sorted(s_types)} vs {sorted(o_types)}"
    )
    bad = {
        c: (s_types[c], o_types[c])
        for c in s_types
        if o_types[c] != "opaque" and s_types[c] != o_types[c]
    }
    assert not bad, f"type-category mismatch (spark, oracle): {bad}"


def _duck_category(typ: str):
    """Coarse DuckDB type-string -> the category space of
    oracle_utils.spark_type_category. Nested/exotic types return
    'opaque' (covered value-level by test_oracle_parity instead)."""
    t = typ.upper()
    if t.endswith("[]"):
        inner = _duck_category(t[:-2])
        return ("list", inner) if inner != "opaque" else "opaque"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "HUGEINT" or t == "UHUGEINT" or t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t == "BLOB":
        return "bytes"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    return "opaque"
