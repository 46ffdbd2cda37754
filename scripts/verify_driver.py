"""Simulate the driver's correctness gate locally.

Vanilla SparkSession (the real driver brings its own), import
__spark_entry__ by path, then:
  t1: entry(spark).collect() -> rows > 0
  t2: every queries()[name] vs oracle_sql()[name] in DuckDB at sf0.01
      (sorted column names, row count, Counter of normalized tuples).

TYPE-STRICT by design (round-5 hardening): the oracle result is fetched
through Arrow (``con.execute(sql).arrow()``), NOT ``fetchall()`` —
DuckDB's Python fetchall() silently converts HUGEINT (the result type of
``SUM(int)``) to a plain int, which hid the exact class of bug that
hash-failed 5 queries in round 4 (the driver compares Arrow-level
values, where HUGEINT surfaces as decimal128 != Spark's int64).
``norm`` keeps Decimal as its own type — never equal to an int or a
float — and the per-column type categories (int/float/decimal/bool/...)
are compared alongside the values. No Spark query here outputs a
DecimalType, so ANY decimal in an oracle output is an oracle bug.

Usage: python scripts/verify_driver.py [--sf /root/testdata/sf0.01] [--only q1,q2]
Exit 0 iff everything matches (no_oracle queries need rows >= 0 only).
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import traceback
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        # type-strict: a Decimal NEVER normalizes to int/float — the
        # driver's hash distinguishes decimal128 from int64/float64.
        return ("decimal", str(v))
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def arrow_cat(t: pa.DataType):
    """Collapse an Arrow type to the category the driver's Python-level
    value hash distinguishes: int widths collapse, float widths
    collapse, decimal stays distinct."""
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
        return ("list", arrow_cat(t.value_type))
    if pa.types.is_struct(t):
        return ("struct",) + tuple(
            (t.field(i).name, arrow_cat(t.field(i).type))
            for i in range(t.num_fields)
        )
    return str(t)


def spark_cat(dt):
    """pyspark DataType -> same category space as arrow_cat."""
    from pyspark.sql import types as T

    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.ArrayType):
        return ("list", spark_cat(dt.elementType))
    if isinstance(dt, T.StructType):
        return ("struct",) + tuple(
            (f.name, spark_cat(f.dataType)) for f in dt.fields
        )
    return str(dt)


def spark_counter(df):
    cols = sorted(df.columns)
    types = {f.name: spark_cat(f.dataType) for f in df.schema.fields}
    rows = df.select(*cols).collect()
    return (
        cols,
        [types[c] for c in cols],
        Counter(tuple(norm(v) for v in r) for r in rows),
    )


def duck_counter(con, sql):
    tbl = con.execute(sql).arrow()
    cols = list(tbl.column_names)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    types = [arrow_cat(tbl.schema.field(i).type) for i in order]
    pyrows = tbl.to_pylist()
    names = [cols[i] for i in order]
    return (
        sorted(cols),
        types,
        Counter(tuple(norm(r[c]) for c in names) for r in pyrows),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("verify_driver")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = len(mod.entry(spark).collect())
    print(f"t1 entry: {n} rows {'OK' if n > 0 else 'FAIL'}")
    if n <= 0:
        return 1

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    results = {}
    fails = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, args.sf)
            scols, stypes, scnt = spark_counter(df)
            if name not in oracles:
                results[name] = f"no_oracle rows={sum(scnt.values())}"
                continue
            ocols, otypes, ocnt = duck_counter(con, oracles[name])
            ok = scols == ocols and stypes == otypes and scnt == ocnt
            if ok:
                results[name] = f"pass rows={sum(scnt.values())}"
            else:
                fails += 1
                msg = []
                if scols != ocols:
                    msg.append(f"cols spark={scols} oracle={ocols}")
                elif stypes != otypes:
                    bad = [
                        f"{c}: spark={st} oracle={ot}"
                        for c, st, ot in zip(scols, stypes, otypes)
                        if st != ot
                    ]
                    msg.append(f"TYPE mismatch {bad}")
                if sum(scnt.values()) != sum(ocnt.values()):
                    msg.append(
                        f"rowcount spark={sum(scnt.values())} "
                        f"oracle={sum(ocnt.values())}"
                    )
                elif scnt != ocnt:
                    diff = list((scnt - ocnt).items())[:2]
                    msg.append(f"value diff e.g. {diff}")
                results[name] = "FAIL " + "; ".join(msg)
        except Exception as e:  # noqa: BLE001
            fails += 1
            results[name] = f"ERROR {type(e).__name__}: {e}"
            traceback.print_exc(limit=3)

    for name, r in results.items():
        print(f"  {name}: {r}")
    npass = sum(1 for r in results.values() if r.startswith("pass"))
    nno = sum(1 for r in results.values() if r.startswith("no_oracle"))
    print(
        json.dumps(
            {"checked": len(results), "pass": npass, "no_oracle": nno,
             "fail": fails}
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
