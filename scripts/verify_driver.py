"""Simulate the driver's correctness gate locally.

Vanilla SparkSession (the real driver brings its own), import
__spark_entry__ by path, then:
  t1: entry(spark).collect() -> rows > 0
  t2: every queries()[name] vs oracle_sql()[name] in DuckDB at sf0.01
      (sorted column names, row count, Counter of normalized tuples).

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
from datetime import datetime
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def spark_counter(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return cols, Counter(tuple(norm(v) for v in r) for r in rows)


def duck_counter(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = cur.fetchall()
    return sorted(cols), Counter(
        tuple(norm(r[i]) for i in order) for r in rows
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
            scols, scnt = spark_counter(df)
            if name not in oracles:
                results[name] = f"no_oracle rows={sum(scnt.values())}"
                continue
            ocols, ocnt = duck_counter(con, oracles[name])
            ok = scols == ocols and scnt == ocnt
            if ok:
                results[name] = f"pass rows={sum(scnt.values())}"
            else:
                fails += 1
                msg = []
                if scols != ocols:
                    msg.append(f"cols spark={scols} oracle={ocols}")
                if sum(scnt.values()) != sum(ocnt.values()):
                    msg.append(
                        f"rowcount spark={sum(scnt.values())} "
                        f"oracle={sum(ocnt.values())}"
                    )
                else:
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
