"""Codec + tem semantics against the reference's own data files.

The CSVs under /root/reference/data/ are the reference pipeline's
fixtures (SURVEY.md §5); using them proves wire-level parity without a
Kafka broker.
"""

import pytest
from pyspark.sql import functions as F

from amazonmsk_emr_tem_data_spark.functions.codec import (
    from_kafka_envelope,
    to_kafka_envelope,
)
from amazonmsk_emr_tem_data_spark.functions.tem import with_tem_avg
from amazonmsk_emr_tem_data_spark.schemas import TEM_AVG_COL, tem_schema
from amazonmsk_emr_tem_data_spark.sources.files import read_tem_csv

CSV2 = "/root/reference/data/csv2.csv"


@pytest.fixture(scope="module")
def tem_df(spark):
    return read_tem_csv(spark, CSV2).cache()


def test_csv_scan_matches_reference_fixture(tem_df):
    # csv2.csv: 1,510 data rows, 755 duplicate ids (SURVEY.md §5)
    assert tem_df.count() == 1510
    assert "Unnamed: 0" not in tem_df.columns
    n_ids = tem_df.select("id").distinct().count()
    assert tem_df.count() - n_ids == 755


def test_envelope_roundtrip_engine_schema(spark, tem_df):
    sch = tem_schema()
    decoded = from_kafka_envelope(to_kafka_envelope(tem_df, key_col="id"), sch)
    orig = sorted(map(tuple, tem_df.collect()))
    back = sorted(map(tuple, decoded.collect()))
    assert orig == back


def test_envelope_roundtrip_compat_schema(spark):
    # compat mode reproduces the reference wire types exactly: float32
    # measures, string dateTime, string TbottomTestTankHpCir quirk
    # (temDataRead.py:34-43)
    df = read_tem_csv(spark, CSV2, compat=True)
    sch = tem_schema(compat=True)
    by_name = {f.name: f.dataType.simpleString() for f in sch.fields}
    assert by_name["dateTime"] == "string"
    assert by_name["TbottomTestTankHpCir"] == "string"  # the quirk
    assert by_name["Tamb"] == "float"
    decoded = from_kafka_envelope(to_kafka_envelope(df, key_col="id"), sch)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, decoded.collect()))


def test_envelope_key_is_string_id(spark, tem_df):
    env = to_kafka_envelope(tem_df, key_col="id")
    assert [f.name for f in env.schema.fields] == ["key", "value"]
    row = env.first()
    assert isinstance(row["key"], str) and row["key"].isdigit()


def test_malformed_value_yields_all_null_struct(spark):
    # PERMISSIVE from_json: garbage → all-NULL row (SURVEY §2.4 F2)
    garbage = spark.createDataFrame(
        [("1", "this is not json"), ("2", '{"truncated":')], ["key", "value"]
    )
    decoded = from_kafka_envelope(garbage, tem_schema())
    for row in decoded.collect():
        assert all(v is None for v in row)


def test_tem_avg_value_and_null_propagation(spark):
    cols = [f"T{i}" for i in range(10)]
    full = {c: float(i) for i, c in enumerate(cols)}  # mean = 4.5
    with_null = dict(full)
    with_null["T3"] = None
    df = spark.createDataFrame(
        [full, with_null], schema=", ".join(f"{c} double" for c in cols)
    )
    out = with_tem_avg(df).select(TEM_AVG_COL).collect()
    # row semantics: horizontal mean; ANY null channel → NULL result
    # (unlike vertical avg() which skips nulls) — SURVEY §7.4
    assert out[0][0] == pytest.approx(4.5)
    assert out[1][0] is None


def test_tem_avg_column_name_quirk(spark, tem_df):
    out = with_tem_avg(tem_df)
    assert TEM_AVG_COL in out.columns  # literal name "Tem(Avg)"
    # the parens force backtick quoting in SQL — prove it works
    out.createOrReplaceTempView("tem_out")
    r = out.sparkSession.sql("SELECT `Tem(Avg)` FROM tem_out LIMIT 1").collect()
    assert len(r) == 1
