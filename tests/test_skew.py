"""Salting is exact: salted plans equal their unsalted twins."""

from pyspark.sql import functions as F

from amazonmsk_emr_tem_data_spark.operators.skew import salted_agg, salted_join
from amazonmsk_emr_tem_data_spark.sources.files import load_table


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    salted = salted_agg(
        orders,
        keys=["o_orderstatus"],
        sums={"n": F.count(F.lit(1)), "qty": F.sum(F.col("o_totalprice"))},
        n_salts=7,
    )
    plain = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("qty")
    )
    s = {r["o_orderstatus"]: (r["n"], round(r["qty"], 4)) for r in salted.collect()}
    p = {r["o_orderstatus"]: (r["n"], round(r["qty"], 4)) for r in plain.collect()}
    assert s == p


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    salted = salted_join(li, orders, on=["l_orderkey"], n_salts=5)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    assert rows(salted.select("l_orderkey", "l_quantity", "o_orderstatus")) == rows(
        plain.select("l_orderkey", "l_quantity", "o_orderstatus")
    )
