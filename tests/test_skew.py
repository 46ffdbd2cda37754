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


def test_choose_n_salts_decision_rule():
    from amazonmsk_emr_tem_data_spark.operators.skew import choose_n_salts

    # hot key = 10x a mean task -> 10 salts
    assert choose_n_salts(10_000, 32_000, shuffle_partitions=32) == 10
    # hot key fits a mean task -> don't salt
    assert choose_n_salts(1_000, 32_000, shuffle_partitions=32) == 1
    # clamped at max_salts
    assert choose_n_salts(10**9, 10**9, 1000, max_salts=64) == 64
    # degenerate inputs never salt
    assert choose_n_salts(0, 0, 32) == 1
    assert choose_n_salts(5, 100, 0) == 1


def test_auto_salt_agg_salts_planted_hot_key(spark):
    """A planted 80%-share key must trigger salting (two exchanges: the
    (key, salt) partials then the tiny merge), and the result must
    still equal the plain groupBy."""
    from amazonmsk_emr_tem_data_spark.operators.skew import SALT, auto_salt_agg

    df = spark.range(10_000).select(
        F.when(F.col("id") % 5 < 4, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        (F.col("id") % 13).cast("long").alias("v"),
    )
    out = auto_salt_agg(df, keys=["k"], sums={"n": F.count(F.lit(1)), "s": F.sum("v")})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert SALT in plan, "planted hot key must produce the salted two-phase plan"
    got = {r["k"]: (r["n"], r["s"]) for r in out.collect()}
    want = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want


def test_auto_salt_agg_skips_uniform_keys(spark):
    """Uniform keys (every key ~ a mean task or smaller) must come back
    as the PLAIN single-shuffle groupBy — salting there pays a second
    shuffle for nothing."""
    from amazonmsk_emr_tem_data_spark.operators.skew import SALT, auto_salt_agg

    df = spark.range(10_000).select(
        (F.col("id") % 1000).cast("string").alias("k"),
        F.lit(1).cast("long").alias("v"),
    )
    out = auto_salt_agg(df, keys=["k"], sums={"n": F.count(F.lit(1))})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert SALT not in plan, "uniform keys must not be salted"
    assert out.count() == 1000


def test_auto_salt_agg_equals_plain_on_orders(spark, sf_dir):
    from amazonmsk_emr_tem_data_spark.operators.skew import auto_salt_agg

    orders = load_table(spark, sf_dir, "orders")
    auto = auto_salt_agg(
        orders,
        keys=["o_orderstatus"],
        sums={"n": F.count(F.lit(1)), "qty": F.sum(F.col("o_totalprice"))},
    )
    plain = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("qty")
    )
    a = {r["o_orderstatus"]: (r["n"], round(r["qty"], 4)) for r in auto.collect()}
    p = {r["o_orderstatus"]: (r["n"], round(r["qty"], 4)) for r in plain.collect()}
    assert a == p


def test_auto_salt_join_salts_planted_hot_key(spark):
    from amazonmsk_emr_tem_data_spark.operators.skew import SALT, auto_salt_join

    skewed = spark.range(10_000).select(
        F.when(F.col("id") % 5 < 4, F.lit(7)).otherwise(F.col("id") % 97)
        .cast("long").alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    out = auto_salt_join(skewed, dim, on=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert SALT in plan, "planted hot key must produce the salted join"
    plain = skewed.join(dim, "k")
    assert out.count() == plain.count()
    assert sorted(map(tuple, out.select("k", "v", "w").collect())) == sorted(
        map(tuple, plain.select("k", "v", "w").collect())
    )


def test_auto_salt_join_skips_uniform_and_outer(spark):
    from amazonmsk_emr_tem_data_spark.operators.skew import SALT, auto_salt_join

    skewed = spark.range(10_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(1000).select(F.col("id").alias("k"))
    out = auto_salt_join(skewed, dim, on=["k"])
    assert SALT not in out._jdf.queryExecution().executedPlan().toString()
    # outer joins must always take the plain path (replication trick
    # does not preserve outer semantics)
    hot = spark.range(10_000).select(F.lit(1).cast("long").alias("k"), F.col("id").alias("v"))
    outer = auto_salt_join(hot, dim, on=["k"], how="left")
    assert SALT not in outer._jdf.queryExecution().executedPlan().toString()
    assert outer.count() == 10_000
