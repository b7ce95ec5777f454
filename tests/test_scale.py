"""Scale-strategy tests: bucketed joins are exchange-free, salted joins
are result-identical under skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.operators.scale import (
    bucketed_join,
    global_running_sums,
    salted_join,
    top_k_global,
    write_bucketed,
)
from advanced_etl_pipelines_spark.sources.readers import read_sf_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = read_sf_table(spark, SF, "orders")
    customer = read_sf_table(spark, SF, "customer")
    write_bucketed(
        orders, "orders_b", ["o_custkey"], 8, ["o_custkey"],
        path=str(base / "orders_b"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b", ["o_custkey"], 8, ["o_custkey"],
        path=str(base / "customer_b"),
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, lt, rt, ["o_custkey"])
        plan = _plan(out)
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        expected = (
            read_sf_table(spark, SF, "orders")
            .join(
                read_sf_table(spark, SF, "customer").withColumnRenamed(
                    "c_custkey", "o_custkey"
                ),
                "o_custkey",
            )
            .count()
        )
        assert out.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join without bucketing shuffles both sides."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = read_sf_table(spark, SF, "orders")
        customer = read_sf_table(spark, SF, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        plan = _plan(orders.join(customer, "o_custkey"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _skewed_frames(spark):
    # 10_000 rows on one hot key + a tail, small lookup side
    big = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim"),
    )
    return big, small


def test_salted_join_matches_plain_inner(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, ["k"]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(big, small, ["k"], salt_factor=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_matches_plain_left(spark):
    big, small = _skewed_frames(spark)
    # poke holes in the lookup side so left-join nulls appear
    small = small.where(F.col("k") != 1)
    plain = big.join(small, ["k"], "left")
    salted = salted_join(big, small, ["k"], salt_factor=4, how="left")
    assert plain.count() == salted.count() == 10_000
    n_null_plain = plain.where(F.col("dim").isNull()).count()
    n_null_salted = salted.where(F.col("dim").isNull()).count()
    assert n_null_plain == n_null_salted > 9_000  # hot key + tail k=1 rows


def test_salted_join_rejects_right_outer(spark):
    big, small = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="right")


def test_range_layout_files_own_disjoint_key_ranges(spark, tmp_path):
    from advanced_etl_pipelines_spark.operators.scale import write_range_layout

    li = read_sf_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    out = str(tmp_path / "layout")
    write_range_layout(
        li, out, range_cols=["l_shipdate"], sort_cols=["l_shipdate"], n_files=8
    )

    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(out + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i
            for i in range(md.schema.to_arrow_schema().get_field_index("l_shipdate") + 1)
            if md.schema.column(i).name == "l_shipdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) > 1
    # each file's key range ends before the next file's begins -> a
    # predicate on l_shipdate prunes to one file via footer stats
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_zorder_layout_clusters_both_columns(spark, tmp_path):
    from advanced_etl_pipelines_spark.operators.scale import (
        write_range_layout,
        write_zorder_layout,
    )

    # independent columns: orderkey (time-ish) and partkey (entity)
    li = read_sf_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    write_zorder_layout(li, zdir, ["l_orderkey", "l_partkey"], n_files=8)
    # baseline: plain sort layout on the FIRST column only
    write_range_layout(
        li, sdir, range_cols=["l_orderkey"], sort_cols=["l_orderkey"],
        n_files=8,
    )

    import glob

    import pyarrow.parquet as pq

    def file_spans(d, col):
        """Per-file normalized (min,max) span of `col` from footer stats."""
        boxes, lo, hi = [], None, None
        for f in glob.glob(d + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            i = next(
                i for i in range(md.num_columns)
                if md.schema.column(i).name == col
            )
            st = [
                md.row_group(rg).column(i).statistics
                for rg in range(md.num_row_groups)
            ]
            mn, mx = min(s.min for s in st), max(s.max for s in st)
            boxes.append((mn, mx))
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        return [(mx - mn) / max(1, hi - lo) for mn, mx in boxes]

    z_spans = file_spans(zdir, "l_partkey")
    s_spans = file_spans(sdir, "l_partkey")
    z_avg = sum(z_spans) / len(z_spans)
    s_avg = sum(s_spans) / len(s_spans)
    # sorting on orderkey leaves partkey unclustered: every file spans
    # ~the full partkey range, so a partkey-only predicate prunes
    # nothing.  z-order bounds BOTH dimensions: each file owns a strict
    # partkey sub-range and footer stats can prune on either column.
    assert s_avg > 0.9
    assert z_avg < 0.75
    assert z_avg < s_avg * 0.8


def test_bloom_runtime_filter_prunes_probe_side(spark):
    """AQE runtime Bloom filter: the selective dim side injects a
    might_contain() predicate into the fact scan, pruning probe rows
    BEFORE the shuffle.  Spark gates it on scan-size thresholds meant
    for clusters (10 GB application side), so local testdata needs them
    lowered — at 100 TB the same plan appears with stock settings."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "1GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = read_sf_table(spark, SF, "lineitem")
        orders = read_sf_table(spark, SF, "orders").where(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert "might_contain" in _plan(j)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_global_running_sums_matches_single_window(spark):
    """Distributed prefix sum == the single-partition window it
    replaces, on an adversarial frame (duplicate-free keys, negative
    and zero sums, fewer rows than partitions in some ranges)."""
    import random

    rnd = random.Random(7)
    rows = [(i, rnd.randint(-5, 20)) for i in rnd.sample(range(10_000), 997)]
    df = spark.createDataFrame(rows, "k INT, v INT")
    got = {
        r["k"]: r["cum_v"]
        for r in global_running_sums(df, ["k"], ["v"], n_parts=7).collect()
    }
    acc, want = 0, {}
    for k, v in sorted(rows):
        acc += v
        want[k] = acc
    assert got == want


def test_global_running_sums_desc_order(spark):
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k INT, c INT")
    got = {
        r["k"]: r["cum_c"]
        for r in global_running_sums(
            df, [F.desc("k")], ["c"], n_parts=5
        ).collect()
    }
    assert got == {k: 100 - k for k in range(100)}


def test_top_k_global_matches_global_rank(spark):
    """Two-level top-k == global row_number top-k, ranks included,
    under a deterministic total order with heavy count ties."""
    rows = [(f"t{i:04d}", i % 17) for i in range(2_000)]
    df = spark.createDataFrame(rows, "token STRING, cnt INT")
    got = sorted(
        (r["rnk"], r["token"], r["cnt"])
        for r in top_k_global(
            df, [F.desc("cnt"), F.asc("token")], 25
        ).collect()
    )
    want_order = sorted(rows, key=lambda t: (-t[1], t[0]))[:25]
    want = sorted(
        (i + 1, tok, cnt) for i, (tok, cnt) in enumerate(want_order)
    )
    assert got == want
