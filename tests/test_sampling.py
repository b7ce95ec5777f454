"""Deterministic-sampling tests: rerun stability, rate accuracy,
fixed-size-per-group exactness, HLL accuracy vs exact counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.operators.sampling import (
    sample_per_group,
    stratified_sample,
    unit_hash,
)
from advanced_etl_pipelines_spark.sources.readers import read_sf_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_sf_table(spark, SF, "documents").cache()


def test_unit_hash_in_range_and_deterministic(spark):
    df = spark.range(0, 10_000).select(unit_hash("id").alias("u"))
    row = df.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("m")
    ).first()
    assert 0.0 <= row.lo and row.hi < 1.0
    # uniform-ish: mean of U(0,1) within a loose band
    assert 0.45 < row.m < 0.55
    a = df.collect()
    b = spark.range(0, 10_000).select(unit_hash("id").alias("u")).collect()
    assert a == b


def test_stratified_sample_rerun_identical(docs):
    kept1 = stratified_sample(docs, "lang", {"en": 0.1}, 0.5, "doc_id")
    kept2 = stratified_sample(docs, "lang", {"en": 0.1}, 0.5, "doc_id")
    ids1 = sorted(r.doc_id for r in kept1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in kept2.select("doc_id").collect())
    assert ids1 == ids2
    assert len(ids1) > 0


def test_stratified_sample_respects_rates(spark):
    # Large uniform population so the empirical rate concentrates.
    pop = spark.range(0, 50_000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "big").otherwise("small").alias("s"),
    )
    kept = stratified_sample(pop, "s", {"big": 0.1}, 0.6, "id")
    rates = {
        r.s: r.kept / 25_000
        for r in kept.groupBy("s").agg(F.count("*").alias("kept")).collect()
    }
    assert abs(rates["big"] - 0.1) < 0.02
    assert abs(rates["small"] - 0.6) < 0.02


def test_sample_per_group_exact_k_and_stable(docs):
    s = sample_per_group(docs.select("doc_id", "lang"), "lang", 3, "doc_id")
    counts = {r.lang: r.c for r in s.groupBy("lang").agg(
        F.count("*").alias("c")).collect()}
    n_langs = docs.select("lang").distinct().count()
    assert len(counts) == n_langs
    assert all(c == 3 for c in counts.values())
    again = sample_per_group(
        docs.select("doc_id", "lang"), "lang", 3, "doc_id"
    )
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, again.collect()))


def test_approx_distinct_within_tolerance(spark):
    ev = read_sf_table(spark, SF, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.05 * n), (k, n, approx[k])


def test_approx_percentiles_close_to_exact(spark):
    li = read_sf_table(spark, SF, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"
        ).alias("a")
    )
    j = {r.l_returnflag: r for r in exact.join(approx, "l_returnflag").collect()}
    for flag, r in j.items():
        assert abs(r.a[0] - r.p50) / r.p50 < 0.01, (flag, "p50")
        assert abs(r.a[1] - r.p95) / r.p95 < 0.01, (flag, "p95")


def test_hll_sketch_rollup_close_to_exact(spark):
    from advanced_etl_pipelines_spark.plans.registry import QUERIES

    rows = QUERIES["hll_sketch_rollup"](spark, SF).collect()
    ev = read_sf_table(spark, SF, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        # exact twin matches an independent computation, and the
        # in-query HLL-vs-exact tolerance flag holds (lgK=12 -> ~1.6%
        # rse; query allows 5%)
        assert r.exact_users == exact[r.event_type]
        assert r.within_5pct


def test_weighted_sample_biases_toward_heavy_rows(spark):
    from advanced_etl_pipelines_spark.operators.sampling import (
        weighted_sample_topk,
    )

    docs = read_sf_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out = weighted_sample_topk(docs, "lang", "doc_id", "n_chars", 20)
    # deterministic across re-runs and partitionings
    again = weighted_sample_topk(
        docs.repartition(13), "lang", "doc_id", "n_chars", 20
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    # length-weighted: sampled docs are longer than the corpus average
    s = out.agg(F.avg("n_chars")).first()[0]
    pop = docs.agg(F.avg("n_chars")).first()[0]
    assert s > pop


def test_kll_quantile_rollup_close_to_exact(spark):
    from advanced_etl_pipelines_spark.plans.registry import QUERIES

    rows = QUERIES["kll_quantile_rollup"](spark, SF).collect()
    ev = read_sf_table(spark, SF, "events")
    exact = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("round(percentile(value, 0.5) + 1e-9, 4)").alias("p50"),
            F.expr("round(percentile(value, 0.95) + 1e-9, 4)").alias("p95"),
            F.expr("round(percentile(value, 0.99) + 1e-9, 4)").alias("p99"),
        )
        .collect()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        # exact twin matches an independent computation...
        assert (r.p50_exact, r.p95_exact, r.p99_exact) == exact[r.event_type]
        # ...and the in-query RANK-tolerance flags hold (the KLL
        # guarantee is on rank, ~1.33% at k=400; the query brackets
        # each estimate between the exact q∓2.5% quantile values —
        # the monotone value-space form of the old bisect rank check)
        assert r.p50_ok and r.p95_ok and r.p99_ok, r


def test_theta_audience_overlap_close_to_exact(spark):
    from advanced_etl_pipelines_spark.plans.registry import QUERIES

    rows = QUERIES["theta_audience_overlap"](spark, SF).collect()
    # the theta-vs-exact tolerance now lives in the query itself
    assert all(r.within_5pct for r in rows), rows
    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_both, r.n_any) for r in rows
    }
    ev = read_sf_table(spark, SF, "events")
    users = {
        et: {r.user_id for r in ev.where(F.col("event_type") == et)
             .select("user_id").distinct().collect()}
        for et in {k for pair in got for k in pair}
    }
    assert len(got) == 10  # C(5,2) behavior pairs
    for (ta, tb), (n_a, n_both, n_any) in got.items():
        sa, sb = users[ta], users[tb]
        # sf0.001 cardinalities sit below the sketch's nominal entries,
        # so estimates are EXACT here; tolerance covers bigger SFs
        assert abs(n_a - len(sa)) / len(sa) < 0.05
        assert abs(n_both - len(sa & sb)) / max(len(sa & sb), 1) < 0.08
        assert abs(n_any - len(sa | sb)) / len(sa | sb) < 0.05


def test_cms_overestimates_within_bound(spark):
    """Count-min guarantees: estimates never under-count, and the
    merged-sketch over-estimate stays within eps*total (eps=0.005, 99%
    confidence) of the exact frequency."""
    import __spark_entry__ as e

    rows = e.queries()["cms_frequency_rollup"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    total = sum(r["exact_count"] for r in rows)
    for r in rows:
        assert r["est_count"] >= r["exact_count"], r
        assert r["est_count"] - r["exact_count"] <= 0.005 * total + 1, r


def test_mixture_budget_fill_matches_naive_window(spark):
    """The distributed-prefix-sum budget fill must equal the naive
    per-source running-sum definition (what the DuckDB oracle states)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import __spark_entry__ as e
    from advanced_etl_pipelines_spark.functions.text import token_count
    from advanced_etl_pipelines_spark.operators.sampling import unit_hash
    from advanced_etl_pipelines_spark.sources.readers import read_sf_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["source"]: (r["total_docs"], r["kept_docs"], r["kept_tokens"])
        for r in e.queries()["mixture_budget_fill"](spark, sf).collect()
    }
    docs = read_sf_table(spark, sf, "documents").select(
        "source",
        "doc_id",
        token_count("text").cast("long").alias("ntok"),
        unit_hash("doc_id").alias("u"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("u", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = (
        docs.withColumn("prior", F.coalesce(F.sum("ntok").over(w), F.lit(0)))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.sum(F.when(F.col("prior") < 1000, 1).otherwise(0))
            .cast("bigint")
            .alias("kept_docs"),
            F.sum(F.when(F.col("prior") < 1000, F.col("ntok")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
    )
    want = {
        r["source"]: (r["total_docs"], r["kept_docs"], r["kept_tokens"])
        for r in naive.collect()
    }
    assert got == want


def test_split_train_holdout_invariants(spark):
    """Split covers every doc exactly once; leakage only counts
    valid/test docs whose normalized text also occurs in train."""
    import __spark_entry__ as e
    from advanced_etl_pipelines_spark.sources.readers import read_sf_table

    sf = "/root/testdata/sf0.001"
    rows = e.queries()["split_train_holdout"](spark, sf).collect()
    total = read_sf_table(spark, sf, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        if r["split"] == "train":
            assert r["n_leaked"] == 0
        assert 0 <= r["n_leaked"] <= r["n_docs"]
