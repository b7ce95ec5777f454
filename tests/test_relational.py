"""Unit tests for relational operator compositions (SURVEY.md §2.2-2.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.operators import relational as R


def test_ensure_schema_adds_missing_typed_nulls(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    out = R.ensure_schema(df, {"id": "int", "extra": "double", "flag": "string"})
    assert set(out.columns) == {"id", "name", "extra", "flag"}
    row = out.collect()[0]
    assert row["extra"] is None and row["flag"] is None
    assert dict(out.dtypes)["extra"] == "double"


def test_dedup_mean_collapses_duplicates(spark):
    df = spark.createDataFrame(
        [("delhi", 1, 10.0), ("delhi", 1, 20.0), ("delhi", 2, 5.0),
         ("mumbai", 1, None), ("mumbai", 1, 8.0)],
        "city string, t int, pm double",
    )
    out = {(r["city"], r["t"]): r["pm"]
           for r in R.dedup_mean(df, ["city", "t"], ["pm"]).collect()}
    assert out[("delhi", 1)] == 15.0
    assert out[("delhi", 2)] == 5.0
    assert out[("mumbai", 1)] == 8.0  # avg skips NULL like pandas mean skips NaN


def test_pivot_avg_fixed_schema_emits_all_values(spark):
    df = spark.createDataFrame(
        [("delhi", 1, "pm2_5", 10.0), ("delhi", 1, "pm2_5", 30.0),
         ("delhi", 1, "ozone", 7.0)],
        "city string, t int, param string, value double",
    )
    out = R.pivot_avg(df, ["city", "t"], "param", ["pm2_5", "ozone", "pm10"], "value")
    assert out.columns == ["city", "t", "pm2_5", "ozone", "pm10"]
    row = out.collect()[0]
    assert row["pm2_5"] == 20.0 and row["ozone"] == 7.0 and row["pm10"] is None


def test_crosstab_counts_zero_fill_and_pct(spark):
    df = spark.createDataFrame(
        [("delhi", "High Risk"), ("delhi", "High Risk"), ("delhi", "Low Risk"),
         ("pune", "Low Risk")],
        "city string, risk string",
    )
    out = {r["city"]: r for r in R.crosstab_counts(
        df, "city", "risk", ["High Risk", "Moderate Risk", "Low Risk"],
        total_name="total_hours").collect()}
    d = out["delhi"]
    assert (d["High Risk"], d["Moderate Risk"], d["Low Risk"]) == (2, 0, 1)
    assert d["total_hours"] == 3
    assert abs(d["pct_high_risk"] - 200 / 3) < 1e-9
    p = out["pune"]
    assert p["pct_low_risk"] == 100.0


def test_argmax_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("b", 10.0), ("a", 10.0), ("c", 5.0)], "k string, v double"
    )
    # equal means: 'a' must win (asc key tie-break), independent of row order
    out = R.argmax_group_avg(df, "k", "v").collect()
    assert out[0]["k"] == "a"


def test_value_counts_pct_absent_class_zero(spark):
    df = spark.createDataFrame([("High Risk",)] * 3, "risk string")
    out = {r["risk"]: (r["cnt"], r["pct"]) for r in R.value_counts_pct(
        df, "risk", ["High Risk", "Moderate Risk", "Low Risk"]).collect()}
    assert out["High Risk"] == (3, 100.0)
    assert out["Moderate Risk"] == (0, 0.0)
    assert out["Low Risk"] == (0, 0.0)


def test_histogram_equal_width_and_clamp(spark):
    df = spark.createDataFrame([(float(x),) for x in range(11)], "v double")
    out = {r["bucket"]: r["cnt"] for r in R.histogram(df, "v", 5).collect()}
    # min=0 max=10, width=2: buckets [0,2) [2,4) [4,6) [6,8) [8,10]
    assert out == {0: 2, 1: 2, 2: 2, 3: 2, 4: 3}  # 10.0 clamps into last


def test_union_all_pads_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, "y")], "id int, b string")
    out = R.union_all(a, b)
    assert set(out.columns) == {"id", "a", "b"}
    assert out.count() == 2


def test_global_summary_shape(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "t int, temp double"
    )
    row = R.global_summary(df, "t", ["temp"]).collect()[0]
    assert row["rows"] == 2 and row["time_min"] == 1 and row["time_max"] == 2
    assert row["temp_mean"] == 15.0


def test_band_join_bucketed_matches_broadcast(spark):
    """The bucketed equi-join band join must produce exactly the
    broadcast-NLJ result, including bands that straddle bucket
    boundaries and values on band edges."""
    from advanced_etl_pipelines_spark.operators.timeseries import (
        band_join,
        band_join_bucketed,
    )
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100)], "id bigint, v double"
    )
    bands = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 9.5, 33.3), ("c", 33.3, 34.0),
         ("d", 90.0, 100.0), ("e", 150.0, 160.0)],
        "band string, lo double, hi double",
    )
    want = {
        (r["id"], r["band"])
        for r in band_join(fact, bands, "v", "lo", "hi").collect()
    }
    got = {
        (r["id"], r["band"])
        for r in band_join_bucketed(
            fact, bands, "v", "lo", "hi", step=7.0
        ).collect()
    }
    assert got == want and len(got) > 0
    # and no Exchange-free claim here: assert the plan is an equi-join,
    # not a nested loop
    plan = band_join_bucketed(
        fact, bands, "v", "lo", "hi", step=7.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_grouped_ols_arrow_matches_native_regr(spark):
    """The applyInArrow OLS seam must agree with the JVM regr_slope /
    regr_intercept aggregates to float tolerance."""
    from advanced_etl_pipelines_spark.functions.features import epoch_seconds
    from advanced_etl_pipelines_spark.operators.timeseries import (
        grouped_ols_arrow,
    )
    from advanced_etl_pipelines_spark.sources.readers import read_sf_table
    from pyspark.sql import functions as F

    ev = read_sf_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type",
        epoch_seconds("ts").alias("xs"),
        F.col("value").alias("ys"),
    )
    native = {
        r["event_type"]: (r["s"], r["i"])
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("regr_slope(ys, xs)").alias("s"),
            F.expr("regr_intercept(ys, xs)").alias("i"),
        )
        .collect()
    }
    arrow = {
        r["event_type"]: (r["slope"], r["intercept"])
        for r in grouped_ols_arrow(ev, "event_type", "xs", "ys").collect()
    }
    assert set(arrow) == set(native)
    for k in native:
        assert abs(arrow[k][0] - native[k][0]) < 1e-6 * max(
            1.0, abs(native[k][0])
        ), k
        assert abs(arrow[k][1] - native[k][1]) < 1e-6 * max(
            1.0, abs(native[k][1])
        ), k


def test_pca_matches_numpy(spark):
    """Distributed PCA (Arrow partial moments + driver eigh) must match
    a single-node numpy PCA on the same vectors: explained variance and
    per-row projections to tolerance, after the shared sign fix."""
    import numpy as np

    from advanced_etl_pipelines_spark.operators.linalg import (
        pca_fit,
        pca_project,
    )
    from advanced_etl_pipelines_spark.sources.readers import read_sf_table

    emb = read_sf_table(spark, "/root/testdata/sf0.001", "embeddings")
    fit = pca_fit(emb, "embedding", k=3)

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    V = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    mu = V.mean(axis=0)
    cov = np.cov((V - mu).T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    comps = evecs[:, order].T
    for i in range(3):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]

    total = float(np.trace(cov))
    want_ev = [float(evals[o]) / total for o in order]
    for got, want in zip(fit["explained_var"], want_ev):
        assert abs(got - want) < 1e-8

    got_comps = np.asarray(fit["components"])
    assert np.abs(got_comps - comps).max() < 1e-8

    proj = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in pca_project(
            emb, "embedding", "vec_id", fit["mean"], fit["components"]
        ).collect()
    }
    want_proj = (V - mu) @ comps.T
    for i, vid in enumerate(ids):
        assert np.abs(proj[vid] - want_proj[i]).max() < 1e-8


def test_kmeans_lloyd_matches_numpy_and_converges(spark):
    """Distributed Lloyd must reproduce a numpy Lloyd run from the SAME
    init under the round-8 determinism rule (quantized distances +
    quantized centroid means — see kmeans_lloyd docstring), with
    IDENTICAL assignments, and strictly reduce inertia."""
    import numpy as np

    from advanced_etl_pipelines_spark.operators.linalg import (
        CENT_DECIMALS,
        EPS,
        kmeans_assign_np,
        kmeans_lloyd,
    )
    from advanced_etl_pipelines_spark.sources.readers import read_sf_table

    emb = read_sf_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    V = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    ids = np.asarray([r["vec_id"] for r in rows])
    k, iters = 4, 5

    cent, assign_df = kmeans_lloyd(emb, "embedding", "vec_id", k, iters)
    cent = np.asarray(cent)

    # numpy twin from the same evenly-spaced-rank init, same rule
    n = len(V)
    step = max(n // k, 1)
    C = V[np.arange(0, k * step, step)[:k]].copy()
    for _ in range(iters):
        a = kmeans_assign_np(V, C)
        for c in range(k):
            if (a == c).any():
                C[c] = np.round(V[a == c].mean(0) + EPS, CENT_DECIMALS)
    # centroids are quantized on both sides, so the match is exact
    assert np.abs(cent - C).max() == 0.0

    got = {r["id"]: r["cluster"] for r in assign_df.collect()}
    want = kmeans_assign_np(V, C)
    mismatches = sum(
        1 for i, vid in enumerate(ids) if got[vid] != want[i]
    )
    assert mismatches == 0

    # inertia strictly improves over the init
    init_inertia = (
        ((V * V).sum(1, keepdims=True)
         - 2 * V @ V[np.arange(0, k * step, step)[:k]].T
         + (V[np.arange(0, k * step, step)[:k]] ** 2).sum(1))
        .min(1).sum()
    )
    d2 = ((V * V).sum(1, keepdims=True) - 2 * V @ C.T + (C * C).sum(1))
    final_inertia = d2.min(1).sum()
    assert final_inertia < init_inertia


def test_kmeans_assign_quantized_tie_rule():
    """The round-8 determinism contract, pinned directly: assignment
    ranks the QUANTIZED distance (1e-6), ties go to the lowest cluster
    index, and sub-quantum perturbations (the FP reduce-order noise
    class, ~1e-14) can never flip membership."""
    import numpy as np

    from advanced_etl_pipelines_spark.operators.linalg import (
        kmeans_assign_np,
    )

    C = np.array([[0.0, 0.0], [2.0, 0.0]])
    # exact equidistance -> lowest index
    assert kmeans_assign_np(np.array([[1.0, 0.0]]), C).tolist() == [0]
    # a 1e-9 centroid shift (1000x the noise class, still 1000x below
    # the quantum) leaves the tie intact -> still cluster 0
    assert kmeans_assign_np(np.array([[1.0, 0.0]]), C + 1e-9).tolist() == [0]
    # a super-quantum difference decides normally
    assert kmeans_assign_np(np.array([[1.1, 0.0]]), C).tolist() == [1]
    # the two d2 evaluation orders (BLAS identity vs explicit sum of
    # squared diffs) agree after quantization on random data
    rng = np.random.default_rng(7)
    V, C = rng.normal(size=(200, 16)), rng.normal(size=(8, 16))
    explicit = np.round(
        ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) + 1e-9, 6
    ).argmin(axis=1)
    assert kmeans_assign_np(V, C).tolist() == explicit.tolist()


def test_kmeans_assignment_is_partition_independent(spark):
    """The determinism rule's load-bearing claim: changing the Arrow
    batch composition (tiny 150-row batches + repartitioned input vs
    the session default) must leave the k-means assignment
    cell-identical, because partial sums quantize before they can
    drift and assignments rank quantized distances.  This is exactly
    what the DuckDB replay oracle relies on at every sf."""
    from advanced_etl_pipelines_spark.operators.linalg import kmeans_lloyd
    from advanced_etl_pipelines_spark.sources.readers import read_sf_table

    emb = read_sf_table(spark, "/root/testdata/sf0.001", "embeddings")
    _, a = kmeans_lloyd(emb, "embedding", "vec_id", k=4, iters=3)
    base = sorted(map(tuple, a.collect()))

    batch_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(batch_key)
    try:
        spark.conf.set(batch_key, "150")
        _, b = kmeans_lloyd(
            emb.repartition(7), "embedding", "vec_id", k=4, iters=3
        )
        assert sorted(map(tuple, b.collect())) == base
    finally:
        spark.conf.set(batch_key, old)


def test_kmeans_rejects_k_above_n(spark):
    """n < k must raise a clear ValueError, not an opaque numpy shape
    error from the seed-selection path (ADVICE.md)."""
    import pytest

    from advanced_etl_pipelines_spark.operators.linalg import kmeans_lloyd

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k=5 exceeds input rows n=2"):
        kmeans_lloyd(df, "embedding", "vec_id", k=5)


def test_histogram2d_degenerate_range_buckets_to_zero(spark):
    """A constant axis lands every row in bucket 0 instead of a silent
    all-NULL bucket from the zero-width divide (ADVICE.md)."""
    from advanced_etl_pipelines_spark.operators.relational import histogram2d

    df = spark.createDataFrame(
        [(5.0, float(i)) for i in range(10)], "x double, y double"
    )
    rows = histogram2d(df, "x", "y", nx=4, ny=2).collect()
    assert all(r["xbucket"] == 0 for r in rows)
    assert {r["ybucket"] for r in rows} == {0, 1}
    assert sum(r["cnt"] for r in rows) == 10


# ------------------------------------------------- IVM delta merge


def test_maintain_additive_agg_hand_case(spark):
    """Base state {a: (2 rows, 10.0)}, delta retracts one 'a' row
    (-1, -4.0), deletes key 'b' entirely via a net-zero... and inserts
    a brand-new key 'c': refreshed state must update a, surface c, and
    expose b's zero row count for the caller's existence filter."""
    from advanced_etl_pipelines_spark.operators.relational import (
        maintain_additive_agg,
    )

    base = spark.createDataFrame(
        [("a", 2, 10.0), ("b", 1, 5.0)],
        "k string, n long, v double",
    )
    delta = spark.createDataFrame(
        [("a", -1, -4.0), ("b", -1, -5.0), ("c", 1, 7.0)],
        "k string, n long, v double",
    )
    got = {
        r["k"]: (r["n"], r["v"])
        for r in maintain_additive_agg(
            base, delta, ["k"], ["n", "v"]
        ).collect()
    }
    assert got["a"] == (1, 6.0)
    assert got["b"] == (0, 0.0)     # net-zero group: caller filters
    assert got["c"] == (1, 7.0)     # appeared only in the delta


def test_maintain_additive_agg_matches_flat_recompute(spark):
    """IVM correctness statement on random data: base prefix + delta
    application == flat aggregate over the full log."""
    import random

    rng = random.Random(11)
    rows = [
        (f"k{rng.randrange(8)}", rng.choice([1, -1]), rng.uniform(-5, 5))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, n long, v double")
    half = spark.createDataFrame(rows[:150], "k string, n long, v double")
    rest = spark.createDataFrame(rows[150:], "k string, n long, v double")
    from advanced_etl_pipelines_spark.operators.relational import (
        maintain_additive_agg,
    )
    from pyspark.sql import functions as F

    base = half.groupBy("k").agg(
        F.sum("n").alias("n"), F.sum("v").alias("v")
    )
    inc = {
        r["k"]: (r["n"], round(r["v"], 6))
        for r in maintain_additive_agg(
            base, rest, ["k"], ["n", "v"]
        ).collect()
    }
    flat = {
        r["k"]: (r["n"], round(r["v"], 6))
        for r in df.groupBy("k")
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
        .collect()
    }
    assert inc == flat


def test_kmeans_lloyd_n_rows_passthrough_is_identical(spark):
    """Passing the (already-known) null-filtered row count through
    ``n_rows`` must reproduce the internally-counted run exactly —
    same centroids, same assignments (round-11: semdedup hands its
    adaptive-k count to the trainer to skip a duplicate corpus count)."""
    from advanced_etl_pipelines_spark.operators.linalg import kmeans_lloyd
    from advanced_etl_pipelines_spark.sources.readers import read_sf_table

    emb = read_sf_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.where(emb.embedding.isNotNull()).count()
    cent_a, assign_a = kmeans_lloyd(emb, "embedding", "vec_id", 4, 3)
    cent_b, assign_b = kmeans_lloyd(
        emb, "embedding", "vec_id", 4, 3, n_rows=n
    )
    assert cent_a == cent_b
    assert sorted(map(tuple, assign_a.collect())) == sorted(
        map(tuple, assign_b.collect())
    )
