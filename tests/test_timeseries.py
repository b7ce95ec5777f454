"""Time-series operator units: as-of join edge semantics (inclusive
match, no-prior-row NULL, tie handling), gap-fill bucket completeness,
band-join boundary closure."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.operators.timeseries import (
    asof_join,
    band_join,
    resample_gapfill,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),  # before any right -> NULL
            (2, "u1", _ts("2024-01-01 12:00:00")),  # exact tie -> inclusive
            (3, "u1", _ts("2024-01-01 15:00:00")),  # picks latest prior
            (4, "u2", _ts("2024-01-01 09:00:00")),  # other key isolated
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 12:00:00"), 100.0),
            ("u1", _ts("2024-01-01 14:00:00"), 200.0),
            ("u2", _ts("2024-01-01 23:00:00"), 999.0),
        ],
        "k string, rts timestamp, v double",
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts", payload=["v"]
    )
    got = {r.id: r.asof_v for r in out.collect()}
    assert got == {1: None, 2: 100.0, 3: 200.0, 4: None}


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
    )
    right = spark.createDataFrame(
        [(0, _ts("2023-11-14 00:00:00"), 1.0)], "k long, rts timestamp, v double"
    )
    out = asof_join(left, right, "k", "ts", "rts", ["v"])
    assert out.count() == 100


def test_resample_gapfill_emits_empty_buckets(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:10:00"), 1.0),
            ("a", _ts("2024-01-01 03:20:00"), 3.0),  # hours 1,2 are gaps
            ("b", _ts("2024-01-01 05:00:00"), 5.0),
        ],
        "g string, ts timestamp, v double",
    )
    out = resample_gapfill(
        df, "g", "ts", "hour", {"cnt": F.count(F.lit(1)), "s": F.sum("v")}
    ).collect()
    a = {r.bucket.hour: (r.cnt, r.s) for r in out if r.g == "a"}
    assert set(a) == {0, 1, 2, 3}
    assert a[1] == (None, None) and a[2] == (None, None)
    assert a[0] == (1, 1.0) and a[3] == (1, 3.0)
    assert len([r for r in out if r.g == "b"]) == 1


def test_band_join_half_open_boundaries(spark):
    fact = spark.createDataFrame(
        [(0.0,), (9.999,), (10.0,), (19.999,), (20.0,)], "v double"
    )
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 10.0, 20.0)], "band string, lo double, hi double"
    )
    out = band_join(fact, bands, "v", "lo", "hi")
    got = sorted((r.v, r.band) for r in out.collect())
    # 20.0 falls in no band (exclusive hi) -> dropped by inner join
    assert got == [(0.0, "lo"), (9.999, "lo"), (10.0, "hi"), (19.999, "hi")]


def test_holt_linear_hand_recurrence(spark):
    from advanced_etl_pipelines_spark.operators.timeseries import (
        holt_linear_arrow,
    )

    # series 1, 3, 4 with alpha=0.5, beta=0.3, init l=1, b=2:
    # i=1: pred=3, sse=0;   l=0.5*3+0.5*3=3,   b=0.3*2+0.7*2=2
    # i=2: pred=5, sse=1;   l=0.5*4+0.5*5=4.5, b=0.3*1.5+0.7*2=1.85
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 3.0), ("a", 3, 4.0)],
        "k string, t long, y double",
    )
    r = holt_linear_arrow(df, "k", "t", "y", 0.5, 0.3, horizon=2).collect()[0]
    assert r.n == 3
    assert abs(r.level - 4.5) < 1e-12
    assert abs(r.trend - 1.85) < 1e-12
    assert abs(r.forecast - (4.5 + 2 * 1.85)) < 1e-12
    assert abs(r.sse - 1.0) < 1e-12


def test_holt_linear_is_exact_on_linear_series(spark):
    from advanced_etl_pipelines_spark.operators.timeseries import (
        holt_linear_arrow,
    )

    # y = 2t: every one-step prediction is exact; forecast extrapolates
    df = spark.createDataFrame(
        [("a", t, 2.0 * t) for t in range(1, 11)],
        "k string, t long, y double",
    )
    r = holt_linear_arrow(df, "k", "t", "y", 0.5, 0.3, horizon=5).collect()[0]
    assert abs(r.sse) < 1e-12
    assert abs(r.trend - 2.0) < 1e-12
    assert abs(r.forecast - (20.0 + 5 * 2.0)) < 1e-12


def test_holt_linear_unsorted_input_sorted_in_batch(spark):
    from advanced_etl_pipelines_spark.operators.timeseries import (
        holt_linear_arrow,
    )

    rows = [("a", t, 2.0 * t) for t in range(1, 8)]
    import random

    rng = random.Random(7)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    df = spark.createDataFrame(shuffled, "k string, t long, y double")
    r = holt_linear_arrow(df, "k", "t", "y", 0.5, 0.3).collect()[0]
    assert abs(r.sse) < 1e-12 and abs(r.trend - 2.0) < 1e-12


def test_asof_join_tiebreak_dedupes_right_duplicates(spark):
    """Duplicate right rows at one (key, ts): the tiebreak picks the
    MAX-tiebreak row deterministically; without it the match would be
    partition-order-dependent (ADVICE.md round 2)."""
    from advanced_etl_pipelines_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [("a", 10)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("a", 5, 100, 1), ("a", 5, 200, 2), ("a", 5, 150, 3)],
        "k string, ts long, price long, seq long",
    ).repartition(4)
    got = asof_join(
        left, right, "k", "ts", "ts", ["price"], tiebreak="seq"
    ).collect()
    assert len(got) == 1 and got[0]["asof_price"] == 150
