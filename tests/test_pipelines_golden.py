"""Golden parity tests against the reference's checked-in artifacts
(SURVEY.md §5 — the reference has no tests; its committed data is the
de-facto regression baseline).

Two separate fixtures of truth, because the reference's checked-in raw
JSON is a LATER API snapshot than the one that produced its staged CSV
(verified: raw bengaluru pm2_5@2025-12-14T01 = 50.1, staged = 49.14 —
forecast hours drift between fetches):

* raw → staged: structural parity (keys, schema, row counts) against the
  staged golden + value parity against the raw JSON itself + derived
  features cross-checked against an eager pandas evaluation of the same
  formulas.
* staged → processed: exact value parity — our analyze() on the golden
  staged CSV must reproduce summary_metrics / city_risk_distribution /
  pollution_trends bit-for-bit (1e-9), the reference's USE_STAGED path.

Reference data is read in place from /root/reference (read-only).
"""

from __future__ import annotations

import json
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.pipelines import air_quality as aq
from advanced_etl_pipelines_spark.pipelines import weather as wx

AQ_DIR = "/root/reference/ETL_Multi_Lvl_API/data"
WX_DIR = "/root/reference/ETL_Weather_API/data"

AQ_STAGED_GOLDEN = f"{AQ_DIR}/staged/air_quality_t_20251211T083147Z.csv"
# The 72-row warehouse snapshot = three append loads; staged files
# 100304 and 100603 are byte-identical fetches, so either + the last two.
WX_WAREHOUSE_FILES = [
    f"{WX_DIR}/staged/weather_staged_20251211_100304.csv",
    f"{WX_DIR}/staged/weather_staged_20251211_100942.csv",
    f"{WX_DIR}/staged/weather_staged_20251211_101401.csv",
]


@pytest.fixture(scope="module")
def aq_staged(spark):
    parsed = aq.parse_raw(aq.read_raw(spark, f"{AQ_DIR}/raw"))
    return aq.transform(parsed)


@pytest.fixture(scope="module")
def aq_staged_golden_df(spark):
    """The reference's staged CSV loaded the way its analysis loads it
    (`etl_analysis.py:106-113`: read_csv + parse time)."""
    df = spark.read.option("header", True).csv(AQ_STAGED_GOLDEN)
    return df.withColumns(
        {
            "time": F.to_timestamp("time"),
            "hour": F.col("hour").try_cast("int"),
            **{
                c: F.col(c).try_cast("double")
                for c in aq.POLLUTANT_COLS + ["severity"]
            },
        }
    )


# ---------- raw → staged --------------------------------------------------


def test_aq_staged_structure_matches_golden(aq_staged):
    golden = pd.read_csv(AQ_STAGED_GOLDEN, parse_dates=["time"])
    ours = aq_staged.toPandas().sort_values(["city", "time"]).reset_index(drop=True)
    golden = golden.sort_values(["city", "time"]).reset_index(drop=True)
    assert list(ours.columns) == list(golden.columns)
    assert len(ours) == len(golden) == 545
    ours_t = pd.to_datetime(ours["time"]).dt.tz_localize("UTC")
    assert (ours_t == golden["time"]).all()
    assert (ours["city"] == golden["city"]).all()
    assert (ours["hour"] == golden["hour"]).all()


def test_aq_staged_values_match_raw_json(aq_staged):
    """Pollutant values must equal the raw arrays index-aligned by time,
    for every city/pollutant (the raw JSON is the live input here)."""
    ours = aq_staged.toPandas()
    import glob

    for path in glob.glob(f"{AQ_DIR}/raw/*_raw_*.json"):
        payload = json.load(open(path))
        city = path.split("/")[-1].split("_")[0]
        h = payload["hourly"]
        sub = ours[ours.city == city]
        got = dict(
            zip(pd.to_datetime(sub.time).dt.strftime("%Y-%m-%dT%H:%M"), sub.pm2_5)
        )
        hits = 0
        for t, v in zip(h["time"], h["pm2_5"]):
            if t in got and v is not None:
                assert math.isclose(got[t], v, rel_tol=1e-12), (city, t)
                hits += 1
        assert hits >= 100  # most hours survive the all-null drop


def test_aq_staged_features_consistent_eager_pandas(aq_staged):
    """Derived columns recomputed eagerly in pandas from OUR pollutant
    values must equal the Spark-computed columns (F1-F4 parity)."""
    ours = aq_staged.toPandas()

    def aqi(v):
        if pd.isna(v):
            return "Unknown"
        if v <= 50:
            return "Good"
        if 51 <= v <= 100:
            return "Moderate"
        if 101 <= v <= 200:
            return "Unhealthy"
        if 201 <= v <= 300:
            return "Very Unhealthy"
        if v > 300:
            return "Hazardous"
        return "Unknown"

    def sev(r):
        z = lambda x: float(x) if pd.notna(x) else 0.0  # noqa: E731
        return (
            z(r.pm2_5) * 5.0
            + z(r.pm10) * 3.0
            + z(r.nitrogen_dioxide) * 4.0
            + z(r.sulphur_dioxide) * 4.0
            + z(r.carbon_monoxide) * 2.0
            + z(r.ozone) * 3.0
        )

    assert (ours.aqi_pm25 == ours.pm2_5.map(aqi)).all()
    expect_sev = ours.apply(sev, axis=1)
    assert (ours.severity - expect_sev).abs().max() <= 1e-9
    expect_risk = expect_sev.map(
        lambda s: "High Risk" if s > 400 else ("Moderate Risk" if s > 200 else "Low Risk")
    )
    assert (ours.risk_class == expect_risk).all()
    assert (ours.hour == pd.to_datetime(ours.time).dt.hour).all()


# ---------- staged → processed (exact golden) -----------------------------


def test_aq_summary_metrics_golden(aq_staged_golden_df):
    out = aq.analyze(aq_staged_golden_df)["summary_metrics"].toPandas()
    golden = pd.read_csv(f"{AQ_DIR}/processed/summary_metrics.csv", dtype=str)
    got = dict(zip(out["metric"], out["value"]))
    want = dict(zip(golden["metric"], golden["value"]))
    assert set(got) == set(want)
    assert got["city_highest_avg_pm2_5"] == want["city_highest_avg_pm2_5"]
    assert got["city_highest_severity"] == want["city_highest_severity"]
    for k in (
        "city_highest_avg_pm2_5_value",
        "city_highest_severity_value",
        "hour_with_worst_avg_pm2_5_value",
    ):
        assert math.isclose(float(got[k]), float(want[k]), rel_tol=1e-9), k
    assert int(float(got["hour_with_worst_avg_pm2_5"])) == int(
        want["hour_with_worst_avg_pm2_5"]
    )


def test_aq_city_risk_distribution_golden(aq_staged_golden_df):
    out = aq.analyze(aq_staged_golden_df)["city_risk_distribution"].toPandas()
    golden = pd.read_csv(f"{AQ_DIR}/processed/city_risk_distribution.csv")
    assert list(out.columns) == list(golden.columns)
    out = out.sort_values("city").reset_index(drop=True)
    golden = golden.sort_values("city").reset_index(drop=True)
    assert (out["city"] == golden["city"]).all()
    for c in ["High Risk", "Moderate Risk", "Low Risk", "total_hours"]:
        assert (out[c].astype(int) == golden[c].astype(int)).all(), c
    for c in ["pct_high", "pct_moderate", "pct_low"]:
        assert (out[c] - golden[c]).abs().max() <= 1e-9, c


def test_aq_pollution_trends_golden(aq_staged_golden_df):
    out = aq.analyze(aq_staged_golden_df)["pollution_trends"].toPandas()
    golden = pd.read_csv(
        f"{AQ_DIR}/processed/pollution_trends.csv", parse_dates=["time"]
    )
    assert len(out) == len(golden) == 545
    out["time"] = pd.to_datetime(out["time"]).dt.tz_localize("UTC")
    out = out.sort_values(["city", "time"]).reset_index(drop=True)
    golden = golden.sort_values(["city", "time"]).reset_index(drop=True)
    assert (out["city"] == golden["city"]).all()
    assert (out["time"] == golden["time"]).all()
    for c in ["pm2_5", "pm10", "ozone"]:
        both = out[c].notna() & golden[c].notna()
        assert (out[c].isna() == golden[c].isna()).all(), c
        assert (out[c][both] - golden[c][both]).abs().max() <= 1e-9, c


# ---------- weather -------------------------------------------------------


@pytest.fixture(scope="module")
def wx_staged_latest(spark):
    """Reference __main__ transforms only the LATEST raw file
    (`ETL_Weather_API/transform.py:87-92`)."""
    raw = f"{WX_DIR}/raw/weather_20251211_101400.json"
    return wx.transform(wx.flatten(wx.read_raw(spark, raw)))


def test_wx_staged_matches_reference_csv(wx_staged_latest):
    golden = pd.read_csv(
        f"{WX_DIR}/staged/weather_staged_20251211_101401.csv",
        parse_dates=["time"],
    )
    ours = wx_staged_latest.toPandas()
    assert list(ours.columns) == list(golden.columns)
    assert len(ours) == len(golden) == 24
    ours = ours.sort_values("time").reset_index(drop=True)
    golden = golden.sort_values("time").reset_index(drop=True)
    assert (pd.to_datetime(ours["time"]) == golden["time"]).all()
    assert (
        pd.to_datetime(ours["date"]).dt.date
        == pd.to_datetime(golden["date"]).dt.date
    ).all()
    assert (ours["hour"] == golden["hour"]).all()
    assert (ours["temp_category"] == golden["temp_category"]).all()
    for c in wx.SENSOR_COLS + ["feels_like_c"]:
        assert (ours[c] - golden[c]).abs().max() <= 1e-9, c


def test_wx_analysis_summary_golden(spark):
    """Warehouse = 3 append loads of staged CSVs → analysis outputs
    (`ETL_Weather_API/etl_analysis.py:107-130`)."""
    staged = spark.read.option("header", True).csv(WX_WAREHOUSE_FILES)
    staged = staged.withColumns(
        {
            "time": F.to_timestamp("time"),
            "date": F.to_date("date"),
            **{c: F.col(c).try_cast("double") for c in wx.SENSOR_COLS},
            "hour": F.col("hour").try_cast("int"),
        }
    )
    got = wx.analysis_summary(staged).toPandas().iloc[0]
    golden = pd.read_csv(f"{WX_DIR}/processed/analysis_summary.csv").iloc[0]
    assert int(got["rows"]) == int(golden["rows"]) == 72
    assert got["time_min"] == golden["time_min"]
    assert got["time_max"] == golden["time_max"]
    for c in ["temp_mean", "humidity_mean", "wind_mean"]:
        assert math.isclose(got[c], golden[c], rel_tol=1e-12), c

    hourly = wx.hourly_avg_temp(staged).toPandas()
    golden_h = pd.read_csv(f"{WX_DIR}/processed/hourly_avg_temp.csv")
    assert len(hourly) == len(golden_h) == 24
    assert (hourly["hour"].astype(int).values == golden_h["hour"].values).all()
    assert (
        (hourly["temperature_c"] - golden_h["temperature_c"]).abs().max()
        <= 1e-9
    )


# ---------- sinks + orchestration ----------------------------------------


def test_upsert_parquet_idempotent(spark, tmp_path, wx_staged_latest):
    from advanced_etl_pipelines_spark.sources.sinks import upsert_parquet

    path = str(tmp_path / "warehouse")
    upsert_parquet(spark, wx_staged_latest, path, ["time"])
    n1 = spark.read.parquet(path).count()
    upsert_parquet(spark, wx_staged_latest, path, ["time"])
    n2 = spark.read.parquet(path).count()
    assert n1 == n2 == 24
    # changed values for same keys replace, not duplicate
    bumped = wx_staged_latest.withColumn(
        "temperature_c", F.col("temperature_c") + 100.0
    )
    upsert_parquet(spark, bumped, path, ["time"])
    after = spark.read.parquet(path)
    assert after.count() == 24
    assert after.agg(F.min("temperature_c")).first()[0] > 50.0


def test_wx_run_pipeline_end_to_end(spark, tmp_path):
    from advanced_etl_pipelines_spark.sources.sinks import append_parquet

    staged = str(tmp_path / "staged")
    processed = str(tmp_path / "processed")
    wh = str(tmp_path / "warehouse")
    timings = wx.run_pipeline(
        spark,
        f"{WX_DIR}/raw/weather_20251211_101400.json",
        staged,
        processed,
        append=lambda df: append_parquet(df, wh),
    )
    assert set(timings) == {"transform", "load", "analysis"}
    assert spark.read.parquet(wh).count() == 24
    summary = (
        spark.read.option("header", True)
        .csv(f"{processed}/analysis_summary")
        .toPandas()
    )
    assert int(summary.iloc[0]["rows"]) == 24


def test_aq_run_pipeline_end_to_end(spark, tmp_path):
    from advanced_etl_pipelines_spark.sources.sinks import upsert_parquet

    staged = str(tmp_path / "staged")
    processed = str(tmp_path / "processed")
    wh = str(tmp_path / "warehouse")
    timings = aq.run_pipeline(
        spark,
        f"{AQ_DIR}/raw",
        staged,
        processed,
        upsert=lambda df: upsert_parquet(spark, df, wh, ["city", "time"]),
    )
    assert set(timings) == {"transform", "load", "analysis"}
    assert spark.read.parquet(wh).count() == 545
    summary = (
        spark.read.option("header", True)
        .csv(f"{processed}/summary_metrics")
        .toPandas()
    )
    assert len(summary) == 6


def test_report_renders_six_reference_charts(spark, tmp_path):
    """S13 parity e2e: render_report writes the six PNGs mirroring the
    reference's matplotlib figures; each must exist, be non-empty, and
    decode as a valid PNG with plausible chart dimensions."""
    import os

    from advanced_etl_pipelines_spark.functions.png import decode_png
    from advanced_etl_pipelines_spark.pipelines.report import (
        REPORT_CHARTS,
        render_report,
    )

    out = str(tmp_path / "report")
    paths = render_report(spark, "/root/testdata/sf0.001", out)
    assert sorted(os.path.basename(p) for p in paths) == sorted(REPORT_CHARTS)
    for p in paths:
        assert os.path.getsize(p) > 500, p
        arr = decode_png(open(p, "rb").read())
        h, w = arr.shape[:2]
        assert h >= 200 and w >= 300, p
        # charts are not blank: more than one distinct color
        assert len({tuple(px) for px in arr.reshape(-1, 3)[::37]}) > 2, p
