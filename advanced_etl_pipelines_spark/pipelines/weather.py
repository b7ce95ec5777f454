"""Weather pipeline — Spark-native rebuild of the reference's
``ETL_Weather_API`` stages (SURVEY.md §3.2).

Reference: ``extract.py`` (Open-Meteo HTTP → raw JSON) →
``transform.py:42-85`` (flatten → rename → coerce → features → drop →
staged CSV) → ``load.py`` (append-insert) → ``etl_analysis.py:98-161``
(summary, hourly/daily averages).

Timestamps: the raw payload carries NAIVE local wall-clock strings
(``timezone=auto`` → Asia/Kolkata in the checked-in data) and the
reference keeps them naive throughout, so ``hour``/``date`` are local.
Under our UTC session the same wall-clock parses to the same field
values — parity holds because nothing ever converts zones.
"""

from __future__ import annotations

import time as _time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.functions.features import (
    feels_like_c,
    temp_category,
)

RENAMES = {  # P7: ETL_Weather_API/transform.py:62-66
    "temperature_2m": "temperature_c",
    "relativehumidity_2m": "relative_humidity",
    "windspeed_10m": "wind_speed_kmh",
}

SENSOR_COLS = ["temperature_c", "relative_humidity", "wind_speed_kmh"]

STAGED_COLS = [
    "time",
    "temperature_c",
    "relative_humidity",
    "wind_speed_kmh",
    "date",
    "hour",
    "temp_category",
    "feels_like_c",
]


def read_raw(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Raw Open-Meteo JSON (one document per fetch)."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.option("multiLine", "true").json(paths)


METRIC_FIELDS = ["temperature_2m", "relativehumidity_2m", "windspeed_10m"]


def flatten(raw: DataFrame) -> DataFrame:
    """P1 (weather variant): index-safe zip of ``hourly.time`` with each
    metric array (`ETL_Weather_API/transform.py:15-40`) — ``arrays_zip``
    pads short arrays with NULL exactly like the reference's bounds
    check, and metrics absent from the payload become NULL columns (the
    reference's ``hourly.get(key, [])`` default).  One row per
    (document, hour)."""
    fields: list[str] = []
    for f in raw.schema.fields:
        if f.name == "hourly" and hasattr(f.dataType, "fields"):
            fields = [s.name for s in f.dataType.fields]
    zip_cols = [F.col("hourly.time").alias("time")]
    missing = []
    for m in METRIC_FIELDS:
        if m in fields:
            zip_cols.append(F.col(f"hourly.`{m}`").alias(m))
        else:
            missing.append(m)
    out = raw.select(F.explode(F.arrays_zip(*zip_cols)).alias("z")).select(
        "z.*"
    )
    for m in missing:
        out = out.withColumn(m, F.lit(None).cast("double"))
    return out.select("time", *METRIC_FIELDS)


def transform(flat: DataFrame) -> DataFrame:
    """Rename → coerce → features → drop-all-null
    (`ETL_Weather_API/transform.py:56-81`), one lazy shuffle-free plan."""
    df = flat.withColumnsRenamed(RENAMES)
    df = df.withColumn("time", F.to_timestamp("time"))
    df = df.withColumns(
        {c: F.col(c).try_cast("double") for c in SENSOR_COLS}
    )
    df = df.withColumns(
        {
            "date": F.to_date("time"),  # F5
            "hour": F.hour("time"),  # F4
            "temp_category": temp_category("temperature_c"),  # F6
            "feels_like_c": feels_like_c(),  # F7
        }
    )
    df = df.na.drop(how="all", subset=SENSOR_COLS)  # P5
    return df.select(*STAGED_COLS)


def analysis_summary(df: DataFrame) -> DataFrame:
    """A8: one-row global summary (`ETL_Weather_API/etl_analysis.py:107-122`).
    ``time_min``/``time_max`` are stringified like the reference's
    ``str(Timestamp)``."""
    return df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.date_format(F.min("time"), "yyyy-MM-dd HH:mm:ss").alias("time_min"),
        F.date_format(F.max("time"), "yyyy-MM-dd HH:mm:ss").alias("time_max"),
        F.avg("temperature_c").alias("temp_mean"),
        F.avg("relative_humidity").alias("humidity_mean"),
        F.avg("wind_speed_kmh").alias("wind_mean"),
    )


def hourly_avg_temp(df: DataFrame) -> DataFrame:
    """A9: mean temperature per (date, hour)
    (`ETL_Weather_API/etl_analysis.py:126-130`), pandas-sorted by key."""
    return (
        df.groupBy("date", "hour")
        .agg(F.avg("temperature_c").alias("temperature_c"))
        .orderBy("date", "hour")
    )


def daily_avg_temp(df: DataFrame) -> DataFrame:
    """A10: mean temperature per date (`etl_analysis.py:144-146`)."""
    return (
        df.groupBy("date")
        .agg(F.avg("temperature_c").alias("temperature_c"))
        .orderBy("date")
    )


def analyze(df: DataFrame) -> dict[str, DataFrame]:
    return {
        "analysis_summary": analysis_summary(df),
        "hourly_avg_temp": hourly_avg_temp(df),
        "daily_avg_temp": daily_avg_temp(df),
    }


def run_pipeline(
    spark: SparkSession,
    raw_paths: str | list[str],
    staged_path: str,
    processed_dir: str,
    skip_analysis: bool = False,
    append: Callable[[DataFrame], None] | None = None,
) -> dict[str, float]:
    """Orchestrator mirroring ``run_pipeline.py:7-20`` (direct calls, no
    subprocess fallback): transform → staged parquet → optional append
    load (S8) → analysis CSVs."""
    timings: dict[str, float] = {}

    def step(name: str, fn: Callable[[], None]) -> None:
        t0 = _time.time()
        fn()
        timings[name] = _time.time() - t0

    step(
        "transform",
        lambda: transform(flatten(read_raw(spark, raw_paths)))
        .write.mode("overwrite")
        .parquet(staged_path),
    )
    staged_df = spark.read.parquet(staged_path)
    if append is not None:
        step("load", lambda: append(staged_df))
    if not skip_analysis:

        def _analysis() -> None:
            for name, out in analyze(staged_df).items():
                out.coalesce(1).write.mode("overwrite").option(
                    "header", True
                ).csv(f"{processed_dir}/{name}")

        step("analysis", _analysis)
    return timings


def main() -> None:
    """CLI twin of ``run_pipeline.py:7-20``: latest raw file → staged
    parquet → append load → analysis CSVs."""
    import glob
    import os

    from advanced_etl_pipelines_spark.session import get_spark
    from advanced_etl_pipelines_spark.sources.sinks import append_parquet

    raw_dir = os.environ.get("WX_RAW_DIR", "data/raw")
    out_root = os.environ.get("WX_OUT_DIR", "data")
    raws = sorted(glob.glob(f"{raw_dir}/weather_*.json"))
    if not raws:
        raise SystemExit(f"no raw weather JSON in {raw_dir}")
    spark = get_spark("weather-pipeline")
    timings = run_pipeline(
        spark,
        raws[-1],  # latest-wins, ETL_Weather_API/transform.py:87-92
        f"{out_root}/staged/weather",
        f"{out_root}/processed",
        append=lambda df: append_parquet(df, f"{out_root}/warehouse/weather_data"),
    )
    for step, sec in timings.items():
        print(f"{step}: {sec:.1f}s")


if __name__ == "__main__":
    main()
