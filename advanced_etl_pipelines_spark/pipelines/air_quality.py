"""Urban Air Quality pipeline — Spark-native rebuild of the reference's
``ETL_Multi_Lvl_API`` stages (SURVEY.md §3.1).

Reference shape (all pandas, eager, files-on-disk between stages):
``extract.py`` (HTTP → raw JSON) → ``transform.py:212-276`` (parse → concat
→ coerce → drop → dedup-mean → features → staged CSV) →
``load.py:147-165`` (batched upsert) → ``etl_analysis.py:346-411`` (KPIs,
risk distribution, trends).

Here each stage is a pure ``DataFrame -> DataFrame`` function; the medallion
handoff is Parquet (partitioned by city) instead of timestamped CSV, and
the whole transform is ONE lazy plan — scan, explode, aggregate and the
derived features all run in a single whole-stage-codegen pass, where the
reference makes four materialized passes with per-row Python ``apply``.

Scale notes (100 TB): the only shuffle in the transform is the
(city, time) dedup aggregate — partial aggregation runs map-side, so the
exchange carries one row per (city, hour), not per reading.  The analysis
aggregates reduce to a handful of rows; everything downstream of them is
driver-sized.  Staged data is partitioned by ``city`` so per-city queries
prune partitions.
"""

from __future__ import annotations

import time as _time
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.functions.features import (
    aqi_category_pm25,
    risk_class_from_severity,
    severity_score,
)
from advanced_etl_pipelines_spark.operators.relational import ensure_schema

# ETL_Multi_Lvl_API/transform.py:29-37
POLLUTANT_COLS = [
    "pm10",
    "pm2_5",
    "carbon_monoxide",
    "nitrogen_dioxide",
    "sulphur_dioxide",
    "ozone",
    "uv_index",
]

RISK_CLASSES = ["High Risk", "Moderate Risk", "Low Risk"]

STAGED_COLS = ["city", "time", "hour"] + POLLUTANT_COLS + [
    "aqi_pm25",
    "severity",
    "risk_class",
]


def _struct_fields(df: DataFrame, name: str) -> list[str]:
    """Field names of a top-level struct column, [] if absent/not a struct."""
    for f in df.schema.fields:
        if f.name == name and hasattr(f.dataType, "fields"):
            return [sub.name for sub in f.dataType.fields]
    return []


def _filename_hint() -> Column:
    """City from the landing filename, e.g. ``mumbai_raw_2025….json``
    (`ETL_Multi_Lvl_API/transform.py:104-106`)."""
    return F.regexp_extract(F.input_file_name(), r"([^/_]+)_raw_", 1)


def read_raw(spark: SparkSession, raw_dir: str) -> DataFrame:
    """S4: multiLine JSON directory scan with corrupt-file tolerance
    (`ETL_Multi_Lvl_API/transform.py:83-87,217-222`).  One row per raw
    payload document, plus the source-filename city hint."""
    return (
        spark.read.option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .json(f"{raw_dir}/*_raw_*.json")
        .withColumn("_file_hint", _filename_hint())
    )


def parse_hourly_array(raw: DataFrame) -> DataFrame:
    """P1: struct-of-arrays payload → one row per hour
    (`ETL_Multi_Lvl_API/transform.py:89-130`).

    ``arrays_zip`` aligns the time array with each pollutant array by
    index, padding short arrays with NULL — the same index-safe zip the
    reference does by hand.  Key variants (``pm2_5``/``pm2.5``/``pm25``)
    are resolved against the inferred schema (`transform.py:110-118`);
    absent metrics become NULL columns (P9).
    """
    fields = _struct_fields(raw, "hourly")
    if "time" not in fields:
        return None  # shape not present in this corpus
    docs = raw.where(F.col("hourly").isNotNull() & F.col("hourly.time").isNotNull())

    zip_cols = [F.col("hourly.time").alias("time")]
    null_cols: list[str] = []
    for col in POLLUTANT_COLS:
        variants = [col, col.replace("_", "."), col.replace("_", "")]
        found = next((v for v in variants if v in fields), None)
        if found is None:
            null_cols.append(col)
        else:
            zip_cols.append(F.col(f"hourly.`{found}`").alias(col))

    # city from payload else filename hint else "unknown"
    # (transform.py:103-106,121; `or` semantics: empty string is falsy)
    top = [f.name for f in raw.schema.fields]
    city_chain = [
        F.nullif(F.trim(F.col(c).cast("string")), F.lit(""))
        for c in ("city", "name")
        if c in top
    ]
    city = F.coalesce(
        *city_chain, F.nullif(F.col("_file_hint"), F.lit("")), F.lit("unknown")
    )

    out = docs.select(
        city.alias("city"), F.explode(F.arrays_zip(*zip_cols)).alias("z")
    ).select(
        "city",
        F.to_timestamp(F.col("z.time")).alias("time"),  # naive ISO → UTC
        *[
            F.col(f"z.`{c}`").try_cast("double").alias(c)
            for c in POLLUTANT_COLS
            if c not in null_cols
        ],
    )
    return ensure_schema(out, {c: "double" for c in null_cols}).select(
        "city", "time", *POLLUTANT_COLS
    )


PARAM_SYNONYMS = {
    "pm2_5": ["pm25", "pm2.5", "pm2_5"],
    "pm10": ["pm10"],
    "carbon_monoxide": ["co", "carbon_monoxide", "carbonmonoxide"],
    "nitrogen_dioxide": ["no2", "nitrogen_dioxide"],
    "sulphur_dioxide": ["so2", "sulphur_dioxide"],
    "ozone": ["o3", "ozone"],
    "uv_index": ["uv", "uv_index"],
}


def map_param(p: Column) -> Column:
    """P3: parameter-name normalization
    (`ETL_Multi_Lvl_API/transform.py:171-191`); unknown → NULL."""
    norm = F.lower(F.trim(p))
    expr = F.lit(None).cast("string")
    for target, names in reversed(PARAM_SYNONYMS.items()):
        expr = F.when(norm.isin(names), F.lit(target)).otherwise(expr)
    return expr


def parse_measurement_list(raw: DataFrame) -> DataFrame:
    """P2+P3+A2: OpenAQ-style ``results[].parameters[]`` → long rows →
    pivot to pollutant columns (`ETL_Multi_Lvl_API/transform.py:132-209`).

    Key synonyms resolve via ``coalesce`` chains guarded by the inferred
    schema; the long→wide pivot passes explicit pollutant values so the
    output schema is fixed without an extra distinct-scan job.
    """
    if "results" not in [f.name for f in raw.schema.fields]:
        return None
    docs = raw.where(F.col("results").isNotNull())
    loc = docs.select(
        "_file_hint", F.explode(F.col("results")).alias("r")
    )

    rfields = []
    for f in docs.schema.fields:
        if f.name == "results":
            el = f.dataType.elementType
            rfields = [sub.name for sub in el.fields] if hasattr(el, "fields") else []

    def rcol(names: list[str], inner: str | None = None) -> Column:
        present = [n for n in names if n in rfields]
        if not present:
            return F.lit(None)
        cols = []
        for n in present:
            c = F.col(f"r.`{n}`")
            cols.append(c)
        return F.coalesce(*cols) if len(cols) > 1 else cols[0]

    city = F.coalesce(
        F.nullif(F.trim(rcol(["city"]).cast("string")), F.lit("")),
        F.nullif(F.trim(rcol(["name"]).cast("string")), F.lit("")),
        F.nullif(F.trim(rcol(["location"]).cast("string")), F.lit("")),
        F.nullif(F.col("_file_hint"), F.lit("")),
    )

    params_field = next(
        (
            n
            for n in ("parameters", "measurements", "latest", "latestMeasurements")
            if n in rfields
        ),
        None,
    )
    if params_field is None:
        return None
    long = loc.select(
        city.alias("city"), F.explode(F.col(f"r.`{params_field}`")).alias("p")
    )
    pfields = []
    for f in long.schema.fields:
        if f.name == "p" and hasattr(f.dataType, "fields"):
            pfields = [sub.name for sub in f.dataType.fields]

    def pcol(names: list[str]) -> Column:
        present = [F.col(f"p.`{n}`") for n in names if n in pfields]
        if not present:
            return F.lit(None)
        return F.coalesce(*present) if len(present) > 1 else present[0]

    param = pcol(["parameter", "param", "name"])
    value = pcol(["lastValue", "value", "avg"])
    # ts: first present of lastUpdated/lastUpdatedAt/date/time, with the
    # {"utc": …} dict shape (transform.py:154-155) unpacked IN PLACE in
    # the chain — a corpus may mix struct-shaped and string-shaped
    # timestamp fields across files, so each candidate contributes its
    # own variant rather than a struct hijacking the whole chain.
    sub_types = {}
    for f in long.schema.fields:
        if f.name == "p" and hasattr(f.dataType, "fields"):
            sub_types = {s.name: s.dataType for s in f.dataType.fields}
    ts_parts: list[Column] = []
    for name in ("lastUpdated", "lastUpdatedAt", "date", "time"):
        t = sub_types.get(name)
        if t is None:
            continue
        if hasattr(t, "fields"):
            inner = [s.name for s in t.fields]
            ts_parts.extend(
                F.col(f"p.`{name}`.`{k}`") for k in ("utc", "local") if k in inner
            )
        else:
            ts_parts.append(F.col(f"p.`{name}`"))
    ts = F.coalesce(*ts_parts) if ts_parts else F.lit(None)

    rows = long.select(
        "city",
        F.to_timestamp(ts.cast("string")).alias("time"),
        map_param(param.cast("string")).alias("param_col"),
        value.cast("string").try_cast("double").alias("value"),
    ).where(F.col("param_col").isNotNull())

    # groupby(city,time,param).mean → pivot_table(mean)  (transform.py:196-202)
    pivot = (
        rows.groupBy("city", "time")
        .pivot("param_col", POLLUTANT_COLS)
        .agg(F.avg("value"))
    )
    return ensure_schema(pivot, {c: "double" for c in POLLUTANT_COLS}).select(
        "city", "time", *POLLUTANT_COLS
    )


def parse_raw(raw: DataFrame) -> DataFrame:
    """Shape detection + parse + union (`transform.py:226-231,242`):
    hourly-array docs take P1, everything else P2; fragments union by name."""
    frames = [f for f in (parse_hourly_array(raw), parse_measurement_list(raw)) if f is not None]
    if not frames:
        raise ValueError("no parseable raw shape found")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def transform(parsed: DataFrame) -> DataFrame:
    """Coerce → drop-all-null → dedup-mean → derived features
    (`transform.py:244-272`).  One lazy plan: the only shuffle is the
    (city, time) aggregate, with map-side partial aggregation."""
    df = parsed.select(
        "city",
        F.col("time"),
        *[F.col(c).try_cast("double").alias(c) for c in POLLUTANT_COLS],
    )
    # P5: keep rows where ANY pollutant is non-null (transform.py:250)
    any_present = None
    for c in POLLUTANT_COLS:
        cond = F.col(c).isNotNull()
        any_present = cond if any_present is None else (any_present | cond)
    df = df.where(any_present)

    # A1: duplicate readings per (city, time) collapse to the mean
    df = df.groupBy("city", "time").agg(
        *[F.avg(c).alias(c) for c in POLLUTANT_COLS]
    )

    # F1-F4 as native expressions (no Python apply; transform.py:265-268)
    df = (
        df.withColumn("hour", F.hour("time"))
        .withColumn("aqi_pm25", aqi_category_pm25("pm2_5"))
        .withColumn("severity", severity_score())
        .withColumn("risk_class", risk_class_from_severity("severity"))
    )
    return df.select(*STAGED_COLS)


def write_staged(df: DataFrame, path: str) -> None:
    """S5 equivalent: Parquet partitioned by city, time-sorted within
    partitions (timestamped CSV in the reference; partition pruning
    replaces latest-wins filename sorting, and the time sort keeps
    row-group min/max stats tight for time-range scans)."""
    df.sortWithinPartitions("time").write.mode("overwrite").partitionBy(
        "city"
    ).parquet(path)


def _recompute_guard(df: DataFrame) -> DataFrame:
    """`etl_analysis.py:149-165`: pad missing pollutant columns, recompute
    severity / risk_class / aqi_pm25 when the column is absent.

    The reference recomputes when absent OR all-null; the all-null probe
    is an extra full scan, so we recompute when absent and otherwise
    coalesce per-row — equivalent output for every observed input."""
    df = ensure_schema(df, {c: "double" for c in POLLUTANT_COLS})
    if "severity" not in df.columns:
        df = df.withColumn("severity", severity_score())
    if "risk_class" not in df.columns:
        df = df.withColumn("risk_class", risk_class_from_severity("severity"))
    if "aqi_pm25" not in df.columns:
        df = df.withColumn("aqi_pm25", aqi_category_pm25("pm2_5"))
    return df


def summary_metrics(df: DataFrame) -> DataFrame:
    """A4+A5+A6 → long (metric, value) frame
    (`etl_analysis.py:167-224,359-380`).  Three tiny argmax aggregates;
    ties break like pandas ``idxmax`` (first key in sorted group order)."""

    def argmax(value_col: str, key: Column, metric: str, val_metric: str) -> DataFrame:
        top = (
            df.where(key.isNotNull())
            .groupBy(key.alias("k"))
            .agg(F.avg(value_col).alias("v"))
            .where(F.col("v").isNotNull())
            .orderBy(F.desc("v"), F.asc("k"))
            .limit(1)
        )
        return top.select(
            F.explode(
                F.array(
                    F.struct(F.lit(metric).alias("metric"), F.col("k").cast("string").alias("value")),
                    F.struct(F.lit(val_metric).alias("metric"), F.col("v").cast("string").alias("value")),
                )
            ).alias("m")
        ).select("m.metric", "m.value")

    city_pm = argmax(
        "pm2_5", F.col("city"), "city_highest_avg_pm2_5", "city_highest_avg_pm2_5_value"
    )
    city_sev = argmax(
        "severity", F.col("city"), "city_highest_severity", "city_highest_severity_value"
    )
    hour_pm = argmax(
        "pm2_5",
        F.hour("time"),
        "hour_with_worst_avg_pm2_5",
        "hour_with_worst_avg_pm2_5_value",
    )
    return city_pm.unionAll(city_sev).unionAll(hour_pm)


def city_risk_distribution(df: DataFrame) -> DataFrame:
    """A3: pivot-count of risk classes per city + totals + percentages
    (`etl_analysis.py:227-245`), ordered by city like pandas groupby."""
    counts = (
        df.groupBy("city")
        .pivot("risk_class", RISK_CLASSES)
        .count()
        .na.fill(0, RISK_CLASSES)
    )
    total = sum(F.col(c) for c in RISK_CLASSES)
    return (
        counts.withColumn("total_hours", total)
        .withColumn("pct_high", F.col("High Risk") / F.col("total_hours") * 100)
        .withColumn("pct_moderate", F.col("Moderate Risk") / F.col("total_hours") * 100)
        .withColumn("pct_low", F.col("Low Risk") / F.col("total_hours") * 100)
        .orderBy("city")
        .select(
            "city", *RISK_CLASSES, "total_hours", "pct_high", "pct_moderate", "pct_low"
        )
    )


def pollution_trends(df: DataFrame) -> DataFrame:
    """A11+A15: per (city, time) mean of pm2_5/pm10/ozone, sorted
    (`etl_analysis.py:248-262`)."""
    df = ensure_schema(df, {c: "double" for c in ("pm2_5", "pm10", "ozone")})
    return (
        df.groupBy("city", "time")
        .agg(
            F.avg("pm2_5").alias("pm2_5"),
            F.avg("pm10").alias("pm10"),
            F.avg("ozone").alias("ozone"),
        )
        .orderBy("city", "time")
    )


def analyze(df: DataFrame) -> dict[str, DataFrame]:
    """`etl_analysis.py:346-411` minus the PNG sinks: city trim (P10),
    recompute guard, then the three processed outputs."""
    df = df.withColumn("city", F.trim(F.col("city").cast("string")))
    df = _recompute_guard(df)
    return {
        "summary_metrics": summary_metrics(df),
        "city_risk_distribution": city_risk_distribution(df),
        "pollution_trends": pollution_trends(df),
    }


def run_pipeline(
    spark: SparkSession,
    raw_dir: str,
    staged_path: str,
    processed_dir: str,
    skip_load: bool = False,
    skip_analysis: bool = False,
    upsert: Callable[[DataFrame], None] | None = None,
) -> dict[str, float]:
    """Orchestrator mirroring ``etl_pipeline.py:62-79,108-134``: named
    steps, wall-clock timing, skip flags, abort-on-failure (exceptions
    propagate).  ``upsert`` is the warehouse load hook (S7) — a
    ``sinks.upsert_parquet`` closure in tests; None skips like SKIP_LOAD."""
    timings: dict[str, float] = {}

    def step(name: str, fn: Callable[[], None]) -> None:
        t0 = _time.time()
        fn()
        timings[name] = _time.time() - t0

    staged: list[DataFrame] = []
    step("transform", lambda: write_staged(transform(parse_raw(read_raw(spark, raw_dir))), staged_path))
    staged_df = spark.read.parquet(staged_path)
    if not skip_load and upsert is not None:
        step("load", lambda: upsert(staged_df))
    if not skip_analysis:
        def _analysis() -> None:
            for name, out in analyze(staged_df).items():
                out.coalesce(1).write.mode("overwrite").option("header", True).csv(
                    f"{processed_dir}/{name}"
                )
        step("analysis", _analysis)
    return timings


def main() -> None:
    """CLI twin of ``etl_pipeline.py:108-134``: raw dir → staged parquet →
    optional warehouse upsert → processed CSVs, with env skip flags
    (`SKIP_LOAD`/`SKIP_ANALYSIS`, `:121-130`) and per-step timing."""
    import os

    from advanced_etl_pipelines_spark.session import get_spark
    from advanced_etl_pipelines_spark.sources.sinks import (
        upsert_parquet_partitioned,
    )

    raw_dir = os.environ.get("AQ_RAW_DIR", "data/raw")
    out_root = os.environ.get("AQ_OUT_DIR", "data")
    skip_load = os.environ.get("SKIP_LOAD", "").lower() in ("1", "true", "yes")
    skip_analysis = os.environ.get("SKIP_ANALYSIS", "").lower() in (
        "1", "true", "yes",
    )
    spark = get_spark("aq-pipeline")
    wh = f"{out_root}/warehouse/air_quality"
    timings = run_pipeline(
        spark,
        raw_dir,
        f"{out_root}/staged/air_quality",
        f"{out_root}/processed",
        skip_load=skip_load,
        skip_analysis=skip_analysis,
        upsert=None
        if skip_load
        else (
            lambda df: upsert_parquet_partitioned(
                spark, df, wh, ["city", "time"], "city"
            )
        ),
    )
    for step, sec in timings.items():
        print(f"{step}: {sec:.1f}s")


if __name__ == "__main__":
    main()
