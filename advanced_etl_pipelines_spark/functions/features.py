"""Derived-feature expressions with exact reference parity (SURVEY.md §2.4).

The reference implements these as per-row Python functions
(`ETL_Multi_Lvl_API/transform.py:42-80`, duplicated in
`etl_analysis.py:59-102`; `ETL_Weather_API/transform.py:72-77`).  Here each
is ONE shared native expression used by both the pipeline and analytics
layers — the reference's copy-paste duplication collapses into this module.

Parity notes (do NOT "fix" these — tests pin them):

* ``aqi_category_pm25``: the reference's boundaries are integer-style with
  *gaps*: 50 < v < 51, 100 < v < 101, 200 < v < 201 all fall through to
  "Unknown" (`transform.py:49-59`).  v > 300 → "Hazardous" has no gap.
* ``severity_score``: nulls count as 0, not null-propagation
  (`transform.py:62-73` ``safe()``); uv_index is excluded from the formula.
* ``risk_class_from_severity``: null severity → "Low Risk" because pandas
  ``NaN > 400`` is False (`transform.py:75-80`); Spark ``when(NULL > 400)``
  is also not-true, so chained when() matches for free.
* ``temp_category``: pandas ``pd.cut`` with right-closed bins
  ``(-100,0],(0,10],(10,20],(20,30],(30,100]``; values outside (-100,100]
  and nulls → NULL (`ETL_Weather_API/transform.py:75`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "aqi_category_pm25",
    "severity_score",
    "risk_class_from_severity",
    "temp_category",
    "feels_like_c",
    "SEVERITY_WEIGHTS",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _dbl(c: Column | str) -> Column:
    """Cast-with-null-on-failure: parity with the reference's pervasive
    ``pd.to_numeric(errors="coerce")`` (P4, `transform.py:246-247`).
    try_cast keeps that semantics under Spark 4's default ANSI mode."""
    return _col(c).try_cast("double")


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds (fractional micros kept) for TIMESTAMP *or*
    TIMESTAMP_NTZ input.  Parquet written by arrow/pandas without a tz
    (isAdjustedToUTC=false) reads as NTZ in Spark 4, which cannot cast to
    DOUBLE directly; NTZ->TIMESTAMP interprets the wall time in the
    session zone (UTC here), matching DuckDB's EPOCH() on the same naive
    values bit-for-bit.  TIMESTAMP input passes through unchanged."""
    return _col(c).cast("timestamp").cast("double")


def aqi_category_pm25(v: Column | str) -> Column:
    """AQI category from PM2.5 (`ETL_Multi_Lvl_API/transform.py:42-59`).

    Boundary semantics are exact: v<=50 Good; 51<=v<=100 Moderate;
    101<=v<=200 Unhealthy; 201<=v<=300 Very Unhealthy; v>300 Hazardous;
    null or in a gap (e.g. 50.5) -> Unknown.
    """
    c = _dbl(v)
    return (
        F.when(c.isNull(), F.lit("Unknown"))
        .when(c <= 50, F.lit("Good"))
        .when((c >= 51) & (c <= 100), F.lit("Moderate"))
        .when((c >= 101) & (c <= 200), F.lit("Unhealthy"))
        .when((c >= 201) & (c <= 300), F.lit("Very Unhealthy"))
        .when(c > 300, F.lit("Hazardous"))
        .otherwise(F.lit("Unknown"))
    )


# Weight table from `ETL_Multi_Lvl_API/transform.py:62-73` (uv_index excluded).
SEVERITY_WEIGHTS: dict[str, float] = {
    "pm2_5": 5.0,
    "pm10": 3.0,
    "nitrogen_dioxide": 4.0,
    "sulphur_dioxide": 4.0,
    "carbon_monoxide": 2.0,
    "ozone": 3.0,
}


def severity_score(
    pm2_5: Column | str = "pm2_5",
    pm10: Column | str = "pm10",
    nitrogen_dioxide: Column | str = "nitrogen_dioxide",
    sulphur_dioxide: Column | str = "sulphur_dioxide",
    carbon_monoxide: Column | str = "carbon_monoxide",
    ozone: Column | str = "ozone",
) -> Column:
    """Weighted severity with null-as-zero (`transform.py:62-73`).

    Term order mirrors the reference exactly so float accumulation order
    (and hence bits) matches a left-to-right evaluation of the same formula.
    """
    z = lambda c: F.coalesce(_dbl(c), F.lit(0.0))  # noqa: E731
    return (
        z(pm2_5) * 5.0
        + z(pm10) * 3.0
        + z(nitrogen_dioxide) * 4.0
        + z(sulphur_dioxide) * 4.0
        + z(carbon_monoxide) * 2.0
        + z(ozone) * 3.0
    )


def risk_class_from_severity(sev: Column | str) -> Column:
    """>400 High, >200 Moderate, else Low — null lands in Low
    (`transform.py:75-80`; pandas NaN comparisons are False)."""
    c = _dbl(sev)
    return (
        F.when(c > 400, F.lit("High Risk"))
        .when(c > 200, F.lit("Moderate Risk"))
        .otherwise(F.lit("Low Risk"))
    )


def temp_category(temp_c: Column | str) -> Column:
    """pd.cut right-closed bins (-100,0],(0,10],(10,20],(20,30],(30,100]
    -> very_cold|cold|mild|warm|hot; outside range / null -> NULL
    (`ETL_Weather_API/transform.py:75`)."""
    c = _dbl(temp_c)
    null_s = F.lit(None).cast("string")
    return (
        F.when(c.isNull() | (c <= -100) | (c > 100), null_s)
        .when(c <= 0, F.lit("very_cold"))
        .when(c <= 10, F.lit("cold"))
        .when(c <= 20, F.lit("mild"))
        .when(c <= 30, F.lit("warm"))
        .otherwise(F.lit("hot"))
    )


def feels_like_c(
    temp_c: Column | str = "temperature_c",
    rel_humidity: Column | str = "relative_humidity",
) -> Column:
    """temperature_c - (relative_humidity/100)*2, null-propagating
    (`ETL_Weather_API/transform.py:77`)."""
    return _dbl(temp_c) - (_dbl(rel_humidity) / F.lit(100.0)) * F.lit(2.0)
