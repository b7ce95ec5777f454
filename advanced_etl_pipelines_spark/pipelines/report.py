"""S13 report sink: render the reference's six figures as PNGs.

The reference pipelines end in matplotlib/seaborn charts
(`ETL_Multi_Lvl_API/etl_analysis.py:266-343` — histogram, stacked risk
bars, hourly trend lines, sampled scatter;
`ETL_Weather_API/etl_analysis.py:132-156` — temperature histogram,
daily-average line).  Round 1 computed every feeding aggregate
(all oracle-green) but never rendered (VERDICT.md item 8); this module
closes that: each chart is its already-green registry aggregate
``toPandas()``'d to the driver (bounded rows — bins, days, top-k) and
rasterized with the pure-numpy chart module (functions/charts.py).

The scale boundary is the point: Spark aggregates distributed, ONLY
plot-ready rows cross to the driver.  The reference's scatter samples
2,000 raw rows "for performance"; its stand-in here is the full-data
2-D density heatmap (heatmap_2d_bins), which sees every row at any
scale.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import SparkSession

# (filename, reference figure it mirrors)
REPORT_CHARTS = {
    "value_histogram.png": "histogram (etl_analysis.py:266 plot_histogram_pm25)",
    "status_stacked_bars.png": "stacked risk bars (:278 plot_risk_flags_per_city)",
    "hourly_trends.png": "hourly trend lines (:294 plot_hourly_pm25_trends)",
    "density_heatmap.png": "scatter, as full-data density (:335 plot_severity_vs_pm25)",
    "second_histogram.png": "temperature hist (ETL_Weather_API etl_analysis.py:135)",
    "daily_avg_line.png": "daily average line (ETL_Weather_API etl_analysis.py:145)",
}


def render_report(spark: SparkSession, sf_dir: str, out_dir: str) -> list[str]:
    """Run the six feeding aggregates and write the six PNGs; returns
    the written paths.  Every aggregate is a registry query (oracle
    checked at sf0.01 by the driver gate) — rendering adds no new
    computation, only driver-side rasterization of bounded frames."""
    from advanced_etl_pipelines_spark.functions import charts as C
    from advanced_etl_pipelines_spark.plans import QUERIES as qs
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []

    def save(name: str, data: bytes) -> None:
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(data)
        written.append(path)

    # 1. equal-width histogram of lineitem prices (40 bins)
    hist = qs["histogram_40"](spark, sf_dir).toPandas().sort_values("bucket")
    save("value_histogram.png", C.render_bars(hist["cnt"].to_numpy()))

    # 2. stacked bars: order-status counts per priority
    ct = (
        qs["crosstab_pct"](spark, sf_dir)
        .toPandas()
        .sort_values("o_orderpriority")
    )
    save(
        "status_stacked_bars.png",
        C.render_bars(ct[["f_cnt", "o_cnt", "p_cnt"]].to_numpy()),
    )

    # 3. hourly trend lines, one series per event type
    hourly = qs["resample_hourly"](spark, sf_dir).toPandas()
    hourly["x"] = (
        np.array(hourly["bucket"], dtype="datetime64[s]").astype("int64")
    )
    series = [
        (g["x"].to_numpy(), g["avg_value"].to_numpy())
        for _, g in hourly.sort_values("x").groupby("event_type")
    ]
    save("hourly_trends.png", C.render_lines(series))

    # 4. 2-D density heatmap (full-data twin of the sampled scatter)
    hm = qs["heatmap_2d_bins"](spark, sf_dir).toPandas()
    grid = np.zeros((20, 20))
    grid[hm["ybucket"].to_numpy(), hm["xbucket"].to_numpy()] = hm[
        "cnt"
    ].to_numpy()
    save("density_heatmap.png", C.render_heatmap(grid))

    # 5. second histogram (events.value distribution via equi-depth)
    h2 = (
        qs["equi_depth_histogram"](spark, sf_dir)
        .toPandas()
        .sort_values("bucket")
    )
    save("second_histogram.png", C.render_bars(h2["cnt"].to_numpy()))

    # 6. daily average line
    daily = qs["group_mean_daily"](spark, sf_dir).toPandas().sort_values("date")
    xs = np.arange(len(daily), dtype=float)
    save(
        "daily_avg_line.png",
        C.render_lines([(xs, daily["avg_value"].to_numpy())]),
    )
    return written
