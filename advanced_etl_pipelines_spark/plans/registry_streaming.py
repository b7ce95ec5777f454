"""Streaming-twin queries (SURVEY.md §2.5 [extension]).

The windowed event aggregation is registered in its BATCH form so the
driver's DuckDB oracle can verify it; ``tests/test_streaming.py`` pins
that the streaming execution of the very same function (file source →
watermark → foreachBatch upsert) produces row-identical output.  That
closes the loop: oracle verifies the semantics, the streaming test
verifies the streaming machinery preserves them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.plans.registry import _t, query, r4
from advanced_etl_pipelines_spark.streaming.windows import windowed_event_stats


@query(
    "stream_windowed_event_stats",
    """
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(1e-9 + SUM(value), 4) AS sum_value,
           ROUND(1e-9 + AVG(value), 4) AS avg_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_stream_windowed_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window stats — the batch twin of the
    Structured Streaming pipeline in ``streaming/windows.py``."""
    out = windowed_event_stats(_t(spark, sf_dir, "events"))
    return out.select(
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        r4(F.col("sum_value")).alias("sum_value"),
        r4(F.col("avg_value")).alias("avg_value"),
    )
