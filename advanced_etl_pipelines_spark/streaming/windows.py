"""Structured Streaming surface (SURVEY.md §2.5 [extension]).

The reference is batch-only; its incremental story is timestamped raw
files plus a ``(city,time)``-keyed upsert that makes re-runs idempotent
(`ETL_Multi_Lvl_API/load.py:117-144`).  The streaming analogue of that
loop is: file/rate source → event-time watermark → windowed aggregation →
``foreachBatch`` MERGE-upsert keyed on the window — a strict superset of
the reference's late-data semantics (it has none; full overwrite-by-key).

Everything here composes the same batch expression library: a windowed
aggregation is the streaming twin of ``resample_avg`` (A13), and the
``foreachBatch`` sink reuses ``sinks.upsert_parquet`` (S7) so batch and
streaming share one idempotent write path.

Scale notes: state size = active windows × groups; the watermark bounds
it by evicting windows older than (max event time − delay).  Shuffle is
keyed on (group, window) exactly like the batch groupBy, so skew remedies
(salting, AQE) carry over.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import TimestampNTZType


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize an event-time column to TIMESTAMP.

    Parquet landed by arrow/pandas without a timezone reads as
    TIMESTAMP_NTZ, which ``withWatermark`` rejects outright
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).  NTZ→TIMESTAMP interprets
    the wall time in the session zone (UTC for this engine), so the
    instant is unchanged; TIMESTAMP input passes through untouched."""
    field = next((f for f in df.schema.fields if f.name == ts_col), None)
    if field is not None and isinstance(field.dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark_delay: str = "10 minutes",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling (or sliding) window aggregate over an event
    stream: count + sum/avg(value) per (window, group).

    Works identically on a batch DataFrame (watermark is a no-op there),
    which is how tests pin streaming output == batch output.
    """
    events = ensure_event_time(events, ts_col)
    w = F.window(F.col(ts_col), window_duration, slide_duration or window_duration)
    src = events.withWatermark(ts_col, watermark_delay) if events.isStreaming else events
    return (
        src.groupBy(w.alias("win"), *[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark_delay: str = "10 minutes",
    key_col: str = "user_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Dynamic-gap session windows via native ``F.session_window`` —
    Spark merges events whose windows ``[ts, ts+gap)`` overlap, growing
    each session until a quiet period >= gap.  Unlike the LAG-based
    batch sessionizer (``sessionize_events``), this is the engine's own
    session operator: it works unchanged on a watermarked stream, where
    state per open session is evicted once the watermark passes its
    close.  Per (key, session): event count and active span
    (last-first event, i.e. window length minus the trailing gap)."""
    events = ensure_event_time(events, ts_col)
    src = (
        events.withWatermark(ts_col, watermark_delay)
        if events.isStreaming
        else events
    )
    # value_col=None -> count-only sessions, for sources without a
    # numeric payload column (ADVICE.md: the signature parameterizes
    # ts/key, so the summed column must be parameterized too).
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    sess = src.groupBy(
        F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("sw"),
        F.col(key_col),
    ).agg(*aggs)
    # session_window.end = last event + gap; subtract the gap to report
    # the ACTIVE span (last-first event), which the LAG-islands oracle
    # can reproduce exactly.
    span = (
        F.col("sw.end").cast("double")
        - F.col("sw.start").cast("double")
        - F.lit(float(gap_seconds))
    )
    return sess.select(
        F.col(key_col),
        F.col("sw.start").alias("session_start"),
        span.alias("active_s"),
        "n_events",
        *(["sum_value"] if value_col is not None else []),
    )


def start_upsert_stream(
    stream_df: DataFrame,
    target_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    trigger_once: bool = True,
    output_mode: str = "update",
) -> StreamingQuery:
    """``writeStream.foreachBatch`` → key-idempotent parquet upsert (the
    streaming S7).  ``update`` output mode re-emits a window whenever the
    watermark admits late rows; the upsert keyed on the window columns
    overwrites the stale aggregate, so the sink converges to the same
    table a batch run would produce.  Session-window aggregations only
    support ``append`` (rows emit once, when the watermark closes the
    session) — pass ``output_mode="append"`` for those.
    """
    from advanced_etl_pipelines_spark.sources.sinks import upsert_parquet

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(batch_df.sparkSession, batch_df, target_path, keys)

    writer = (
        stream_df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def file_event_stream(
    spark,
    source_dir: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File source over a landing directory — the streaming S4.  New files
    are discovered per micro-batch; ``maxFilesPerTrigger`` throttles
    backfill so one giant landing burst doesn't become one giant batch."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup: drop rows whose ``keys``
    were already seen within the watermark horizon — the streaming twin
    of exact dedup (operators/dedup.py) and the idempotency guard an
    at-least-once upstream (Kafka, retried HTTP landings) needs before
    the upsert sink.

    State = one entry per distinct key inside the horizon, evicted by
    the watermark — bounded, unlike a naive ``dropDuplicates`` on a
    stream (which keeps ALL keys forever and OOMs at 100 TB/day)."""
    events = ensure_event_time(events, ts_col)
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join within a time interval:
    ``right_ts ∈ [left_ts - upper, left_ts - lower]`` per key — e.g.
    "click attributed to a purchase within the preceding hour".

    Both sides are watermarked; the interval condition lets Spark bound
    the join state (each side holds only rows inside watermark +
    interval).  An unbounded-condition stream-stream join would keep
    both streams' full history in state — never do that at scale.

    ``how`` may be ``left_outer``/``right_outer``/``full_outer``:
    outer rows emit with NULLs only once the watermark proves no match
    can still arrive, so unmatched results trail the inner ones by the
    watermark delay — that lag is the price of correctness, not a bug."""
    left = ensure_event_time(left, left_ts)
    right = ensure_event_time(right, right_ts)
    l = left.withWatermark(left_ts, delay).alias("l")
    r = right.withWatermark(right_ts, delay).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts - F.expr(f"INTERVAL {upper_s} SECONDS"))
        & (rts <= lts - F.expr(f"INTERVAL {lower_s} SECONDS"))
    )
    return l.join(r, cond, how)


def enrich_with_static(
    stream_df: DataFrame,
    static_df: DataFrame,
    on: Sequence[str],
    how: str = "left_outer",
) -> DataFrame:
    """Stream-static enrichment join (the feature-store lookup pattern):
    each micro-batch joins against the CURRENT state of the static
    DataFrame — no streaming state is kept for the join itself, so it
    composes freely before watermarked aggregation.  Spark broadcasts
    the static side when it fits (it re-resolves per micro-batch, so a
    slowly-refreshed dimension table is picked up on re-read at the
    source level).  At 100 TB the static side is the small one by
    construction — a dimension or per-key feature table; if it outgrows
    broadcast, pre-bucket both sides on the join key."""
    return stream_df.join(F.broadcast(static_df), list(on), how)


def start_medallion_stream(
    stream_df: DataFrame,
    bronze_path: str,
    silver_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Dual-sink micro-batch pipeline with end-to-end idempotency — the
    streaming medallion pattern (raw->staged->rollup is the reference's
    batch layout, `SURVEY.md §1.1`; this is its incremental form):

    1. bronze: the batch lands under ``batch=<id>/`` with mode
       overwrite, so a redelivered batch replaces itself byte-for-byte
       instead of duplicating;
    2. silver: the (day, event_type) rollup is NOT incremented —
       incremental += double-counts on redelivery.  Instead the days
       touched by this batch are re-aggregated FROM bronze (the source
       of truth) and upserted by key.  Recompute-touched-partitions is
       what makes the rollup exactly-once under at-least-once delivery,
       with cost bounded by the touched days, not table size."""
    from advanced_etl_pipelines_spark.sources.sinks import upsert_parquet

    stream_df = ensure_event_time(stream_df, ts_col)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df.write.mode("overwrite").parquet(
            f"{bronze_path}/batch={batch_id}"
        )
        days = [
            r["d"]
            for r in batch_df.select(
                F.to_date(ts_col).alias("d")
            ).distinct().collect()
        ]
        bronze = spark.read.option("basePath", bronze_path).parquet(
            bronze_path
        )
        rollup = (
            bronze.where(F.to_date(ts_col).isin(days))
            .groupBy(F.to_date(ts_col).alias("d"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
        )
        upsert_parquet(spark, rollup, silver_path, ["d", "event_type"])

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
