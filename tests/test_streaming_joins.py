"""Streaming dedup + stream-stream interval join: parity with batch
semantics under availableNow processing."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.streaming.windows import (
    dedup_stream,
    file_event_stream,
    interval_join_streams,
)


def _await(query, timeout_s: int = 120) -> None:
    query.awaitTermination(timeout_s)
    deadline = time.time() + timeout_s
    while query.isActive and time.time() < deadline:
        time.sleep(0.2)
    assert not query.isActive


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, 0)


def test_stream_dedup_drops_watermark_window_dups(spark, tmp_path):
    rows = [
        (1, "a", _ts(0), 1.0),
        (1, "a", _ts(1), 2.0),   # dup key inside horizon -> dropped
        (2, "b", _ts(1), 3.0),
        (2, "b", _ts(2), 4.0),   # dup key -> dropped
        (3, "c", _ts(3), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "k long, name string, ts timestamp, v double"
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)

    stream = file_event_stream(spark, src, df.schema)
    out = str(tmp_path / "out")
    q = (
        dedup_stream(stream, ["k"], "ts", "10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert sorted(r.k for r in got.select("k").collect()) == [1, 2, 3]


def test_interval_join_matches_batch_join(spark, tmp_path):
    clicks = [(1, "u1", _ts(10)), (2, "u1", _ts(30)), (3, "u2", _ts(20))]
    purchases = [
        ("u1", _ts(5), 100.0),   # 5 min before click 1 -> match
        ("u1", _ts(29), 200.0),  # 1 min before click 2 -> match
        ("u2", _ts(50), 300.0),  # AFTER u2's click -> no match
    ]
    cdf = spark.createDataFrame(clicks, "click_id long, user string, cts timestamp")
    pdf = spark.createDataFrame(purchases, "user string, pts timestamp, amount double")
    csrc, psrc = str(tmp_path / "c"), str(tmp_path / "p")
    cdf.coalesce(1).write.parquet(csrc)
    pdf.coalesce(1).write.parquet(psrc)

    cs = file_event_stream(spark, csrc, cdf.schema)
    ps = file_event_stream(spark, psrc, pdf.schema)
    # purchase within [cts - 15min, cts]
    joined = interval_join_streams(
        cs, ps, "user", "cts", "pts", lower_s=0, upper_s=900
    ).select("click_id", "amount")
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = sorted(
        (r.click_id, r.amount) for r in spark.read.parquet(out).collect()
    )
    batch = sorted(
        (r.click_id, r.amount)
        for r in cdf.join(
            pdf,
            (cdf.user == pdf.user)
            & (pdf.pts >= cdf.cts - F.expr("INTERVAL 900 SECONDS"))
            & (pdf.pts <= cdf.cts),
        ).select("click_id", "amount").collect()
    )
    assert got == batch == [(1, 100.0), (2, 200.0)]


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """left_outer interval join: matched rows join normally; a click
    with no purchase in its window emits once with NULL amount after
    the watermark closes its interval."""
    clicks = [
        (1, "u1", _ts(10)),
        (2, "u2", _ts(12)),
        (3, "u3", _ts(14)),
        # the stream-global watermark is the MIN over both inputs, so
        # BOTH sides need a late row to close clicks 1-3; this click
        # itself stays open (watermark never passes it) and must not
        # appear in the output.
        (4, "u4", _ts(40)),
    ]
    purchases = [
        ("u1", _ts(5), 100.0),    # inside click 1's window -> match
        ("u9", _ts(40), 999.0),   # unrelated user, advances right watermark
    ]
    cdf = spark.createDataFrame(
        clicks, "click_id long, user string, cts timestamp"
    )
    pdf = spark.createDataFrame(
        purchases, "user string, pts timestamp, amount double"
    )
    csrc, psrc = str(tmp_path / "c"), str(tmp_path / "p")
    cdf.coalesce(1).write.parquet(csrc)
    pdf.coalesce(1).write.parquet(psrc)

    joined = interval_join_streams(
        file_event_stream(spark, csrc, cdf.schema),
        file_event_stream(spark, psrc, pdf.schema),
        "user",
        "cts",
        "pts",
        lower_s=0,
        upper_s=900,
        delay="1 minutes",
        how="left_outer",
    ).select("click_id", "amount")
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = sorted(
        (r.click_id, r.amount) for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, 100.0), (2, None), (3, None)]


def test_stream_dedup_replay_matches_batch_twin(spark, tmp_path):
    """Close the loop on stream_dedup_replay: the same deterministic
    10%-replayed event feed, streamed through dedup_stream on event_id,
    must keep exactly the oracle-checked batch twin's n_unique rows."""
    import __spark_entry__ as e
    from advanced_etl_pipelines_spark.operators.sampling import unit_hash
    from advanced_etl_pipelines_spark.sources.readers import read_sf_table

    sf = "/root/testdata/sf0.001"
    expected = {
        r["event_type"]: r["n_unique"]
        for r in e.queries()["stream_dedup_replay"](spark, sf).collect()
    }

    ev = read_sf_table(spark, sf, "events").select(
        "event_id", "event_type", "ts"
    )
    replay = ev.unionAll(ev.where(unit_hash("event_id") < 0.1))
    src = str(tmp_path / "src")
    replay.coalesce(2).write.parquet(src)

    stream = file_event_stream(spark, src, spark.read.parquet(src).schema)
    out = str(tmp_path / "out")
    # horizon spans the whole 30-day testdata window so every redelivery
    # lands inside the dedup state regardless of file ordering
    q = (
        dedup_stream(stream, ["event_id"], "ts", "31 days")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: a streaming fact enriches against a static
    dimension without watermarks or state (Spark re-reads the static
    side per micro-batch; with a broadcast hint the stream side never
    shuffles) — result must equal the batch join."""
    events = [(1, "u1", 10.0), (2, "u2", 20.0), (3, "u3", 30.0)]
    dims = [("u1", "gold"), ("u2", "silver")]
    edf = spark.createDataFrame(events, "eid long, user string, v double")
    ddf = spark.createDataFrame(dims, "user string, tier string")
    esrc = str(tmp_path / "e")
    edf.coalesce(1).write.parquet(esrc)

    es = file_event_stream(spark, esrc, edf.schema)
    joined = es.join(F.broadcast(ddf), "user", "left_outer").select(
        "eid", "tier"
    )
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = sorted(
        (r.eid, r.tier) for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, "gold"), (2, "silver"), (3, None)]


def test_interval_join_recovers_from_mid_batch_kill(spark, tmp_path):
    """Round-5 VERDICT item 6 — the stream-stream analogue of the
    medallion mid-batch-kill test: kill the query on its SECOND
    micro-batch after the join state stores committed that batch's
    version but before the offset log committed (raise inside
    foreachBatch after the batch's output landed — the worst
    interleaving: sink output on disk, state advanced, batch
    uncommitted).  Restart from the same checkpoint; Spark must replay
    the dead batch against the PREVIOUS state version, so with an
    idempotent by-batch-id sink the final output equals the batch
    join exactly — a double-emission (replaying against the already-
    advanced state, or appending the replayed batch) fails the
    multiset compare.

    Data is laid out so a match SPANS the two micro-batches (purchase
    in the batch-0 file, its click in the batch-1 file), so the replay
    must also recover the buffered right-side state, not just re-read
    input."""
    import collections

    clicks_b0 = [(1, "u1", _ts(10))]
    clicks_b1 = [(2, "u1", _ts(30)), (3, "u2", _ts(20))]
    purch_b0 = [("u1", _ts(5), 100.0), ("u2", _ts(18), 300.0)]
    purch_b1 = [("u1", _ts(29), 200.0)]
    cdf = spark.createDataFrame(
        clicks_b0 + clicks_b1, "click_id long, user string, cts timestamp"
    )
    pdf = spark.createDataFrame(
        purch_b0 + purch_b1, "user string, pts timestamp, amount double"
    )
    csrc, psrc = str(tmp_path / "c"), str(tmp_path / "p")
    for rows, schema, path in [
        (clicks_b0, cdf.schema, csrc + "/f0"),
        (clicks_b1, cdf.schema, csrc + "/f1"),
    ]:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
    for rows, schema, path in [
        (purch_b0, pdf.schema, psrc + "/f0"),
        (purch_b1, pdf.schema, psrc + "/f1"),
    ]:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    calls = {"n": 0, "die": True}

    def sink(batch_df, batch_id):
        # idempotent by-batch-id landing (the medallion bronze pattern):
        # a replayed batch REPLACES its own directory, never appends
        batch_df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")
        calls["n"] += 1
        if calls["die"] and calls["n"] == 2:
            # output written + state committed; offset commit never runs
            raise RuntimeError("injected mid-batch crash")

    def start():
        cs = file_event_stream(
            spark, csrc + "/*", cdf.schema, max_files_per_trigger=1
        )
        ps = file_event_stream(
            spark, psrc + "/*", pdf.schema, max_files_per_trigger=1
        )
        joined = interval_join_streams(
            cs, ps, "user", "cts", "pts", lower_s=0, upper_s=900
        ).select("click_id", "amount")
        return (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    import pytest

    q = start()
    with pytest.raises(Exception):
        q.awaitTermination(120)
    assert not q.isActive
    assert q.exception() is not None, "first run must die on batch 2"
    assert calls["n"] == 2

    calls["die"] = False
    _await(start())

    got = collections.Counter(
        (r.click_id, r.amount)
        for r in spark.read.parquet(out + "/batch=*").collect()
    )
    batch_twin = collections.Counter(
        (r.click_id, r.amount)
        for r in cdf.join(
            pdf,
            (cdf.user == pdf.user)
            & (pdf.pts >= cdf.cts - F.expr("INTERVAL 900 SECONDS"))
            & (pdf.pts <= cdf.cts),
        ).select("click_id", "amount").collect()
    )
    assert got == batch_twin
    assert sum(got.values()) == 3  # (1,100), (2,200), (3,300) exactly once
