"""Arbitrary stateful streaming via ``transformWithStateInPandas``
(Spark 4's successor to ``applyInPandasWithState`` — SURVEY.md §2.5
[extension]).

``streaming/stateful.py`` implements the reference's custom state
machines on the classic ``GroupState`` API; this module is the same two
operators on the new ``StatefulProcessor`` API, which is where Spark's
stateful-processing investment is going:

* typed, **named** state variables (``getValueState``/``getListState``/
  ``getMapState``) instead of one opaque state tuple — state schema
  evolves per-variable;
* first-class **timers** (``registerTimer``/``handleExpiredTimer``)
  instead of a single per-key timeout — a key can hold many, and expiry
  delivers the firing timestamp;
* an ``init``/``close`` lifecycle so per-partition resources are
  explicit.

The operators are behavioral twins of the classic ones, and the tests
pin exactly that: same cross-batch totals, same session splits.

Scale notes: ``transformWithStateInPandas`` requires the RocksDB state
store (``ensure_state_store``) — state is off-heap and spills to disk,
so per-executor state is bounded by SSD, not heap; that is the 100 TB
story for long-lived keyed state (the HDFS-backed store keeps every
entry on-heap).  The shuffle is the one ``user_id`` exchange the batch
twin pays; Arrow moves each group's rows as columnar batches.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# transformWithState's state-server protocol is protobuf-encoded; the
# JVM<->Python handshake imports google.protobuf at query start.  The
# operators below are complete and run wherever protobuf is installed
# (it ships with `pip install "pyspark[connect]"`); environments
# without it get a clean skip instead of a worker crash.
try:
    TWS_AVAILABLE = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no `google` namespace package at all
    TWS_AVAILABLE = False


def ensure_state_store(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB state store provider; the
    conf is read at query START, so setting it at runtime covers every
    query started afterwards (idempotent)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


RUNNING_SCHEMA = "user_id bigint, n_events bigint, sum_value double"


class RunningStatsProcessor(StatefulProcessor):
    """Per-user cumulative count + value sum across micro-batches
    (twin of ``stateful.running_user_stats``)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, s double")

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        prev = self._totals.get()
        n, s = prev if prev is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        self._totals.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` form of the running counter.

    ``timeMode="none"`` — no timers, so the state store skips timer
    bookkeeping entirely.  Output mode must be ``update``.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningStatsProcessor(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, closed boolean"
)


class SessionProcessor(StatefulProcessor):
    """Inactivity-gap sessionization with a real per-key timer
    (twin of ``stateful.sessionize_stream``).

    State: the open session ``(start_s, last_s, n)``.  Each batch
    re-arms one processing-time timer ``timeout_ms`` out; if it fires
    before new events arrive, the open session flushes as closed.
    """

    def __init__(self, gap_seconds: float, timeout_ms: int) -> None:
        self.gap_seconds = gap_seconds
        self.timeout_ms = timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._open = handle.getValueState(
            "open_session", "start_s double, last_s double, n bigint"
        )

    @staticmethod
    def _row(key: Any, start_s: float, last_s: float, n: int, closed: bool) -> dict:
        def ts(seconds: float) -> pd.Timestamp:
            # round float-seconds to whole microseconds — Arrow's safe
            # cast rejects ns remainders on a us column
            return pd.Timestamp(round(seconds * 1e6), unit="us", tz="UTC")

        return {
            "user_id": key[0],
            "session_start": ts(start_s),
            "session_end": ts(last_s),
            "n_events": n,
            "closed": closed,
        }

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        prev = self._open.get()
        start_s, last_s, n = prev if prev is not None else (None, None, 0)
        times: list[float] = []
        for pdf in rows:
            times.extend(
                t.timestamp() for t in pd.to_datetime(pdf["ts"]) if pd.notna(t)
            )
        out: list[dict] = []
        for t in sorted(times):
            if start_s is None:
                start_s, last_s, n = t, t, 1
            elif t - last_s > self.gap_seconds:
                out.append(self._row(key, start_s, last_s, n, True))
                start_s, last_s, n = t, t, 1
            else:
                last_s, n = t, n + 1
        if start_s is not None:
            out.append(self._row(key, start_s, last_s, n, False))
            self._open.update((start_s, last_s, n))
            # re-arm: one live timer per key — drop stale ones first
            for t_ms in self._handle.listTimers():
                self._handle.deleteTimer(t_ms)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + self.timeout_ms
            )
        yield pd.DataFrame(out)

    def handleExpiredTimer(
        self,
        key: Any,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        prev = self._open.get()
        if prev is not None:
            start_s, last_s, n = prev
            self._open.clear()
            yield pd.DataFrame([self._row(key, start_s, last_s, n, True)])

    def close(self) -> None:
        pass


def sessionize_tws(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Timer-flushed inactivity-gap sessionization on the new API."""
    return events.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(gap_seconds, timeout_ms),
        outputStructType=SESSION_SCHEMA,
        outputMode="update",
        timeMode="processingTime",
    )


def running_user_stats_auto(events: DataFrame) -> DataFrame:
    """Backend-dispatching running counter: ``transformWithStateInPandas``
    where the protobuf-encoded state-server protocol is importable, else
    the behavioral twin on classic ``applyInPandasWithState`` (same
    output schema, same cross-batch totals — parity pinned by
    tests/test_transform_state.py in both environments).  This is the
    operator callers should use: the new API is strictly an engine
    upgrade (RocksDB-backed named state, timer bookkeeping), not a
    semantic one."""
    if TWS_AVAILABLE:
        return running_user_stats_tws(events)
    from advanced_etl_pipelines_spark.streaming.stateful import (
        running_user_stats,
    )

    return running_user_stats(events)


def sessionize_auto(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Backend-dispatching sessionizer: timer-flushed
    ``transformWithStateInPandas`` when protobuf is available, else the
    classic ``applyInPandasWithState`` twin whose GroupState timeout
    plays the timer's role (same schema, same session splits)."""
    if TWS_AVAILABLE:
        return sessionize_tws(events, gap_seconds, timeout_ms)
    from advanced_etl_pipelines_spark.streaming.stateful import (
        sessionize_stream,
    )

    return sessionize_stream(events, gap_seconds, timeout_ms)
