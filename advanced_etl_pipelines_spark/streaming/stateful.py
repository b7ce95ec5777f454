"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.5 [extension]).

Windowed aggregates (``streaming/windows.py``) cover everything the
built-in state machinery expresses; this module is the seam for state
machines Spark has no operator for.  Two canonical examples:

* ``running_user_stats`` — per-key cumulative counters that survive
  micro-batch boundaries (the online analogue of a groupBy count).
* ``sessionize_stream`` — inactivity-gap sessionization: state holds the
  open session per user; a processing-time timeout flushes sessions
  whose gap has passed with no new events.  Its batch twin is the
  ``sessionize_events`` registry query (LAG + running sum) — same
  semantics, verified against the DuckDB oracle.

Scale notes: state lives in the state store, partitioned by the grouping
key — the shuffle is the same single user_id exchange the batch query
pays.  State size is O(open sessions); the timeout bounds it.  Arrow
moves each group's rows as columnar batches, so the Python hop is
per-group-per-batch, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
RUNNING_STATE_SCHEMA = "n bigint, s double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Cumulative per-user event count + value sum across micro-batches.

    Output mode must be ``update``; each batch emits the new running
    totals for users seen in that batch.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, closed boolean"
)
SESSION_STATE_SCHEMA = "start_s double, last_s double, n bigint"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Inactivity-gap sessionization with per-user state.

    Within a batch, a gap > ``gap_seconds`` between consecutive events
    closes the open session and starts a new one; closed sessions are
    emitted immediately with ``closed=true``.  The still-open session is
    emitted with ``closed=false`` (so downstream sees live progress) and
    kept in state; if no new events arrive within ``timeout_ms``
    processing time, the timeout path flushes it as closed.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def ts(seconds: float) -> pd.Timestamp:
            # round float-seconds state to whole microseconds — Arrow's
            # safe cast rejects ns-precision remainders on a us column
            return pd.Timestamp(round(seconds * 1e6), unit="us", tz="UTC")

        def row(start_s: float, last_s: float, n: int, closed: bool) -> dict:
            return {
                "user_id": key[0],
                "session_start": ts(start_s),
                "session_end": ts(last_s),
                "n_events": n,
                "closed": closed,
            }

        out: list[dict] = []
        if state.hasTimedOut:
            if state.exists:
                start_s, last_s, n = state.get
                out.append(row(start_s, last_s, n, True))
            state.remove()
            yield pd.DataFrame(out)
            return

        start_s, last_s, n = state.get if state.exists else (None, None, 0)
        times: list[float] = []
        for pdf in pdfs:
            times.extend(
                t.timestamp() for t in pd.to_datetime(pdf["ts"]) if pd.notna(t)
            )
        for t in sorted(times):
            if start_s is None:
                start_s, last_s, n = t, t, 1
            elif t - last_s > gap_seconds:
                out.append(row(start_s, last_s, n, True))
                start_s, last_s, n = t, t, 1
            else:
                last_s, n = t, n + 1
        if start_s is not None:
            out.append(row(start_s, last_s, n, False))
            state.update((start_s, last_s, n))
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(out)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
