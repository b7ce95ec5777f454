"""Custom connector via the Python Data Source API (Spark 4).

The reference's only "connector" is a driver-side HTTP loop feeding a
local file (SURVEY.md S1/S2).  The Spark-4-native way to bring a new
source into the engine is a ``DataSource`` subclass: the reader
declares its PARTITIONS, Spark schedules one task per partition, and
each executor pulls only its slice — the fan-out the reference did
sequentially becomes parallel and restartable for free.

``SyntheticEventsDataSource`` is the reference implementation: a
deterministic, partition-parallel event generator (the same shape as
the testdata ``events`` table).  It doubles as a load generator for
streaming/ingest tests — every row is a pure function of its global
index, so any slice can be re-read idempotently at any parallelism.

A real HTTP source follows the identical skeleton: partitions = the
URL/city list, ``read(partition)`` = fetch + parse one URL (with the
retry/backoff policy of ``sources/http.py``), schema = the landed
JSON's schema.  Arrow note: ``read`` may also yield pyarrow
RecordBatches for wide rows; tuples are fine at this row width.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)

KNUTH = 2654435761
MOD = 2**32

EVENT_TYPES = ("view", "click", "cart", "purchase", "refund")

SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, value double"
)


def _row(i: int) -> tuple:
    h = (i * KNUTH) % MOD
    user = h % 1000
    etype = EVENT_TYPES[(h >> 10) % len(EVENT_TYPES)]
    value = round(((h >> 16) % 10_000) / 100.0, 2)
    return (i, user, etype, value)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))
        self.eq: dict[str, object] = {}

    def pushFilters(self, filters):
        """Filter pushdown (gated on
        ``spark.sql.python.filterPushdown.enabled``): accept EqualTo on
        the generated attributes and drop matching rows AT THE SOURCE —
        the Python-data-source analogue of parquet PushedFilters.  Spark
        removes accepted predicates from the residual plan Filter, so
        correctness rides on the source honoring them (pinned in
        tests).  Everything else is yielded back as residual."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute[0] in (
                "user_id",
                "event_type",
            ):
                self.eq[f.attribute[0]] = f.value
            else:
                yield f

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        per = -(-self.rows // self.parts)  # ceil
        start = partition.value * per
        end = min(start + per, self.rows)
        want_user = self.eq.get("user_id")
        want_type = self.eq.get("event_type")
        for i in range(start, end):
            row = _row(i)
            if want_user is not None and row[1] != want_user:
                continue
            if want_type is not None and row[2] != want_type:
                continue
            yield row


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("synthetic_events")`` works session-wide.
    A reader that implements ``pushFilters`` requires the pushdown
    feature flag, so registration enables it (runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming twin: the offset is the global row
    index, so recovery from a
    checkpoint resumes EXACTLY where the last committed batch ended —
    the replayable-source half of exactly-once (the other half is an
    idempotent sink, sources/sinks.py upsert).  readBetweenOffsets
    replays any committed range verbatim on failure recovery."""

    def __init__(self, options) -> None:
        self.batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        i = int(start["index"])
        end = i + self.batch
        return iter([_row(j) for j in range(i, end)]), {"index": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_row(j) for j in range(int(start["index"]), int(end["index"]))]
        )

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — rows are a pure function of index
