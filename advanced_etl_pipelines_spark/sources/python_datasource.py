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

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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
    spark.dataSource.register(ManifestJsonSink)


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


# ---------------------------------------------------------------------------
# Streaming SINK half of the connector story: a DataSourceStreamWriter
# with two-phase manifest commit.


@dataclass
class FileCommitMessage(WriterCommitMessage):
    path: str
    count: int


class ManifestJsonStreamWriter(DataSourceStreamWriter):
    """Per-batch two-phase commit: executors write uniquely-named
    JSON-lines data files and report them in commit messages; the
    DRIVER then publishes ``_manifest_<batchId>.json`` naming exactly
    those files.  Readers trust only manifest-listed files, so

    * a task that crashed mid-file leaves an orphan that is never read;
    * ``abort`` deletes the batch's files eagerly (best effort — the
      manifest gate is what guarantees invisibility);
    * a REPLAYED batch (restart between sink commit and offset commit)
      overwrites its own manifest, superseding the first attempt's
      files — commit is idempotent per batchId, which is the sink half
      of exactly-once (the source half is ``readBetweenOffsets``).

    This is the miniature of every real lakehouse sink protocol
    (Delta/Iceberg commit logs); at scale the manifest write is one
    driver-side rename per batch, never a data-volume operation.
    """

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_json sink requires .option('path', ...)")

    def write(self, iterator) -> FileCommitMessage:
        # runs on EXECUTORS — one uniquely-named file per task attempt
        name = f"part-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, name)
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(full, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return FileCommitMessage(path=name, count=n)

    def commit(self, messages, batchId: int) -> None:
        # runs on the DRIVER once all tasks succeeded
        manifest = {
            "batch_id": batchId,
            "files": [
                {"path": m.path, "count": m.count} for m in messages if m
            ],
        }
        tmp = os.path.join(self.path, f"._manifest_{batchId}.tmp")
        final = os.path.join(self.path, f"_manifest_{batchId}.json")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, final)  # atomic publish; replay overwrites

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.path))
                except OSError:
                    pass


class ManifestJsonSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_json"

    def streamWriter(self, schema, overwrite: bool) -> ManifestJsonStreamWriter:
        return ManifestJsonStreamWriter(self.options)


def read_committed(spark, path: str):
    """Read back ONLY manifest-committed files (later manifests for the
    same batch id supersede earlier ones — replay safety)."""
    import glob as _glob

    by_batch: dict[int, list[str]] = {}
    for mf in sorted(_glob.glob(os.path.join(path, "_manifest_*.json"))):
        with open(mf, encoding="utf-8") as fh:
            m = json.load(fh)
        by_batch[m["batch_id"]] = [
            os.path.join(path, f["path"]) for f in m["files"]
        ]
    files = [f for fs in by_batch.values() for f in fs if os.path.exists(f)]
    if not files:
        return spark.createDataFrame([], SCHEMA)
    return spark.read.schema(SCHEMA).json(files)
