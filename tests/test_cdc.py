"""CDC merge tests: batch compaction order-independence, delete
routing, idempotent re-apply, cross-batch versioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.sources.sinks import (
    apply_cdc,
    compact_cdc_batch,
)

SCHEMA = "k long, v string, op string, version long"


def _table(spark, path):
    rows = spark.read.parquet(path).collect()
    return {r.k: r.v for r in rows}


def test_compact_latest_version_wins(spark):
    batch = spark.createDataFrame(
        [
            (1, "a1", "I", 1),
            (1, "a2", "U", 3),
            (1, "a-old", "U", 2),
            (2, "b", "I", 1),
        ],
        SCHEMA,
    )
    out = {r.k: (r.v, r.version) for r in compact_cdc_batch(batch, ["k"]).collect()}
    assert out == {1: ("a2", 3), 2: ("b", 1)}


def test_compact_delete_wins_at_equal_version(spark):
    batch = spark.createDataFrame(
        [(1, "x", "U", 5), (1, None, "D", 5)], SCHEMA
    )
    out = compact_cdc_batch(batch, ["k"]).collect()
    assert len(out) == 1 and out[0].op == "D"


def test_apply_cdc_insert_update_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [(1, "one", "I", 1), (2, "two", "I", 1), (3, "three", "I", 1)], SCHEMA
    )
    apply_cdc(spark, b1, path, ["k"])
    assert _table(spark, path) == {1: "one", 2: "two", 3: "three"}

    b2 = spark.createDataFrame(
        [(2, "TWO", "U", 2), (3, None, "D", 2), (4, "four", "I", 2)], SCHEMA
    )
    apply_cdc(spark, b2, path, ["k"])
    assert _table(spark, path) == {1: "one", 2: "TWO", 4: "four"}


def test_apply_cdc_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    b1 = spark.createDataFrame([(1, "one", "I", 1), (2, "two", "I", 1)], SCHEMA)
    apply_cdc(spark, b1, path, ["k"])
    before = _table(spark, path)
    apply_cdc(spark, b1, path, ["k"])  # re-deliver the same batch
    assert _table(spark, path) == before


def test_apply_cdc_intra_batch_insert_then_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    batch = spark.createDataFrame(
        [(1, "ghost", "I", 1), (1, None, "D", 2), (2, "keep", "I", 1)], SCHEMA
    )
    apply_cdc(spark, batch, path, ["k"])
    assert _table(spark, path) == {2: "keep"}
