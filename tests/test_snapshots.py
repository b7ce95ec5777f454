"""Snapshot-versioning + compaction tests: latest-wins reads, time
travel, retention pruning, compaction file counts and content identity."""

from __future__ import annotations

import glob
import os

import pytest

from advanced_etl_pipelines_spark.sources.sinks import (
    compact_small_files,
    read_snapshot,
    write_snapshot,
)


def _df(spark, vals):
    return spark.createDataFrame([(i, f"r{i}") for i in vals], "k long, v string")


def test_snapshot_latest_wins_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(_df(spark, [1, 2]), root)
    write_snapshot(_df(spark, [1, 2, 3]), root)
    assert read_snapshot(spark, root).count() == 3
    assert read_snapshot(spark, root, version=0).count() == 2


def test_snapshot_retention_prunes_oldest(spark, tmp_path):
    root = str(tmp_path / "t")
    for n in (1, 2, 3, 4):
        write_snapshot(_df(spark, range(n)), root, keep=2)
    dirs = sorted(os.listdir(root))
    assert dirs == ["v=2", "v=3"]
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=0)
    assert read_snapshot(spark, root).count() == 4


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 1000).repartition(40)
    df.write.parquet(path)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 40
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    n = compact_small_files(spark, path, target_rows_per_file=500)
    assert n == 2
    assert len(glob.glob(f"{path}/part-*.parquet")) == 2
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before


def test_forget_keys_erases_and_versions(spark, tmp_path):
    from advanced_etl_pipelines_spark.sources.sinks import (
        forget_keys,
        read_snapshot,
        write_snapshot,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "keep"), (2, "erase-me"), (3, "keep"), (2, "erase-me-too")],
        "user_id bigint, payload string",
    )
    first_path = write_snapshot(df, root)
    v_first = int(first_path.rstrip("/").rsplit("v=", 1)[1])
    keys = spark.createDataFrame([(2,)], "user_id bigint")
    forget_keys(spark, root, keys, ["user_id"])

    latest = read_snapshot(spark, root)
    assert latest.where("user_id = 2").count() == 0
    assert latest.count() == 2
    # prior version still holds the rows until retention prunes it
    v1 = read_snapshot(spark, root, version=v_first)
    assert v1.where("user_id = 2").count() == 2

    # keep=1 physically drops the old version containing the data
    forget_keys(spark, root, keys, ["user_id"], keep=1)
    import pytest

    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=v_first)
