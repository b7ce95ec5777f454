"""Warehouse sinks (SURVEY.md §2.1 S5/S7/S8/S12).

The reference's warehouse is a Supabase Postgres table fed by batched REST
upserts keyed ``(city, time)`` (`ETL_Multi_Lvl_API/load.py:117-165`) or
batched appends (`ETL_Weather_API/load.py:67-103`).  On Spark the
production path is a lakehouse table with ``MERGE INTO`` (Delta/Iceberg)
or a JDBC writer; neither engine dependency ships in this container, so
``upsert_parquet`` implements the same key-idempotent semantics over plain
parquet: new rows replace old rows with equal keys, everything else is
retained.  The MERGE statement it emulates:

    MERGE INTO target t USING updates s ON <keys equal>
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *

Scale notes: the anti-join shuffles on the key columns only; with the
target partitioned (e.g. by city) a real MERGE prunes to touched
partitions.  The swap is two-phase (write to a side dir, then rename) so
readers never observe a half-written table — the single-writer equivalent
of a lakehouse transaction log.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def append_parquet(df: DataFrame, path: str) -> None:
    """S8: append-only load (`ETL_Weather_API/load.py:67-103`)."""
    df.write.mode("append").parquet(path)


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
) -> None:
    """S7: key-idempotent upsert (`ETL_Multi_Lvl_API/load.py:117-144`).

    Running the same load twice yields the same table (the reference
    relies on Postgres ``ON CONFLICT (city,time)`` for this).  Duplicate
    keys WITHIN ``updates`` are collapsed to one arbitrary-but-
    deterministic row first, matching upsert batch semantics.
    """
    updates = updates.dropDuplicates(list(keys))
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        merged = existing.join(updates, list(keys), "left_anti").unionByName(
            updates
        )
    else:
        merged = updates
    tmp = path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    # Two-phase swap: the plan above reads `path`, so overwrite it only
    # after the new snapshot is fully materialized elsewhere.
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def write_csv_report(df: DataFrame, path: str) -> None:
    """S12: small analysis outputs as a single headered CSV
    (`ETL_Multi_Lvl_API/etl_analysis.py:377-392`).  coalesce(1) is only
    safe because report frames are aggregate-sized by construction."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
