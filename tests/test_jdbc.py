"""Live JDBC round-trip (round-2 VERDICT item 6): drive the S7/S8/S10
relational sink/source paths through a REAL database — embedded Apache
Derby, which ships in Spark's own jars — instead of option-validation
only.  Derby stands in for the reference's Supabase Postgres
(`ETL_Multi_Lvl_API/load.py:117-165`, `etl_analysis.py:116-135`): same
Spark JDBC writer/reader code paths, same keyed-upsert semantics.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from advanced_etl_pipelines_spark.sources.catalog import (
    _jdbc_statement,
    append_jdbc,
    jdbc_reader,
    upsert_jdbc,
)

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
T1 = datetime(2024, 5, 1, 10, 0, 0)
T2 = datetime(2024, 5, 1, 11, 0, 0)


@pytest.fixture()
def url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _rows(spark, url, table):
    df = jdbc_reader(spark, url, table=table, properties=DERBY).load()
    return {
        (r["city"], r["time"], round(r["pm2_5"], 3))
        for r in df.collect()
    }


def test_append_then_read_roundtrip(spark, url):
    """S8 append creates the table and streams rows; S10 reads them back
    through the JDBC source."""
    seed = spark.createDataFrame(
        [("Delhi", T1, 10.0), ("Mumbai", T1, 20.0)],
        "city string, time timestamp, pm2_5 double",
    )
    append_jdbc(seed, url, "aq", batch_size=1, properties=DERBY)
    assert _rows(spark, url, "aq") == {
        ("Delhi", T1, 10.0),
        ("Mumbai", T1, 20.0),
    }


def test_upsert_is_keyed_and_idempotent(spark, url):
    """S7 against a live database: update-by-key, insert-new, collapse
    in-batch duplicates — and running the same batch twice changes
    nothing (the reference's ON CONFLICT contract)."""
    seed = spark.createDataFrame(
        [("Delhi", T1, 10.0), ("Mumbai", T1, 20.0)],
        "city string, time timestamp, pm2_5 double",
    )
    append_jdbc(seed, url, "aq", properties=DERBY)

    batch = spark.createDataFrame(
        [
            ("Delhi", T1, 99.0),  # update existing key
            ("Pune", T1, 5.0),  # new key
            ("Pune", T1, 5.0),  # in-batch duplicate collapses
            ("Delhi", T2, 1.0),  # same city, new hour = new key
        ],
        "city string, time timestamp, pm2_5 double",
    )
    for _ in range(2):  # idempotent re-run
        upsert_jdbc(
            batch, url, "aq", keys=["city", "time"], properties=DERBY
        )
        assert _rows(spark, url, "aq") == {
            ("Delhi", T1, 99.0),
            ("Mumbai", T1, 20.0),
            ("Pune", T1, 5.0),
            ("Delhi", T2, 1.0),
        }


def test_partitioned_jdbc_scan(spark, url):
    """S10's parallel form: partitionColumn bounds split the read into
    range slices; the union must still be the whole table."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id int, v double"
    )
    append_jdbc(df, url, "nums", properties=DERBY)
    got = jdbc_reader(
        spark,
        url,
        table="nums",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=20,
        properties=DERBY,
    ).load()
    assert got.rdd.getNumPartitions() == 4
    assert sorted(r["id"] for r in got.collect()) == list(range(20))


def test_statement_retry_surfaces_failure(spark, url):
    """A statement that cannot succeed must raise, and a syntax-class
    failure (missing table) must surface IMMEDIATELY — deterministic
    errors are not retried (ADVICE r3), so even a large retry budget
    returns fast with the non-retryable message."""
    import time

    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="non-retryable"):
        _jdbc_statement(
            spark,
            url,
            ["DELETE FROM no_such_table"],
            max_retries=10,
            retry_backoff_s=2.0,
        )
    # 10 retries at 2s exponential backoff would take >2000s; the
    # non-retryable path must skip all of it
    assert time.perf_counter() - t0 < 5.0
