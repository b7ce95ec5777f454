"""Fast registry smoke at sf0.001: every query runs and returns rows with a
stable schema; full DuckDB comparison lives in scripts/check_oracle.py (and
the driver's t2)."""

from __future__ import annotations

import pytest

from advanced_etl_pipelines_spark.plans.registry import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"

# join_anti legitimately returns 0 rows when every customer has orders.
MAY_BE_EMPTY = {"join_anti"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF)
    rows = df.collect()
    assert df.columns, name
    if name not in MAY_BE_EMPTY:
        assert len(rows) > 0, f"{name} returned no rows"


def test_every_oracle_has_query():
    assert set(ORACLE_SQL) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0
