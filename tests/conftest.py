from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from advanced_etl_pipelines_spark.session import get_spark

    s = get_spark("pytest", master="local[8]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
    })
    yield s


def rows_to_tuples(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.collect())
