"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real implementation lives in ``advanced_etl_pipelines_spark/``; this
module only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style pricing
    summary over lineitem (scan -> partial agg -> final agg, codegen)."""
    from advanced_etl_pipelines_spark.plans.registry import QUERIES
    from advanced_etl_pipelines_spark.session import configure_existing

    configure_existing(spark)
    return QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from advanced_etl_pipelines_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys absent here get a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""
    from advanced_etl_pipelines_spark.plans.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
