"""Query registry: the engine's public query surface.

``registry.QUERIES`` maps query name -> callable(spark, sf_dir) -> DataFrame;
``registry.ORACLE_SQL`` maps the same names to ANSI SQL DuckDB oracles.
``__spark_entry__`` at the repo root re-exports these for the driver.
"""

from advanced_etl_pipelines_spark.plans.registry import (  # noqa: F401
    ORACLE_SQL,
    QUERIES,
)

# Importing registers the extension query families into QUERIES/ORACLE_SQL.
from advanced_etl_pipelines_spark.plans import registry_llm  # noqa: E402,F401
from advanced_etl_pipelines_spark.plans import registry_streaming  # noqa: E402,F401
from advanced_etl_pipelines_spark.plans import registry_corpus  # noqa: E402,F401
from advanced_etl_pipelines_spark.plans import registry_ts  # noqa: E402,F401
from advanced_etl_pipelines_spark.plans import registry_profiling  # noqa: E402,F401
from advanced_etl_pipelines_spark.plans import registry_analytics  # noqa: E402,F401
from advanced_etl_pipelines_spark.plans import registry_advanced  # noqa: E402,F401
