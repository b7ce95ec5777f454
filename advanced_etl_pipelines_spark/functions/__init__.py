"""Expression library: native Column functions only (no Python UDFs).

Every scalar function the reference applies row-at-a-time via
``Series.apply`` / ``apply(axis=1)`` is re-expressed here as a Catalyst
``Column`` expression, so at 100 TB it runs inside whole-stage codegen
instead of a Python interpreter loop.
"""

from advanced_etl_pipelines_spark.functions.features import (  # noqa: F401
    aqi_category_pm25,
    feels_like_c,
    risk_class_from_severity,
    severity_score,
    temp_category,
)
