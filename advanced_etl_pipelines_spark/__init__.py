"""advanced_etl_pipelines_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``manjunath1005/Advanced-ETL-pipelines``
(pandas batch ETL: urban air-quality + weather pipelines), extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) and designed for 100 TB scale.

Layout:
    session     SparkSession factory (UTC, AQE, Arrow).
    functions/  Expression library: derived features (reference parity),
                text analysis, vector math. Native Column expressions only.
    operators/  Relational operator compositions (agg/pivot/argmax/histogram),
                dedup family, similarity search, multimodal plumbing.
    sources/    Readers (JSON shape detection, CSV/Parquet latest-wins) and
                sinks (medallion writers, key-based merge upsert).
    plans/      The query registry backing ``__spark_entry__.queries()``.
    pipelines/  End-to-end air-quality and weather pipelines (medallion).
    streaming/  Structured Streaming variants (watermark + windows).
"""

__version__ = "0.1.0"
