"""Warehouse catalog + relational source helpers (SURVEY.md §2.1 S9/S10).

The reference bootstraps its Postgres table with a ``CREATE TABLE IF NOT
EXISTS`` RPC (`ETL_Weather_API/load.py:24-52`) and reads it back with
``SELECT *`` + optional LIMIT (`ETL_Multi_Lvl_API/etl_analysis.py:116-135`).
On Spark the catalog is first-class: DDL goes through ``spark.sql`` and
relational sources through the JDBC reader, which pushes projections,
filters and (with partitioning options) parallelizes the scan — the
pushdown the reference's client-side ``SELECT *`` never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# weather_data DDL transcribed from ETL_Weather_API/load.py:24-36
# (BIGSERIAL id is sink-side identity; Spark tables don't need it).
WEATHER_TABLE_COLUMNS = {
    "time": "timestamp",
    "date": "date",
    "hour": "int",
    "temperature_c": "double",
    "relative_humidity": "double",
    "wind_speed_kmh": "double",
    "temp_category": "string",
    "feels_like_c": "double",
}

AIR_QUALITY_TABLE_COLUMNS = {
    "city": "string",
    "time": "timestamp",
    "hour": "int",
    "pm10": "double",
    "pm2_5": "double",
    "carbon_monoxide": "double",
    "nitrogen_dioxide": "double",
    "sulphur_dioxide": "double",
    "ozone": "double",
    "uv_index": "double",
    "aqi_pm25": "string",
    "severity": "double",
    "risk_class": "string",
}


def create_table_if_not_exists(
    spark: SparkSession,
    name: str,
    columns: dict[str, str],
    using: str = "parquet",
    location: str | None = None,
    partitioned_by: list[str] | None = None,
) -> None:
    """S9 DDL bootstrap via the session catalog."""
    cols = ", ".join(f"`{c}` {t}" for c, t in columns.items())
    sql = f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING {using}"
    if partitioned_by:
        sql += f" PARTITIONED BY ({', '.join(partitioned_by)})"
    if location:
        sql += f" LOCATION '{location}'"
    spark.sql(sql)


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    limit: int | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
):
    """S10 relational source, configured but not yet loaded (call
    ``.load()``).  Exactly one of ``table``/``query``.

    The reference's optional LIMIT (`etl_analysis.py:122-124`) becomes a
    pushed-down subquery.  ``partition_column`` + bounds split the scan
    into ``num_partitions`` range slices — the distributed form of its
    client-side batching; ``fetchsize`` is the row-stream batch
    (its BATCH_SIZE analogue, `ETL_Multi_Lvl_API/load.py:30`).
    """
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    if query is not None and limit is not None:
        query = f"SELECT * FROM ({query}) q LIMIT {limit}"
    elif table is not None and limit is not None:
        query, table = f"SELECT * FROM {table} LIMIT {limit}", None

    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("fetchsize", str(fetch_size))
    )
    reader = (
        reader.option("dbtable", table)
        if table is not None
        else reader.option("query", query)
    )
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires num_partitions, lower_bound, upper_bound"
            )
        if table is None:
            # Spark's JDBC source rejects query+partitionColumn at load
            # time; fail at build time instead.
            raise ValueError(
                "partition_column requires table= (not query=/limit=)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def append_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    batch_size: int = 100,
    properties: dict[str, str] | None = None,
) -> None:
    """S8 relational sink: append via the JDBC writer; ``batchsize``
    mirrors the reference's manual 100-row batches
    (`ETL_Weather_API/load.py:67-103`) without the hand-rolled loop."""
    writer = (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
