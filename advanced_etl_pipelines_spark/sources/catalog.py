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

from collections.abc import Sequence

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


def _jdbc_statement(
    spark: SparkSession,
    url: str,
    sql_texts: list[str],
    max_retries: int = 3,
    retry_backoff_s: float = 0.5,
) -> None:
    """Run driver-side DDL/DML statements over one JDBC transaction with
    the reference's retry-with-backoff posture
    (`ETL_Multi_Lvl_API/load.py:117-165`: batched writes, retried, then
    surfaced).  All statements commit atomically or roll back together.

    Syntax-class failures (bad SQL, missing table) are NOT retried —
    they are deterministic, so backoff only delays the real error
    (ADVICE r3); only transient driver/connection errors get the
    backoff loop."""
    import time

    def _nonretryable(ex: Exception) -> bool:
        je = getattr(ex, "java_exception", None)
        seen = 0
        while je is not None and seen < 8:
            name = je.getClass().getName()
            if "SQLSyntaxError" in name or "SqlSyntaxError" in name:
                return True
            je = je.getCause()
            seen += 1
        return False

    jvm = spark._jvm
    last = None
    for attempt in range(max_retries):
        conn = None
        try:
            conn = jvm.java.sql.DriverManager.getConnection(url)
            conn.setAutoCommit(False)
            st = conn.createStatement()
            for text in sql_texts:
                st.execute(text)
            conn.commit()
            return
        except Exception as ex:  # noqa: BLE001 — retry transient errors
            last = ex
            if conn is not None:
                try:
                    conn.rollback()
                except Exception:
                    pass
            if _nonretryable(ex):
                raise RuntimeError(
                    f"JDBC statement failed (non-retryable): {ex}"
                ) from ex
            time.sleep(retry_backoff_s * (2**attempt))
        finally:
            if conn is not None:
                try:
                    conn.close()
                except Exception:
                    pass
    raise RuntimeError(
        f"JDBC statement failed after {max_retries} attempts: {last}"
    )


def upsert_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    staging_table: str | None = None,
    batch_size: int = 1000,
    max_retries: int = 3,
    properties: dict[str, str] | None = None,
) -> None:
    """S7 relational upsert — the reference's keyed ``ON CONFLICT
    (city,time)`` load (`ETL_Multi_Lvl_API/load.py:117-144`) as a
    scale-correct two-phase apply:

    1. the batch stages through a DISTRIBUTED JDBC overwrite of
       ``staging_table`` (every executor streams its partition;
       ``batchsize`` mirrors the reference's 100-row batches) — this is
       where 100 TB of work happens, in parallel;
    2. one driver-side set-based transaction applies the merge:
       ``DELETE target WHERE key IN staging`` + ``INSERT target SELECT
       FROM staging`` — two statements over the database's own join
       machinery, never a row-at-a-time driver loop, retried with
       backoff and rolled back atomically on failure.

    Duplicate keys WITHIN the batch collapse first (same contract as
    ``sinks.upsert_parquet``).  Targets Derby/Postgres-style dialects
    (double-quoted identifiers, correlation names on DELETE) — the
    integration test drives it through embedded Derby, the in-sandbox
    stand-in for the reference's Postgres; MySQL-family dialects need a
    different DELETE form (ADVICE r3: the earlier "any ANSI database"
    claim overstated this).
    """
    keys = list(keys)
    updates = df.dropDuplicates(keys)
    staging = staging_table or f"{table}_staging"
    writer = (
        updates.write.format("jdbc")
        .mode("overwrite")
        .option("url", url)
        .option("dbtable", staging)
        .option("batchsize", str(batch_size))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()

    # Quote identifiers exactly as Spark's JDBC writer does (unquoted
    # names would fold to a different case on some databases).
    def q(name: str) -> str:
        return '"' + name.replace('"', '""') + '"'

    cols = ", ".join(q(c) for c in updates.columns)
    # String keys compare through a VARCHAR cast: some dialects (Derby's
    # in particular) store StringType as CLOB, which SQL can't put in an
    # equality predicate; the cast is a no-op where strings are already
    # VARCHAR.  Upsert keys are identifiers (city, id, ts), so a 4000
    # bound is not a practical truncation risk.
    string_keys = {
        f.name for f in updates.schema.fields if f.dataType.typeName() == "string"
    }

    def keyexpr(alias: str, k: str) -> str:
        ref = f"{alias}.{q(k)}"
        if k in string_keys:
            return f"CAST({ref} AS VARCHAR(4000))"
        return ref

    match = " AND ".join(
        f"{keyexpr('t', k)} = {keyexpr('s', k)}" for k in keys
    )
    # table/staging names are interpolated VERBATIM — deliberately NOT
    # q()-quoted like the column list (ADVICE r3 asked for consistency,
    # but Spark's JDBC writer also interpolates the dbtable option
    # verbatim into its CREATE/INSERT SQL, so the merge must spell the
    # name the exact same way or a case-folding database resolves two
    # different tables: Derby folds unquoted 'aq' to AQ at create time,
    # and a quoted "aq" here then misses it — measured by the live test).
    # Callers whose names need quoting pass them pre-quoted, same as
    # they must for the writer.
    _jdbc_statement(
        df.sparkSession,
        url,
        [
            f"DELETE FROM {table} t WHERE EXISTS "
            f"(SELECT 1 FROM {staging} s WHERE {match})",
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging}",
        ],
        max_retries=max_retries,
    )


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
