"""Deterministic sampling operators for large-scale corpus curation.

[extension] — no reference counterpart (the reference's only sampling is
``df.sample(2000)`` for a scatter plot, `ETL_Multi_Lvl_API/etl_analysis.py:336`).
These are the training-data-pipeline versions: reproducible, key-derived
sampling that is stable across runs, partitionings, and engines — the
property ``df.sample(fraction)`` does NOT have (its output depends on
partition layout and seed plumbing).

Design for 100 TB:

* The sampling decision is a pure per-row arithmetic expression on the
  row key — no shuffle, no state, no RNG stream to coordinate across
  1000 executors.  It composes with any scan and pushes nothing.
* Per-stratum rates are a tiny literal CASE expression (broadcast-free).
* Per-group top-k sampling is one hash-partitioned window — the single
  shuffle is on the group key, identical to any groupBy.

The hash is Knuth's multiplicative scheme on the 32-bit golden ratio,
``u = (key * 2654435761) mod 2^32``, chosen over xxhash64/crc32 because
every engine (Spark, DuckDB, any SQL dialect) evaluates it identically
with plain BIGINT arithmetic — which makes sampled outputs
oracle-checkable, and in production makes the sample reproducible by any
downstream system that knows the formula.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth TAOCP vol.3 §6.4
MOD = 4294967296  # 2^32


def unit_hash(key: Column | str) -> Column:
    """Map an integer key to a deterministic uniform-ish value in [0, 1).

    DuckDB: ``((key * 2654435761) % 4294967296) / 4294967296.0``.
    Multiplication stays within BIGINT for keys < 2^31, which holds for
    testdata ids; for production 64-bit keys fold first:
    ``(key % 2^31) * KNUTH``.
    """
    col = F.col(key) if isinstance(key, str) else key
    return ((col % F.lit(2**31)) * F.lit(KNUTH) % F.lit(MOD)) / F.lit(
        float(MOD)
    )


def stratified_sample(
    df: DataFrame,
    stratum: str,
    rates: Mapping[str, float],
    default_rate: float,
    key: str,
) -> DataFrame:
    """Deterministic Bernoulli sample with a per-stratum keep rate.

    The classic corpus-balancing move: downsample the dominant language /
    source to a target mix.  Keep iff ``unit_hash(key) < rate(stratum)``
    — rerunning on the same keys always keeps the same rows.
    """
    rate = F.lit(float(default_rate))
    for value, r in rates.items():
        rate = F.when(F.col(stratum) == value, F.lit(float(r))).otherwise(rate)
    return df.where(unit_hash(key) < rate)


def sample_per_group(
    df: DataFrame, group: str, k: int, key: str
) -> DataFrame:
    """Deterministic k-row sample per group (fixed-size, not fixed-rate).

    Hash-ordered ROW_NUMBER ≤ k: statistically a uniform without-
    replacement sample per group, but reproducible.  One shuffle (on the
    group key); the window never sees more than a partition's rows and
    Spark's rank-limit pushdown truncates eagerly.  Adds ``sample_rank``
    (1-based, stable).
    """
    w = Window.partitionBy(group).orderBy(
        F.asc(unit_hash(key)), F.asc(F.col(key))
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def weighted_sample_topk(
    df: DataFrame,
    group: str,
    key: str,
    weight: Column | str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement per group —
    Efraimidis–Spirakis A-Res with the engine-portable ``unit_hash`` as
    the uniform draw: priority = ln(u) / w (the log form of u^(1/w)),
    keep the k highest priorities.  Heavier rows win proportionally more
    often, re-runs are identical, and the keep decision is pure per-row
    arithmetic + one per-group top-k window — the same zero-RNG-state
    discipline as ``stratified_sample``, so it stays oracle-checkable
    and engine-portable.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    # (h + 0.5)/MOD keeps u strictly inside (0,1): ln stays finite
    col = F.col(key) if isinstance(key, str) else key
    h = (col % F.lit(2**31)) * F.lit(KNUTH) % F.lit(MOD)
    u = (h + F.lit(0.5)) / F.lit(float(MOD))
    pri = F.log(u) / w.cast("double")
    win = Window.partitionBy(group).orderBy(
        F.desc_nulls_last(pri), F.asc(key)
    )
    return (
        df.withColumn("_pri", pri)
        .withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= k)
        .drop("_pri", "_rn")
    )
