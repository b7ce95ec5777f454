"""Data-layout control for scan-time pruning [extension]: Z-order
(Morton) clustering for multi-column predicate locality.

No reference counterpart (the reference writes single CSVs); at 100 TB
the dominant cost of every query in the registry is the scan, and the
scan's cost is decided at WRITE time: parquet keeps per-row-group
min/max stats, and both Spark's file-level pruning and parquet's
row-group skipping only bite when rows with nearby key values sit in
the same files.  Sorting by one column clusters that column only;
interleaving the bits of two (or more) columns — the Z-order / Morton
curve — gives every interleaved column locality, so box predicates on
ANY subset of the clustered columns touch a small fraction of files.

Spark-first shape: the Morton value is a pure bitwise expression
(shiftleft/or folds — codegen, no UDF); the layout write is
``repartitionByRange(z)`` + ``sortWithinPartitions(z)``, i.e. one range
exchange, the same cost as any global sort, paid once at write time and
amortized over every subsequent scan.  This is the same mechanism as
Delta/Iceberg ``OPTIMIZE ZORDER BY`` re-expressed on plain parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread_bits(v: Column, bits: int) -> Column:
    """Insert a 0 between consecutive bits of ``v`` (bits-wide): the
    classic interleave half of a Morton code, as a shift/or/mask fold.
    Pure integer expressions — stays inside whole-stage codegen."""
    x = v.cast("long")
    # magic-number bit spreading (64-bit): each step doubles the gap
    masks = [
        (32, 0x00000000FFFFFFFF),
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ]
    # start by masking to the requested width
    x = x.bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in masks:
        if shift < bits * 2:
            x = (
                x.bitwiseOR(F.shiftleft(x, shift))
            ).bitwiseAND(F.lit(mask))
    return x


def zorder_value(
    colx: Column | str,
    coly: Column | str,
    lo_x: float,
    hi_x: float,
    lo_y: float,
    hi_y: float,
    bits: int = 16,
) -> Column:
    """Morton-interleave two numeric columns into one clustering key.

    Each column is first quantized to ``bits`` levels over its [lo, hi)
    range (the caller supplies bounds — one ``agg(min,max)`` pass, or
    domain knowledge); the two bucket ids are then bit-interleaved.
    Rows close in BOTH dimensions get close z-values, so a range
    exchange on z puts them in the same output files."""
    cx = F.col(colx) if isinstance(colx, str) else colx
    cy = F.col(coly) if isinstance(coly, str) else coly
    n = (1 << bits) - 1

    def bucket(c: Column, lo: float, hi: float) -> Column:
        u = (c.cast("double") - F.lit(lo)) / F.lit(max(hi - lo, 1e-300))
        return F.least(
            F.greatest((u * n).cast("long"), F.lit(0)), F.lit(n)
        )

    return _spread_bits(bucket(cx, lo_x, hi_x), bits).bitwiseOR(
        F.shiftleft(_spread_bits(bucket(cy, lo_y, hi_y), bits), 1)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    colx: str,
    coly: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of (colx, coly).

    One bounds aggregate (dashboard-sized), one range exchange on the
    Morton value, an in-partition sort, then a plain parquet write —
    the layout cost is a single global-sort-shaped job.  ``n_files``
    controls file granularity: more files = finer pruning, more
    metadata; at 100 TB aim for ~1 GB files via
    ``spark.sql.files.maxRecordsPerFile`` instead of a fixed count."""
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(colx), F.max(colx), F.min(coly), F.max(coly)
    ).first()
    z = zorder_value(
        colx, coly, float(lo_x), float(hi_x), float(lo_y), float(hi_y),
        bits=bits,
    ).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
