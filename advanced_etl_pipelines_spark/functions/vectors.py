"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2.6).

[extension] Native higher-order-function implementations: zip_with for the
elementwise product, aggregate for the fold.  All math in double precision
(the parquet stores float32; casting first keeps Spark and DuckDB oracles
bit-comparable after rounding).

At 100 TB the brute-force path is O(n·q) — fine for broadcastable query
sets; the LSH path in ``operators/similarity.py`` is the scale route.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — matches DuckDB's list accumulation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(||a||·||b||); NULL when either norm is 0."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, d / denom).otherwise(F.lit(None).cast("double"))
