"""Similarity search over embedding columns (SURVEY.md §2.6 [extension]).

Two tiers, as a scale story:

* ``brute_force_topk`` — exact cosine top-k.  The query set is broadcast;
  the corpus is never shuffled (map-side cross product + per-partition
  top-k via window).  Right answer for q ≪ n; O(n·q·d) compute.
* ``lsh_topk`` — random-hyperplane LSH: bucket the corpus by sign
  signatures over seeded hyperplanes (multi-band OR for recall), rerank
  candidates with exact cosine.  The join is keyed on (band, bucket), so
  the pair space is bucket collisions, not n·q.  This is the 100 TB path:
  signatures are computed map-side and the corpus shuffle is bounded by
  collision counts.

Hyperplanes are generated with a fixed numpy seed — runs are reproducible
across sessions and cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from advanced_etl_pipelines_spark.functions.vectors import (
    as_double,
    dot,
    l2_norm,
)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _cos_hoisted() -> "F.Column":
    """cosine over pre-computed per-row norms ``qn``/``cn`` — the pair
    loop pays only the dot-product fold."""
    denom = F.col("qn") * F.col("cn")
    return F.when(
        denom > 0, dot(F.col("qv"), F.col("cv")) / denom
    ).otherwise(F.lit(None).cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cos_sim), self-pairs excluded, ties on
    cosine broken by ascending neighbor id (deterministic).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    # Norms are per-ROW columns, so the O(n·q) pair loop runs ONE fold
    # (the dot product) instead of three; same arithmetic as
    # dot/(sqrt(a·a)·sqrt(b·b)), bit-identical to the oracle's formula.
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cos_hoisted().alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _band_signatures(v, planes: list[list[float]], bands: int):
    """Array of per-band bucket signatures (ints) from hyperplane signs.

    ``bind_once`` pins the (possibly non-trivial) vector expression to a
    single evaluation per row; otherwise Catalyst inlines it into every
    plane's fold (n_planes re-evaluations)."""
    from advanced_etl_pipelines_spark.functions.text import bind_once

    per_band = len(planes) // bands

    def build(vv):
        band_cols = []
        for b in range(bands):
            sig = F.lit(0)
            for p in planes[b * per_band : (b + 1) * per_band]:
                bit = F.when(
                    F.aggregate(
                        F.zip_with(vv, F.lit(p), lambda x, y: x * y),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    >= 0,
                    F.lit(1),
                ).otherwise(F.lit(0))
                sig = sig * 2 + bit
            band_cols.append(sig)
        return F.array(*band_cols)

    return bind_once(v, build)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share at least one LSH band bucket with
    the query (multi-band OR), reranked by exact cosine.

    Recall rises with bands (more OR-chances) and falls with planes-per-band
    (stricter buckets); 16 planes / 4 bands gives ~4-bit buckets with 4
    chances — a reasonable default for 64-dim data.  Compare against
    ``brute_force_topk`` in tests to measure recall.
    """
    dim = len(corpus.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
        )
        .withColumn("cn", l2_norm(F.col("cv")))
        .withColumn("sigs", _band_signatures(F.col("cv"), planes, bands))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
        )
        .withColumn("qn", l2_norm(F.col("qv")))
        .withColumn("sigs", _band_signatures(F.col("qv"), planes, bands))
    )

    c_b = c.select(
        "neighbor_id", "cv", "cn", F.posexplode("sigs").alias("band", "bucket")
    )
    q_b = q.select(
        "query_id", "qv", "qn", F.posexplode("sigs").alias("band", "bucket")
    )
    cand = (
        c_b.join(F.broadcast(q_b), on=["band", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "qn", "cv", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", _cos_hoisted().alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
