"""Lexical relevance scoring (TF-IDF / BM25) as native Column expressions.

[extension] — the retrieval side of a training-data pipeline: score
documents against query terms for corpus search, quality-weighted
sampling, or hard-negative mining.

Spark-first shape: corpus statistics (N, avgdl, per-term document
frequency) come from ONE aggregate over the corpus — a single row —
cross-joined (broadcast) back onto every document; the per-document
score is then pure per-row arithmetic over a bind-once token array.
No shuffle touches the documents themselves; scoring scales linearly
and the top-k is a TakeOrderedAndProject.

Okapi BM25 (Robertson & Zaragoza 2009, §3.3), k1=1.2, b=0.75, and the
Lucene-style non-negative idf: ln(1 + (N - df + 0.5)/(df + 0.5)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.functions.text import bind_once, word_tokens

K1 = 1.2
B = 0.75


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_scores(
    docs: DataFrame, text_col: str, id_col: str, terms: list[str]
) -> DataFrame:
    """Score every document against ``terms``; returns (id, dl, score).

    One corpus-stats aggregate (N, avgdl, df per term — conditional
    counts, so a single pass) + one scoring projection.
    """
    tokens = word_tokens(text_col)
    with_toks = docs.select(
        F.col(id_col),
        bind_once(
            tokens,
            lambda t: F.struct(
                F.size(t).alias("dl"),
                *[_tf(t, q).alias(f"tf_{i}") for i, q in enumerate(terms)],
            ),
        ).alias("s"),
    ).select(F.col(id_col), "s.*")

    stats = with_toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}")
        norm = tf + F.lit(K1) * (
            F.lit(1 - B) + F.lit(B) * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * (tf * F.lit(K1 + 1)) / norm

    return with_toks.join(F.broadcast(stats)).select(
        F.col(id_col), F.col("dl"), score.alias("score")
    )
