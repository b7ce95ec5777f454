"""End-to-end corpus-curation pipeline: the LLM-data operators composed
into the sequence a training-data run actually executes.

[extension] — no reference counterpart; this is the engine's training-
data story assembled from the pieces the registry verifies one by one:

    ingest → quality gate → language rebalance (stratified sample)
           → exact dedup → near-dedup (n-gram Jaccard pairs
           → connected components → keep cluster canonical)
           → curated snapshot + per-stage audit report

Every stage is a pure DataFrame → DataFrame function (same design as
the air-quality/weather pipelines), so stages are independently
runnable, testable, and re-orderable.  The audit report records row
counts in/out per stage — the first thing anyone asks of a curation
run ("where did my documents go?").

Scale shape: the gate and the sample are per-row expressions (no
shuffle); exact dedup shuffles 8-byte digests; near-dedup is the
blocked pair join + tiny-graph components; the final snapshot write is
one pass.  Nothing here collects documents to the driver.
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.functions import text as T
from advanced_etl_pipelines_spark.operators import dedup as D
from advanced_etl_pipelines_spark.operators import sampling as SA
from advanced_etl_pipelines_spark.operators.graph import connected_components
from advanced_etl_pipelines_spark.sources.sinks import write_snapshot


def quality_gate(
    docs: DataFrame,
    min_words: int = 25,
    max_words: int = 90,
    min_uniq: float = 0.4,
) -> DataFrame:
    """Gopher-style keep rules (length band + lexical diversity floor) —
    the same signals as the ``corpus_quality_filter`` query, applied as
    a filter.  Pure per-row HOFs, zero shuffle."""
    s = T.bind_once(
        T.word_tokens("text"),
        lambda t: F.struct(
            F.size(t).alias("n"),
            (
                F.size(F.array_distinct(t)).cast("double")
                / F.greatest(F.size(t), F.lit(1))
            ).alias("uniq"),
        ),
    )
    return (
        docs.withColumn("__q", s)
        .where(
            (F.col("__q.n") >= min_words)
            & (F.col("__q.n") <= max_words)
            & (F.col("__q.uniq") >= min_uniq)
        )
        .drop("__q")
    )


def rebalance(
    docs: DataFrame, rates: dict[str, float], default_rate: float = 1.0
) -> DataFrame:
    """Deterministic per-language downsampling (rerun-stable)."""
    return SA.stratified_sample(docs, "lang", rates, default_rate, "doc_id")


def near_dedup_keep_canonical(
    docs: DataFrame, threshold: float = 0.15
) -> DataFrame:
    """Drop every member of a near-dup cluster except its canonical
    (min doc_id): n-gram Jaccard pairs → connected components → anti
    join on non-canonical members."""
    pairs = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", "lang", n=3, threshold=threshold
    )
    comp = connected_components(pairs, "id_a", "id_b")
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti")


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    out_root: str,
    rates: dict[str, float] | None = None,
    jaccard_threshold: float = 0.15,
) -> dict[str, object]:
    """Execute the full curation sequence; returns
    ``{"snapshot": path, "audit": [(stage, rows, secs), ...]}``."""
    audit: list[tuple[str, int, float]] = []

    def step(name: str, fn: Callable[[], DataFrame]) -> DataFrame:
        t0 = _time.time()
        out = fn()
        n = out.count()
        audit.append((name, n, _time.time() - t0))
        return out

    cur = step("ingest", lambda: docs)
    cur = step("quality_gate", lambda: quality_gate(cur))
    if rates:
        kept = cur
        cur = step("rebalance", lambda: rebalance(kept, rates, 1.0))
    gated = cur
    cur = step(
        "exact_dedup", lambda: D.exact_dedup(gated, "text", "doc_id")
    )
    exact = cur
    cur = step(
        "near_dedup",
        lambda: near_dedup_keep_canonical(exact, jaccard_threshold),
    )
    snapshot = write_snapshot(cur, out_root)
    return {"snapshot": snapshot, "audit": audit}
