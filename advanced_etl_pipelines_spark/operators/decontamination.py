"""Benchmark decontamination [extension] — remove training documents that
overlap an evaluation/benchmark set.

The standard contamination rule (GPT-3 appendix C, PaLM, Llama): a
training doc is contaminated if it shares any word n-gram (n around
8-13) with any benchmark document.  The benchmark side is tiny (eval
suites are thousands of docs); the corpus side is the full 100 TB — so
the Spark-first shape is:

1. benchmark -> distinct n-gram set (a few MB), built once;
2. ``broadcast`` that set and LEFT SEMI join the exploded corpus grams
   against it — no shuffle of the corpus, contamination check rides the
   scan;
3. distinct contaminated ids -> anti-join to keep the clean corpus.

Everything is native expressions (the tokenizer/ngram HOFs from
``functions/text.py``); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.functions.text import word_ngrams, word_tokens


def _gram_frame(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, grams) with distinct word n-grams; gramless docs dropped."""
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams(word_tokens(text_col), n)).alias("g"),
    ).where(F.size("g") > 0)


def benchmark_gram_set(benchmark: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct n-grams of the benchmark set — the broadcast side."""
    return (
        benchmark.select(
            F.explode(
                F.array_distinct(word_ngrams(word_tokens(text_col), n))
            ).alias("gram")
        )
        .distinct()
    )


def contaminated_ids(
    df: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: DataFrame,
    bench_text_col: str,
    n: int = 8,
) -> DataFrame:
    """ids of ``df`` docs sharing >= 1 word n-gram with the benchmark.

    The corpus side never shuffles: exploded grams stream through a
    broadcast-hash semi-join against the benchmark gram set, then a
    distinct on the (already rare) hit ids.
    """
    bench = benchmark_gram_set(benchmark, bench_text_col, n)
    return (
        _gram_frame(df, text_col, id_col, n)
        .select("id", F.explode("g").alias("gram"))
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("id")
        .distinct()
    )


def decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: DataFrame,
    bench_text_col: str,
    n: int = 8,
) -> DataFrame:
    """The clean corpus: ``df`` minus contaminated docs (all original
    columns preserved).  Docs too short to produce an n-gram cannot
    overlap and are kept."""
    hits = contaminated_ids(df, text_col, id_col, benchmark, bench_text_col, n)
    return df.join(
        hits.withColumnRenamed("id", id_col), id_col, "left_anti"
    )
