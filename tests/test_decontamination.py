"""Semantics tests for decontamination, repetition, and PII ops.

Synthetic fixtures (the sf tables have no real PII and contamination
there is data-dependent); these pin the operator contracts the registry
queries rely on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.functions.text import (
    pii_count,
    redact_pii,
    repetition_ratio,
    word_tokens,
)
from advanced_etl_pipelines_spark.operators.decontamination import (
    contaminated_ids,
    decontaminate,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),  # contains bench gram
    (2, "pack my box with five dozen liquor jugs"),  # clean
    (3, "quick brown fox jumps over everything else entirely"),  # overlaps bench
    (4, "too short"),  # < n tokens: cannot be contaminated
]
BENCH = [(100, "a quick brown fox jumps over fences")]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(BENCH, "doc_id long, text string")


def test_contaminated_ids_ngram_overlap(spark):
    # bench 5-grams include "quick brown fox jumps over" -> docs 1 and 3
    ids = {
        r[0]
        for r in contaminated_ids(
            _docs(spark), "text", "doc_id", _bench(spark), "text", n=5
        ).collect()
    }
    assert ids == {1, 3}


def test_decontaminate_keeps_clean_and_short(spark):
    out = decontaminate(
        _docs(spark), "text", "doc_id", _bench(spark), "text", n=5
    )
    assert {r["doc_id"] for r in out.collect()} == {2, 4}
    assert out.columns == ["doc_id", "text"]  # original schema preserved


def test_contamination_needs_full_ngram(spark):
    # with n=8 no 8-gram is shared (bench doc differs at both ends)
    ids = contaminated_ids(
        _docs(spark), "text", "doc_id", _bench(spark), "text", n=8
    ).count()
    assert ids == 0


def test_repetition_ratio_values(spark):
    rows = [
        (1, "a b a b a b"),  # bigrams: ab ba ab ba ab -> 2 distinct of 5
        (2, "all words here are unique tokens"),  # no duplicate bigram
        (3, "single"),  # no bigram at all -> 0.0
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["rep"]
        for r in df.select(
            "id", repetition_ratio(word_tokens("text"), 2).alias("rep")
        ).collect()
    }
    assert abs(got[1] - (1 - 2 / 5)) < 1e-12
    assert got[2] == 0.0
    assert got[3] == 0.0


PII_TEXT = (
    "Contact John.Doe+spam@Example.ORG or 555-867-5309, "
    "server at 10.0.0.1 (backup 192.168.1.255)."
)


def test_pii_counts(spark):
    df = spark.createDataFrame([(PII_TEXT,)], "text string")
    row = df.select(
        pii_count("text", "email").alias("e"),
        pii_count("text", "phone").alias("p"),
        pii_count("text", "ipv4").alias("i"),
    ).first()
    assert (row.e, row.p, row.i) == (1, 1, 2)


def test_redact_pii_replaces_all_spans(spark):
    df = spark.createDataFrame([(PII_TEXT,)], "text string")
    red = df.select(redact_pii("text").alias("t")).first().t
    assert "<EMAIL>" in red and "<PHONE>" in red and red.count("<IP>") == 2
    assert "@" not in red and "10.0.0.1" not in red
    # non-PII text survives (lowercased)
    assert red.startswith("contact <EMAIL>")


def test_redact_pii_no_op_on_clean_text(spark):
    df = spark.createDataFrame([("no personal data here",)], "text string")
    assert df.select(redact_pii("text").alias("t")).first().t == (
        "no personal data here"
    )
