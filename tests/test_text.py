"""Unit tests for the text-analysis expression library."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.functions import text as T


def _one(spark, col, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("out")).collect()[0]["out"]


def test_word_tokens_normalizes_and_drops_empties(spark):
    out = _one(spark, T.word_tokens("text"), "Hello,  World! 42x ---")
    assert out == ["hello", "world", "42x"]


def test_word_tokens_empty_string(spark):
    assert _one(spark, T.word_tokens("text"), "") == []
    assert _one(spark, T.word_tokens("text"), "!!!") == []


def test_token_count_whitespace(spark):
    assert _one(spark, T.token_count("text"), "a b  c\nd") == 4
    assert _one(spark, T.token_count("text"), "") == 0


def test_punct_ratio(spark):
    # "ab,." -> 2 punct of 4 chars
    assert abs(_one(spark, T.punct_ratio("text"), "ab,.") - 0.5) < 1e-12
    assert _one(spark, T.punct_ratio("text"), "") == 0.0


def test_word_ngrams(spark):
    toks = T.word_tokens("text")
    out = _one(spark, T.word_ngrams(toks, 3), "a b c d")
    assert out == ["a b c", "b c d"]
    assert _one(spark, T.word_ngrams(toks, 3), "a b") == []


def test_lang_guess(spark):
    cases = {
        "the cat and the dog of it": "en",
        "el gato y la casa de que": "es",
        "der hund und die katze ist ein": "de",
        "xyzzy qwerty plugh": "und",
    }
    for text, want in cases.items():
        assert _one(spark, T.lang_guess(T.word_tokens("text")), text) == want


def test_lang_guess_tie_prefers_code_order(spark):
    # 'la' is in both es and fr lists; 'de' in es and fr too -> tie es/fr
    # resolved to 'es' (earlier in sorted code order... after 'de','en')
    out = _one(spark, T.lang_guess(T.word_tokens("text")), "la de la de")
    assert out == "es"


def test_quality_score_in_unit_interval(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog " * 5,),
         ("!!!???;;;",), ("",)],
        "text string",
    )
    vals = [r[0] for r in df.select(T.quality_score("text")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[1]  # clean English beats punctuation soup


def test_fingerprint_order_sensitive(spark):
    fp = T.doc_fingerprint(T.word_tokens("text"))
    a = _one(spark, fp, "alpha beta gamma")
    b = _one(spark, fp, "gamma beta alpha")
    c = _one(spark, fp, "alpha beta gamma")
    assert a == c and a != b
