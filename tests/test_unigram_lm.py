"""Unigram-LM tokenizer (operators/unigram_lm.py) — hand-computed
piece probabilities and Viterbi segmentations."""

import math

from advanced_etl_pipelines_spark.operators.unigram_lm import (
    unigram_piece_table,
    unigram_viterbi_words,
)


def test_piece_table_hand_counts(spark):
    """words {ab x2, abc x1}: substring occurrences a:3 b:3 c:1 ab:3
    bc:1 abc:1, total 12; lp = ln(freq/12) with no frequency floor."""
    words = spark.createDataFrame(
        [("ab", 2), ("abc", 1)], "word string, freq long"
    )
    got = {
        r["p"]: (r["freq"], r["lp"])
        for r in unigram_piece_table(words, min_rel_freq=0.0).collect()
    }
    assert {p: f for p, (f, _) in got.items()} == {
        "a": 3, "b": 3, "c": 1, "ab": 3, "bc": 1, "abc": 1
    }
    assert abs(got["ab"][1] - math.log(3 / 12)) < 1e-12
    assert abs(got["abc"][1] - math.log(1 / 12)) < 1e-12


def test_viterbi_prefers_high_probability_pieces(spark):
    """'abc' as one piece (ln 1/12 = -2.485) beats ab+c
    (ln 3/12 + ln 1/12 = -3.871) and a+b+c (-4.159)."""
    words = spark.createDataFrame(
        [("ab", 2), ("abc", 1)], "word string, freq long"
    )
    pieces = unigram_piece_table(words, min_rel_freq=0.0)
    got = {
        r["word"]: (r["n_pieces"], r["logprob"])
        for r in unigram_viterbi_words(words, pieces).collect()
    }
    assert got["ab"][0] == 1
    assert abs(got["ab"][1] - math.log(3 / 12)) < 1e-12
    assert got["abc"][0] == 1
    assert abs(got["abc"][1] - math.log(1 / 12)) < 1e-12


def test_single_chars_survive_frequency_floor(spark):
    """A rare character is kept by the unconditional single-char rule
    (the lattice must never be stuck), while a rare multi-char piece
    is dropped by the relative-frequency floor."""
    words = spark.createDataFrame(
        [("aaaa", 100), ("qz", 1)], "word string, freq long"
    )
    pieces = unigram_piece_table(words, min_rel_freq=0.01)
    kept = {r["p"] for r in pieces.collect()}
    assert {"q", "z"} <= kept          # single chars unconditional
    assert "qz" not in kept            # rare 2-gram floored out
    seg = {
        r["word"]: r["n_pieces"]
        for r in unigram_viterbi_words(words, pieces).collect()
    }
    assert seg["qz"] == 2              # segments via single chars
    assert seg["aaaa"] == 1            # 'aaaa' piece dominates


def test_viterbi_deterministic_across_runs(spark):
    """Same input, three runs, identical frames (fixed fold order +
    strict-inequality tiebreak)."""
    words = spark.createDataFrame(
        [("banana", 3), ("bandana", 2), ("nab", 5)],
        "word string, freq long",
    )
    pieces = unigram_piece_table(words, min_rel_freq=0.0)
    runs = [
        sorted(
            (r["word"], r["n_pieces"], round(r["logprob"], 10))
            for r in unigram_viterbi_words(words, pieces).collect()
        )
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
