"""Unigram-LM tokenizer (operators/unigram_lm.py) — hand-computed
piece probabilities and Viterbi segmentations."""

import math

from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.operators.unigram_lm import (
    occ_frame,
    unigram_em_step,
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

def test_em_step_hand_posteriors(spark):
    """Word 'ab' x1 under uniform pieces {a, b, ab} (p = 1/3 each):
    two segmentations, [ab] mass 1/3 and [a][b] mass 1/9 ->
    posterior(ab) = 0.75, posterior(a) = posterior(b) = 0.25.
    M-step renormalizes expected counts 0.75/0.25/0.25 to
    probabilities 0.6/0.2/0.2 (exact in micro-units)."""
    words = spark.createDataFrame([("ab", 1)], "word string, freq long")
    lp = math.log(1 / 3)
    pieces = spark.createDataFrame(
        [("a", 1, lp), ("b", 1, lp), ("ab", 1, lp)],
        "p string, freq long, lp double",
    )
    got = {
        r["p"]: (r["freq"], r["lp"])
        for r in unigram_em_step(words, pieces).collect()
    }
    assert got["ab"][0] == 750_000
    assert got["a"][0] == 250_000
    assert got["b"][0] == 250_000
    assert abs(got["ab"][1] - math.log(0.6)) < 1e-12
    assert abs(got["a"][1] - math.log(0.2)) < 1e-12


def test_em_step_prebuilt_occ_matches_inline(spark):
    """Passing a prebuilt occ_frame lattice must give the identical
    refreshed piece table as the inline build (it is the same frame,
    built once for iteration)."""
    words = spark.createDataFrame(
        [("banana", 3), ("nab", 5)], "word string, freq long"
    )
    pieces = unigram_piece_table(words, min_rel_freq=0.0)
    inline = {
        (r["p"], r["freq"])
        for r in unigram_em_step(words, pieces).collect()
    }
    occ = occ_frame(words)
    pre = {
        (r["p"], r["freq"])
        for r in unigram_em_step(words, pieces, occ=occ).collect()
    }
    assert inline == pre and len(inline) > 0


def test_em_improves_corpus_likelihood(spark):
    """Two EM rounds on a small skewed corpus must not decrease the
    quantized corpus log-likelihood (EM monotonicity, here checked via
    the Viterbi proxy: total best-path logprob weighted by freq)."""
    words = spark.createDataFrame(
        [("banana", 30), ("bandana", 20), ("nab", 50), ("anna", 10)],
        "word string, freq long",
    )
    occ = occ_frame(words)

    def viterbi_ll(pieces):
        seg = unigram_viterbi_words(words, pieces, occ=occ)
        row = (
            words.join(seg, "word")
            .agg(F.sum(F.col("freq") * F.col("logprob")).alias("ll"))
            .collect()[0]
        )
        return row["ll"]

    p0 = unigram_piece_table(words, min_rel_freq=0.0)
    ll0 = viterbi_ll(p0)
    p1 = unigram_em_step(words, p0, occ=occ)
    ll1 = viterbi_ll(p1)
    p2 = unigram_em_step(words, p1, occ=occ)
    ll2 = viterbi_ll(p2)
    assert ll1 >= ll0 - 1e-9
    assert ll2 >= ll1 - 1e-9
