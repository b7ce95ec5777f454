"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
the SentencePiece unigram model): score candidate subword pieces by
corpus frequency, then segment each word by VITERBI — the
maximum-likelihood split under an independence model over pieces.

[extension] — the second of the two standard subword tokenizer families
(operators/bpe.py is the merge-list one).  Where BPE training is
inherently sequential (each merge changes the next round's counts),
unigram scoring is ONE aggregate, which makes this family the cheaper
distributed citizen: no driver loop at all.

The same vocabulary-collapse trick as BPE makes it distributable:

1. the corpus aggregates once to a (word, freq) table;
2. candidate pieces = every substring of length 1..max_len of every
   vocab word, frequency-weighted — an explode over the VOCAB table,
   so candidate volume is vocabulary-bounded, never corpus-bounded;
3. pieces kept: relative frequency >= ``min_rel_freq`` (scale-relative,
   so the vocabulary doesn't balloon with data volume) plus ALL single
   characters (guarantees every word segments — the Viterbi lattice is
   never stuck);  log p(piece) = ln(freq) - ln(total kept freq);
4. Viterbi per DISTINCT word: best[i] = max over pieces ending at i of
   best[start] + logp — one SQL ``aggregate`` HOF over positions with
   a nested fold over that position's candidate pieces (no Python, no
   UDF).  Ties resolve to the FIRST candidate in (start asc, len asc)
   scan order (strict-> update), so the result is deterministic for
   any partitioning;
5. corpus-side reports join per-(group, word) counts against the
   per-word Viterbi frame — the corpus pays one token-count aggregate
   and a vocab-sized join, never per-token DP (same lesson as
   ``bpe_segment``'s vocabulary-join rewrite).

At 100 TB: the candidate explode and lattice DP run on the ~10-100M-row
vocabulary; corpus-sized work is exactly two hash aggregates.
Deterministic end to end — exact integer frequencies, fixed fold order,
strict-inequality tiebreak — so the registry query pins an expected
frame at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# every substring occurrence of length 1..max_len, char-positioned:
# flatten(transform(starts, s -> transform(lens, l -> (s, l, piece))))
_OCC_EXPR = (
    "flatten(transform(sequence(0, char_length(word) - 1), s -> "
    "transform(sequence(1, least({max_len}, char_length(word) - s)), "
    "l -> named_struct('s', s, 'l', l, "
    "'p', substring(word, s + 1, l)))))"
)

# Viterbi over the position lattice.  acc holds best[0..i-1] as an
# array of (sc, np) structs (1-based element_at; best[0] = (0.0, 0));
# each step appends best[i] = the max over candidate pieces ending at
# i, scanned in the sorted (start, len) order with strict > update.
_VITERBI_EXPR = """
aggregate(
  sequence(1, char_length(word)),
  array(named_struct('sc', cast(0.0 as double), 'np', 0)),
  (acc, i) -> concat(acc, array(
    aggregate(
      filter(cs, c -> c.s + c.l = i),
      named_struct('sc', cast('-Infinity' as double), 'np', 0),
      (m, c) -> CASE
        WHEN element_at(acc, c.s + 1).sc + c.lp > m.sc
        THEN named_struct(
          'sc', element_at(acc, c.s + 1).sc + c.lp,
          'np', element_at(acc, c.s + 1).np + 1)
        ELSE m END))))
"""


def unigram_piece_table(
    words: DataFrame,
    max_len: int = 4,
    min_rel_freq: float = 1e-5,
) -> DataFrame:
    """Candidate piece vocabulary from a (word, freq) frame: substring
    explode, frequency filter (relative, plus unconditional single
    chars), ln-probabilities.  Returns (p, freq, lp)."""
    occ = words.select(
        "freq",
        F.explode(
            F.expr(_OCC_EXPR.format(max_len=max_len))
        ).alias("o"),
    )
    pf = occ.groupBy(F.col("o.p").alias("p")).agg(
        F.sum("freq").alias("pfreq")
    )
    tot = pf.agg(F.sum("pfreq").alias("t"))
    kept = (
        pf.crossJoin(F.broadcast(tot))
        .where(
            (F.col("pfreq") >= F.col("t") * F.lit(min_rel_freq))
            | (F.char_length("p") == 1)
        )
        .select("p", "pfreq", "t")
    )
    norm = kept.groupBy().agg(F.sum("pfreq").alias("z"))
    return kept.crossJoin(F.broadcast(norm)).select(
        "p",
        F.col("pfreq").alias("freq"),
        (F.log("pfreq") - F.log("z")).alias("lp"),
    )


def unigram_viterbi_words(
    words: DataFrame,
    pieces: DataFrame,
    max_len: int = 4,
) -> DataFrame:
    """Viterbi-segment each DISTINCT word of a (word, ...) frame
    against a (p, lp) piece table.  Returns (word, logprob, n_pieces).

    The candidate join is an equi-join on the piece string (vocab-
    bounded both sides); the DP itself is one map-side HOF per word."""
    occ = words.select(
        "word",
        F.explode(
            F.expr(_OCC_EXPR.format(max_len=max_len))
        ).alias("o"),
    ).select("word", "o.s", "o.l", F.col("o.p").alias("p"))
    cand = (
        occ.join(pieces.select("p", "lp"), "p")
        .groupBy("word")
        # sort_array orders structs by field order (s, then l) — a
        # unique key per word, so the collected scan order (and with
        # it the tie policy) is deterministic under any partitioning
        .agg(
            F.sort_array(
                F.collect_list(F.struct("s", "l", "lp"))
            ).alias("cs")
        )
    )
    best = cand.withColumn(
        "fin",
        F.element_at(
            F.expr(_VITERBI_EXPR), F.char_length("word") + 1
        ),
    )
    return best.select(
        "word",
        F.col("fin.sc").alias("logprob"),
        F.col("fin.np").alias("n_pieces"),
    )
