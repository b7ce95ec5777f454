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


def occ_frame(words: DataFrame, max_len: int = 4) -> DataFrame:
    """The substring-occurrence lattice (word, freq, s, l, p) — the
    iteration-INVARIANT half of every lattice pass (only piece
    probabilities change between EM rounds).  Callers running several
    passes build this once, ``tracked_persist`` it, and hand it to
    ``unigram_em_step`` / ``unigram_viterbi_words`` so the explode is
    paid once, not per iteration."""
    return words.select(
        "word",
        "freq",
        F.explode(
            F.expr(_OCC_EXPR.format(max_len=max_len))
        ).alias("o"),
    ).select("word", "freq", "o.s", "o.l", F.col("o.p").alias("p"))


def unigram_viterbi_words(
    words: DataFrame,
    pieces: DataFrame,
    max_len: int = 4,
    occ: DataFrame | None = None,
) -> DataFrame:
    """Viterbi-segment each DISTINCT word of a (word, ...) frame
    against a (p, lp) piece table.  Returns (word, logprob, n_pieces).

    The candidate join is an equi-join on the piece string (vocab-
    bounded both sides); the DP itself is one map-side HOF per word."""
    if occ is None:
        occ = occ_frame(words, max_len)
    occ = occ.select("word", "s", "l", "p")
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


# Forward ("inside") pass over the lattice: alpha[i] = total probability
# of char prefix [0, i) under all segmentations; alpha[0] = 1 at index 1.
_ALPHA_EXPR = """
aggregate(
  sequence(1, char_length(word)),
  array(cast(1.0 as double)),
  (acc, i) -> concat(acc, array(
    aggregate(
      filter(cs, c -> c.s + c.l = i),
      cast(0.0 as double),
      (m, c) -> m + element_at(acc, c.s + 1) * c.pr))))
"""

# Backward ("outside") pass, stored REVERSED so each step only reads
# already-computed entries: element_at(.., L - i + 1) = beta[i];
# beta[L] = 1 at index 1.
_BETA_EXPR = """
aggregate(
  sequence(char_length(word) - 1, 0, -1),
  array(cast(1.0 as double)),
  (acc, i) -> concat(acc, array(
    aggregate(
      filter(cs, c -> c.s = i),
      cast(0.0 as double),
      (m, c) -> m + c.pr * element_at(
        acc, char_length(word) - (c.s + c.l) + 1)))))
"""

# Posterior expected count of each candidate piece occurrence, in
# integer MICRO-UNITS (x 1e6): quantizing the per-word E-step output
# before the cross-word sum turns the M-step into exact integer
# arithmetic — float summation order can no longer perturb the model,
# so iterated EM is bit-reproducible on any partitioning.  (The same
# fixed-point trick ships in production ML reducers for exactly this
# reason; the quantization IS part of the algorithm definition.)
_POSTERIOR_EXPR = """
transform(cs, c -> named_struct(
  'p', c.p,
  'cnt', cast(round(freq * 1e6 *
    element_at(al, c.s + 1) * c.pr *
    element_at(be, char_length(word) - (c.s + c.l) + 1)
    / element_at(al, char_length(word) + 1)) as bigint)))
"""


def unigram_em_step(
    words: DataFrame,
    pieces: DataFrame,
    max_len: int = 4,
    occ: DataFrame | None = None,
) -> DataFrame:
    """One EM iteration of the unigram LM (Kudo 2018 §3.2): E-step =
    forward-backward over each DISTINCT word's segmentation lattice
    (two ``aggregate`` HOFs, map-side, vocabulary-bounded); M-step =
    re-normalized expected piece counts.

    Returns a refreshed (p, freq, lp) piece frame where ``freq`` is
    the expected count in integer micro-units.  Deterministic: the
    per-word lattice folds run in fixed order, the per-(word, piece)
    posteriors are quantized to micro-units BEFORE the cross-word
    aggregate, and the M-step normalizer is a sum of longs — so the
    new probabilities are exact ratios of integers, identical under
    any partitioning.  Single-character pieces are floored at one
    micro-unit (the lattice must stay connected).

    Pass a prebuilt (persisted) ``occ_frame`` result via ``occ`` when
    iterating: the substring explode is the only corpus-vocabulary-
    sized scan in the loop and it never changes between rounds.
    """
    if occ is None:
        occ = occ_frame(words, max_len)
    cand = (
        occ.join(pieces.select("p", F.exp("lp").alias("pr")), "p")
        .groupBy("word", "freq")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("s", "l", "p", "pr"))
            ).alias("cs")
        )
    )
    post = (
        cand.withColumn("al", F.expr(_ALPHA_EXPR))
        .withColumn("be", F.expr(_BETA_EXPR))
        .select(F.explode(F.expr(_POSTERIOR_EXPR)).alias("e"))
        .groupBy(F.col("e.p").alias("p"))
        .agg(F.sum("e.cnt").alias("raw"))
        .select(
            "p",
            F.when(
                F.char_length("p") == 1,
                F.greatest(F.col("raw"), F.lit(1)),
            )
            .otherwise(F.col("raw"))
            .alias("freq"),
        )
        .where(F.col("freq") > 0)
    )
    z = post.groupBy().agg(F.sum("freq").alias("z"))
    return post.crossJoin(F.broadcast(z)).select(
        "p", "freq", (F.log("freq") - F.log("z")).alias("lp")
    )
