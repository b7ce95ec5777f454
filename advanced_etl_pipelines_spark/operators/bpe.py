"""Distributed BPE vocabulary learning (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
tokenizer-training step of an LLM data pipeline).

The trick that makes BPE training distributable is that the corpus
collapses FIRST: one scan aggregates it to a (word, freq) table, and
every merge round then operates on the distinct-word table weighted by
frequency — the corpus is never rescanned.  Each round is

1. one pair-count aggregate: explode each word's adjacent symbol pairs,
   ``groupBy(pair).agg(sum(freq))`` — shuffle is vocabulary-sized, with
   map-side partial aggregation collapsing each partition's pair stream;
2. one driver argmax (``max_by`` over the pair counts — a bounded
   reduction, not a data collect), tie-broken deterministically by
   (count DESC, pair ASC);
3. one map-side rewrite folding the winning pair into every word that
   contains it (a left-to-right non-overlapping fold expressed as ONE
   SQL ``aggregate`` HOF — no Python in the loop), localCheckpoint'ed
   per round so the k-round lineage stays flat.

At 100 TB the (word, freq) table is ~10-100M rows (vocabulary-bounded,
not corpus-bounded), so a merge round's shuffle carries megabytes; the
one corpus-sized aggregation happens once up front.  Driver traffic is
one (pair, count) row per round — the same bounded-loop shape as
kcenter_select, including its round-4 lesson: the per-round expression
is built as ONE SQL string, not per-element py4j calls.

Deterministic by construction (exact integer counts, total-order
tiebreak), so the registry query pins an expected frame at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(a: str, b: str) -> F.Column:
    """Fold the adjacent pair (a, b) -> ab into the ``symbols`` array,
    left-to-right and non-overlapping: a symbol produced by this
    round's merge is textually ``ab`` and can no longer equal ``a``, so
    a plain last-element check gives exactly BPE's within-round
    non-overlap semantics ('aaa' + (a,a) -> ['aa','a'])."""
    qa, qb, qab = _sql_quote(a), _sql_quote(b), _sql_quote(a + b)
    return F.expr(
        "aggregate(symbols, CAST(array() AS ARRAY<STRING>), (acc, x) ->"
        f" CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {qa}"
        f"           AND x = {qb}"
        f"      THEN concat(slice(acc, 1, size(acc) - 1), array({qab}))"
        "       ELSE concat(acc, array(x)) END)"
    )


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """The one corpus-sized step: tokenize and aggregate to
    (word, freq).  Everything after runs on this vocabulary-bounded
    frame."""
    from advanced_etl_pipelines_spark.functions.text import word_tokens

    return (
        df.select(F.explode(word_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_learn(
    words: DataFrame, n_merges: int, end_of_word: str = "</w>"
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) frame.

    Returns [(rank, left, right, merged, weighted_count)] in merge
    order.  Symbols start as single characters plus an ``end_of_word``
    marker appended as its own symbol (the Sennrich formulation — it
    lets the vocabulary distinguish word-final subwords, e.g. 'est</w>'
    in 'newest' vs 'est' in 'estimate')."""
    # lazy: round 1's argmax collect is the first action — it
    # materializes + persists this frame (and the upstream word_freq
    # aggregate) in the same job; rounds 2+ then read the persisted
    # blocks.  Same one-job-per-round discipline as the loop below.
    cur = words.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(end_of_word))
        ).alias("symbols"),
    ).localCheckpoint(eager=False)

    pair_counts = (
        lambda d: d.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(
                        F.col("symbols"), 1, F.size("symbols") - 1
                    ),
                    F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                    lambda x, y: F.struct(
                        x.alias("a"), y.alias("b")
                    ),
                )
            ).alias("p"),
        )
        .groupBy("p")
        .agg(F.sum("freq").alias("cnt"))
    )

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # deterministic argmax in ONE bounded aggregate: min_by over the
        # struct (-cnt, a, b) — struct comparison is lexicographic, so
        # the minimum is (highest count, then smallest left symbol,
        # then smallest right symbol).  Exact integer counts + a total
        # order = the same winner on every run and partitioning.
        top = (
            pair_counts(cur)
            .agg(
                F.min_by(
                    F.struct("p", "cnt"),
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("p.a").alias("a"),
                        F.col("p.b").alias("b"),
                    ),
                ).alias("t")
            )
            .collect()[0]["t"]
        )
        if top is None:
            break  # words are fully merged — no adjacent pairs left
        a, b, cnt = top["p"]["a"], top["p"]["b"], int(top["cnt"])
        merges.append((rank, a, b, a + b, cnt))
        # lazy checkpoint: the NEXT round's argmax collect is the first
        # action over the rewritten frame — it materializes + persists
        # the fold and truncates lineage in the same job, so each merge
        # round costs ONE job instead of two (an eager checkpoint here
        # ran a dedicated materialization job per round; at 12 merges
        # that was 12 extra scheduler round-trips per bpe_learn caller).
        # The final round's frame is never materialized — it is dead
        # (only `merges` is returned), so the lazy marker costs nothing.
        cur = cur.withColumn(
            "symbols", _merge_expr(a, b)
        ).localCheckpoint(eager=False)
    return merges


def bpe_segment_vocab(
    words: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    end_of_word: str = "</w>",
) -> DataFrame:
    """Segment a DISTINCT-word frame (column ``word``) with a learned
    merge list: chars + end-of-word marker, then every merge folds in
    rank order (BPE application is just replaying the merge sequence).
    Adds ``symbols`` (the subword tokens) and ``n_subwords``.

    This is where the k stacked ``aggregate`` HOF folds run — over the
    VOCABULARY-bounded table, not the corpus.  Segmentation is a pure
    function of the word, so the corpus never pays the fold cost (the
    first cut of ``bpe_segment`` folded every corpus token: 22 s at
    sf0.1 vs <1 s for the vocab-join form, a gap that only widens with
    data since vocabulary grows sublinearly)."""
    base = words.withColumn(
        "symbols",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(end_of_word))
        ),
    )
    for _rank, a, b, _m, _cnt in merges:
        base = base.withColumn("symbols", _merge_expr(a, b))
    return base.withColumn("n_subwords", F.size("symbols"))


def bpe_segment(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[int, str, str, str, int]],
    keep_cols: list[str] | None = None,
    end_of_word: str = "</w>",
) -> DataFrame:
    """Tokenize a corpus with a learned merge list — the INFERENCE half
    of the tokenizer.  Output: one row per corpus word — ``keep_cols``
    passed through, ``symbols`` and ``n_subwords``.

    Plan shape: explode to tokens, distinct to the vocabulary, segment
    the vocabulary (``bpe_segment_vocab``), equi-join the tokens back.
    Both the distinct and the join shuffle corpus-sized streams of
    SHORT WORDS with map-side partial aggregation — never symbol
    arrays — and at 100 TB the vocabulary side (10-100M rows) stays
    joinable while per-token fold work would be corpus-bounded.  AQE
    picks broadcast when the vocab fits.  Callers that only need
    per-group token counts should pre-aggregate (word, group) counts
    and join ``bpe_segment_vocab`` directly — see
    ``bpe_fertility_by_lang``."""
    from advanced_etl_pipelines_spark.functions.text import word_tokens

    keep = list(keep_cols or [])
    toks = df.select(
        *keep, F.explode(word_tokens(text_col)).alias("word")
    )
    vocab = bpe_segment_vocab(
        toks.select("word").distinct(), merges, end_of_word
    )
    return toks.join(vocab, "word").select(
        *keep, "word", "symbols", "n_subwords"
    )
