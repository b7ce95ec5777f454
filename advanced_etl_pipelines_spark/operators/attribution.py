"""Markov-chain (removal-effect) attribution.

The data-driven alternative to rule-based attribution
(``registry_analytics``' last-touch): model user journeys as a
first-order Markov chain over touchpoint states with absorbing
CONV/NULL states, then credit each channel by how much total conversion
probability drops when the channel is removed (its transitions
redirected to NULL) — Anderl et al. 2014's removal effect.

Scale split: transition COUNTING is the data-scale part and stays fully
distributed (one LAG window partitioned by user).  The chain itself is
(|channels|+3)^2 numbers — a few hundred bytes — so the absorbing-chain
solve is a bounded driver reduction (same pattern as k-means' k
centroids or the sketch merges), not a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

START, CONV, NULL = "__start__", "__conv__", "__null__"


def journey_transitions(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    state_col: str,
    conv_state: str,
    order_cols: list | None = None,
) -> DataFrame:
    """(prev_state, next_state, n) transition counts over per-user
    journeys that run from START to the FIRST conversion event
    (absorbed in CONV) or to the end of history (absorbed in NULL).

    One shuffle on the user key; everything else is the LAG window and
    a grouped count.  Deterministic total order within a user comes
    from (ts, *order_cols)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    # keep events up to and including the first conversion
    conv_seen = F.sum(
        F.when(F.col(state_col) == conv_state, 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    trimmed = events.withColumn(
        "__prior_convs", F.coalesce(conv_seen, F.lit(0))
    ).where(F.col("__prior_convs") == 0)
    state = F.when(
        F.col(state_col) == conv_state, F.lit(CONV)
    ).otherwise(F.col(state_col))
    steps = trimmed.select(
        F.col(user_col).alias("u"),
        state.alias("s"),
        F.lag(state).over(w).alias("prev"),
        F.lead(state).over(w).alias("nxt"),
    )
    firsts = steps.where(F.col("prev").isNull()).select(
        F.lit(START).alias("src"), F.col("s").alias("dst")
    )
    mids = steps.where(F.col("nxt").isNotNull()).select(
        F.col("s").alias("src"), F.col("nxt").alias("dst")
    )
    lasts = (
        steps.where(F.col("nxt").isNull() & (F.col("s") != CONV))
        .select(F.col("s").alias("src"), F.lit(NULL).alias("dst"))
    )
    return (
        firsts.unionAll(mids)
        .unionAll(lasts)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _conversion_prob(trans: dict, removed: str | None = None) -> float:
    """P(absorb in CONV | start at START) for the chain given by
    ``trans[(src, dst)] = n``, with ``removed``'s INCOMING transitions
    redirected to NULL.  Solved with the fundamental-matrix identity
    x = R_conv + Q x on the tiny transient-state system."""
    import numpy as np

    redirected: dict = {}
    for (s, d), n in trans.items():
        if s == removed:
            continue
        if d == removed:
            d = NULL
        redirected[(s, d)] = redirected.get((s, d), 0) + n
    transients = sorted(
        {s for (s, _d) in redirected} - {CONV, NULL}
    )
    idx = {s: i for i, s in enumerate(transients)}
    t = len(transients)
    Q = np.zeros((t, t))
    r_conv = np.zeros(t)
    for s in transients:
        row = {
            d: n for (s2, d), n in redirected.items() if s2 == s
        }
        tot = sum(row.values())
        if tot == 0:
            continue
        for d, n in row.items():
            if d == CONV:
                r_conv[idx[s]] += n / tot
            elif d in idx:
                Q[idx[s], idx[d]] += n / tot
    if START not in idx:
        return 0.0
    x = np.linalg.solve(np.eye(t) - Q, r_conv)
    return float(x[idx[START]])


def markov_removal_effects(trans_df: DataFrame) -> list[tuple]:
    """Removal effect + normalized attribution per channel from a
    transition-count frame (src, dst, n).  Driver-side on the bounded
    chain; returns [(channel, removal_effect, attribution)] sorted by
    attribution desc then channel."""
    trans = {(r["src"], r["dst"]): r["n"] for r in trans_df.collect()}
    base = _conversion_prob(trans)
    channels = sorted(
        {s for (s, _d) in trans} | {d for (_s, d) in trans}
    ) 
    channels = [
        c for c in channels if c not in (START, CONV, NULL)
    ]
    effects = {}
    for c in channels:
        if base <= 0:
            effects[c] = 0.0
            continue
        effects[c] = max(
            0.0, 1.0 - _conversion_prob(trans, removed=c) / base
        )
    tot = sum(effects.values())
    out = [
        (c, e, (e / tot) if tot > 0 else 0.0)
        for c, e in effects.items()
    ]
    return sorted(out, key=lambda t: (-t[2], t[0]))
