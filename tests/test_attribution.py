"""Markov removal-effect attribution: hand-solvable chains."""

from __future__ import annotations

from advanced_etl_pipelines_spark.operators.attribution import (
    journey_transitions,
    markov_removal_effects,
    _conversion_prob,
    START, CONV, NULL,
)


def _fx(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, event_id long"
    )


def test_transitions_first_conversion_absorbs(spark):
    # user 1: A -> purchase -> B (post-conversion B must be dropped)
    df = _fx(spark, [(1, 1, "A", 1), (1, 2, "purchase", 2), (1, 3, "B", 3)])
    t = journey_transitions(
        df, "user_id", "ts", "event_type", "purchase", ["event_id"]
    )
    got = {(r.src, r.dst): r.n for r in t.collect()}
    assert got == {(START, "A"): 1, ("A", CONV): 1}


def test_transitions_nonconverter_hits_null(spark):
    df = _fx(spark, [(1, 1, "A", 1), (1, 2, "B", 2)])
    t = journey_transitions(
        df, "user_id", "ts", "event_type", "purchase", ["event_id"]
    )
    got = {(r.src, r.dst): r.n for r in t.collect()}
    assert got == {(START, "A"): 1, ("A", "B"): 1, ("B", NULL): 1}


def test_sole_channel_gets_full_attribution(spark):
    # every conversion goes through A; B never converts
    df = _fx(spark, [
        (1, 1, "A", 1), (1, 2, "purchase", 2),
        (2, 1, "A", 3), (2, 2, "purchase", 4),
        (3, 1, "B", 5),
    ])
    t = journey_transitions(
        df, "user_id", "ts", "event_type", "purchase", ["event_id"]
    )
    out = markov_removal_effects(t)
    eff = {c: (e, a) for c, e, a in out}
    assert eff["A"] == (1.0, 1.0)
    assert eff["B"][0] == 0.0


def test_conversion_prob_hand_chain():
    # START -> A (always); A -> CONV 0.5, A -> NULL 0.5
    trans = {
        (START, "A"): 10, ("A", CONV): 5, ("A", NULL): 5,
    }
    assert abs(_conversion_prob(trans) - 0.5) < 1e-12
    # removing A kills all conversion
    assert _conversion_prob(trans, removed="A") == 0.0


def test_markov_oracle_zero_conversions_matches_spark(spark):
    """Round-5 ADVICE: with ZERO conversions the oracle's xs/xbase CTEs
    are empty — a bare CROSS JOIN xbase used to drop every channel row
    (0 rows) while the Spark side emits one 0.0 row per channel.  The
    COALESCE(MAX(x),0) xbase keeps the <=0 branch reachable; oracle and
    operator must agree row-for-row."""
    import duckdb

    from advanced_etl_pipelines_spark.plans.oracle_replays import (
        markov_removal_sql,
    )

    rows = [
        (1, 1, "click", 1), (1, 2, "view", 2),
        (2, 1, "view", 3), (2, 2, "click", 4), (2, 3, "cart", 5),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (user_id BIGINT, ts TIMESTAMP, "
        "event_type VARCHAR, event_id BIGINT)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, to_timestamp(?), ?, ?)", rows
    )
    got = sorted(con.execute(markov_removal_sql(10)).fetchall())
    assert got == [
        ("cart", 0.0, 0.0), ("click", 0.0, 0.0), ("view", 0.0, 0.0),
    ]

    t = journey_transitions(
        _fx(spark, rows), "user_id", "ts", "event_type", "purchase",
        ["event_id"],
    )
    spark_rows = sorted(
        (c, round(1e-9 + e, 4), round(1e-9 + a, 4))
        for c, e, a in markov_removal_effects(t)
    )
    assert spark_rows == got


def test_two_hop_chain_prob():
    # START->A->B->CONV always: p = 1; removal of either zeroes it
    trans = {(START, "A"): 3, ("A", "B"): 3, ("B", CONV): 3}
    assert abs(_conversion_prob(trans) - 1.0) < 1e-12
    assert _conversion_prob(trans, removed="B") == 0.0
