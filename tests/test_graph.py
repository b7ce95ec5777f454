"""Connected-components units: chains (transitivity), stars, disjoint
components, canonical min labeling, and single-pair graphs."""

from __future__ import annotations

import math

from advanced_etl_pipelines_spark.operators.graph import connected_components
from advanced_etl_pipelines_spark.functions.ranking import bm25_scores


def _components(spark, edges):
    df = spark.createDataFrame(edges, "s long, d long")
    out = connected_components(df, "s", "d")
    return {r.node: r.component for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, needs >1 propagation round
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_star_and_disjoint_components(spark):
    got = _components(
        spark, [(10, 11), (10, 12), (10, 13), (20, 21), (30, 31), (31, 30)]
    )
    assert got == {10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20, 30: 30, 31: 30}


def test_edge_direction_irrelevant(spark):
    a = _components(spark, [(5, 1), (2, 5)])
    b = _components(spark, [(1, 5), (5, 2)])
    assert a == b == {1: 1, 2: 1, 5: 1}


def test_bm25_ranks_matching_doc_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join table spark"),
            (2, "spark banana"),
            (3, "banana apple cherry"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.score
        for r in bm25_scores(docs, "text", "doc_id", ["spark", "join"]).collect()
    }
    assert out[1] > out[2] > out[3]
    assert out[3] == 0.0


def test_bm25_matches_closed_form(spark):
    # One doc, one term appearing once: score = idf * (1*(k1+1)) /
    # (1 + k1*(1-b+b*dl/avgdl)); dl == avgdl so norm = 1 + k1.
    docs = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    out = bm25_scores(docs, "text", "doc_id", ["alpha"]).first()
    idf = math.log(1 + (1 - 1 + 0.5) / (1 + 0.5))
    expect = idf * (1 * 2.2) / (1 + 1.2)
    assert abs(out.score - expect) < 1e-9


def test_pagerank_matches_numpy_power_iteration(spark):
    """DataFrame PageRank must equal a numpy power iteration with the
    same damping/iterations on the same graph (no dangling nodes)."""
    import numpy as np

    from advanced_etl_pipelines_spark.operators.graph import pagerank

    # a small symmetric graph: star 0-(1,2,3) plus chain 3-4
    pairs = [(0, 1), (0, 2), (0, 3), (3, 4)]
    und = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(und, "s long, d long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "s", "d", iters=6, damping=0.85).collect()
    }

    ids = sorted({x for p in und for x in p})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in und:
        A[idx[b], idx[a]] = 1.0  # column-stochastic flow a -> b
    A /= np.maximum(A.sum(axis=0), 1)
    r = np.full(n, 1.0 / n)
    for _ in range(6):
        r = (1 - 0.85) / n + 0.85 * A @ r
    for v in ids:
        assert abs(got[v] - r[idx[v]]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def _core_nodes(spark, edges, k):
    from advanced_etl_pipelines_spark.operators.graph import k_core

    df = spark.createDataFrame(edges, "s long, d long")
    return {r.a for r in k_core(df, "s", "d", k).collect()}


def test_kcore_peels_pendant_tail(spark):
    # triangle 1-2-3 with pendant 3-4: 2-core is the triangle, 4 peels
    got = _core_nodes(spark, [(1, 2), (2, 3), (1, 3), (3, 4)], k=2)
    assert got == {1, 2, 3}


def test_kcore_cascading_peel(spark):
    # chain 1-2-3-4: removing endpoints leaves nodes at degree 1 again,
    # so the 2-core must peel to EMPTY (needs the iterative fixpoint)
    got = _core_nodes(spark, [(1, 2), (2, 3), (3, 4)], k=2)
    assert got == set()


def test_kcore_k3_keeps_clique_drops_bridge(spark):
    # K4 clique {1,2,3,4} + bridge 4-5-6: 3-core = the clique only
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = _core_nodes(spark, k4 + [(4, 5), (5, 6)], k=3)
    assert got == {1, 2, 3, 4}


def test_kcore_duplicate_and_reversed_edges_ignored(spark):
    # duplicates and reversals must not inflate degree
    got = _core_nodes(
        spark, [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (3, 1)], k=2
    )
    assert got == {1, 2, 3}


def test_cc_warns_when_max_iter_truncates(spark):
    """A path graph with diameter > 2*max_iter rounds cannot converge in
    one round — the fixpoint loop must WARN instead of silently
    returning possibly-split labels (ADVICE.md round 2)."""
    import warnings

    from advanced_etl_pipelines_spark.operators.graph import (
        connected_components,
    )

    path = [(i, i + 1) for i in range(1, 40)]
    df = spark.createDataFrame(path, "s long, d long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(df, "s", "d", max_iter=1).collect()
    assert any("no fixpoint" in str(w.message) for w in caught)

    # and a convergent run stays silent (short path, diameter < rounds;
    # one-hop min-label propagation needs O(diameter) rounds, so the
    # 40-node path above genuinely cannot finish in 20 — which is the
    # silent-truncation case the warning exists for)
    short = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "s long, d long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = connected_components(short, "s", "d", max_iter=20).collect()
    assert not [w for w in caught if "no fixpoint" in str(w.message)]
    assert {r["component"] for r in got} == {1}


def test_kcore_warns_when_max_iter_truncates(spark):
    """Cascading peel cut off by max_iter=1 must warn (ADVICE.md)."""
    import warnings

    from advanced_etl_pipelines_spark.operators.graph import k_core

    chain = [(i, i + 1) for i in range(1, 10)]
    df = spark.createDataFrame(chain, "s long, d long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        k_core(df, "s", "d", k=2, max_iter=1).collect()
    assert any("fixpoint" in str(w.message) for w in caught)


def test_adamic_adar_topk_hand_computed(spark):
    """Tiny graph with hand-computed AA scores: edges (1,2),(1,3),
    (2,3),(3,4).  Non-edges at distance 2: (1,4) and (2,4), both with
    common neighbor {3} (deg 3) -> score 1/ln(3) = 0.9102; tie broken
    by node id."""
    from advanced_etl_pipelines_spark.operators.graph import (
        adamic_adar_topk,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "s long, d long"
    )
    got = adamic_adar_topk(edges, "s", "d", 5).orderBy("rnk").collect()
    assert [(r["s"], r["d"], r["aa_r"], r["n_common"], r["rnk"]) for r in got] == [
        (1, 4, 0.9102, 1, 1),
        (2, 4, 0.9102, 1, 2),
    ]


def test_adamic_adar_hub_cap_drops_middles(spark):
    """max_middle_degree excludes hub middles from scoring: capping at
    2 removes node 3 (degree 3), leaving no distance-2 candidates."""
    from advanced_etl_pipelines_spark.operators.graph import (
        adamic_adar_topk,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "s long, d long"
    )
    got = adamic_adar_topk(edges, "s", "d", 5, max_middle_degree=2)
    assert got.count() == 0


# ---------------------------------------------------------------- LPA


def _lpa(spark, edges, iters=2):
    from advanced_etl_pipelines_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame(edges, "s long, d long")
    sym = df.union(df.selectExpr("d as s", "s as d"))
    return {
        r["node"]: r["label"]
        for r in label_propagation(sym, "s", "d", iters=iters).collect()
    }


def test_lpa_two_cliques_with_bridge(spark):
    """Two triangles {1,2,3} and {10,11,12} joined by one bridge edge
    3-10: after three synchronous min-tie rounds each triangle has
    settled on one label; the bridge does not merge them.  (Hand
    trace: round 2 leaves node 10 still carrying its own label while
    11/12 have adopted 3 — synchronous updates propagate one hop per
    round, which is why the operator takes ``iters`` rather than
    assuming instant convergence.)"""
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    got = _lpa(spark, tri1 + tri2 + [(3, 10)], iters=3)
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_lpa_min_label_tie_break(spark):
    """A node whose neighbors' labels are all distinct (every count
    ties at 1) must adopt the SMALLEST neighbor label — round 1 on a
    star: center 100 sees {1,2,3}, adopts 1."""
    got = _lpa(spark, [(100, 1), (100, 2), (100, 3)], iters=1)
    assert got[100] == 1


def test_lpa_deterministic_across_runs(spark):
    """Same edges, three runs, identical labelings (synchronous
    schedule + min-label ties are partitioning-independent)."""
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(30), rng.randrange(30)) for _ in range(60)
    ]
    edges = [(s, d) for s, d in edges if s != d]
    runs = [sorted(_lpa(spark, edges).items()) for _ in range(3)]
    assert runs[0] == runs[1] == runs[2]


def test_lpa_directed_input_symmetrized_internally(spark):
    """A one-direction edge list must get true undirected semantics via
    the internal symmetrize (no flag), and `assume_symmetric=True` on a
    genuinely symmetric list must give the identical labeling while
    skipping the rebuild."""
    from advanced_etl_pipelines_spark.operators.graph import (
        label_propagation,
    )

    one_dir = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12),
               (3, 10)]
    df = spark.createDataFrame(one_dir, "s long, d long")
    sym = df.union(df.selectExpr("d as s", "s as d"))

    def run(frame, **kw):
        return {
            r["node"]: r["label"]
            for r in label_propagation(frame, "s", "d", iters=3, **kw)
            .collect()
        }

    via_internal = run(df)                       # symmetrize path
    via_flag = run(sym, assume_symmetric=True)   # fast path
    assert via_internal == via_flag
    assert via_internal[1] == via_internal[2] == via_internal[3]
    assert via_internal[10] == via_internal[11] == via_internal[12]
    assert via_internal[1] != via_internal[10]


def test_pagerank_weighted_matches_multigraph_replication(spark):
    """A weighted edge list must produce exactly the ranks of the
    equivalent multigraph with each edge replicated weight times
    (integer weights -> bit-identical flow splits)."""
    from advanced_etl_pipelines_spark.operators.graph import pagerank

    weighted = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1), (2, 1, 2), (3, 1, 1), (2, 3, 1)],
        "s long, d long, w long",
    )
    multi_rows = []
    for s, d, w in weighted.collect():
        multi_rows += [(s, d)] * w
    multi = spark.createDataFrame(multi_rows, "s long, d long")
    rw = {
        r["node"]: round(r["rank"], 12)
        for r in pagerank(
            weighted, "s", "d", iters=4, weight="w"
        ).collect()
    }
    rm = {
        r["node"]: round(r["rank"], 12)
        for r in pagerank(
            multi, "s", "d", iters=4, dedupe_edges=False
        ).collect()
    }
    assert rw == rm


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    """Two triangles joined by one bridge: seeding at node 1 must rank
    its own triangle's members above the far triangle's, and the seed
    itself highest; mass sums to ~1."""
    from advanced_etl_pipelines_spark.operators.graph import pagerank

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    pairs = tri1 + tri2 + [(3, 10)]
    und = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(und, "s long, d long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "s", "d", iters=8, seeds=seeds).collect()
    }
    assert got[1] == max(got.values())
    assert min(got[2], got[3]) > max(got[11], got[12])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_personalized_pagerank_rejects_unknown_seeds(spark):
    from advanced_etl_pipelines_spark.operators.graph import pagerank
    import pytest

    edges = spark.createDataFrame([(1, 2), (2, 1)], "s long, d long")
    seeds = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="no seed id"):
        pagerank(edges, "s", "d", seeds=seeds)


def test_iterative_materialization_cadence_is_result_neutral(
    spark, monkeypatch
):
    """The periodic mid-loop materialization that bounds lazy-checkpoint
    broadcast nesting (_MAT_EVERY, round-10 ADVICE) must not change any
    rank or label: forcing a materialization EVERY round has to produce
    bit-identical output to the default cadence."""
    from advanced_etl_pipelines_spark.operators import graph

    pairs = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (2, 5)]
    und = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(und, "s long, d long")

    base_pr = sorted(
        map(tuple, graph.pagerank(edges, "s", "d", iters=6).collect())
    )
    base_lpa = sorted(
        map(
            tuple,
            graph.label_propagation(edges, "s", "d", iters=5).collect(),
        )
    )
    monkeypatch.setattr(graph, "_MAT_EVERY", 1)
    assert base_pr == sorted(
        map(tuple, graph.pagerank(edges, "s", "d", iters=6).collect())
    )
    assert base_lpa == sorted(
        map(
            tuple,
            graph.label_propagation(edges, "s", "d", iters=5).collect(),
        )
    )
