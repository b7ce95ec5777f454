"""scripts/make_scale_data.py — per-copy mutation properties.

The replicator's whole point is that copies are NOT verbatim twins
(verbatim replication turns every near-dup query into a K²/2 all-clique
workload).  These tests pin the K-aware mutation maps directly — cheap,
no corpus build needed — plus the K=10 back-compat guarantee that keeps
every recorded sf1 number comparable after the K=100 fix.
"""

import importlib.util
import os

import duckdb
import pytest


def _msd():
    path = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "make_scale_data.py"
    )
    spec = importlib.util.spec_from_file_location("make_scale_data", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_letter_maps_distinct_and_bijective_for_k100():
    """The LETTER part alone must be distinct per copy: the driver's
    synthetic documents are word-only, so a digit rotation cannot
    disambiguate two copies (an earlier scheme had only 52 distinct
    letter transforms and copies 29/81 shared identical texts on the
    generated K=100 corpus)."""
    m = _msd()
    seen = {}
    for i in range(100):
        frm, to = m.letter_map(i)
        assert len(frm) == len(to) == 62
        assert sorted(frm) == sorted(to)  # bijection over the same set
        letters = to[:52]
        assert letters not in seen, (
            f"copies {seen.get(letters)} and {i} share a letter map"
        )
        seen[letters] = i
    # the old rotation-only scheme was identity at i=26 — pin the fix
    frm, to26 = m.letter_map(26)
    assert to26 != frm


def test_letter_map_k10_backcompat():
    """Copies 0-9 must reproduce the original rotation-only map so a
    regenerated sf1 corpus is byte-identical to the recorded one."""
    m = _msd()
    for i in range(10):
        frm, to = m.letter_map(i)
        rl = m.LOWER[i:] + m.LOWER[:i]
        assert to == rl + rl.upper() + m.DIGITS


def test_embedding_perturbations_distinct_for_k100():
    """Evaluate the per-copy perturbation lambdas in DuckDB (the engine
    that runs them) over a 64-dim zero vector: every copy pair's
    perturbation vectors must differ (the old mod-7 formula gave copies
    i === j (mod 7) IDENTICAL vectors -> ~14 exact twins per base
    vector at K=100) — EXCEPT the two documented legacy pairs (1,8)
    and (2,9), which the byte-compatible i < 10 family inherits from
    the original K=10 formula (see embedding_perturb_expr's docstring:
    bounded one-twin-per-vector artifact, present in every recorded
    sf1 number, kept for corpus comparability)."""
    m = _msd()
    con = duckdb.connect()
    vecs = {}
    dups = set()
    for i in range(1, 100):
        expr = m.embedding_perturb_expr(i)
        (v,) = con.sql(
            "SELECT list_transform("
            "list_zip(list_transform(range(1, 65), x -> CAST(0.0 AS"
            " FLOAT)), range(1, 65)),"
            f" z -> CAST(z[1] + {expr} AS FLOAT))"
        ).fetchone()
        v = tuple(v)
        assert max(abs(x) for x in v) <= 0.1501  # amplitude bound holds
        for j, w in vecs.items():
            if w == v:
                dups.add((j, i))
        vecs[i] = v
    assert dups == {(1, 8), (2, 9)}, f"unexpected twin copies: {dups}"
    # back-compat: i < 10 keeps the original K=10 formula
    for i in range(1, 10):
        expect = tuple(
            round(0.05 * ((i * 31 + d) % 7 - 3), 6) for d in range(1, 65)
        )
        got = tuple(round(x, 6) for x in vecs[i])
        assert got == expect, f"copy {i} diverged from the K=10 formula"


def test_embedding_perturbations_decorrelate_on_real_vectors():
    """Exact distinctness is NOT the property that matters — the first
    K=100 scheme (affine 211-lattice) had all copies distinct yet
    measured cross-copy cosines of 0.9999 on real vectors, because
    affine maps give copies at a constant offset near-identical
    perturbation VECTORS.  Pin the real invariant: applying all 100
    perturbations to real unit embeddings, every non-legacy copy pair
    must stay under the 0.95 near-dup threshold."""
    np = pytest.importorskip("numpy")
    m = _msd()
    con = duckdb.connect()
    P = np.zeros((100, 64))
    for i in range(1, 100):
        (v,) = con.sql(
            "SELECT list_transform("
            "list_zip(list_transform(range(1, 65), x -> CAST(0.0 AS"
            " DOUBLE)), range(1, 65)),"
            f" z -> z[1] + {m.embedding_perturb_expr(i)})"
        ).fetchone()
        P[i] = v
    base = con.sql(
        "SELECT embedding FROM"
        " '/root/testdata/sf0.001/embeddings.parquet'"
        " WHERE vec_id IN (7, 123, 400)"
    ).fetchall()
    for (emb,) in base:
        E = np.asarray(emb, dtype=np.float64)
        M = E[None, :] + P
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        C = Mn @ Mn.T
        np.fill_diagonal(C, -1)
        C[1, 8] = C[8, 1] = C[2, 9] = C[9, 2] = -1  # documented legacy twins
        assert C.max() < 0.95, f"cross-copy cosine {C.max():.4f}"


def test_mutate_covers_text_names_and_embeddings():
    m = _msd()
    strides = {"customer.c_custkey": 100, "supplier.s_suppkey": 50}
    assert "translate" in m.mutate("documents", "text", 3, strides)
    assert m.mutate("documents", "text", 0, strides) is None  # copy 0 raw
    assert "c_custkey + 300" in m.mutate("customer", "c_name", 3, strides)
    assert "s_suppkey + 150" in m.mutate("supplier", "s_name", 3, strides)
    assert "list_transform" in m.mutate("embeddings", "embedding", 3, strides)
    assert m.mutate("embeddings", "embedding", 0, strides) is None
    assert m.mutate("orders", "o_comment", 5, strides) is None
