"""Independent numpy parity for the PCA query — at sf0.01 AND sf1.

``pca_embedding_projection`` is the one analytics query whose oracle
stays sf-pinned after round 5: the embedding covariance spectrum is
near-isotropic (measured lambda2/lambda3 = 0.98 at sf0.01), so any
iterative eigensolver expressible as unrolled SQL would need ~800
rounds to separate pc1/pc2 to 4-decimal parity — genuinely
non-SQL-expressible, unlike the BPE/unigram/kcenter/markov replays
(plans/oracle_replays.py).  This test is the compensating ANSWER check
at scale: a single-process numpy pipeline (DuckDB parquet read,
full-matrix moments, eigh, projection, pandas rollup) recomputes the
per-label frame with none of the Spark machinery — no Arrow batch
splits, no partial-moment tree, no distributed projection — and the
r4-rounded frames must agree exactly.  Shared numerics are limited to
``np.linalg.eigh`` on the same covariance; everything around it (data
path, moment assembly, batching, rollup) is independent, which is
exactly the part a distributed-plan bug would corrupt.

The sf1 case runs whenever ``.localdata/sf1`` exists (built by
``scripts/make_scale_data.py``); on driver machines without it, sf0.01
still pins the parity.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

SF001 = "/root/testdata/sf0.01"
SF1 = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".localdata/sf1")


def _numpy_pca_frame(sf_dir: str) -> dict[int, tuple]:
    """(label -> (n, mean_pc1, mean_pc2, var_pc1, var_pc2)) computed
    single-process: DuckDB parquet scan + plain numpy, mirroring the
    ALGORITHM of operators/linalg.py::pca_fit (divide-by-n covariance,
    eigh, largest-|x|-positive sign fix) without any of its distributed
    assembly."""
    import duckdb

    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(path):
        path = os.path.join(path, "*.parquet")
    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding, label FROM '{path}' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    labels = np.asarray([r[2] for r in rows])
    n = len(X)
    mean = X.mean(axis=0)
    cov = (X.T @ X) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    comps = evecs[:, order].T
    for i in range(2):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = float(np.trace(cov))
    var1, var2 = (float(evals[o]) / total_var for o in order)
    pc = (X - mean) @ comps.T
    out: dict[int, tuple] = {}
    for lab in sorted(set(labels.tolist())):
        m = labels == lab
        out[int(lab)] = (
            int(m.sum()),
            round(float(pc[m, 0].mean()) + 1e-9, 4),
            round(float(pc[m, 1].mean()) + 1e-9, 4),
            round(var1 + 1e-9, 4),
            round(var2 + 1e-9, 4),
        )
    return out


def _spark_pca_frame(spark, sf_dir: str) -> dict[int, tuple]:
    from advanced_etl_pipelines_spark.plans.registry import QUERIES

    rows = QUERIES["pca_embedding_projection"](spark, sf_dir).collect()
    return {
        int(r["label"]): (
            int(r["n"]),
            float(r["mean_pc1"]),
            float(r["mean_pc2"]),
            float(r["var_pc1"]),
            float(r["var_pc2"]),
        )
        for r in rows
    }


def test_pca_numpy_parity_sf001(spark):
    assert _spark_pca_frame(spark, SF001) == _numpy_pca_frame(SF001)


@pytest.mark.skipif(
    not os.path.isdir(SF1), reason="scale corpus .localdata/sf1 not built"
)
def test_pca_numpy_parity_sf1(spark):
    assert _spark_pca_frame(spark, SF1) == _numpy_pca_frame(SF1)
