"""SemDeDup semantics (o2g_spark/operators/semdedup.py).

Cross-engine exactness is pinned by the gate oracle
(scripts/check_oracles.py semdedup — literal-centroid DuckDB twin);
these tests pin the keep rule (lowest id of a dup group survives),
the cluster scoping (no cross-cluster comparisons, by design), the
numpy brute-force equivalence of max_sim, and the fail-loud
hot-cluster guard.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from o2g_spark.operators.semdedup import semdedup

SCHEMA = "vec_id long, embedding array<float>"

# two well-separated centroids: assignment is unambiguous for vectors
# near either axis
CENTS = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], SCHEMA
    )


def test_keeps_lowest_id_of_dup_group(spark):
    v = [0.9, 0.1, 0.02, 0.0]
    rows = [(1, v), (2, v), (3, v), (10, [0.8, 0.2, -0.4, 0.1])]
    out = {
        r.vec_id: (r.max_sim, r.keep)
        for r in semdedup(
            _emb(spark, rows), threshold=0.95, centroids=CENTS
        ).collect()
    }
    assert out[1][1] == 1  # first of the identical triple survives
    assert out[2] == (1.0, 0) and out[3] == (1.0, 0)
    assert out[10][1] == 1  # dissimilar neighbor survives


def test_cluster_scoping_no_cross_cluster_pairs(spark):
    """An exact duplicate in a DIFFERENT cluster is out of scope — the
    published algorithm only compares within clusters (that is the
    O(Σ|c|²) bound); assert the scope instead of accidentally relying
    on it."""
    a = [1.0, 0.05, 0.0, 0.0]  # cluster 0
    b = [0.05, 1.0, 0.0, 0.0]  # cluster 1
    out = {
        r.vec_id: (r.cluster, r.max_sim, r.keep)
        for r in semdedup(
            _emb(spark, [(1, a), (2, a), (3, b), (4, b)]),
            threshold=0.9,
            centroids=CENTS,
        ).collect()
    }
    assert out[1][0] == 0 and out[3][0] == 1
    assert out[2] == (0, 1.0, 0) and out[4] == (1, 1.0, 0)
    assert out[1][2] == 1 and out[3][2] == 1
    # the cluster-first rows never saw a lower-id comparison
    assert out[1][1] == -1.0 and out[3][1] == -1.0


def test_max_sim_matches_numpy_brute_force(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 4))
    rows = [(i, vecs[i]) for i in range(40)]
    out = {
        r.vec_id: (r.cluster, r.max_sim)
        for r in semdedup(
            _emb(spark, rows), threshold=0.5, centroids=CENTS
        ).collect()
    }
    v32 = vecs.astype(np.float32).astype(np.float64)
    cn = (CENTS * CENTS).sum(axis=1)
    cl = np.argmin(cn[None, :] - 2.0 * (v32 @ CENTS.T), axis=1)
    vn = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    for i in range(40):
        lower = [j for j in range(i) if cl[j] == cl[i]]
        exp = max((float(vn[i] @ vn[j]) for j in lower), default=-1.0)
        assert out[i][0] == cl[i]
        got = out[i][1]
        if exp == -1.0:
            assert got == -1.0
        else:
            assert abs(got - round(exp, 6)) <= 2e-6  # 6-dp round + fold order


def test_hot_cluster_guard_raises(spark):
    rows = [(i, [1.0, float(i) / 100.0, 0.0, 0.0]) for i in range(6)]
    df = semdedup(
        _emb(spark, rows), threshold=0.99, centroids=CENTS, max_cluster_rows=3
    )
    with pytest.raises(Exception, match="max_cluster_rows"):
        df.collect()


def test_partitioning_invariant(spark):
    rng = np.random.default_rng(11)
    rows = [(i, rng.standard_normal(4)) for i in range(60)]
    a = semdedup(_emb(spark, rows), threshold=0.6, centroids=CENTS)
    b = semdedup(
        _emb(spark, rows).repartition(7), threshold=0.6, centroids=CENTS
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
