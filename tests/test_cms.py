"""Count-Min sketch + exact heavy hitters
(o2g_spark/operators/sketches.py count-min section).

Cross-engine exactness is pinned by the gate oracles
(scripts/check_oracles.py cms_users heavy_users — the heavy-hitter
oracle is the PLAIN GROUP BY/HAVING, i.e. algebraic equivalence);
these tests pin the sketch's mathematical contracts: never an
underestimate, exact when collision-free, heavy hitters ==
plain-aggregation under collision pressure AND without it, merge
distributivity, null handling, and parameter validation.
"""

from collections import Counter

import pytest

from o2g_spark.operators import sketches

VALS = [f"u{i % 37}" for i in range(1000)] + ["hot"] * 300 + [None] * 5
TRUE = Counter(v for v in VALS if v is not None)


@pytest.fixture(scope="module")
def vdf(spark):
    return spark.createDataFrame([(v,) for v in VALS], "v string")


def _est(spark, vdf, w, d):
    sk = sketches.cms_build(vdf, "v", w=w, d=d)
    return {
        r.value: r.est
        for r in sketches.cms_query(sk, vdf, "v", w=w, d=d).collect()
    }


def test_never_underestimates_under_collisions(spark, vdf):
    est = _est(spark, vdf, w=16, d=3)
    assert all(est[v] >= n for v, n in TRUE.items())
    # w=16 over 38 values MUST collide somewhere
    assert any(est[v] > n for v, n in TRUE.items())


def test_exact_when_collision_free(spark, vdf):
    est = _est(spark, vdf, w=1 << 16, d=4)
    assert est == dict(TRUE)


def test_unseen_value_est_zero_at_big_w(spark, vdf):
    sk = sketches.cms_build(vdf, "v", w=1 << 16, d=4)
    probes = spark.createDataFrame([("never-seen",)], "v string")
    rows = sketches.cms_query(sk, probes, "v", w=1 << 16, d=4).collect()
    assert [(r.value, r.est) for r in rows] == [("never-seen", 0)]


@pytest.mark.parametrize("w", [8, 4096])
def test_heavy_hitters_equal_plain_aggregation(spark, vdf, w):
    got = {
        (r.value, r.n)
        for r in sketches.cms_heavy_hitters(vdf, "v", 30, w=w, d=3).collect()
    }
    assert got == {(v, n) for v, n in TRUE.items() if n >= 30}


def test_merge_distributes_over_union(spark, vdf):
    p1 = spark.createDataFrame([(v,) for v in VALS[:600]], "v string")
    p2 = spark.createDataFrame([(v,) for v in VALS[600:]], "v string")
    merged = {
        (r.row, r.col, r.c)
        for r in sketches.cms_merge(
            sketches.cms_build(p1, "v", w=16, d=3),
            sketches.cms_build(p2, "v", w=16, d=3),
        ).collect()
    }
    whole = {
        (r.row, r.col, r.c)
        for r in sketches.cms_build(vdf, "v", w=16, d=3).collect()
    }
    assert merged == whole


def test_nulls_ignored_and_sketch_bounded(spark, vdf):
    rows = sketches.cms_build(vdf, "v", w=16, d=3).collect()
    assert sum(r.c for r in rows if r.row == 0) == sum(TRUE.values())
    assert len(rows) <= 16 * 3


def test_parameter_validation(spark, vdf):
    with pytest.raises(ValueError):
        sketches.cms_build(vdf, "v", w=1, d=3)
    with pytest.raises(ValueError):
        sketches.cms_heavy_hitters(vdf, "v", 0, w=16, d=3)
    with pytest.raises(ValueError):
        sketches.cms_merge()
