"""kNN k-ring expansion vs brute force (SURVEY.md §2.B B6, §2.C rank parity)."""

import numpy as np
import pandas as pd
import pytest

from o2g_spark.operators import knn


@pytest.fixture(scope="module")
def qt(spark):
    rng = np.random.default_rng(7)
    nq, nt = 60, 300
    q = pd.DataFrame(
        {
            "qid": np.arange(nq),
            "lat": np.round(rng.uniform(-20, 50, nq), 4),
            "lon": np.round(rng.uniform(-25, 25, nq), 4),
        }
    )
    # targets clustered (some cells dense, some empty → multi-ring paths)
    t = pd.DataFrame(
        {
            "tid": np.arange(nt),
            "lat": np.round(
                np.concatenate(
                    [rng.uniform(-20, 50, nt // 2), rng.normal(48.85, 0.5, nt - nt // 2)]
                ),
                4,
            ),
            "lon": np.round(
                np.concatenate(
                    [rng.uniform(-25, 25, nt // 2), rng.normal(2.35, 0.5, nt - nt // 2)]
                ),
                4,
            ),
        }
    )
    return spark.createDataFrame(q), spark.createDataFrame(t)


def _collect(df):
    return sorted(
        (r.qid, r.tid, r.knn_rank, round(r.dist2, 9)) for r in df.collect()
    )


def test_knn_matches_bruteforce(qt):
    q, t = qt
    got = _collect(knn.knn_join(q, t, k=5, res=5))
    exp = _collect(knn.knn_bruteforce(q, t, k=5))
    assert got == exp


def test_knn_matches_bruteforce_fine_res(qt):
    # finer grid → many empty rings; exercises multi-round expansion
    q, t = qt
    got = _collect(knn.knn_join(q, t, k=3, res=8))
    exp = _collect(knn.knn_bruteforce(q, t, k=3))
    assert got == exp


def test_knn_fewer_targets_than_k(spark):
    q = spark.createDataFrame(
        pd.DataFrame({"qid": [0, 1], "lat": [10.0, -5.0], "lon": [3.0, 7.0]})
    )
    t = spark.createDataFrame(
        pd.DataFrame({"tid": [100, 101], "lat": [11.0, 60.0], "lon": [3.5, 20.0]})
    )
    out = knn.knn_join(q, t, k=5, res=3).collect()
    # every query finds both targets, ranks 1..2
    assert len(out) == 4
    assert {(r.qid, r.knn_rank) for r in out} == {(0, 1), (0, 2), (1, 1), (1, 2)}


def test_knn_deterministic_ties(spark):
    # two targets equidistant from the query → rank by tid ascending
    q = spark.createDataFrame(pd.DataFrame({"qid": [0], "lat": [0.0], "lon": [0.0]}))
    t = spark.createDataFrame(
        pd.DataFrame({"tid": [7, 3], "lat": [1.0, -1.0], "lon": [0.0, 0.0]})
    )
    out = {r.knn_rank: r.tid for r in knn.knn_join(q, t, k=2, res=4).collect()}
    assert out == {1: 3, 2: 7}


def test_knn_partition_invariance(qt):
    q, t = qt
    a = _collect(knn.knn_join(q.repartition(1), t, k=4, res=6))
    b = _collect(knn.knn_join(q.repartition(13), t.repartition(7), k=4, res=6))
    assert a == b


def test_knn_auto_strategy_matches_kring(qt):
    """Auto (brute for small targets) and explicit k-ring agree exactly."""
    q, t = qt
    auto = _collect(knn.knn_join(q, t, k=4))  # 300 targets → brute path
    ring = _collect(knn.knn_join(q, t, k=4, res=6))
    assert auto == ring


def test_knn_choose_strategy_bounds_total_work():
    """The cost model bounds the CROSS PRODUCT, not one side (CLAUDE.md
    perf rule 7): 14M queries x 200 targets must NOT go brute."""
    assert knn.choose_strategy(3, 100, 200) == (True, knn.choose_strategy(3, 100, 200)[1])
    use_brute, _ = knn.choose_strategy(3, 14_000_000, 200)
    assert not use_brute
    use_brute, _ = knn.choose_strategy(3, 100, 10_000)  # big target side
    assert not use_brute
    # res grows with target density, clamped to [2, 12]
    assert knn.choose_strategy(3, 10, 10)[1] >= 2
    assert knn.choose_strategy(1, 10, 10**12)[1] == 12


def test_knn_cardinality_hints_same_result(qt):
    """Hints skip the two count() scans but never change results; a
    hint forcing the k-ring path on small data still agrees with brute."""
    q, t = qt
    exp = _collect(knn.knn_bruteforce(q, t, k=4))
    hinted_brute = _collect(knn.knn_join(q, t, k=4, n_queries=60, n_targets=300))
    assert hinted_brute == exp
    # lie high on purpose: auto picks the k-ring path, results identical
    hinted_ring = _collect(
        knn.knn_join(q, t, k=4, n_queries=10_000_000, n_targets=300)
    )
    assert hinted_ring == exp


def test_knn_grid_aligned_equal_distance_tie(spark):
    """Strict done-bound regression: a target at EXACTLY the safe-radius
    distance with a smaller tid must still displace the provisional
    k-th (non-strict <= emitted early and missed it)."""
    # res=2 → n=4, dlat=45. query at cell center-ish; two targets:
    # tid=9 nearby in the same cell, tid=1 at exactly 45 degrees away
    # in a farther cell. k=1: correct answer depends on exact compare.
    q = spark.createDataFrame(pd.DataFrame({"qid": [0], "lat": [0.0], "lon": [0.0]}))
    t = spark.createDataFrame(
        pd.DataFrame({"tid": [9, 1], "lat": [45.0, -45.0], "lon": [0.0, 0.0]})
    )
    out = _collect(knn.knn_join(q, t, k=1, res=2))
    exp = _collect(knn.knn_bruteforce(q, t, k=1))
    assert out == exp  # tid=1 wins the (dist2, tid) tie


def test_knn_pure_ring_loop_no_tail_brute(qt):
    """tail_brute_cap=0 forces the ring loop to prove every query done
    by the distance bound alone — the 100-TB shape where |active|·|T|
    never fits a broadcast cross join. Must equal brute force exactly."""
    q, t = qt
    got = _collect(knn.knn_join(q, t, k=3, res=6, tail_brute_cap=0))
    exp = _collect(knn.knn_bruteforce(q, t, k=3))
    assert got == exp


def test_knn_tail_brute_path(qt):
    """A huge cap routes the sparse tail through the bounded cross-join
    cleanup after round 1 — same exact answers."""
    q, t = qt
    got = _collect(
        knn.knn_join(q, t, k=3, res=8, tail_brute_cap=10_000_000_000)
    )
    exp = _collect(knn.knn_bruteforce(q, t, k=3))
    assert got == exp


def test_offset_chunks_cover_rings_exactly_once():
    """A single over-wide ring (8r > 4096 past r=512) is split across
    chunks instead of emitting one unbounded literal (ADVICE r3 #4);
    together the chunks cover each ring cell exactly once."""
    for lo, hi in [(0, 3), (600, 600), (510, 513)]:
        chunks = knn._offset_chunks(lo, hi)
        assert all(len(c) <= knn._OFFSET_CHUNK for c in chunks)
        flat = [off for c in chunks for off in c]
        expected = [
            off for r in range(lo, hi + 1) for off in knn._ring_offsets(r)
        ]
        assert flat == expected
        assert len(set(flat)) == len(flat)
    # ring 600 alone is 4800 offsets -> must be 2 chunks
    assert len(knn._offset_chunks(600, 600)) == 2
