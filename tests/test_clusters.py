"""Connected-components dup clustering: the star contraction must
match a pure-python union-find on every graph shape the pair
generators can emit — long chains (worst diameter), cycles, hubs,
random — and the corpus-level dedup must keep exactly one
representative per cluster."""

import numpy as np
import pytest

from o2g_spark.operators import clusters


def _uf_canon(edges, nodes):
    """Pure-python union-find oracle: node -> component min."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    got = {
        (r.doc_id, r.canon_id)
        for r in clusters.dup_clusters(_pairs_df(spark, edges)).collect()
    }
    want = set(_uf_canon(edges, nodes).items())
    assert got == want
    return got


def test_chain_worst_diameter(spark):
    # 60-hop path: label propagation would need 60 rounds; the star
    # contraction must finish inside dup_clusters' default max_iter
    _check(spark, [(i, i + 1) for i in range(60)])


def test_dedup_keep_best_policy(spark):
    # clusters {0,1,2} and {10,11}; scores pick 1 (highest in its
    # cluster) and tie 10/11 at 5 -> min id 10 wins; 20 unpaired
    corpus = spark.createDataFrame(
        [(0, 3), (1, 9), (2, 7), (10, 5), (11, 5), (20, 1)],
        "doc_id long, score long",
    )
    kept = {
        r["doc_id"]
        for r in clusters.dedup_keep_best(
            corpus, _pairs_df(spark, [(0, 1), (1, 2), (10, 11)]),
            "doc_id", "score",
        ).collect()
    }
    assert kept == {1, 10, 20}


def test_dedup_keep_best_constant_score_equals_canonical(spark):
    # constant score -> tiebreak keeps the min id per cluster, which
    # is exactly dedup_canonical's policy
    corpus = spark.createDataFrame(
        [(i, 1) for i in range(8)], "doc_id long, score long"
    )
    pairs = _pairs_df(spark, [(3, 4), (4, 5), (6, 7)])
    best = {
        r["doc_id"]
        for r in clusters.dedup_keep_best(
            corpus, pairs, "doc_id", "score"
        ).collect()
    }
    canon = {
        r["doc_id"]
        for r in clusters.dedup_canonical(corpus, pairs, "doc_id").collect()
    }
    assert best == canon


def test_dup_stats_histogram(spark):
    # clusters: {0,1,2} (size 3), {10,11} (size 2); corpus adds
    # singletons 20, 21 -> histogram rows for sizes 1, 2, 3
    lab = clusters.dup_clusters(
        _pairs_df(spark, [(0, 1), (1, 2), (10, 11)])
    )
    corpus = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 10, 11, 20, 21)], "doc_id long"
    )
    rows = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["n_droppable"])
        for r in clusters.dup_stats(lab, corpus=corpus).collect()
    }
    assert rows == {1: (2, 2, 0), 2: (1, 2, 1), 3: (1, 3, 2)}
    # droppable total == what dedup_canonical actually removes
    kept = clusters.dedup_canonical(
        corpus, _pairs_df(spark, [(0, 1), (1, 2), (10, 11)]), "doc_id"
    ).count()
    dropped = sum(n_drop for _, _, n_drop in rows.values())
    assert corpus.count() - kept == dropped


def test_dup_stats_without_corpus(spark):
    # labels only: no singleton row unless a component is a singleton
    lab = clusters.dup_clusters(_pairs_df(spark, [(5, 6)]))
    rows = {
        r["cluster_size"]: r["n_clusters"]
        for r in clusters.dup_stats(lab).collect()
    }
    assert rows == {2: 1}


def test_min_strategy_equivalence(spark):
    # window (default, measured 1.7× faster) and join (the
    # AQE-skew-splittable fallback) must produce identical labels on
    # a shape mixing chains, a hub, and disjoint components
    edges = (
        [(i, i + 1) for i in range(40)]          # chain
        + [(500, 500 + i) for i in range(1, 30)]  # hub
        + [(900, 901), (903, 902)]                # small components
    )
    lab_w = {
        (r["doc_id"], r["canon_id"])
        for r in clusters.dup_clusters(
            _pairs_df(spark, edges), min_strategy="window"
        ).collect()
    }
    lab_j = {
        (r["doc_id"], r["canon_id"])
        for r in clusters.dup_clusters(
            _pairs_df(spark, edges), min_strategy="join"
        ).collect()
    }
    assert lab_w == lab_j
    import pytest as _pytest
    with _pytest.raises(ValueError):
        clusters.dup_clusters(
            _pairs_df(spark, edges), min_strategy="bogus"
        ).collect()


def test_stats_hook_reports_sublinear_rounds(spark):
    # the measurement hook (bench_clusters.py) must see rounds ≪
    # diameter on a worst-case path, and not perturb the labels
    stats: dict = {}
    lab = {
        (r["doc_id"], r["canon_id"])
        for r in clusters.dup_clusters(
            _pairs_df(spark, [(i, i + 1) for i in range(60)]), stats=stats
        ).collect()
    }
    assert lab == {(i, 0) for i in range(61)}
    assert 1 <= stats["rounds"] < 20  # 60-hop diameter, log-ish rounds


def test_shapes(spark):
    edges = (
        [(1, 2), (2, 3), (3, 1)]          # cycle
        + [(10, 11)]                       # isolated pair
        + [(20, k) for k in range(21, 35)] # hub star (large-star's case)
        + [(40, 41), (43, 42), (41, 43)]   # mixed orientation chain
    )
    got = _check(spark, edges)
    assert (35 - 21 + 1) == sum(1 for d, c in got if c == 20)


def test_random_vs_union_find(spark):
    rng = np.random.default_rng(7)
    edges = [tuple(sorted(p)) for p in rng.integers(0, 400, (600, 2))
             if p[0] != p[1]]
    _check(spark, edges)


def test_duplicate_and_reversed_pairs_ignored(spark):
    got = _check(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_empty_pairs(spark):
    assert clusters.dup_clusters(_pairs_df(spark, [])).count() == 0


def test_non_convergence_raises(spark):
    with pytest.raises(RuntimeError, match="converge"):
        clusters.dup_clusters(
            _pairs_df(spark, [(i, i + 1) for i in range(40)]), max_iter=1
        )


def test_dedup_canonical_keeps_min_per_cluster(spark):
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(12)], "doc_id long, text string"
    )
    # clusters {0,1,2}, {5,7}; 3,4,6,8..11 unpaired
    pairs = _pairs_df(spark, [(1, 0), (1, 2), (7, 5)])
    kept = sorted(
        r.doc_id
        for r in clusters.dedup_canonical(df, pairs, "doc_id").collect()
    )
    assert kept == [0, 3, 4, 5, 6, 8, 9, 10, 11]


def test_incremental_equals_full(spark):
    """Folding a second batch of pairs into the first batch's labels
    must equal clustering all pairs at once — including cluster merges
    (a new pair bridging two old components) and singletons carried
    through."""
    rng = np.random.default_rng(11)
    edges = [tuple(sorted(p)) for p in rng.integers(0, 120, (150, 2))
             if p[0] != p[1]]
    first, second = edges[:90], edges[90:]
    # force a cross-batch bridge between two first-batch components
    lab1 = clusters.dup_clusters(_pairs_df(spark, first))
    c1 = {r.doc_id: r.canon_id for r in lab1.collect()}
    roots = sorted(set(c1.values()))
    if len(roots) >= 2:
        second = second + [(roots[0], roots[1])]
    inc = {
        (r.doc_id, r.canon_id)
        for r in clusters.dup_clusters_incremental(
            lab1, _pairs_df(spark, second)).collect()
    }
    full = {
        (r.doc_id, r.canon_id)
        for r in clusters.dup_clusters(
            _pairs_df(spark, first + second)).collect()
    }
    assert inc == full
    # monotonicity: no doc's canon moved upward
    after = dict(inc)
    assert all(after[d] <= c for d, c in c1.items())


def test_incremental_keeps_singletons(spark):
    lab1 = clusters.dup_clusters(_pairs_df(spark, [(1, 2), (7, 8)]))
    inc = {
        (r.doc_id, r.canon_id)
        for r in clusters.dup_clusters_incremental(
            lab1, _pairs_df(spark, [(2, 3)])).collect()
    }
    assert inc == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}


def test_sql_twin_matches_spark(spark):
    """The recursive-CTE oracle (the gate's side of the bargain)
    agrees with the star contraction on a mixed graph."""
    import duckdb

    edges = [(1, 2), (2, 3), (3, 4), (9, 8), (4, 1), (6, 5)]
    spark_rows = {
        (r.doc_id, r.canon_id)
        for r in clusters.dup_clusters(_pairs_df(spark, edges)).collect()
    }
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = clusters.dup_clusters_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(id_a, id_b)"
    )
    duck_rows = set(duckdb.sql(sql).fetchall())
    assert spark_rows == duck_rows
