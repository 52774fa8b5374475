"""Integer-exact PageRank (operators/graph.py): float-reference
agreement, mass conservation, structure sanity, invariances, twin."""

import duckdb
import pytest

from o2g_spark.operators import graph as G

EDGES = [(1, 2), (1, 3), (2, 3), (4, 1), (1, 2)]  # dup edge + dangling 3


def _float_ref(edges, n_iter, d=0.85):
    out = {}
    for s, t in set(edges):
        out.setdefault(s, set()).add(t)
    nodes = sorted({x for e in set(edges) for x in e})
    r = {n: 1 / len(nodes) for n in nodes}
    for _ in range(n_iter):
        dang = sum(r[n] for n in nodes if n not in out)
        r = {
            n: (1 - d) / len(nodes)
            + d * (sum(r[s] / len(out[s]) for s in out if n in out[s])
                   + dang / len(nodes))
            for n in nodes
        }
    return r


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_matches_float_reference(edges_df):
    got = {r.node: r.rank_scaled / G.SCALE
           for r in G.pagerank(edges_df, iterations=5).collect()}
    ref = _float_ref(EDGES, 5)
    assert got.keys() == ref.keys()
    for n in ref:
        assert abs(got[n] - ref[n]) < 1e-9, (n, got[n], ref[n])


def test_mass_conserved_up_to_truncation(edges_df):
    iters = 7
    rows = G.pagerank(edges_df, iterations=iters).collect()
    mass = sum(r.rank_scaled for r in rows)
    # each round loses < n_nodes units to floor division at each of
    # the ~3 truncation points
    assert G.SCALE - 4 * 3 * iters <= mass <= G.SCALE


def test_hub_ranks_highest(spark):
    # star: everyone links to 0, 0 links back to 1
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 8)] + [(0, 1)], "src long, dst long"
    )
    # 20 rounds: the 0↔1 mass oscillation has decayed below the
    # equilibrium gap (float ref: r0=.456 vs r1=.431 at 20; at 10 the
    # slosh still has r1 ahead)
    rows = {r.node: r.rank_scaled
            for r in G.pagerank(edges, iterations=20).collect()}
    assert rows[0] == max(rows.values())
    assert rows[1] > rows[2]  # 0's sole target beats the leaves


def test_multi_edge_collapse_and_partition_invariance(spark, edges_df):
    base = sorted(map(tuple, G.pagerank(edges_df, iterations=4).collect()))
    dedup = spark.createDataFrame(sorted(set(EDGES)), "src long, dst long")
    assert base == sorted(map(tuple, G.pagerank(dedup, iterations=4).collect()))
    assert base == sorted(
        map(tuple, G.pagerank(edges_df.repartition(7), iterations=4).collect())
    )


def test_checkpoint_path_identical(edges_df):
    a = sorted(map(tuple, G.pagerank(edges_df, iterations=6).collect()))
    b = sorted(map(tuple, G.pagerank(
        edges_df, iterations=6, checkpoint_every=2).collect()))
    assert a == b


def test_validation(edges_df):
    with pytest.raises(ValueError):
        G.pagerank(edges_df, damping_pct=0)
    with pytest.raises(ValueError):
        G.pagerank(edges_df, iterations=0)


def test_sql_twin_bit_identical(edges_df):
    got = sorted(map(tuple, G.pagerank(edges_df, iterations=5).collect()))
    con = duckdb.connect()
    con.sql("CREATE TABLE edges (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?,?)", EDGES)
    want = sorted(
        tuple(w)
        for w in con.sql(G.pagerank_sql("SELECT * FROM edges", iterations=5)).fetchall()
    )
    assert got == want
