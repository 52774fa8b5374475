"""Link-graph analytics: integer-exact fixed-iteration PageRank.

A web-scale crawl pipeline ranks pages to prioritize fetch/keep
decisions; PageRank over the host/page link graph is the canonical
scorer. This implementation is Spark-first AND oracle-exact:

- **Fixed iteration count** (power iteration unrolls into a static
  DAG — at 100 TB you run 10-30 rounds, each one join + one agg; a
  convergence test would add a driver round-trip per iteration for
  nothing the fixed count doesn't give).
- **Integer arithmetic end-to-end**: ranks live as BIGINT in units of
  1/SCALE (default 1e12). Each round redistributes
  ``contrib = rank div out_degree`` (floor division), applies damping
  as ``(D_PCT × mass) div 100``, and adds the dangling pool's
  per-node share — every operation is order-independent integer math,
  so the DuckDB twin (an UNROLLED chain of CTEs, one per iteration)
  matches BIT-FOR-BIT with no float-sum rounding caveats. The ≤n
  units of truncation dust per round are *identically* truncated in
  both engines (and vanish under round-to-float for users).
- **Scale shape**: per round, ranks join edges on src (one hash
  shuffle keyed by node), partial-agg contributions by dst (map-side
  combine — the groupBy sums longs), plus one scalar agg for the
  dangling pool broadcast back as a literal-free 1-row cross join.
  ``localCheckpoint`` every ``checkpoint_every`` rounds truncates the
  growing lineage (the dup_clusters lesson).

Dangling nodes (no out-edges) donate their damped mass uniformly to
all nodes — the standard correction; without it total mass leaks and
ranks drift toward zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCALE = 10**12
D_PCT = 85  # damping as an integer percentage (0.85)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_pct: int = D_PCT,
    scale: int = SCALE,
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank over a directed edge list → ``(node, rank_scaled)``
    where ``rank_scaled`` is the rank in 1/scale units (BIGINT).

    Multi-edges are collapsed first (out-degree counts DISTINCT
    targets — pass a pre-weighted edge table through
    ``groupBy(src).pivot…`` yourself if you want weighted walks);
    self-loops participate normally. The node set is src ∪ dst.
    """
    if not (0 < damping_pct < 100):
        raise ValueError(f"damping_pct must be in (1, 99), got {damping_pct}")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            "node", F.lit(0).cast(T.LongType()).alias("rank_scaled")
        )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # static per-round inputs, attached ONCE (not per iteration): the
    # edge list with out-degree pre-joined, and the dangling node set
    e2 = e.join(deg, "src").select("src", "dst", "out_deg").localCheckpoint()
    dangling_nodes = nodes.join(
        deg, nodes.node == deg.src, "left_anti"
    ).localCheckpoint()
    base = ((100 - damping_pct) * scale) // (100 * n_nodes)
    init = scale // n_nodes

    ranks = nodes.select("node", F.lit(init).cast(T.LongType()).alias("rank_scaled"))
    for it in range(iterations):
        # dangling pool: total rank of nodes with no out-edges
        dangling = ranks.join(dangling_nodes, "node").agg(
            F.coalesce(F.sum("rank_scaled"), F.lit(0)).alias("__dang")
        )
        contribs = (
            ranks.join(e2, ranks.node == e2.src)
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled div out_deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * (coalesce(__in, 0)"
                        f" + __dang div {n_nodes})) div 100"
                    )
                ).cast(T.LongType()).alias("rank_scaled"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_sql(
    edges_query: str,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_pct: int = D_PCT,
    scale: int = SCALE,
) -> str:
    """DuckDB twin of :func:`pagerank`: the power iteration UNROLLED
    into one CTE per round (r0..r{k}) — every step the same floor
    division (`//`) and integer damping as the Spark path, so the
    result is bit-identical. n_nodes is computed inline (scalar
    subquery) rather than passed, keeping the twin self-contained."""
    body = [
        f"WITH e AS (SELECT DISTINCT {src_col} AS src, {dst_col} AS dst"
        f" FROM ({edges_query})),",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "nn AS (SELECT count(*) AS n FROM nodes),",
        "deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),",
        f"r0 AS (SELECT node, {scale} // (SELECT n FROM nn) AS rank_scaled"
        " FROM nodes),",
    ]
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        body.append(f"""
dang{i} AS (
  SELECT coalesce(sum(rank_scaled), 0) AS d FROM {prev}
  WHERE node NOT IN (SELECT src FROM deg)
),
con{i} AS (
  SELECT e.dst AS node, sum(p.rank_scaled // deg.out_deg) AS c
  FROM {prev} p JOIN deg ON p.node = deg.src JOIN e ON p.node = e.src
  GROUP BY e.dst
),
{cur} AS (
  SELECT nodes.node,
         ({100 - damping_pct} * {scale}) // (100 * (SELECT n FROM nn))
         + ({damping_pct} * (coalesce(con{i}.c, 0)
            + (SELECT d FROM dang{i}) // (SELECT n FROM nn))) // 100
         AS rank_scaled
  FROM nodes LEFT JOIN con{i} USING (node)
),""")
    joined = "\n".join(body).rstrip().rstrip(",")
    return (
        f"{joined}\n"
        f"SELECT node, CAST(rank_scaled AS BIGINT) AS rank_scaled"
        f" FROM r{iterations}"
    )
