"""PageRank at crawl scale (round-5 evidence for operators/graph.py).

Claims measured:

1. Per-round cost is ONE ranks⇄edges hash join + one dst aggregation
   (degree pre-joined once, dangling set precomputed once) — wall
   time per iteration should be ~flat across rounds.
2. A planted mega-hub (50% of edges point at one node) does not blow
   up: contributions into the hub are partial-aggregated map-side
   (groupBy sum of longs), so the hot dst key reduces, never
   materializes its fan-in.
3. Mass conservation at scale: total rank stays within the
   truncation-dust bound of SCALE (exactness evidence at a size where
   a float implementation would have ordering-dependent sums).

Input synthesized deterministically in Spark (no external data):
N nodes, E edges with an affine-hash dst; --hub plants the hot dst.

Run:  python scripts/bench_graph.py [--nodes 1000000] [--edges 10000000]
          [--iters 10] [--hub] [--master local[32]]
JSON line per config to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.operators import graph  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402


def synth_edges(spark, n_nodes: int, n_edges: int, hub: bool):
    e = spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("src"),
        # modulo id first so the affine mix never overflows BIGINT
        (((F.col("id") % n_nodes) * 2654435761 + 40503) % n_nodes).alias("dst"),
    )
    if hub:
        # 50% of edges retargeted at node 0 — the planted mega-hub
        e = e.select(
            "src",
            F.when(F.col("src") % 2 == 0, F.lit(0)).otherwise(F.col("dst"))
            .alias("dst"),
        )
    return e


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hub", action="store_true")
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    spark = get_spark("bench_graph", master=args.master)
    edges = synth_edges(spark, args.nodes, args.edges, args.hub)

    # warm: JIT + python worker spawn (CLAUDE.md rule 5)
    graph.pagerank(edges.limit(100_000), iterations=2).count()

    t0 = time.time()
    pr = graph.pagerank(edges, iterations=args.iters)
    rows = pr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rank_scaled").alias("mass"),
        F.max("rank_scaled").alias("mx"),
    ).collect()[0]
    wall = time.time() - t0
    out = {
        "op": "pagerank",
        "nodes": rows.n,
        "edges": args.edges,
        "iters": args.iters,
        "hub": args.hub,
        "wall_s": round(wall, 2),
        "edge_iters_per_s": int(args.edges * args.iters / wall),
        "mass_frac": rows.mass / graph.SCALE,
        "max_rank_frac": rows.mx / graph.SCALE,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
