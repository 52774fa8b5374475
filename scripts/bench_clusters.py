"""Dup-cluster contraction at crawl scale (round-5 evidence).

`dup_clusters` (operators/clusters.py) claims O(log n) convergence
INDEPENDENT of component diameter — the property that makes transitive
dedup feasible at 100 TB, where plain min-label propagation pays one
full shuffle round PER HOP of the longest mirror chain. This script
proves the claim on a planted worst-case graph, synthesized
deterministically in Spark (no external data):

  - CHAINS: --chains paths of --chain-len hops each — diameter
    `chain_len`; label propagation would need ~chain_len rounds,
    the star contraction should stay at ~log2.
  - HUB: one node with --hub-edges neighbors — the skew case
    large-star exists for (the hub's adjacency must contract
    geometrically, never re-shuffle whole).
  - RANDOM: --rand-edges uniform pairs over --rand-nodes ids —
    the background supercomponent + singleton mix of a real crawl.

Everything is verified structurally after the run: every chain
collapses to exactly its min id, the hub component has hub_edges+1
members with the hub's min as canon, and the label table covers every
distinct node exactly once. A FAILED invariant exits non-zero.

Run:  python scripts/bench_clusters.py [--chains 100]
          [--chain-len 10000] [--hub-edges 2000000]
          [--rand-edges 8000000] [--rand-nodes 30000000]
          [--update-baseline]

Results print as JSON lines and (with --update-baseline) splice into
BENCH/BASELINE.md between the clusters markers.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.operators.clusters import (  # noqa: E402
    dup_clusters,
    dup_clusters_incremental,
)
from o2g_spark.session import get_spark  # noqa: E402

BEGIN = "<!-- clusters:begin -->"
END = "<!-- clusters:end -->"

# disjoint node-id spaces so invariants are checkable per family
HUB_BASE = 1_000_000_000
RAND_BASE = 2_000_000_000
NEW_BASE = 3_000_000_000


def build_edges(spark, args):
    """Deterministic adversarial edge set as (id_a, id_b) longs."""
    chains = (
        spark.range(args.chains * args.chain_len)
        .where(F.col("id") % args.chain_len != args.chain_len - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    hub = spark.range(args.hub_edges).select(
        F.lit(HUB_BASE).cast("long").alias("id_a"),
        (F.lit(HUB_BASE + 1) + F.col("id")).alias("id_b"),
    )
    rand = (
        spark.range(args.rand_edges)
        .select(
            (F.lit(RAND_BASE)
             + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(args.rand_nodes))
             ).alias("id_a"),
            (F.lit(RAND_BASE)
             + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(args.rand_nodes))
             ).alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
    )
    return chains.unionByName(hub).unionByName(rand)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=100)
    ap.add_argument("--chain-len", type=int, default=10_000)
    ap.add_argument("--hub-edges", type=int, default=2_000_000)
    ap.add_argument("--rand-edges", type=int, default=8_000_000)
    ap.add_argument("--rand-nodes", type=int, default=30_000_000)
    ap.add_argument("--inc-edges", type=int, default=2_000_000,
                    help="size of the incremental batch (0 disables "
                         "the incremental-vs-recluster comparison)")
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    spark = get_spark("bench-clusters", master=args.master)
    edges = build_edges(spark, args).localCheckpoint(eager=True)
    n_edges = edges.count()
    print(json.dumps({"edges": n_edges}), flush=True)

    stats: dict = {}
    t0 = time.time()
    labels = dup_clusters(edges, stats=stats).localCheckpoint(eager=True)
    n_labels = labels.count()
    dt = time.time() - t0

    # --- structural invariants (cheap aggregates over the label table)
    chain_bad = labels.where(
        (F.col("doc_id") < args.chains * args.chain_len)
        & (F.col("canon_id")
           != (F.col("doc_id") - F.pmod(F.col("doc_id"),
                                        F.lit(args.chain_len))))
    ).count()
    hub_rows = labels.where(
        (F.col("doc_id") >= HUB_BASE) & (F.col("doc_id") < RAND_BASE)
    )
    hub_size = hub_rows.count()
    hub_bad = hub_rows.where(F.col("canon_id") != HUB_BASE).count()
    n_nodes = (
        edges.select(F.col("id_a").alias("n"))
        .unionByName(edges.select(F.col("id_b").alias("n")))
        .distinct().count()
    )
    top = (
        labels.groupBy("canon_id").count()
        .orderBy(F.desc("count")).limit(1).collect()[0]
    )

    ok = (
        chain_bad == 0
        and hub_bad == 0
        and hub_size == args.hub_edges + 1
        and n_labels == n_nodes
    )
    result = {
        "edges": n_edges,
        "nodes": n_nodes,
        "labels": n_labels,
        "rounds": stats.get("rounds"),
        "diameter_planted": args.chain_len,
        "sec": round(dt, 2),
        "edges_per_sec": int(n_edges / dt),
        "max_cluster": int(top["count"]),
        "chain_mislabels": chain_bad,
        "hub_size": hub_size,
        "hub_mislabels": hub_bad,
        "invariants_ok": ok,
    }
    print(json.dumps(result), flush=True)

    inc = None
    if ok and args.inc_edges > 0:
        inc = run_incremental(spark, args, edges, labels)
        print(json.dumps(inc), flush=True)
        ok = ok and inc["labels_identical"]

    if args.update_baseline and ok:
        update_baseline(args, result, inc)
    return 0 if ok else 1


def run_incremental(spark, args, edges, labels):
    """Next crawl batch arrives: half its pairs live among brand-new
    ids, half link new ids into EXISTING components (forced merges).
    The incremental fold works over labels ∪ batch — O(corpus pairs
    ever seen) never appears — and must label-match a full recluster
    of edges ∪ batch exactly."""
    half = args.inc_edges // 2
    fresh = spark.range(half).select(
        (F.lit(NEW_BASE)
         + F.pmod(F.xxhash64("id", F.lit(3)), F.lit(args.inc_edges))
         ).alias("id_a"),
        (F.lit(NEW_BASE)
         + F.pmod(F.xxhash64("id", F.lit(4)), F.lit(args.inc_edges))
         ).alias("id_b"),
    )
    cross = spark.range(half).select(
        (F.lit(RAND_BASE)
         + F.pmod(F.xxhash64("id", F.lit(5)), F.lit(args.rand_nodes))
         ).alias("id_a"),
        (F.lit(NEW_BASE)
         + F.pmod(F.xxhash64("id", F.lit(6)), F.lit(args.inc_edges))
         ).alias("id_b"),
    )
    batch = (
        fresh.unionByName(cross)
        .where(F.col("id_a") != F.col("id_b"))
        .localCheckpoint(eager=True)
    )
    n_batch = batch.count()

    t0 = time.time()
    # incremental path sees ONLY committed labels + the new batch
    lab_inc = dup_clusters_incremental(labels, batch).localCheckpoint(
        eager=True
    )
    n_inc = lab_inc.count()
    t_inc = time.time() - t0

    t0 = time.time()
    full_stats: dict = {}
    lab_full = dup_clusters(
        edges.unionByName(batch), stats=full_stats
    ).localCheckpoint(eager=True)
    n_full = lab_full.count()
    t_full = time.time() - t0

    def digest(df):
        r = df.agg(
            F.count("*"),
            F.expr("bit_xor(xxhash64(doc_id, canon_id))"),
        ).collect()[0]
        return int(r[0]), int(r[1])

    return {
        "inc_batch_edges": n_batch,
        "inc_sec": round(t_inc, 2),
        "inc_labels": n_inc,
        "recluster_sec": round(t_full, 2),
        "recluster_rounds": full_stats.get("rounds"),
        "recluster_labels": n_full,
        "labels_identical": digest(lab_inc) == digest(lab_full),
    }


def update_baseline(args, r, inc=None) -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "BASELINE.md",
    )
    lines = [
        BEGIN,
        "",
        "## Dup-cluster contraction at crawl scale — round 5",
        "",
        f"Planted worst case: {args.chains} mirror chains of "
        f"{args.chain_len:,} hops (diameter {args.chain_len:,}), one "
        f"{args.hub_edges:,}-neighbor hub, {args.rand_edges:,} random "
        f"pairs over {args.rand_nodes:,} ids — "
        f"{r['edges']:,} edges / {r['nodes']:,} nodes total.",
        "",
        "| metric | value |",
        "|---|---|",
        f"| contraction rounds | **{r['rounds']}** "
        f"(vs {args.chain_len:,} for O(diameter) label propagation; "
        f"log2(n) ≈ {math.log2(max(r['nodes'], 2)):.1f}) |",
        f"| wall | {r['sec']} s ({r['edges_per_sec']:,} edges/s) |",
        f"| largest cluster | {r['max_cluster']:,} rows (the hub) |",
        f"| invariants | chains exact, hub exact "
        f"({r['hub_size']:,} members), labels = nodes |",
        "",
        "- Rounds grow with log(component size), NOT diameter — the "
        "planted 10k-hop chains converge in the same handful of "
        "alternations as the random background, which is why "
        "transitive dedup over a 100 TB crawl's mirror chains stays "
        "a constant-factor job.",
        "- The hub contracts geometrically (large-star emits edges "
        "toward the neighborhood min only) — no round re-shuffles "
        "the full adjacency of the hot node.",
    ]
    if inc:
        lines += [
            "",
            f"Incremental fold (`dup_clusters_incremental`): next "
            f"crawl batch of {inc['inc_batch_edges']:,} pairs (half "
            "among brand-new ids, half merging into existing "
            "components), folded into the committed labels vs "
            "re-clustering every pair ever seen:",
            "",
            "| path | wall s | input |",
            "|---|---|---|",
            f"| incremental (labels ∪ batch) | **{inc['inc_sec']}** | "
            f"{r['labels']:,} committed labels + batch |",
            f"| full recluster (all pairs ∪ batch, "
            f"{inc['recluster_rounds']} rounds) | "
            f"{inc['recluster_sec']} | "
            f"{r['edges'] + inc['inc_batch_edges']:,} edges |",
            "",
            "- Labels bit-identical both paths (digest-compared) — "
            "the committed labels are a spanning star set, and "
            "connected components are invariant under swapping one "
            "spanning structure for another. The star edges are "
            "depth-1, so the incremental fold converges in a few "
            "rounds regardless of the old pair set's shape; at 100 "
            "TB the pair HISTORY keeps growing while the label table "
            "stays ≤ corpus size — the recluster column is the cost "
            "that stops existing.",
        ]
    lines += [
        "",
        END,
    ]
    block = "\n".join(lines)
    with open(path) as f:
        doc = f.read()
    if BEGIN in doc:
        doc = doc[: doc.index(BEGIN)] + block + doc[doc.index(END) + len(END):]
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(doc)


if __name__ == "__main__":
    sys.exit(main())
