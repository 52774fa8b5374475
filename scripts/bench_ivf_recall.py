"""IVF recall@k vs nprobe curve (round-4 evidence, VERDICT r3 #6).

The gate pins ann_ivf correctness at ONE setting (nprobe=3); this
script documents the recall/cost TRADE a user actually tunes: for
nprobe in 1,2,4,8 measure recall@k against the exact brute-force
cosine top-k and the warm wall time, on

  - the sf0.1 embeddings table (the gate corpus, 2k × 64d), and
  - a deterministic synthetic clustered corpus (--synth N, default
    200k × 64d) where bucket pruning actually pays — at 2k vectors
    every strategy is sub-second, so only the big corpus separates
    the cost axis.

Prints JSON lines plus a ready-to-paste markdown table; the table is
recorded in STATUS.md next to the ANN (IVF) row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from o2g_spark.operators import similarity  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402


def synth_corpus(spark, n: int, dim: int = 64, clusters: int = 64,
                 seed: int = 9):
    """Clustered unit vectors: cluster centers + gaussian jitter, built
    driver-side in numpy then parallelized (bounded: n ≤ ~1M here; the
    curve needs a fixed corpus, not a scale record)."""
    rng = np.random.default_rng(seed)
    cent = rng.normal(size=(clusters, dim))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    assign = rng.integers(0, clusters, size=n)
    vecs = cent[assign] + 0.25 * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(int(i), vecs[i].astype(float).tolist()) for i in range(n)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    return spark.createDataFrame(rows, schema).repartition(32)


def topk_sets(df, k: int) -> dict:
    out: dict = {}
    for r in df.filter(F.col("sim_rank") <= k).collect():
        out.setdefault(r[0], set()).add(r[1])
    return out


def run_curve(spark, corpus, label: str, k: int, n_queries: int,
              n_centroids: int):
    queries = (
        corpus.orderBy("vec_id").limit(n_queries)
        .select(F.col("vec_id").alias("qid"), "embedding")
        .localCheckpoint(eager=True)
    )
    corpus = corpus.localCheckpoint(eager=True)
    exact = topk_sets(
        similarity.cosine_topk(corpus, queries, k=k), k
    )
    rows = []
    for nprobe in (1, 2, 4, 8):
        # warm-up then timed run (JIT + Arrow worker spin-up otherwise
        # lands on nprobe=1's number)
        for timed in (False, True):
            t0 = time.time()
            got = similarity.ann_ivf_topk(
                corpus, queries, k=k, n_centroids=n_centroids,
                nprobe=nprobe,
            )
            sets = topk_sets(got, k)
            dt = time.time() - t0
        recs = [
            len(sets.get(q, set()) & exact[q]) / len(exact[q])
            for q in exact
        ]
        rows.append({
            "corpus": label, "nprobe": nprobe,
            "recall_at_k": round(float(np.mean(recs)), 4),
            "sec": round(dt, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--synth", type=int, default=200_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    spark = get_spark("bench-ivf-recall", master=args.master)
    all_rows = []
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    all_rows += run_curve(spark, emb, f"sf0.1 ({emb.count()}x64)",
                          args.k, args.queries, n_centroids=16)
    if args.synth:
        big = synth_corpus(spark, args.synth)
        all_rows += run_curve(
            spark, big, f"synth ({args.synth // 1000}k x64)",
            args.k, args.queries, n_centroids=64,
        )

    print("\n| corpus | nprobe | recall@%d | warm sec |" % args.k)
    print("|---|---|---|---|")
    for r in all_rows:
        print(f"| {r['corpus']} | {r['nprobe']} | {r['recall_at_k']} "
              f"| {r['sec']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
