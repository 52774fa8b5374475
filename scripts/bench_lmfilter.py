"""Model-based quality filtering at crawl scale (round-5 evidence for
operators/lmfilter.py + operators/semdedup.py).

Claims measured (inputs synthesized deterministically in Spark):

1. lm_train + lm_score: 2M docs, model trained on the clean hash half
   (~2M+ bigram types — the model-side shuffle join is real, not a
   broadcast toy); every planted gibberish doc (unique OOV tokens)
   scores strictly worse than every clean doc (min-junk > max-clean,
   checked exactly in one aggregation pass).
2. dsir_logweights: 2M raw docs vs a 200k-doc target corpus on a
   disjoint theme; every on-theme raw doc outweighs every off-theme
   one (exact separation), both model tables bounded at 8192 buckets.
3. semdedup: 200k vectors (dim 64) in ~400 coarse clusters with 2k
   planted EXACT duplicate vectors; total pairwise work is confined
   to Σ|cluster|² (reported), every planted copy drops at the 0.999
   threshold and nothing else does.

Run:  python scripts/bench_lmfilter.py [--scale 1.0] [--master local[32]]
JSON line per op to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.operators import corpus as corpus_ops  # noqa: E402
from o2g_spark.operators import lmfilter, semdedup  # noqa: E402
from o2g_spark.operators.similarity import ivf_train_centroids  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()

THEME_B = ("red orange yellow green blue indigo violet black white "
           "gray pink brown teal cyan magenta olive navy maroon lime "
           "silver").split()


def _sentence(i_col, words, n=16):
    """~n-word pseudo-random body from the doc id (pure column)."""
    parts = [
        F.element_at(
            F.array(*[F.lit(w) for w in words]),
            ((i_col * (7 + k) + k * k) % len(words) + 1).cast("int"),
        )
        for k in range(n)
    ]
    return F.concat_ws(" ", *parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    spark = get_spark("bench_lmfilter", master=args.master)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    # --------------------------------------------------- lm train+score
    # every 50th doc is gibberish (unique tokens -> fully OOV); the
    # clean body carries a per-doc unique tail token so the trained
    # model has O(n_docs) bigram types — the count-table join is a
    # real shuffle join at this size, not a broadcast toy
    n_docs = int(2_000_000 * args.scale)
    junk_every = 50
    i = F.col("id")
    docs = spark.range(n_docs).select(
        i.alias("doc_id"),
        F.when(
            i % junk_every == 0,
            F.concat_ws(
                " ",
                *[F.concat(F.lit(f"zq{k}x"), i.cast("string"))
                  for k in range(12)],
            ),
        ).otherwise(
            F.concat_ws(
                " ",
                _sentence(i, WORDS),
                F.concat(F.lit("tail"), i.cast("string")),
            )
        ).alias("text"),
    )
    train = docs.where(
        (i % junk_every != 0)
        & (corpus_ops.hash_bucket_micro("doc_id", "lmbench") < 500_000)
    )
    # warmup (JIT + python workers)
    lmfilter.lm_score(
        train.limit(20_000), docs.limit(20_000), "doc_id", "text"
    ).agg(F.count(F.lit(1))).collect()

    t0 = time.time()
    model_rows = lmfilter.lm_train(train, "doc_id", "text").count()
    dt_train = time.time() - t0

    scores = lmfilter.lm_score(train, docs, "doc_id", "text")
    t0 = time.time()
    agg = scores.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.when(F.col("doc_id") % junk_every == 0,
                     F.col("nll_per_tok"))).alias("junk_min"),
        F.max(F.when(F.col("doc_id") % junk_every != 0,
                     F.col("nll_per_tok"))).alias("clean_max"),
    ).collect()[0]
    dt = time.time() - t0
    emit(op="lm_score", docs=n_docs, model_bigrams=model_rows,
         train_wall_s=round(dt_train, 2), score_wall_s=round(dt, 2),
         docs_per_s=int(n_docs / dt),
         junk_min=round(float(agg.junk_min), 4),
         clean_max=round(float(agg.clean_max), 4),
         exact=(agg.n == n_docs and agg.junk_min > agg.clean_max))

    # ------------------------------------------------------------- dsir
    # raw = 2M docs alternating theme A / theme B; target = 200k docs
    # of theme A only (disjoint id space so self-counts don't dominate)
    n_raw = int(2_000_000 * args.scale)
    n_tgt = int(200_000 * args.scale)
    raw = spark.range(n_raw).select(
        i.alias("doc_id"),
        F.when(i % 2 == 0, _sentence(i, WORDS))
        .otherwise(_sentence(i, THEME_B)).alias("text"),
    )
    target = spark.range(n_tgt).select(
        (i + 10_000_000).alias("doc_id"),
        _sentence(i * 31 + 7, WORDS).alias("text"),
    )
    lmfilter.dsir_logweights(
        raw.limit(20_000), target.limit(20_000), "doc_id", "text"
    ).agg(F.count(F.lit(1))).collect()
    t0 = time.time()
    agg2 = lmfilter.dsir_logweights(raw, target, "doc_id", "text").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.when(F.col("doc_id") % 2 == 0, F.col("logw"))).alias("a_min"),
        F.max(F.when(F.col("doc_id") % 2 != 0, F.col("logw"))).alias("b_max"),
    ).collect()[0]
    dt = time.time() - t0
    emit(op="dsir_logweights", raw_docs=n_raw, target_docs=n_tgt,
         wall_s=round(dt, 2), docs_per_s=int(n_raw / dt),
         on_theme_min=round(float(agg2.a_min), 4),
         off_theme_max=round(float(agg2.b_max), 4),
         exact=(agg2.n == n_raw and agg2.a_min > agg2.b_max))

    # --------------------------------------------------------- semdedup
    # ~400 natural groups of noisy vectors around hash-derived centers;
    # planted EXACT copies (ids >= n_vec mirror id-n_vec) must all drop
    # at threshold .999 and nothing else (organic noise sims stay far
    # below). Work bound: Sigma |cluster|^2 pairs, reported.
    n_vec = int(200_000 * args.scale)
    n_cl = 400
    dup_every = 100
    dim = 64

    def _vec(idc):
        # noise must be Murmur3-mixed per (id, dim): an affine
        # (id*A + j*B) % p has a CONSTANT modular offset across j for
        # any two ids, so same-cluster pairs whose id-difference maps
        # to a small residue become organic 0.999+ near-dups (first
        # run of this bench: 196k dropped vs 2k planted)
        g = idc % n_cl
        comps = []
        for j in range(dim):
            center = ((g * 2654435761 + j * 40503) % 1009) / 1009.0 - 0.5
            noise = (F.pmod(F.hash(idc, F.lit(j)), F.lit(1013))
                     / F.lit(1013.0) - F.lit(0.5))
            comps.append((F.lit(2.0) * F.lit(center).cast("double")
                          + noise.cast("double") * F.lit(0.6)).cast("float"))
        return F.array(*comps)

    base = spark.range(n_vec).select(
        i.alias("vec_id"), _vec(i).alias("embedding"))
    copies = spark.range(0, n_vec, dup_every).select(
        (i + n_vec).alias("vec_id"), _vec(i).alias("embedding"))
    emb = base.unionByName(copies)
    n_planted = (n_vec + dup_every - 1) // dup_every

    cent = ivf_train_centroids(base, n_centroids=n_cl)
    verdicts = semdedup.semdedup(
        emb, threshold=0.999, centroids=cent, max_cluster_rows=50_000)
    verdicts.limit(1).collect()  # warmup compile path only
    t0 = time.time()
    agg3 = verdicts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("keep") == 0, 1).otherwise(0)).alias("dropped"),
        F.sum(F.when((F.col("keep") == 0) & (F.col("vec_id") >= n_vec), 1)
              .otherwise(0)).alias("dropped_planted"),
    ).collect()[0]
    dt = time.time() - t0
    sizes = verdicts.groupBy("cluster").count()
    pair_work = sizes.agg(
        F.sum(F.col("count") * F.col("count")).alias("p")).collect()[0].p
    emit(op="semdedup", vectors=n_vec + n_planted, clusters=n_cl,
         planted=n_planted, wall_s=round(dt, 2),
         vecs_per_s=int((n_vec + n_planted) / dt),
         pair_work=int(pair_work),
         dropped=int(agg3.dropped),
         exact=(agg3.n == n_vec + n_planted
                and agg3.dropped == n_planted
                and agg3.dropped_planted == n_planted))

    spark.stop()


if __name__ == "__main__":
    main()
