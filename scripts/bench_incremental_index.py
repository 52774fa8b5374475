"""Persisted-index incremental pairing vs full re-pairing, measured.

The claim the persisted indexes (operators/lsh_index.py,
operators/emb_index.py) exist to cash: a periodic crawl should pay
O(batch) per increment, while ``minhash_lsh_pairs`` /
``embedding_near_dup_pairs`` re-band and re-pair the WHOLE corpus —
O(corpus) work that stops existing at 100 TB. This script measures
both paths on the same synthetic corpus and asserts the increment's
pairs equal the full run restricted to new-touching pairs (the
bit-exactness contract the unit tests pin at small n, re-checked here
at bench scale).

Protocol: one corpus of --docs documents (text + embedding, planted
near-dups every 17th/13th id), the last --batch ids arriving as the
new batch. Per modality: time the FULL run over corpus ∪ batch, the
one-off index build over the corpus, then --runs incremental calls
(first = cold: fresh JVM listing + JIT; rest = warm). Spark is warmed
up before any timing (CLAUDE.md rule 5). Embedding banding uses
bits_per_band=20 at bench scale — corpus-sized buckets (STATUS.md
§mixed-modality funnel); the full run uses the identical params, so
equivalence is unaffected.

The merge section splits the text batch into --merges sub-batches and
folds each into the index (one LSM delta per merge — O(batch)), then
compacts once (the explicit O(corpus) fold): the delta design's claim
is merge_sec ≪ build_sec and flat across merges, compact_sec ~
build_sec, and a post-compaction increment still bit-equal.

Run: python scripts/bench_incremental_index.py \
        [--docs 200000] [--batch 5000] [--runs 3] [--merges 4] \
        [--out /tmp/bench_inc_index] [--force]
Prints one JSON line; the table lives in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
NH, NB, JAC_T = 32, 16, 0.4
EMB_BANDS, EMB_BITS, SIM_T = 8, 20, 0.95


def synth(n: int, seed: int = 23) -> pd.DataFrame:
    """(doc_id, text, embedding): 14 words from a 5k vocab (random
    pairs share ~no shingles, so candidates are the planted dups, the
    realistic shape), text dups planted every 17th id, embedding
    near-dups every 13th."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(5000)])
    picks = rng.integers(0, len(vocab), size=(n, 14))
    texts = [" ".join(vocab[row]) + f" tail{i}" for i, row in enumerate(picks)]
    for i in range(30, n, 17):
        texts[i] = texts[i - 30]
    vecs = rng.standard_normal((n, DIM))
    for i in range(24, n, 13):
        vecs[i] = vecs[i - 24] + 1e-4 * rng.standard_normal(DIM)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "embedding": [row.tolist() for row in vecs],
    })


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def pair_set(df, score_col):
    return {(r.id_a, r.id_b, r[score_col]) for r in df.collect()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=5_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--merges", type=int, default=4)
    ap.add_argument("--out", default="/tmp/bench_inc_index")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from o2g_spark.fsutil import reset_scratch_dir
    from o2g_spark.operators import dedup, emb_index, lsh_index, similarity
    from o2g_spark.session import get_spark

    out = reset_scratch_dir(args.out, force=args.force)
    spark = get_spark(app_name="bench_incremental_index")

    pdf = synth(args.docs)
    cut = args.docs - args.batch
    src = os.path.join(out, "docs")
    spark.createDataFrame(pdf).repartition(32).write.parquet(src)
    all_docs = spark.read.parquet(src)
    corpus = all_docs.filter(f"doc_id < {cut}")
    batch = all_docs.filter(f"doc_id >= {cut}")
    all_docs.count()  # warm up JVM + JIT + file listing
    report: dict = {
        "metric": "incremental_index", "unit": "sec",
        "docs": args.docs, "batch": args.batch,
    }

    # ---- text modality -------------------------------------------------
    t_full, full_df = timed(lambda: dedup.minhash_lsh_pairs(
        all_docs, "doc_id", "text", NH, NB, JAC_T))
    t_full += timed(full_df.count)[0]
    base = os.path.join(out, "lsh")
    t_build, _ = timed(lambda: lsh_index.lsh_index_build(
        spark, base, corpus, num_hashes=NH, bands=NB))
    t_inc = []
    for _ in range(args.runs):
        t, inc_df = timed(lambda: lsh_index.minhash_lsh_pairs_incremental(
            spark, base, batch, threshold=JAC_T))
        t += timed(inc_df.count)[0]
        t_inc.append(round(t, 3))
    expected = {p for p in pair_set(full_df, "jaccard")
                if p[0] >= cut or p[1] >= cut}
    got = pair_set(inc_df, "jaccard")
    assert got == expected, (
        f"text increment != full restricted: {len(got)} vs {len(expected)}")
    report["text"] = {
        "full_sec": round(t_full, 3), "build_sec": round(t_build, 3),
        "inc_sec": t_inc, "pairs": len(got),
        "full_pairs": full_df.count(),
    }
    print(json.dumps({"stage": "text", **report["text"]}), flush=True)

    # ---- merge lifecycle (LSM deltas vs O(corpus) rewrite) -------------
    # each merge commits ONE delta — O(batch). The O(corpus) cost is
    # paid only at an explicit compact. The old design re-committed
    # old ∪ new per merge, i.e. ~build_sec per batch; the evidence
    # that the LSM shape fixes it is merge_sec ≪ build_sec and flat
    # across consecutive merges while compact_sec ~ build_sec.
    n_m = args.merges
    sub = max(1, args.batch // n_m)
    t_merge = []
    for i in range(n_m):
        lo, hi = cut + i * sub, cut + (i + 1) * sub
        b = all_docs.filter(f"doc_id >= {lo} AND doc_id < {hi}")
        t, _ = timed(lambda: lsh_index.lsh_index_merge(spark, base, b))
        t_merge.append(round(t, 3))
    t_compact, n_folded = timed(
        lambda: lsh_index.lsh_index_compact(spark, base))
    # post-compaction correctness: a fresh increment over the tail
    # (never merged) must equal the full run restricted to it
    tail = all_docs.filter(f"doc_id >= {cut + n_m * sub}")
    if tail.count():
        inc3 = lsh_index.minhash_lsh_pairs_incremental(
            spark, base, tail, threshold=JAC_T)
        exp3 = {p for p in pair_set(full_df, "jaccard")
                if p[0] >= cut + n_m * sub or p[1] >= cut + n_m * sub}
        assert pair_set(inc3, "jaccard") == exp3, "post-compact mismatch"
    report["merge"] = {
        "merges": n_m, "sub_batch": sub, "merge_sec": t_merge,
        "compact_sec": round(t_compact, 3), "deltas_folded": n_folded,
        "build_sec": round(t_build, 3),
    }
    print(json.dumps({"stage": "merge", **report["merge"]}), flush=True)

    # ---- embedding modality --------------------------------------------
    t_full_e, full_e = timed(lambda: similarity.embedding_near_dup_pairs(
        all_docs, sim_threshold=SIM_T, bands=EMB_BANDS,
        bits_per_band=EMB_BITS, dim=DIM, id_col="doc_id",
        vec_col="embedding"))
    t_full_e += timed(full_e.count)[0]
    base_e = os.path.join(out, "emb")
    t_build_e, _ = timed(lambda: emb_index.emb_index_build(
        spark, base_e, corpus, id_col="doc_id", vec_col="embedding",
        bands=EMB_BANDS, bits_per_band=EMB_BITS, dim=DIM))
    t_inc_e = []
    for _ in range(args.runs):
        t, inc_e = timed(lambda: emb_index.embedding_near_dup_incremental(
            spark, base_e, batch, id_col="doc_id", vec_col="embedding",
            sim_threshold=SIM_T))
        t += timed(inc_e.count)[0]
        t_inc_e.append(round(t, 3))
    expected_e = {p for p in pair_set(full_e, "sim")
                  if p[0] >= cut or p[1] >= cut}
    got_e = pair_set(inc_e, "sim")
    assert got_e == expected_e, (
        f"emb increment != full restricted: {len(got_e)} vs {len(expected_e)}")
    report["embedding"] = {
        "full_sec": round(t_full_e, 3), "build_sec": round(t_build_e, 3),
        "inc_sec": t_inc_e, "pairs": len(got_e),
        "full_pairs": full_e.count(),
    }
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
