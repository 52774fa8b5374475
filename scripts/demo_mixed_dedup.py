"""End-to-end mixed-modality dedup funnel demo (r4 VERDICT #6).

Each piece is gate-checked alone; this script evidences the COMPOSED
100-TB shape over one synthetic crawl: both bounded-state streaming
candidate funnels feeding their batch verifiers, with planted
cross-batch duplicates and end-to-end precision/recall reported.

    crawl (docs with text + embedding + image + video, stream)
      ├─ near_dup_candidates_stream (minhash-LSH, text)    ─┐
      ├─ near_dup_embedding_stream (hyperplane, vectors)    ├─ candidate
      ├─ near_dup_media_stream (integer dHash, payloads)    │  pairs
      └─ near_dup_video_stream (frame dHashes, AVI clips)  ─┘
                               │
              batch verify: n-gram Jaccard ≥ τ_text (exact string
              shingles) / cosine ≥ τ_emb (exact dot product) /
              bit_count(xor) ≤ h_media (exact dHash hamming) /
              frame-set Jaccard ≥ τ_video (exact hash sets)
                               │
              verified duplicate pairs vs the PLANTED ground truth

Planted shapes (all cross-batch — pair members land in different
stream files, so every catch exercises the stateful cross-batch
machinery, not within-batch pairing):
  - text dups: identical text, fresh embedding (same-page re-crawl)
  - embedding dups: near-identical vector (cos ≥ ~0.99), fresh text
    (the "paraphrase/translation" proxy — text-invisible)
  - both-modality dups: identical text AND near-identical vector
  - media dups: near-identical image payload (1-2 dHash bits), fresh
    text AND fresh embedding — invisible to the other two funnels
  - video dups: same clip minus its last frame (frame-set jaccard
    exactly 5/6), everything else fresh — video-only visible

Run: python scripts/demo_mixed_dedup.py [--docs 20000] [--files 16]
         [--out /tmp/mixed_dedup]
Prints one JSON line per stage + the summary table recorded in
STATUS.md §mixed-modality funnel.
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

BASE_MS = 1_717_243_200_000  # 2024-06-01T12:00:00Z, pinned
DIM = 64
SIM_T = 0.95
JAC_T = 0.5
HAM_T = 6
VJAC_T = 0.5
V_FRAMES = 6


def _grid_bmp(v):
    from o2g_spark.operators.multimodal import make_bmp

    gray = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1).astype(np.uint8)
    return make_bmp(np.stack([gray] * 3, axis=-1))


def _clip(grids) -> bytes:
    from o2g_spark.operators.video import _grid_frame, make_avi

    return make_avi([_grid_frame(g) for g in grids], fps=10)


def synth_crawl(n: int, seed: int = 17):
    """Docs with (doc_id, text, embedding, payload, video, ts);
    returns (pdf, planted) where planted maps pair → modality in
    {text, emb, both, media, video}. Dup members sit ~n/10 positions
    apart (different files for any files ≥ 4), inside the
    idle-timeout horizon."""
    rng = np.random.default_rng(seed)
    words = np.array(
        "crawl spark tile cell union page shard route vector raster "
        "index hash band state join query stream batch delta frame "
        "anchor render beacon cursor margin packet socket tensor".split()
    )
    texts = [
        " ".join(rng.choice(words, size=14, replace=True)) + f" tail{i}"
        for i in range(n)
    ]
    vecs = rng.standard_normal((n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # block-constant image payloads: dHash bits are exactly the block
    # comparisons, so a media twin's hamming is controlled, not hoped
    grids = [rng.integers(0, 251, size=(8, 9)).astype(np.int64)
             for _ in range(n)]
    # per-doc video clips: V_FRAMES block-constant raw-DIB frames —
    # every frame dHash is ground truth by construction
    vgrids = [
        [rng.integers(0, 251, size=(8, 9)).astype(np.int64)
         for _ in range(V_FRAMES)]
        for _ in range(n)
    ]
    gap = n // 10
    planted: dict[tuple[str, str], str] = {}

    def pid(i: int) -> str:
        return f"d{i:07d}"

    for i in range(gap, n, 97):       # text dups
        texts[i] = texts[i - gap]
        planted[(pid(i - gap), pid(i))] = "text"
    for i in range(gap + 13, n, 89):  # embedding dups (text-invisible)
        if (pid(i - gap), pid(i)) in planted:
            continue
        v = vecs[i - gap] + 0.02 * rng.standard_normal(DIM)
        vecs[i] = v / np.linalg.norm(v)
        planted[(pid(i - gap), pid(i))] = "emb"
    for i in range(gap + 29, n, 83):  # both modalities
        key = (pid(i - gap), pid(i))
        if key in planted:
            continue
        texts[i] = texts[i - gap]
        v = vecs[i - gap] + 0.01 * rng.standard_normal(DIM)
        vecs[i] = v / np.linalg.norm(v)
        planted[key] = "both"
    for i in range(gap + 41, n, 79):  # media dups (image-only visible)
        key = (pid(i - gap), pid(i))
        if key in planted:
            continue
        t = grids[i - gap].copy()
        for r in range(1 + i % 2):    # flip exactly 1-2 dHash bits
            t[r, 0] = t[r, 1] if t[r, 0] > t[r, 1] else t[r, 1] + 1
        grids[i] = t
        planted[key] = "media"
    for i in range(gap + 53, n, 73):  # video dups (video-only visible)
        key = (pid(i - gap), pid(i))
        if key in planted:
            continue
        # same clip minus the last frame: frame-set jaccard exactly
        # (V_FRAMES-1)/V_FRAMES; text/embedding/image stay fresh
        vgrids[i] = [g.copy() for g in vgrids[i - gap][:-1]]
        planted[key] = "video"
    pdf = pd.DataFrame({
        "doc_id": [pid(i) for i in range(n)],
        "text": texts,
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
        "payload": [_grid_bmp(g) for g in grids],
        "video": [_clip(g) for g in vgrids],
        "ts": pd.to_datetime(BASE_MS + np.arange(n, dtype=np.int64) * 500,
                             unit="ms"),
    })
    return pdf, planted


def write_files(pdf: pd.DataFrame, n_files: int, out: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    schema = pa.schema([
        pa.field("doc_id", pa.string()),
        pa.field("text", pa.string()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("payload", pa.binary()),
        pa.field("video", pa.binary()),
        pa.field("ts", pa.timestamp("us")),
    ])
    per = len(pdf) // n_files
    for i in range(n_files):
        sl = pdf.iloc[i * per: len(pdf) if i == n_files - 1 else (i + 1) * per]
        tbl = pa.Table.from_pandas(sl, schema=schema, preserve_index=False)
        f = os.path.join(out, f"part_{i:04d}.parquet")
        pq.write_table(tbl, f)
        os.utime(f, times=(1_000_000 + i, 1_000_000 + i))


def drain_to_memory(spark, out, name: str, settle_s: float = 6.0):
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    q.processAllAvailable()
    # idle-settle: eviction rows land in watermark-advance no-data
    # batches that processAllAvailable can miss
    deadline = time.time() + 120
    last = -1
    stable = None
    while time.time() < deadline:
        n = spark.sql(f"SELECT count(*) c FROM {name}").collect()[0]["c"]
        if n == last:
            if stable is None:
                stable = time.time()
            elif time.time() - stable >= settle_s:
                break
        else:
            stable = None
            last = n
        time.sleep(1)
    q.stop()
    return spark.sql(f"SELECT DISTINCT id_a, id_b FROM {name}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--out", default="/tmp/mixed_dedup")
    ap.add_argument("--master", default="local[16]")
    # bucket width must be CORPUS-SIZED: b bits = 2^b buckets/band, and
    # an unrelated doc claims a bucket's canonical slot at rate n/2^b
    # per band — at 12 bits and 20k docs that cost 55%% of the
    # embedding-only recall (the (canon,x) link fails cosine verify, so
    # the cluster never connects). Rule of thumb: 2^b >= ~50*n.
    ap.add_argument("--bits-per-band", type=int, default=20)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from o2g_spark.fsutil import reset_scratch_dir
    from o2g_spark.functions import text as X
    from o2g_spark.operators.similarity import cosine
    from o2g_spark.session import get_spark
    from o2g_spark.streaming import stateful

    reset_scratch_dir(args.out, force=args.force)
    pdf, planted = synth_crawl(args.docs)
    src = os.path.join(args.out, "src")
    write_files(pdf, args.files, src)
    n_text = sum(1 for m in planted.values() if m in ("text", "both"))
    n_emb = sum(1 for m in planted.values() if m in ("emb", "both"))
    n_media = sum(1 for m in planted.values() if m == "media")
    n_video = sum(1 for m in planted.values() if m == "video")
    print(json.dumps({"stage": "synth", "docs": args.docs,
                      "planted": len(planted), "planted_text_visible": n_text,
                      "planted_emb_visible": n_emb,
                      "planted_media_visible": n_media,
                      "planted_video_visible": n_video}), flush=True)

    spark = get_spark("mixed-dedup-demo", master=args.master,
                      shuffle_partitions=8)
    schema = ("doc_id string, text string, embedding array<float>, "
              "payload binary, video binary, ts timestamp")

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 2).parquet(src))

    # ---- candidate funnels (bounded state, event time, sharded)
    t0 = time.time()
    cand_text = drain_to_memory(
        spark,
        stateful.near_dup_candidates_stream(
            stream(), timeout_ms=86_400_000, watermark="1 minute"),
        "cand_text",
    ).localCheckpoint()
    n_cand_text = cand_text.count()
    t_text = time.time() - t0
    t0 = time.time()
    cand_emb = drain_to_memory(
        spark,
        stateful.near_dup_embedding_stream(
            stream(), dim=DIM, id_col="doc_id", timeout_ms=86_400_000,
            watermark="1 minute", bits_per_band=args.bits_per_band),
        "cand_emb",
    ).localCheckpoint()
    n_cand_emb = cand_emb.count()
    t_emb = time.time() - t0
    t0 = time.time()
    cand_media = drain_to_memory(
        spark,
        stateful.near_dup_media_stream(
            stream(), kind="image", id_col="doc_id",
            timeout_ms=86_400_000, watermark="1 minute"),
        "cand_media",
    ).localCheckpoint()
    n_cand_media = cand_media.count()
    t_media = time.time() - t0
    t0 = time.time()
    cand_video = drain_to_memory(
        spark,
        stateful.near_dup_video_stream(
            stream(), id_col="doc_id", payload_col="video",
            timeout_ms=86_400_000, watermark="1 minute"),
        "cand_video",
    ).localCheckpoint()
    n_cand_video = cand_video.count()
    t_video = time.time() - t0
    print(json.dumps({"stage": "funnels", "cand_text": int(n_cand_text),
                      "cand_emb": int(n_cand_emb),
                      "cand_media": int(n_cand_media),
                      "cand_video": int(n_cand_video),
                      "sec_text": round(t_text, 1),
                      "sec_emb": round(t_emb, 1),
                      "sec_media": round(t_media, 1),
                      "sec_video": round(t_video, 1)}), flush=True)

    # ---- batch verification over the UNION of candidates
    from o2g_spark.operators.media_dedup import media_signature_udf
    from o2g_spark.operators.video import video_frame_dhash_udf

    docs = spark.read.parquet(src)
    sh = docs.select(
        F.col("doc_id").alias("__id"),
        X.shingles("text", 3).alias("__sh"),
        F.col("embedding").alias("__v"),
        media_signature_udf("image")(F.col("payload")).alias("__sig"),
        video_frame_dhash_udf()(F.col("video")).alias("__fh"),
    ).localCheckpoint()
    cands = (cand_text.unionByName(cand_emb).unionByName(cand_media)
             .unionByName(cand_video).distinct())
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"),
                  F.col("__v").alias("v_a"), F.col("__sig").alias("s_a"),
                  F.col("__fh").alias("fh_a"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"),
                  F.col("__v").alias("v_b"), F.col("__sig").alias("s_b"),
                  F.col("__fh").alias("fh_b"))
    scored = (
        cands.join(a, "id_a").join(b, "id_b")
        .withColumn("jac", F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
        .withColumn("ham", F.coalesce(
            F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b"))), F.lit(64)))
        .withColumn("vjac", F.coalesce(
            F.size(F.array_intersect("fh_a", "fh_b"))
            / F.size(F.array_union("fh_a", "fh_b")), F.lit(0.0)))
        .withColumn("verified",
                    (F.col("jac") >= JAC_T) | (F.col("cos") >= SIM_T)
                    | (F.col("ham") <= HAM_T) | (F.col("vjac") >= VJAC_T))
    )
    # ONE collect derives both the verified set and the scored count —
    # a separate scored.count() would re-execute the double join +
    # shingle/cosine scoring, the demo's most expensive batch stage
    scored_rows = scored.select("id_a", "id_b", "verified").collect()
    verified = {(r.id_a, r.id_b) for r in scored_rows if r.verified}
    n_pairs_scored = len(scored_rows)

    planted_set = set(planted)
    tp = verified & planted_set
    recall = len(tp) / len(planted_set)
    precision = len(tp) / max(len(verified), 1)

    # CLUSTER recall — the metric the dedup semantics actually promise:
    # the streaming funnel pairs each arrival with its bucket's
    # CANONICAL doc, so a planted pair whose bucket was first claimed
    # by a colliding third doc surfaces as (canon,a)+(canon,b), not
    # (a,b). Union-find over the verified pairs (bounded by |verified|)
    # recovers the duplicate clusters; a planted pair is CAUGHT when
    # both members land in one cluster.
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in verified:
        parent[find(x)] = find(y)
    caught = {p for p in planted_set if find(p[0]) == find(p[1])}
    cluster_recall = len(caught) / len(planted_set)
    by_mod = {m: sum(1 for p, mm in planted.items()
                     if mm == m and p in caught)
              for m in ("text", "emb", "both", "media", "video")}
    tot_mod = {m: sum(1 for mm in planted.values() if mm == m)
               for m in ("text", "emb", "both", "media", "video")}
    out = {
        "stage": "verdict", "planted": len(planted_set),
        "candidate_pairs": int(n_pairs_scored),
        "verified": len(verified), "true_positive_pairs": len(tp),
        "pair_precision": round(precision, 4),
        "pair_recall": round(recall, 4),
        "cluster_recall": round(cluster_recall, 4),
        "cluster_recall_by_modality": {
            m: f"{by_mod[m]}/{tot_mod[m]}" for m in by_mod},
    }
    print(json.dumps(out), flush=True)
    print(f"| {args.docs:,} | {len(planted_set)} | {n_cand_text:,} / "
          f"{n_cand_emb:,} / {n_cand_media:,} / {n_cand_video:,} | "
          f"{n_pairs_scored:,} | "
          f"{len(verified)} | {precision:.3f} | {recall:.3f} | "
          f"{cluster_recall:.3f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
