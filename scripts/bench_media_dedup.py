"""Perceptual media near-dup at scale (operators/media_dedup.py).

Claims measured:

1. **Planted exactness at 1M images.** Payloads are synthesized
   DISTRIBUTEDLY (mapInPandas over spark.range, no driver bytes) as
   block-constant gray BMPs: each image is an 8×9 grid of constant
   2×2-pixel blocks, so its dHash bits are EXACTLY the pairwise
   comparisons of the chosen block values — ground truth by
   construction, not by re-running the kernel. Every 20th base image
   gets a twin whose leftmost-column blocks are edited to flip an
   exact, known number of comparison bits (leftmost blocks feed
   exactly one comparison each), planting pairs at Hamming 1 and 2.
   The run asserts found == planted as SETS including the hamming
   values (distributed join, no collect). Accidental cross-id pairs
   at Hamming ≤ 2 have expected count ~1e-4 at this scale
   (≈5·10¹¹ pairs × C(64,≤2)/2⁶⁴), so exact equality is the correct
   assertion, not an approximation.

2. **Band-config fan-out** — the corpus-sized-key-space rule made
   visible: (chunks=8, band_chunks=2) = 28 bands / 16-bit keys
   (guaranteed recall ≤ 6) vs (chunks=4, band_chunks=2) = 6 bands /
   32-bit keys (guaranteed recall ≤ 2). At 1M docs the 16-bit key
   space is ~16 docs/bucket → hundreds of millions of candidate
   pairs; the 32-bit space is ~2⁻¹² docs/bucket → candidates ≈
   survivors. Both configs return the identical pair set at
   max_hamming=2; the JSON records candidate_pairs / max_bucket /
   wall seconds for each so the config choice at any corpus size is
   a lookup, not a guess.

3. **Audio symmetry** at --audio-n clips: constant-amplitude frames
   (energy comparisons = amplitude comparisons), 66 frames so all 64
   signature bits are live (shorter clips would share constant-zero
   high bits across the corpus and make accidental collisions
   likely), twins flip exactly bit 0 via frame 0 (it feeds one
   comparison).

4. **Video symmetry** at --video-n clips of 6 block-constant raw-DIB
   AVI frames each (kernels/avi.py): every 20th base gets a twin
   that drops the last frame — frame-set jaccard exactly 5/6 — and
   found == planted as sets including the jaccard values. The rate
   row covers the full decode: 6 real frame unpacks + 6 dHashes per
   payload.

Run: python scripts/bench_media_dedup.py [--n 1000000]
     [--audio-n 200000] [--video-n 100000] [--master local[32]]
One JSON line per measurement to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.operators import media_dedup as M  # noqa: E402
from o2g_spark.operators import multimodal as mm  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

MEDIA_COLS = ["media_id", "url", "kind", "payload", "meta"]

PLANT_EVERY = 20  # every 20th base id gets a near-dup twin


def _image_grid(i: int) -> np.ndarray:
    """Deterministic 8×9 block-value grid for base id i, capped at 250
    so a twin can always raise a value by 1 to invert a comparison."""
    return np.random.default_rng(i).integers(0, 251, size=(8, 9)).astype(np.int64)


def _twin_grid(v: np.ndarray, flips: int) -> np.ndarray:
    """Flip exactly ``flips`` dHash bits: bit (r, 0) compares block
    (r,0) vs (r,1), and column-0 blocks feed no other comparison."""
    v = v.copy()
    for r in range(flips):
        v[r, 0] = v[r, 1] if v[r, 0] > v[r, 1] else v[r, 1] + 1
    return v


def _grid_bmp(v: np.ndarray) -> bytes:
    gray = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1).astype(np.uint8)
    return mm.make_bmp(np.stack([gray] * 3, axis=-1))


def _planted_flips(i: int) -> int:
    return 1 + (i // PLANT_EVERY) % 2  # hamming 1 or 2, deterministic


def _synth_images(spark, n: int):
    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                v = _image_grid(i)
                rows.append((i, f"u{i}", "image", _grid_bmp(v), {}))
                if i % PLANT_EVERY == 0:
                    tv = _twin_grid(v, _planted_flips(i))
                    rows.append((i + n, f"u{i}t", "image", _grid_bmp(tv), {}))
            yield pd.DataFrame(rows, columns=MEDIA_COLS)

    return spark.range(n).mapInPandas(gen, schema=mm.MEDIA_SCHEMA)


AUDIO_FRAMES = 66  # all 64 signature bits live (needs >= 65 frames)
AUDIO_FS = 32  # samples per frame


def _audio_amps(i: int) -> np.ndarray:
    return np.random.default_rng(10**9 + i).integers(
        1, 1000, size=AUDIO_FRAMES
    ).astype(np.int64)


def _amps_wav(a: np.ndarray) -> bytes:
    samples = np.repeat(a, AUDIO_FS).astype(np.int16)
    return mm.make_wav(samples[:, None], 8000)


def _synth_audio(spark, n: int):
    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                a = _audio_amps(i)
                rows.append((i, f"a{i}", "audio", _amps_wav(a), {}))
                if i % PLANT_EVERY == 0:
                    # flip exactly bit 0, the e[1] > e[0] comparison
                    # (NEXT vs PREV — reversed vs the image grid's
                    # left-vs-right): frame 0 feeds no other bit
                    t = a.copy()
                    t[0] = t[1] if t[1] > t[0] else t[1] - 1
                    rows.append((i + n, f"a{i}t", "audio", _amps_wav(t), {}))
            yield pd.DataFrame(rows, columns=MEDIA_COLS)

    return spark.range(n).mapInPandas(gen, schema=mm.MEDIA_SCHEMA)


VIDEO_FRAMES = 6


def _video_payload(i: int, n_frames: int) -> bytes:
    from o2g_spark.kernels.avi import make_avi
    from o2g_spark.operators.video import _grid_frame

    rng = np.random.default_rng(2 * 10**9 + i)
    grids = [rng.integers(0, 251, size=(8, 9)).astype(np.int64)
             for _ in range(n_frames)]
    return make_avi([_grid_frame(g) for g in grids], fps=10)


def _synth_videos(spark, n: int):
    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = _video_payload(i, VIDEO_FRAMES)
                rows.append((i, f"v{i}", "video", payload, {}))
                if i % PLANT_EVERY == 0:
                    # twin: identical frames minus the last one -> the
                    # byte-exact frame chunks re-wrap into a new AVI
                    twin = _video_payload(i, VIDEO_FRAMES - 1)
                    rows.append((i + n, f"v{i}t", "video", twin, {}))
            yield pd.DataFrame(rows, columns=MEDIA_COLS)

    return spark.range(n).mapInPandas(gen, schema=mm.MEDIA_SCHEMA)


def _planted_images_df(spark, n: int):
    return (
        spark.range(0, n, PLANT_EVERY)
        .select(
            F.col("id").alias("id_a"),
            (F.col("id") + n).alias("id_b"),
            (1 + (F.col("id") / PLANT_EVERY).cast("long") % 2)
            .cast("int")
            .alias("hamming"),
        )
    )


def _assert_equal_sets(found, planted) -> dict:
    n_found, n_planted = found.count(), planted.count()
    n_match = found.join(planted, ["id_a", "id_b", "hamming"]).count()
    return {
        "found": n_found,
        "planted": n_planted,
        "exact": bool(n_found == n_planted == n_match),
    }


def _fanout(sig, chunks: int, band_chunks: int) -> dict:
    s = sig.select(F.col("media_id").alias("__id"), F.col("__s").alias("__sig"))
    buckets = (
        M._banded(s, chunks, band_chunks)
        .groupBy(F.col("__b.idx"), F.col("__b.val"))
        .agg(F.count("*").alias("k"))
        .agg(
            F.sum(F.expr("k * (k - 1) / 2")).cast("long").alias("cand"),
            F.max("k").alias("max_bucket"),
        )
        .collect()[0]
    )
    return {"candidate_pairs": int(buckets.cand), "max_bucket": int(buckets.max_bucket)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--audio-n", type=int, default=200_000)
    ap.add_argument("--video-n", type=int, default=100_000)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    spark = get_spark("bench_media_dedup", master=args.master)

    # ---- images
    media = _synth_images(spark, args.n)
    _synth_images(spark, 20_000).count()  # warm Python workers + JIT

    t0 = time.time()
    sig = M.image_dhash(media).select(
        "media_id", F.col("dhash").alias("__s")
    ).filter(F.col("__s").isNotNull())
    sig = sig.persist()
    n_sig = sig.count()
    t_hash = time.time() - t0
    print(json.dumps({
        "op": "image_dhash", "payloads": n_sig,
        "wall_s": round(t_hash, 2), "payloads_per_s": int(n_sig / t_hash),
    }), flush=True)

    planted = _planted_images_df(spark, args.n)
    for chunks, band_chunks in ((8, 2), (4, 2)):
        fan = _fanout(sig, chunks, band_chunks)
        t0 = time.time()
        found = M.image_near_dup_pairs(
            media, max_hamming=2, chunks=chunks, band_chunks=band_chunks
        )
        res = _assert_equal_sets(found, planted)
        dt = time.time() - t0
        print(json.dumps({
            "op": "image_near_dup", "config": f"chunks={chunks},band_chunks={band_chunks}",
            "bands": {8: 28, 4: 6}[chunks], "key_bits": (64 // chunks) * band_chunks,
            "payloads": n_sig, "wall_s": round(dt, 2), **fan, **res,
        }), flush=True)
        assert res["exact"], res
    sig.unpersist()

    # ---- audio
    amedia = _synth_audio(spark, args.audio_n)
    _synth_audio(spark, 5_000).count()
    t0 = time.time()
    found = M.audio_near_dup_pairs(amedia, frame_samples=AUDIO_FS, max_hamming=2)
    aplanted = (
        spark.range(0, args.audio_n, PLANT_EVERY)
        .select(
            F.col("id").alias("id_a"),
            (F.col("id") + args.audio_n).alias("id_b"),
            F.lit(1).cast("int").alias("hamming"),
        )
    )
    res = _assert_equal_sets(found, aplanted)
    dt = time.time() - t0
    n_audio = args.audio_n + args.audio_n // PLANT_EVERY
    print(json.dumps({
        "op": "audio_near_dup", "payloads": n_audio,
        "wall_s": round(dt, 2), "payloads_per_s": int(n_audio / dt), **res,
    }), flush=True)
    assert res["exact"], res

    # ---- video
    from o2g_spark.operators import video as V

    vmedia = _synth_videos(spark, args.video_n)
    _synth_videos(spark, 2_000).count()
    t0 = time.time()
    found = V.video_near_dup_pairs(vmedia, threshold=0.5)
    jac = round((VIDEO_FRAMES - 1) / VIDEO_FRAMES, 6)
    vplanted = (
        spark.range(0, args.video_n, PLANT_EVERY)
        .select(
            F.col("id").alias("id_a"),
            (F.col("id") + args.video_n).alias("id_b"),
            F.lit(jac).alias("jaccard"),
        )
    )
    n_vf, n_vp = found.count(), vplanted.count()
    n_match = found.join(vplanted, ["id_a", "id_b", "jaccard"]).count()
    res = {"found": n_vf, "planted": n_vp,
           "exact": bool(n_vf == n_vp == n_match)}
    dt = time.time() - t0
    n_vid = args.video_n + args.video_n // PLANT_EVERY
    n_frames_total = n_vid * VIDEO_FRAMES - args.video_n // PLANT_EVERY
    print(json.dumps({
        "op": "video_near_dup", "payloads": n_vid,
        "frames_decoded": n_frames_total,
        "wall_s": round(dt, 2), "payloads_per_s": int(n_vid / dt),
        "frames_per_s": int(n_frames_total / dt), **res,
    }), flush=True)
    assert res["exact"], res

    spark.stop()


if __name__ == "__main__":
    main()
