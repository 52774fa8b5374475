"""Multimodal decode family at scale (round-5 evidence for
operators/multimodal.py): the mapInPandas decode path over REAL
payload bytes — BMP, PNG (real zlib, all five filters), GIF (canonical
literal-LZW and real compressed streams alternating), baseline JPEG
(real Huffman entropy decode + IDCT, 1/4 with restart markers), and
PCM16 WAV.

Claims measured:

1. Payloads are SYNTHESIZED DISTRIBUTEDLY (mapInPandas over
   spark.range — no driver-side byte building, the shape a 100-TB
   media crawl has) with per-id deterministic pixel/sample content.
2. decode_images / audio_features recover PLANTED truth exactly on
   EVERY row — the planted value is pure column math from media_id
   (images: channel-0 constant; wav: id-derived frame count), so the
   check is a conditional aggregate with no extra join or synth pass.
3. Throughput is reported per format so the stand-in-free decode cost
   is a recorded number, not an assumption. The timed pipeline is
   synth→decode fused (one mapInPandas feeding another, no
   materialization), so the rate is a LOWER bound on pure decode
   throughput — the honest shape, since a real run pays a read that
   the synth stands in for.

Run:  python scripts/bench_multimodal.py [--n 1000000] [--master local[32]]
JSON line per format to stdout.
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

from o2g_spark.operators import multimodal as mm  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

MEDIA_COLS = ["media_id", "url", "kind", "payload", "meta"]


_lzw_encode = mm.lzw_encode_reference


def _gif_compressed(idx: np.ndarray, palette: np.ndarray) -> bytes:
    h, w = idx.shape
    stream = _lzw_encode(idx.reshape(-1).tobytes(), 8)
    blocks = bytearray()
    for g in range(0, len(stream), 255):
        chunk = stream[g : g + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0xF7, 0, 0]) + palette.astype(np.uint8).tobytes()
            + b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little")
            + h.to_bytes(2, "little") + b"\x00" + bytes([8])
            + bytes(blocks) + b"\x3b")


def _make_payload(kind: str, i: int) -> bytes:
    """Deterministic payload for media_id i. Planted truths (pure
    column math downstream): bmp/png/jpeg channel-0 = i %% 251; gif
    channel-0 = (2*i) %% 256; wav frame count = 200 + i %% 800."""
    w, h = 16 + i % 17, 12 + i % 13
    if kind in ("bmp", "png"):
        rgb = np.empty((h, w, 3), dtype=np.uint8)
        rgb[..., 0] = i % 251
        rgb[..., 1] = (i * 7) % 256
        rgb[..., 2] = (i * 13) % 256
        if kind == "bmp":
            return mm.make_bmp(rgb, top_down=(i % 5 == 0))
        return mm.make_png(rgb, filter_type=i % 5, stored=False)
    if kind in ("jpeg", "jpeg_prog"):
        from o2g_spark.kernels import jpeg as J

        rgb = np.empty((h, w, 3), dtype=np.uint8)
        rgb[..., 0] = i % 251
        rgb[..., 1] = (i * 7) % 256
        rgb[..., 2] = (i * 13) % 256
        if kind == "jpeg_prog":
            return J.make_progressive_jpeg(
                rgb, quality=90, subsample=(i % 3 == 0),
                spectral_only=(i % 2 == 0))
        return J.make_jpeg(rgb, quality=90,
                           restart_interval=(3 if i % 4 == 0 else 0),
                           subsample=(i % 3 == 0))
    if kind == "gif":
        pal = np.zeros((256, 3), dtype=np.uint8)
        # pal[j, 0] = (j - i) mod 256  →  pal[(3i)%256, 0] = (2i)%256
        pal[:, 0] = np.roll(np.arange(256, dtype=np.uint8), i % 256)
        pal[:, 1] = (i * 7) % 256
        pal[:, 2] = (i * 13) % 256
        idx = np.full((h, w), (i * 3) % 256, dtype=np.uint8)
        if i % 2 == 0:
            return mm.make_gif(idx, pal)  # canonical literal-only LZW
        return _gif_compressed(idx, pal)  # real compressed stream
    n = 200 + i % 800
    t = np.arange(n, dtype=np.int64)
    samples = ((t * (3 + i % 11)) % 4096 - 2048).astype(np.int16)
    return mm.make_wav(samples[:, None], 8000)


def _synth(spark, kind: str, n: int):
    media_kind = "audio" if kind == "wav" else "image"

    def gen(it):
        for pdf in it:
            rows = [
                (int(i), f"u{int(i)}", media_kind,
                 _make_payload(kind, int(i)), {})
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=MEDIA_COLS)

    return spark.range(n).mapInPandas(gen, schema=mm.MEDIA_SCHEMA)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    spark = get_spark("bench_multimodal", master=args.master)

    for kind in ("bmp", "png", "gif", "jpeg", "jpeg_prog", "wav"):
        # JPEG entropy-decodes block-by-block in Python (the honest
        # cost of a real Huffman stream without libjpeg) — bench it at
        # a tenth of the lossless formats' row count
        n = args.n // 10 if kind.startswith("jpeg") else args.n
        media = _synth(spark, kind, n)
        if kind == "wav":
            out = mm.audio_features(media)
            # duration_ms = frames * 1000 // 8000 = frames // 8
            planted = (200 + F.pmod(F.col("media_id"), F.lit(800))) / 8
            cond = F.col("duration_ms") == planted.cast("long")
        else:
            out = mm.decode_images(media)
            if kind == "gif":
                planted = F.pmod(2 * F.col("media_id"), F.lit(256))
            else:
                planted = F.pmod(F.col("media_id"), F.lit(251))
            # lossless formats must hit the planted constant exactly;
            # JPEG is lossy — flat-block DC quant + YCbCr round-trip
            # bounds the channel mean within ±2.5/255
            tol = 2.5 / 255.0 if kind.startswith("jpeg") else 1e-6
            cond = (
                F.abs(F.element_at("feature", 1) - planted / F.lit(255.0))
                < tol
            ) & (F.col("width") == 16 + F.pmod(F.col("media_id"), F.lit(17)))
        # warm the Python workers + JIT on a small slice
        warm = _synth(spark, kind, 20_000)
        (mm.audio_features(warm) if kind == "wav"
         else mm.decode_images(warm)).count()
        t0 = time.time()
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cond.cast("long")).alias("ok"),
        ).collect()[0]
        dt = time.time() - t0
        print(json.dumps({
            "op": f"decode_{kind}", "payloads": n, "wall_s": round(dt, 2),
            "payloads_per_s": int(n / dt),
            "exact": bool(agg.n == n and agg.ok == n),
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
