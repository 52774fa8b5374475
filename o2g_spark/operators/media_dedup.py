"""Perceptual near-dup detection for decoded media (images + audio).

Closes the last modality gap in the dedup family: text near-dups go
through minhash-LSH (operators/dedup.py), embeddings through
hyperplane banding (operators/similarity.py) — this module gives
IMAGES an integer difference-hash (dHash) computed from the real
raster decoders (multimodal.try_decode_bmp/png/gif + kernels/jpeg)
and AUDIO an integer frame-energy fingerprint over the real WAV
decoder, both paired by exact pigeonhole banding over chunk
COMBINATIONS: with ``chunks`` equal slices of the 64-bit fingerprint
and bands of ``band_chunks`` slices each, any pair within Hamming ≤
chunks − band_chunks has at least ``band_chunks`` undamaged slices
and therefore shares at least one full band key — guaranteed recall,
and the verify is a single ``bit_count(xor)``.

Why combinations and not single chunks (the simhash_pairs shape): a
single 8-bit chunk has a 256-value key space, so at corpus scale
every bucket degenerates to ~n/256 members and the band join goes
quadratic — the corpus-sized-bucket-width lesson from the embedding
stream (STATUS.md §mixed-modality funnel). Combining ``band_chunks``
slices per band key multiplies the key space 2^bits× per extra slice
at the cost of one unit of Hamming tolerance each — and the key
space must be CORPUS-SIZED (2^(band_chunks·bits) ≥ ~50× docs, the
CLAUDE.md rule-11 bound): the default (chunks=8, band_chunks=2) gives
C(8,2)=28 bands over 16-bit keys and guaranteed recall at Hamming ≤
6, right up to ~1M docs; at web scale run (chunks=4, band_chunks=2)
— C(4,2)=6 bands over 32-bit keys, Hamming ≤ 2, expected bucket size
< 1 into the billions (scripts/bench_media_dedup.py measures the
candidate fan-out of both at 1M planted images).

Everything is INTEGER-exact end to end — luma = 299R + 587G + 114B,
block means compared by cross-multiplication (no division), frame
energies as int64 sums of squares — so the DuckDB gate twins
(__spark_entry__.py) re-derive the fingerprints from payload hex
alone: a value-hash match proves the perceptual hash is physically
computed from decoded pixels/samples, not a digest stand-in.

Graft lineage: the o2g reference has no media path (SURVEY.md §2.A);
these are training-data-pipeline ops in the multimodal family
(SURVEY.md §2, LLM-pipeline table).
"""

from __future__ import annotations

from itertools import combinations
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import cache_latest
from .multimodal import (
    MEDIA_SCHEMA,
    _try_decode_raster,
    make_bmp,
    make_png,
    make_wav,
    try_decode_wav,
)

# dHash samples an 8-row × 9-column block grid; 8 comparisons per row
# between horizontally adjacent block means → 64 bits.
GRID_H = 8
GRID_W = 9


# ----------------------------------------------------------- kernels


def dhash_from_rgb(rgb: np.ndarray) -> int | None:
    """64-bit integer dHash of an (h, w, 3) uint8 RGB array.

    Integer-exact pipeline: per-pixel luma ``299R + 587G + 114B``
    (int64, no division), block partition ``gy = y*8//h, gx = x*9//w``
    (every cell non-empty when h ≥ 8 and w ≥ 9), and the classic
    adjacent-mean comparison done by CROSS-MULTIPLICATION —
    ``sum_a * n_b > sum_b * n_a`` — so unequal block populations never
    force a float division. Bit r*8+c is set iff block (r, c) is
    brighter than block (r, c+1); bits pack into an int64 with two's-
    complement wrap (matching the DuckDB twin's HUGEINT → BIGINT wrap).

    Returns None for images smaller than the 9×8 grid (web decoration
    pixels — no perceptual content to hash). Exact for images up to
    ~37 gigapixels (cross-multiplied block sums stay below 2^63).
    """
    h, w = int(rgb.shape[0]), int(rgb.shape[1])
    if h < GRID_H or w < GRID_W:
        return None
    px = rgb.astype(np.int64)
    luma = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
    gy = (np.arange(h, dtype=np.int64) * GRID_H) // h
    gx = (np.arange(w, dtype=np.int64) * GRID_W) // w
    row_sums = np.zeros((GRID_H, w), dtype=np.int64)
    np.add.at(row_sums, gy, luma)
    col_sums = np.zeros((GRID_W, GRID_H), dtype=np.int64)
    np.add.at(col_sums, gx, row_sums.T)
    sums = col_sums.T  # (8, 9)
    counts = np.outer(
        np.bincount(gy, minlength=GRID_H), np.bincount(gx, minlength=GRID_W)
    ).astype(np.int64)
    bits = sums[:, :-1] * counts[:, 1:] > sums[:, 1:] * counts[:, :-1]
    weights = (
        np.uint64(1) << np.arange(64, dtype=np.uint64).reshape(GRID_H, GRID_W - 1)
    )
    sig = (bits.astype(np.uint64) * weights).sum(dtype=np.uint64)
    return int(sig.astype(np.int64))


def dhash_from_rgb_batch(frames: np.ndarray) -> list[int] | None:
    """Batched :func:`dhash_from_rgb` over (n, h, w, 3) uint8 frames
    sharing one shape (a video clip): BIT-IDENTICAL results — the
    pipeline is pure int64 arithmetic, and integer addition is exactly
    associative, so folding the block sums through matmuls instead of
    ``np.add.at`` cannot change a single bit (pinned by test). One
    numpy pass per CLIP instead of ~20 numpy calls per FRAME — the
    per-frame call overhead dominates at thumbnail sizes. Returns
    None when the shared shape is below the 9×8 grid (the per-frame
    function's None, once for the whole clip)."""
    n, h, w = frames.shape[0], int(frames.shape[1]), int(frames.shape[2])
    if h < GRID_H or w < GRID_W:
        return None
    px = frames.astype(np.int64)
    luma = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
    gy = (np.arange(h, dtype=np.int64) * GRID_H) // h
    gx = (np.arange(w, dtype=np.int64) * GRID_W) // w
    my = np.zeros((GRID_H, h), dtype=np.int64)
    my[gy, np.arange(h)] = 1
    mx = np.zeros((w, GRID_W), dtype=np.int64)
    mx[np.arange(w), gx] = 1
    sums = my @ luma @ mx  # (n, 8, 9), exact int64 block sums
    counts = np.outer(
        np.bincount(gy, minlength=GRID_H), np.bincount(gx, minlength=GRID_W)
    ).astype(np.int64)
    bits = sums[:, :, :-1] * counts[None, :, 1:] \
        > sums[:, :, 1:] * counts[None, :, :-1]
    weights = (
        np.uint64(1)
        << np.arange(64, dtype=np.uint64).reshape(GRID_H, GRID_W - 1)
    )
    sigs = (bits.astype(np.uint64) * weights[None]).sum(
        axis=(1, 2), dtype=np.uint64)
    return [int(s) for s in sigs.astype(np.int64)]


def audio_fp_from_samples(
    samples: np.ndarray, frame_samples: int = 256
) -> tuple[int, int | None]:
    """(n_frames, 64-bit fingerprint) from (n, channels) int16 samples.

    Channel 0 is cut into full frames of ``frame_samples``; each
    frame's energy is the exact int64 sum of squared samples (bounded:
    32768² × frame ≤ 2.8e11 per frame). Bit k (k < 64) is set iff
    energy[k+1] > energy[k] — an energy-envelope contour, the
    integer-exact cousin of spectral fingerprints, chosen because it
    is re-derivable in pure SQL from the payload bytes. Clips shorter
    than 2 full frames fingerprint as None (no contour to compare).
    """
    ch0 = samples[:, 0].astype(np.int64)
    n_frames = len(ch0) // frame_samples
    if n_frames < 2:
        return n_frames, None
    e = (
        (ch0[: n_frames * frame_samples] ** 2)
        .reshape(n_frames, frame_samples)
        .sum(axis=1)
    )
    k = min(64, n_frames - 1)
    bits = (e[1 : k + 1] > e[:k]).astype(np.uint64)
    weights = np.uint64(1) << np.arange(k, dtype=np.uint64)
    sig = (bits * weights).sum(dtype=np.uint64)
    return n_frames, int(sig.astype(np.int64))


# ------------------------------------------------------- Spark operators

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("dhash", T.LongType(), True),
    ]
)

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), True),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """image rows → (media_id, width, height, dhash).

    ``mapInPandas`` generator streaming (payload bytes never
    accumulate beyond one Arrow batch per worker — the shape that
    survives 100 TB of media). Payloads decode through the real
    raster dispatch (BMP/PNG/GIF/baseline-JPEG); rows that do not
    decode, or decode smaller than the 9×8 hash grid, emit NULL
    dims/dhash and are excluded from pairing downstream.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raster = _try_decode_raster(bytes(payload))
                if raster is None:
                    rows.append((mid, None, None, None))
                    continue
                w, h, rgb = raster
                rows.append((mid, w, h, dhash_from_rgb(rgb)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "dhash"]
            )

    img = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return img.mapInPandas(batches, schema=DHASH_SCHEMA)


def audio_fingerprint(media: DataFrame, frame_samples: int = 256) -> DataFrame:
    """audio rows → (media_id, n_frames, fingerprint).

    PCM16 WAV payloads decode for real (:func:`try_decode_wav`);
    non-WAV or shorter-than-2-frames clips emit NULL fingerprints
    (n_frames 0 / actual count) and are excluded from pairing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                wav = try_decode_wav(bytes(payload))
                if wav is None:
                    rows.append((mid, 0, None))
                    continue
                _rate, _ch, samples = wav
                nfr, fp = audio_fp_from_samples(samples, frame_samples)
                rows.append((mid, nfr, fp))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "fingerprint"]
            )

    aud = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return aud.mapInPandas(batches, schema=AUDIO_FP_SCHEMA)


def _banded(s: DataFrame, chunks: int, band_chunks: int) -> DataFrame:
    """rows with an int64 ``__sig`` → one row per band, every input
    column preserved plus ``__b{idx, val}``.

    Band key = ``band_chunks`` signature slices packed side by side
    (band_chunks·bits wide), one band per chunk combination. Shared by
    :func:`hamming_pairs`, the streaming funnel's banding
    (streaming.stateful._banded_media), and the fan-out accounting in
    scripts/bench_media_dedup.py so bucket semantics are the
    operator's own keys everywhere, not re-implementations."""
    bits = 64 // chunks

    def chunk(c: int) -> F.Column:
        return F.shiftrightunsigned(F.col("__sig"), c * bits).bitwiseAND(
            F.lit((1 << bits) - 1)
        )

    combos = list(combinations(range(chunks), band_chunks))
    band_structs = [
        F.struct(
            F.lit(i).alias("idx"),
            sum(
                (chunk(c) * F.lit(1 << (j * bits)) for j, c in enumerate(combo)),
                F.lit(0),
            ).alias("val"),
        )
        for i, combo in enumerate(combos)
    ]
    return s.withColumn("__bands", F.array(*band_structs)).select(
        *s.columns, F.explode("__bands").alias("__b")
    )


def media_signature_udf(kind: str = "image", frame_samples: int = 256):
    """Arrow pandas UDF: raw payload bytes → int64 perceptual
    signature (:func:`dhash_from_rgb` for images via the raster
    dispatch, :func:`audio_fp_from_samples` for WAV audio), NULL for
    undecodable / sub-grid / sub-2-frame media.

    The column-expression form of the signature step — what the
    STREAMING funnel needs (``mapInPandas`` ops like
    :func:`image_dhash` return whole new frames; a watermarked stream
    wants the signature as one added column, ArrowEvalPython being
    its own plan node with no HOF-inlining risk). Batch callers keep
    :func:`image_dhash` / :func:`audio_fingerprint`, which also carry
    the dims/frame-count metadata."""
    if kind not in ("image", "audio"):
        raise ValueError("kind must be 'image' or 'audio'")

    @F.pandas_udf(T.LongType())
    def _sig(payloads: pd.Series) -> pd.Series:
        out: list[int | None] = []
        for p in payloads:
            b = bytes(p)
            if kind == "image":
                r = _try_decode_raster(b)
                out.append(None if r is None else dhash_from_rgb(r[2]))
            else:
                wav = try_decode_wav(b)
                out.append(
                    None
                    if wav is None
                    else audio_fp_from_samples(wav[2], frame_samples)[1]
                )
        return pd.Series(out, dtype="object")

    return _sig


def band_bucket_sizes(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    chunks: int = 8,
    band_chunks: int = 2,
) -> DataFrame:
    """(band, key, k) — member count per band bucket, the operator's
    OWN keys (shared :func:`_banded`). The observability companion to
    ``hamming_pairs(max_bucket=)``: a production run reports how many
    buckets its cap silenced instead of silently losing recall."""
    s = sig.filter(F.col(sig_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(sig_col).alias("__sig")
    )
    return (
        _banded(s, chunks, band_chunks)
        .groupBy(F.col("__b.idx").alias("band"), F.col("__b.val").alias("key"))
        .agg(F.count("*").alias("k"))
    )


def hamming_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int = 6,
    chunks: int = 8,
    band_chunks: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs with Hamming(sig_a, sig_b) ≤ max_hamming, exactly.

    Pigeonhole over chunk combinations: the 64-bit signature splits
    into ``chunks`` equal slices; each band key concatenates
    ``band_chunks`` slices, one band per combination. A pair within
    Hamming ≤ chunks − band_chunks damages at most chunks−band_chunks
    slices, leaving ≥ band_chunks intact — so SOME combination of
    intact slices matches exactly and recall is guaranteed
    (``max_hamming ≤ chunks − band_chunks`` enforced; raises above).
    Generalizes dedup.simhash_pairs' single-chunk banding: band_chunks
    = 1 reproduces it, band_chunks = 2 widens the key space 2^bits×
    so bucket fan-out stays bounded at corpus scale.

    ``max_bucket`` (optional) drops band buckets with more members
    than the cap before the self-join — the hot-bucket guard for
    degenerate corpora (blank thumbnails all hash identically, and
    every pair among them IS a duplicate: route exact-equal groups
    through dedup.dedup_exact instead of enumerating O(k²) pairs).
    None (default) keeps the operator exact for the gate twin.

    NULL signatures (undecodable / too-small media) are excluded.
    """
    if 64 % chunks != 0 or not 1 <= band_chunks <= chunks:
        raise ValueError("chunks must divide 64 and 1 <= band_chunks <= chunks")
    if max_hamming > chunks - band_chunks:
        raise ValueError(
            "pigeonhole recall needs max_hamming <= chunks - band_chunks"
        )
    bits = 64 // chunks
    # cache_latest: the band self-join scans the signature relation
    # twice, and WITHOUT a materialization boundary Spark re-executes
    # the full upstream lineage per scan — for media signatures that
    # lineage is the payload decode itself (MapInPandas over raw
    # bytes), the dominant cost at corpus scale. Signatures are 16
    # bytes/row, so caching them is free by comparison (the
    # embedding_near_dup precedent, similarity.py).
    s = cache_latest(
        f"media_dedup.hamming.{sig_col}",
        sig.filter(F.col(sig_col).isNotNull()).select(
            F.col(id_col).alias("__id"), F.col(sig_col).alias("__sig")
        ),
    )

    banded = _banded(s, chunks, band_chunks)
    if max_bucket is not None:
        counts = banded.groupBy(
            F.col("__b.idx").alias("__i"), F.col("__b.val").alias("__v")
        ).agg(F.count("*").alias("__n"))
        hot = counts.filter(F.col("__n") > max_bucket).drop("__n")
        banded = banded.join(
            F.broadcast(hot),
            (F.col("__b.idx") == F.col("__i")) & (F.col("__b.val") == F.col("__v")),
            "left_anti",
        )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__b.idx") == F.col("b.__b.idx"))
            & (F.col("a.__b.val") == F.col("b.__b.val"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(F.col("a.__sig").bitwiseXOR(F.col("b.__sig"))).alias(
                "hamming"
            ),
        )
        # verify BEFORE dedup: hamming is deterministic per pair, and
        # the candidate fan-out (shared-band pairs) can be orders of
        # magnitude larger than the survivor set — filtering first
        # keeps the dropDuplicates exchange sized by RESULTS, not
        # candidates
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def image_near_dup_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    chunks: int = 8,
    band_chunks: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) over decoded image payloads — dHash +
    exact pigeonhole banding. Near-identical images (re-encodes,
    small crops of noise, format conversions of the same pixels)
    land within a few bits; the default tolerates Hamming ≤ 6."""
    return hamming_pairs(
        image_dhash(media),
        "media_id",
        "dhash",
        max_hamming=max_hamming,
        chunks=chunks,
        band_chunks=band_chunks,
        max_bucket=max_bucket,
    )


def audio_near_dup_pairs(
    media: DataFrame,
    frame_samples: int = 256,
    max_hamming: int = 6,
    chunks: int = 8,
    band_chunks: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) over decoded WAV payloads — energy-
    envelope fingerprint + the same exact banding as images."""
    return hamming_pairs(
        audio_fingerprint(media, frame_samples),
        "media_id",
        "fingerprint",
        max_hamming=max_hamming,
        chunks=chunks,
        band_chunks=band_chunks,
        max_bucket=max_bucket,
    )


# ------------------------------------------------------------- fixtures


def synth_phash_media_rows(
    n_base: int = 14, seed: int = 47
) -> list[tuple]:
    """Deterministic BMP media rows with PLANTED near-duplicates for
    the image_phash / image_near_dup gate queries: every payload is a
    24-bit BMP ≥ the 9×8 hash grid (mixed padded/unpadded strides, one
    top-down), and every third base image gets a lightly perturbed
    twin (id + 1000, a few ±pixel nudges) whose dHash lands within a
    few bits. BMP-only so the DuckDB twin can re-derive every
    fingerprint from payload hex with pure byte arithmetic."""
    rng = np.random.default_rng(seed)
    dims = [(16, 12), (24, 16), (9, 8), (32, 24), (13, 10), (40, 30)]
    rows = []
    for i in range(n_base):
        w, h = dims[i % len(dims)]
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append(
            (i, f"https://media.example/bmp/{i}", "image",
             make_bmp(rgb, top_down=(i % 5 == 2)), {})
        )
        if i % 3 == 0:
            # perturb a whole patch so a FEW dHash bits flip (near-dup,
            # not exact-dup): brightness shift over ~a block's worth of
            # pixels moves 1-4 adjacent-mean comparisons near their tie
            var = rgb.astype(np.int64)
            ph, pw = max(2, h // 4), max(2, w // 4)
            y0 = int(rng.integers(0, h - ph + 1))
            x0 = int(rng.integers(0, w - pw + 1))
            var[y0 : y0 + ph, x0 : x0 + pw] += int(rng.integers(25, 60))
            rows.append(
                (1000 + i, f"https://media.example/bmp/{i}-var", "image",
                 make_bmp(np.clip(var, 0, 255).astype(np.uint8)), {})
            )
    # one exact byte-for-byte duplicate pair (hamming 0 across ids)
    rows.append((2000, "https://media.example/bmp/dup", "image", rows[1][3], {}))
    return rows


def synth_afp_media_rows(
    n_base: int = 12, seed: int = 53, frame_samples: int = 128
) -> list[tuple]:
    """Deterministic PCM16 WAV rows with planted near-duplicates for
    the audio_fingerprint / audio_near_dup gate queries: clips span
    2..80+ frames (so the 64-bit clamp and the short-clip NULL path
    are both exercised), mono and stereo, varied rates; every third
    base clip gets a twin with a short burst of small-amplitude noise
    (id + 1000) that flips at most a couple of energy-contour bits."""
    rng = np.random.default_rng(seed)
    rates = [8000, 16000, 22050, 44100]
    rows = []
    for j in range(n_base):
        rate = rates[j % len(rates)]
        ch = 1 + j % 2
        n = int(rng.integers(2 * frame_samples, 85 * frame_samples))
        samples = rng.integers(-20000, 20000, size=(n, ch)).astype(np.int16)
        rows.append(
            (j, f"https://media.example/wav/{j}", "audio",
             make_wav(samples, rate), {})
        )
        if j % 3 == 0:
            # boost one frame's amplitude so 1-2 contour bits flip
            # (near-dup, not exact-dup)
            var = samples.astype(np.int64)
            k = int(rng.integers(0, n // frame_samples))
            var[k * frame_samples : (k + 1) * frame_samples, 0] = (
                var[k * frame_samples : (k + 1) * frame_samples, 0] * 5
            ) // 4
            rows.append(
                (1000 + j, f"https://media.example/wav/{j}-var", "audio",
                 make_wav(np.clip(var, -32768, 32767).astype(np.int16), rate), {})
            )
    # one too-short clip: fingerprints as NULL, excluded from pairing
    short = rng.integers(-20000, 20000, size=(frame_samples // 2, 1)).astype(np.int16)
    rows.append(
        (3000, "https://media.example/wav/short", "audio",
         make_wav(short, 8000), {})
    )
    return rows


def synth_cross_format_rows(seed: int = 59) -> list[tuple]:
    """The same random pixel grids serialized as BMP AND as stored-
    DEFLATE PNG — byte-different payloads, identical decoded pixels,
    so their dHashes must be IDENTICAL (hamming 0). Pytest-only (the
    gate twins stay single-format)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(4):
        w, h = 12 + 3 * i, 9 + 2 * i
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((10 * i, f"https://x/{i}.bmp", "image", make_bmp(rgb), {}))
        rows.append(
            (10 * i + 1, f"https://x/{i}.png", "image",
             make_png(rgb, filter_type=i % 3, stored=True), {})
        )
    return rows


def synth_phash_media(spark, n_base: int = 14, seed: int = 47) -> DataFrame:
    return spark.createDataFrame(synth_phash_media_rows(n_base, seed), MEDIA_SCHEMA)


def synth_afp_media(
    spark, n_base: int = 12, seed: int = 53, frame_samples: int = 128
) -> DataFrame:
    return spark.createDataFrame(
        synth_afp_media_rows(n_base, seed, frame_samples), MEDIA_SCHEMA
    )
