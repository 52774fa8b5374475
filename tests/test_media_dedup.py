"""media_dedup: integer dHash / audio-fingerprint near-dup family.

Kernel exactness is pinned against brute-force loop references; the
Spark banding operators are pinned against brute all-pairs over the
collected signatures (the pigeonhole guarantee makes them equal sets,
not approximations).
"""

import numpy as np
import pytest

from o2g_spark.operators import media_dedup as M
from o2g_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _try_decode_raster,
    make_bmp,
    make_wav,
    try_decode_wav,
)


def _brute_dhash(rgb):
    h, w = rgb.shape[:2]
    if h < 8 or w < 9:
        return None
    px = rgb.astype(np.int64)
    luma = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
    sig = 0
    for r in range(8):
        ys = [y for y in range(h) if y * 8 // h == r]
        for c in range(8):
            xa = [x for x in range(w) if x * 9 // w == c]
            xb = [x for x in range(w) if x * 9 // w == c + 1]
            sa = sum(int(luma[y, x]) for y in ys for x in xa)
            sb = sum(int(luma[y, x]) for y in ys for x in xb)
            if sa * (len(ys) * len(xb)) > sb * (len(ys) * len(xa)):
                sig |= 1 << (r * 8 + c)
    return int(np.uint64(sig).astype(np.int64))


def _brute_afp(samples, frame_samples):
    ch0 = samples[:, 0].astype(np.int64)
    nfr = len(ch0) // frame_samples
    if nfr < 2:
        return nfr, None
    e = [
        int((ch0[k * frame_samples : (k + 1) * frame_samples] ** 2).sum())
        for k in range(nfr)
    ]
    sig = 0
    for k in range(min(64, nfr - 1)):
        if e[k + 1] > e[k]:
            sig |= 1 << k
    return nfr, int(np.uint64(sig).astype(np.int64))


def _ham(a, b):
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# ------------------------------------------------------------- kernels


def test_dhash_matches_brute_reference():
    rng = np.random.default_rng(7)
    for _ in range(25):
        h, w = int(rng.integers(8, 48)), int(rng.integers(9, 60))
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert M.dhash_from_rgb(rgb) == _brute_dhash(rgb)


def test_dhash_too_small_is_none():
    rng = np.random.default_rng(8)
    assert M.dhash_from_rgb(rng.integers(0, 256, (7, 20, 3), dtype=np.uint8)) is None
    assert M.dhash_from_rgb(rng.integers(0, 256, (20, 8, 3), dtype=np.uint8)) is None
    assert M.dhash_from_rgb(rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)) is not None


def test_dhash_brightness_invariance_and_sensitivity():
    # dHash compares adjacent block means: a global brightness shift
    # preserves every comparison, a strong local patch edit flips bits.
    rng = np.random.default_rng(9)
    rgb = rng.integers(30, 200, size=(24, 36, 3), dtype=np.uint8)
    base = M.dhash_from_rgb(rgb)
    assert M.dhash_from_rgb(np.clip(rgb.astype(np.int64) + 40, 0, 255).astype(np.uint8)) == base
    other = rng.integers(0, 256, size=(24, 36, 3), dtype=np.uint8)
    assert _ham(base, M.dhash_from_rgb(other)) > 10


def test_audio_fp_matches_brute_reference():
    rng = np.random.default_rng(11)
    for ch in (1, 2):
        for n in (255, 256, 512, 9000, 70 * 256):
            s = rng.integers(-30000, 30000, size=(n, ch)).astype(np.int16)
            assert M.audio_fp_from_samples(s, 256) == _brute_afp(s, 256)


def test_audio_fp_short_clip_none():
    s = np.zeros((511, 1), dtype=np.int16)
    assert M.audio_fp_from_samples(s, 256) == (1, None)


def test_audio_fp_64bit_clamp():
    # > 65 frames: only the first 64 transitions contribute
    rng = np.random.default_rng(12)
    s = rng.integers(-30000, 30000, size=(100 * 64, 1)).astype(np.int16)
    nfr, fp = M.audio_fp_from_samples(s, 64)
    assert nfr == 100
    assert fp == _brute_afp(s, 64)[1]


# ------------------------------------------------- banding (Spark side)


def _brute_pairs(sigs, max_hamming):
    ids = sorted(k for k, v in sigs.items() if v is not None)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            hm = _ham(sigs[a], sigs[b])
            if hm <= max_hamming:
                out.add((a, b, hm))
    return out


def test_image_near_dup_equals_brute(spark):
    media = M.synth_phash_media(spark)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in M.image_near_dup_pairs(media).collect()
    }
    sigs = {r.media_id: r.dhash for r in M.image_dhash(media).collect()}
    want = _brute_pairs(sigs, 6)
    assert got == want
    assert len(want) >= 4  # planted near-dups actually pair
    assert any(hm > 0 for (_, _, hm) in want)  # nonzero hammings exercised


def test_audio_near_dup_equals_brute(spark):
    media = M.synth_afp_media(spark)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in M.audio_near_dup_pairs(media, frame_samples=128).collect()
    }
    sigs = {
        r.media_id: r.fingerprint
        for r in M.audio_fingerprint(media, 128).collect()
    }
    want = _brute_pairs(sigs, 6)
    assert got == want
    assert len(want) >= 3


def test_null_signatures_excluded(spark):
    rng = np.random.default_rng(13)
    rows = [
        (1, "u1", "image", make_bmp(rng.integers(0, 256, (5, 5, 3), dtype=np.uint8)), {}),
        (2, "u2", "image", b"\x00not-an-image", {}),
        (3, "u3", "image", make_bmp(rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)), {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sig = M.image_dhash(media).collect()
    by_id = {r.media_id: r for r in sig}
    assert by_id[1].dhash is None and by_id[2].dhash is None
    assert by_id[3].dhash is not None
    assert M.image_near_dup_pairs(media).count() == 0


def test_cross_format_same_pixels_same_dhash(spark):
    media = spark.createDataFrame(M.synth_cross_format_rows(), MEDIA_SCHEMA)
    pairs = {(r.id_a, r.id_b): r.hamming for r in M.image_near_dup_pairs(media).collect()}
    for i in range(4):
        assert pairs.get((10 * i, 10 * i + 1)) == 0


def test_hamming_pairs_validation(spark):
    df = spark.createDataFrame([(1, 5)], "id LONG, s LONG")
    with pytest.raises(ValueError, match="pigeonhole"):
        M.hamming_pairs(df, "id", "s", max_hamming=7, chunks=8, band_chunks=2)
    with pytest.raises(ValueError, match="chunks"):
        M.hamming_pairs(df, "id", "s", chunks=7)


def test_hamming_pairs_band_chunks_one_matches_simhash_shape(spark):
    # band_chunks=1 degenerates to single-chunk banding; still exact
    # for max_hamming <= chunks-1 (the dedup.simhash_pairs guarantee)
    rng = np.random.default_rng(21)
    base = int(rng.integers(0, 2**63))
    sigs = {0: base}
    for i in range(1, 10):
        v = base
        for b in rng.choice(64, size=i % 8, replace=False):
            v ^= 1 << int(b)
        sigs[i] = int(np.uint64(v).astype(np.int64))
    df = spark.createDataFrame(list(sigs.items()), "id LONG, s LONG")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in M.hamming_pairs(df, "id", "s", max_hamming=7, chunks=8, band_chunks=1).collect()
    }
    assert got == _brute_pairs(sigs, 7)


def test_hamming_pairs_max_bucket_drops_hot(spark):
    # 40 identical signatures: every band bucket is hot at cap 8 ->
    # all pairs drop; the distinct signature pair survives via its own
    # buckets only if under cap.
    rows = [(i, 0) for i in range(40)] + [(100, 3), (101, 3)]
    df = spark.createDataFrame(rows, "id LONG, s LONG")
    got = {
        (r.id_a, r.id_b)
        for r in M.hamming_pairs(df, "id", "s", max_bucket=8).collect()
    }
    assert got == {(100, 101)}
    # exact mode (no cap) keeps the full O(k^2) set: 780 zero-zero
    # pairs + 80 zero-vs-3 pairs (hamming 2) + the (100,101) pair
    n_all = M.hamming_pairs(df, "id", "s").count()
    assert n_all == 40 * 39 // 2 + 80 + 1


def test_fixture_decodability():
    # every gate-fixture payload decodes through the REAL decoders
    for mid, _u, _k, payload, _m in M.synth_phash_media_rows():
        assert _try_decode_raster(bytes(payload)) is not None, mid
    for mid, _u, _k, payload, _m in M.synth_afp_media_rows():
        assert try_decode_wav(bytes(payload)) is not None, mid
