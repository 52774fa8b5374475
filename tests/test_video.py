"""AVI video codec kernel + video operators: real container decode
(raw-DIB exact, MJPEG through the pure-numpy JPEG codec), per-frame
dHash parity with the image kernel, and frame-set near-dup pairs
pinned against brute-force set jaccard."""

import numpy as np
import pytest

from o2g_spark.kernels.avi import MOVI_DATA_OFFSET, make_avi, try_decode_avi
from o2g_spark.operators import video as V
from o2g_spark.operators.media_dedup import dhash_from_rgb
from o2g_spark.operators.multimodal import MEDIA_SCHEMA


def _frames(n, h=12, w=18, seed=5):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


# --------------------------------------------------------------- kernel


def test_rawdib_round_trip_exact():
    frames = _frames(5)
    w, h, fps, out = try_decode_avi(make_avi(frames, fps=8))
    assert (w, h, fps, len(out)) == (18, 12, 8, 5)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_rawdib_arithmetic_frame_offsets():
    # the property the DuckDB gate twin relies on: frame f's pixel
    # (y, x, c) sits at a pure-arithmetic payload offset
    frames = _frames(4)
    b = make_avi(frames, fps=10)
    h, w = 12, 18
    stride = (w * 3 + 3) & ~3
    for f, y, x, c in ((0, 0, 0, 0), (2, 3, 5, 0), (3, 11, 17, 2)):
        off = (MOVI_DATA_OFFSET + f * (8 + stride * h) + 8
               + (h - 1 - y) * stride + x * 3 + (2 - c))
        assert b[off] == frames[f][y, x, c]


def test_mjpeg_round_trip_within_lossy_bound():
    # flat-ish frames: quantization error bounded like the JPEG bench
    rng = np.random.default_rng(7)
    frames = []
    for i in range(3):
        f = np.empty((16, 16, 3), dtype=np.uint8)
        f[..., 0], f[..., 1], f[..., 2] = 40 * i + 30, 90, 150
        frames.append(f)
    w, h, fps, out = try_decode_avi(make_avi(frames, fps=5, codec="mjpeg"))
    assert (w, h, fps, len(out)) == (16, 16, 5, 3)
    for a, b in zip(frames, out):
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0


def test_truncated_tail_keeps_leading_frames():
    frames = _frames(5)
    b = make_avi(frames, fps=8)
    for cut in (1, 100, 700):
        r = try_decode_avi(b[: len(b) - cut])
        assert r is not None and 0 < len(r[3]) < 5
        for a, got in zip(frames, r[3]):
            assert np.array_equal(a, got)


def test_odd_width_and_rejects():
    f = _frames(1, h=9, w=13, seed=9)
    w, h, fps, out = try_decode_avi(make_avi(f, fps=1))
    assert (w, h) == (13, 9) and np.array_equal(out[0], f[0])
    assert try_decode_avi(b"\x00" * 64) is None
    assert try_decode_avi(b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 24) is None
    with pytest.raises(ValueError):
        make_avi(f, codec="h264")
    with pytest.raises(ValueError):
        make_avi([])


# ------------------------------------------------------------ operators


def test_decode_video_metadata(spark):
    media = V.synth_avi_media(spark)
    rows = {r.media_id: r for r in V.decode_video(media).collect()}
    for mid, _u, _k, payload, _m in V.synth_avi_media_rows():
        w, h, fps, frames = try_decode_avi(bytes(payload))
        r = rows[mid]
        assert (r.width, r.height, r.fps, r.n_frames) == (w, h, fps, len(frames))
        assert r.duration_ms == len(frames) * 1000 // fps
    # undecodable payload -> NULL metadata
    bad = spark.createDataFrame(
        [(9, "u", "video", b"\x00garbage", {})], MEDIA_SCHEMA)
    r = V.decode_video(bad).collect()[0]
    assert r.width is None and r.n_frames is None


def test_frame_dhash_matches_image_kernel(spark):
    media = V.synth_avi_media(spark)
    got = {(r.media_id, r.frame_idx): r.dhash
           for r in V.video_frame_dhash(media).collect()}
    want = {}
    for mid, _u, _k, payload, _m in V.synth_avi_media_rows():
        for idx, frame in enumerate(try_decode_avi(bytes(payload))[3]):
            want[(mid, idx)] = dhash_from_rgb(frame)
    assert got == want


def test_frame_sampling_every_k(spark):
    media = V.synth_avi_media(spark)
    all_rows = V.video_frame_dhash(media, every_k=1).collect()
    sampled = V.video_frame_dhash(media, every_k=2).collect()
    assert {(r.media_id, r.frame_idx) for r in sampled} == {
        (r.media_id, r.frame_idx) for r in all_rows if r.frame_idx % 2 == 0}
    with pytest.raises(ValueError):
        V.video_frame_dhash(media, every_k=0)


def _brute_pairs(rows, threshold):
    sets = {}
    for mid, _u, _k, payload, _m in rows:
        sets[mid] = {dhash_from_rgb(f)
                     for f in try_decode_avi(bytes(payload))[3]}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                jac = round(inter / len(sets[a] | sets[b]), 6)
                if jac >= threshold:
                    out.add((a, b, jac))
    return out


def test_video_near_dup_equals_brute(spark):
    media = V.synth_avi_media(spark)
    got = {(r.id_a, r.id_b, r.jaccard)
           for r in V.video_near_dup_pairs(media, threshold=0.5).collect()}
    want = _brute_pairs(V.synth_avi_media_rows(), 0.5)
    assert got == want
    assert (1000, 2000, 1.0) in got  # the byte-identical dup (of id 1000)
    assert len(got) >= 3  # planted twins actually pair
    assert any(j < 1.0 for _, _, j in got)  # non-trivial overlaps too


def test_video_near_dup_max_df_cap(spark):
    # a "test card" frame shared by many videos trips the cap; the
    # hot-hash report names it and capped pairing drops only it
    rng = np.random.default_rng(31)
    card = rng.integers(0, 251, size=(8, 9)).astype(np.int64)
    rows = []
    for i in range(8):
        own = rng.integers(0, 251, size=(8, 9)).astype(np.int64)
        frames = [V._grid_frame(card)] + [V._grid_frame(own)] * 3
        rows.append((i, f"u{i}", "video", make_avi(frames, fps=4), {}))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hot = V.video_hot_frame_hashes(media, max_df=3).collect()
    assert len(hot) == 1 and hot[0].n_videos == 8
    capped = V.video_near_dup_pairs(media, threshold=0.1, max_df=3)
    assert capped.count() == 0  # only the card was shared
    uncapped = V.video_near_dup_pairs(media, threshold=0.1)
    assert uncapped.count() == 8 * 7 // 2  # card links every pair


# ------------------------------------------- review-hardening (s6)


def test_routing_honours_bicompression_over_chunk_id():
    """Real muxers mix chunk ids and codecs: JPEG frames in '00db'
    (biCompression='MJPG') and raw frames in '00dc' (biCompression 0)
    must route by the FORMAT header, not the chunk fourcc."""
    rng = np.random.default_rng(13)
    flat = np.full((16, 16, 3), 120, np.uint8)
    mj = bytearray(make_avi([flat, flat], fps=5, codec="mjpeg"))
    want = try_decode_avi(bytes(mj))
    # rewrite every frame chunk id 00dc -> 00db; compression stays MJPG
    patched = bytes(mj).replace(b"00dc", b"00db")
    got = try_decode_avi(patched)
    assert got is not None and len(got[3]) == 2
    for a, b in zip(want[3], got[3]):
        assert np.array_equal(a, b)

    raw = _frames(3, seed=int(rng.integers(1 << 30)))
    rd = bytes(make_avi(raw, fps=8)).replace(b"00db", b"00dc")
    got = try_decode_avi(rd)  # compression 0 -> raw path despite 00dc
    assert got is not None
    for a, b in zip(raw, got[3]):
        assert np.array_equal(a, b)


def test_unknown_codec_fourcc_rejected():
    b = bytearray(make_avi(_frames(2), fps=8))
    at = bytes(b).index(b"strf") + 8 + 16  # biCompression field
    b[at : at + 4] = b"XVID"
    assert try_decode_avi(bytes(b)) is None


def test_audio_strf_does_not_clobber_video_compression():
    """A second 'auds' stream's WAVEFORMAT strf (whose bytes at offset
    16 are arbitrary) must not overwrite the video biCompression."""
    import struct

    b = bytes(make_avi(_frames(3), fps=8))
    strh = (b"auds" + b"\x00" * 4
            + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, 8000, 0, 100,
                          0, 0, -1)
            + struct.pack("<4H", 0, 0, 0, 0))
    # 20+ byte WAVEFORMAT whose offset-16 dword is garbage
    strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16) + b"\xde\xad\xbe\xef"
    strl = (b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
            + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
            + b"strf" + struct.pack("<I", len(strf)) + strf)
    movi_at = b.index(b"LIST", 12, None)
    # insert the audio strl right before the movi LIST
    movi_list = b.index(b"movi") - 8
    patched = bytearray(b[:movi_list] + strl + b[movi_list:])
    # fix the RIFF size
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    got = try_decode_avi(bytes(patched))
    assert got is not None and len(got[3]) == 3
    assert movi_at  # silence linters


def test_lying_inner_list_size_stays_inside_parent():
    """A nested LIST whose declared size overshoots its parent must
    not leak the scan past the parent's extent (no duplicate/phantom
    frames)."""
    import struct

    frames = _frames(2)
    b = bytes(make_avi(frames, fps=8))
    # wrap the first frame chunk in a LIST lying about its size
    stride = (18 * 3 + 3) & ~3
    fsize = stride * 12
    first = MOVI_DATA_OFFSET
    lie = (b"LIST" + struct.pack("<I", 1 << 24) + b"rec "
           + b[first : first + 8 + fsize])
    patched = bytearray(b[:first] + lie + b[first + 8 + fsize:])
    movi_list_size_at = b.index(b"movi") - 4
    old = struct.unpack_from("<I", bytes(patched), movi_list_size_at)[0]
    struct.pack_into("<I", patched, movi_list_size_at, old + 12)
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    got = try_decode_avi(bytes(patched))
    assert got is not None and len(got[3]) == 2
    for a, bb in zip(frames, got[3]):
        assert np.array_equal(a, bb)


def test_make_avi_rejects_nonpositive_fps():
    with pytest.raises(ValueError, match="fps"):
        make_avi(_frames(1), fps=0)
    with pytest.raises(ValueError, match="fps"):
        make_avi(_frames(1), fps=-3)


def test_batched_dhash_bit_identical_to_scalar():
    """The batched clip hasher must be BIT-IDENTICAL to the per-frame
    function across shapes (incl. non-divisible grid dims) — pure
    int64 arithmetic, so the matmul block-sum fold cannot differ."""
    from o2g_spark.operators.media_dedup import (
        dhash_from_rgb, dhash_from_rgb_batch)

    rng = np.random.default_rng(3)
    for shape in [(16, 18), (9, 9), (8, 9), (12, 16), (33, 47)]:
        fr = rng.integers(0, 256, (7,) + shape + (3,), dtype=np.uint8)
        assert dhash_from_rgb_batch(fr) == [dhash_from_rgb(f) for f in fr]
    assert dhash_from_rgb_batch(
        rng.integers(0, 256, (3, 5, 7, 3), dtype=np.uint8)) is None


def test_video_frames_resample_exact(spark):
    """video_frames: every sampled frame resampled by the same
    nearest-neighbor index arithmetic as multimodal.resize_images —
    pinned against a per-frame numpy reference on the decoded clip."""
    media = V.synth_avi_media(spark, n_base=3)
    out = {
        (r.media_id, r.frame_idx): r
        for r in V.video_frames(media, width=10, height=6,
                                every_k=2).collect()
    }
    rows = V.synth_avi_media_rows(n_base=3)
    n_expected = 0
    for mid, _u, _k, payload, _m in rows:
        w, h, _fps, frames = try_decode_avi(bytes(payload))
        ys = np.arange(6) * h // 6
        xs = np.arange(10) * w // 10
        for idx in range(0, len(frames), 2):
            n_expected += 1
            r = out[(mid, idx)]
            assert (r.width, r.height) == (10, 6)
            want = frames[idx][ys][:, xs].tobytes()
            assert bytes(r.pixels) == want
    assert len(out) == n_expected


def test_video_frames_validates_args(spark):
    media = V.synth_avi_media(spark, n_base=1)
    with pytest.raises(ValueError):
        V.video_frames(media, every_k=0)
    with pytest.raises(ValueError):
        V.video_frames(media, width=0)


def _splice_small_frame(good: bytes, small_jpeg: bytes) -> bytes:
    """Replace the SECOND MJPEG frame chunk's payload with a JPEG whose
    dimensions differ from the container header, fixing the chunk, movi
    LIST and RIFF sizes (the ADVICE r5 adversarial shape)."""
    import struct as S

    i1 = good.index(b"00dc")
    i2 = good.index(b"00dc", i1 + 1)
    osz = S.unpack_from("<I", good, i2 + 4)[0]
    old_total = 8 + osz + (osz & 1)
    nsz = len(small_jpeg)
    pad = b"\x00" if nsz & 1 else b""
    new = (good[:i2] + b"00dc" + S.pack("<I", nsz) + small_jpeg + pad
           + good[i2 + old_total:])
    delta = (8 + nsz + (nsz & 1)) - old_total
    movi = new.index(b"movi")
    lsz = S.unpack_from("<I", new, movi - 4)[0]
    new = new[:movi - 4] + S.pack("<I", lsz + delta) + new[movi:]
    rsz = S.unpack_from("<I", new, 4)[0]
    return new[:4] + S.pack("<I", rsz + delta) + new[8:]


def test_mjpeg_frame_dim_mismatch_degrades_to_undecodable(spark):
    # a clip whose embedded JPEG dims differ from the (w, h) header must
    # take the undecodable path (None / no rows), not crash np.stack in
    # the mapInPandas consumers
    from o2g_spark.kernels import jpeg as J

    big = _frames(2, h=16, w=16, seed=3)
    small = _frames(1, h=8, w=8, seed=4)[0]
    good = make_avi(big, fps=5, codec="mjpeg")
    bad = _splice_small_frame(good, J.make_jpeg(small, quality=90))
    assert try_decode_avi(good) is not None
    assert try_decode_avi(bad) is None

    media = spark.createDataFrame(
        [(1, "u1", "video", bytearray(good), {}),
         (9, "u9", "video", bytearray(bad), {})], MEDIA_SCHEMA)
    # hashing consumer: bad clip contributes no rows, good clip decodes
    hashed = V.video_frame_dhash(media).collect()
    assert {r.media_id for r in hashed} == {1}
    # frame-sample consumer: same contract (no ValueError inside tasks)
    sampled = V.video_frames(media, width=8, height=8, every_k=1).collect()
    assert {r.media_id for r in sampled} == {1}
