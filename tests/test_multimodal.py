"""Multimodal plumbing: html→text (B3) + stubbed media decode shapes."""

import hashlib

import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import multimodal as mm
from o2g_spark.sources import synth, tables


def test_html_to_text_byte_identical(spark, pages_truth):
    """The byte-identical-text invariant (BASELINE.json input_hint):
    extracting text from html reproduces the stored text exactly."""
    pages_pdf, _ = pages_truth
    pages = tables.pages_df(spark, pages_pdf.head(300))
    out = mm.extract_text(pages)
    bad = out.filter(F.col("text_extracted") != F.col("text")).count()
    assert bad == 0
    # and the text column itself was not touched
    h_in = sorted(
        hashlib.sha256(t.encode()).hexdigest() for t in pages_pdf.head(300)["text"]
    )
    h_out = sorted(
        hashlib.sha256(r.text.encode()).hexdigest() for r in out.select("text").collect()
    )
    assert h_in == h_out


def test_html_to_text_golden():
    """Golden pins: the canonical extraction can never change."""
    cases = {
        b"<html><body>Hello  world</body></html>": b"Hello world",
        b"<p>a</p>\n<p>b</p>": b"a b",
        b"no tags at all": b"no tags at all",
        b"  <div> x </div>  ": b"x",
    }
    for html, want in cases.items():
        assert mm.html_to_text_bytes(html) == want


def test_decode_images_stub_shape(spark):
    media = mm.synth_media(spark, n=60)
    out = mm.decode_images(media)
    rows = out.collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    for r in rows:
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert len(r.feature) == 8 and all(0.0 <= f <= 4.0 for f in r.feature)
    # deterministic: same payload → same decode, any partitioning
    rows2 = mm.decode_images(media.repartition(7)).collect()
    assert sorted((r.media_id, r.width, r.height) for r in rows) == sorted(
        (r.media_id, r.width, r.height) for r in rows2
    )


def test_decode_images_real_path_gated(spark):
    media = mm.synth_media(spark, n=6)
    if not mm.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            mm.decode_images(media, use_real_decoder=True)


def test_sample_frames(spark):
    media = mm.synth_media(spark, n=30)
    out = mm.sample_frames(media, every_ms=1000).collect()
    metas = {
        r.media_id: int(r.meta["duration_ms"])
        for r in media.filter(F.col("kind") == "video").collect()
    }
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == set(metas)
    for mid, frames in by_media.items():
        want = (metas[mid] + 999) // 1000
        assert len(frames) == want
        assert sorted(f.frame_idx for f in frames) == list(range(want))
        assert all(len(f.frame) == 32 for f in frames)


def test_resize_images_shape(spark):
    media = mm.synth_media(spark, n=30)
    out = mm.resize_images(media, width=16, height=8).collect()
    assert len(out) == media.filter(F.col("kind") == "image").count()
    for r in out:
        assert (r.width, r.height) == (16, 8)
        assert len(r.pixels) == 16 * 8 * 3
    # deterministic under repartitioning
    out2 = mm.resize_images(media.repartition(5), 16, 8).collect()
    assert sorted((r.media_id, bytes(r.pixels)) for r in out) == sorted(
        (r.media_id, bytes(r.pixels)) for r in out2
    )


def test_audio_features_shape(spark):
    media = mm.synth_media(spark, n=30)
    out = mm.audio_features(media).collect()
    assert len(out) == media.filter(F.col("kind") == "audio").count()
    for r in out:
        assert 500 <= r.duration_ms < 10_500
        assert 0.0 <= r.rms <= 255.0
        assert len(r.mfcc) == 13 and all(0.0 <= v <= 1.0 for v in r.mfcc)


# ------------------------------------------------ real BMP / WAV decode

import numpy as np  # noqa: E402


def test_bmp_roundtrip_padded_and_topdown():
    """make_bmp → try_decode_bmp is pixel-exact for padded strides
    (w=5 → 16-byte rows) and both row orders."""
    rgb = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
    for td in (False, True):
        w, h, out = mm.try_decode_bmp(mm.make_bmp(rgb, top_down=td))
        assert (w, h) == (5, 4)
        assert np.array_equal(out, rgb)


def test_bmp_rejects_non_bmp():
    assert mm.try_decode_bmp(b"JFIF" * 30) is None
    assert mm.try_decode_bmp(b"BM" + b"\x00" * 20) is None  # truncated
    # 8bpp header → None (only 24-bit BI_RGB supported)
    b = bytearray(mm.make_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    b[28] = 8
    assert mm.try_decode_bmp(bytes(b)) is None


def test_wav_roundtrip_mono_stereo():
    s = np.arange(-200, 200, 3, dtype=np.int16)
    rate, ch, out = mm.try_decode_wav(mm.make_wav(s, 8000))
    assert (rate, ch) == (8000, 1) and np.array_equal(out[:, 0], s)
    s2 = np.stack([s, s[::-1]], axis=1).astype(np.int16)
    rate, ch, out = mm.try_decode_wav(mm.make_wav(s2, 44100))
    assert (rate, ch) == (44100, 2) and np.array_equal(out, s2)


def test_png_roundtrip_all_filters_stored_and_compressed():
    """make_png → try_decode_png is pixel-exact for EVERY spec filter
    (None/Sub/Up/Average/Paeth) under both the canonical stored-DEFLATE
    framing (the gate-twin layout) and a real zlib-compressed stream —
    the gate only SQL-covers filters 0-2, so 3/4 + inflate are pinned
    here."""
    rng = np.random.default_rng(11)
    for (h, w) in [(1, 1), (4, 5), (7, 3)]:
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for f in range(5):
            for stored in (True, False):
                got = mm.try_decode_png(mm.make_png(rgb, filter_type=f,
                                                    stored=stored))
                assert got is not None, (h, w, f, stored)
                gw, gh, out = got
                assert (gw, gh) == (w, h)
                assert np.array_equal(out, rgb), (h, w, f, stored)


def test_png_gray_and_rgba_color_types():
    """Color type 0 replicates to 3 channels; type 6 drops alpha —
    hand-built minimal files (make_png only emits type 2)."""
    import struct
    import zlib

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    def build(w, h, ctype, px_rows):
        raw = b"".join(b"\x00" + r for r in px_rows)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (mm._PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    g = build(2, 1, 0, [bytes([7, 250])])
    w, h, rgb = mm.try_decode_png(g)
    assert (w, h) == (2, 1)
    assert np.array_equal(rgb, [[[7, 7, 7], [250, 250, 250]]])
    a = build(1, 1, 6, [bytes([10, 20, 30, 99])])
    w, h, rgb = mm.try_decode_png(a)
    assert (w, h) == (1, 1) and np.array_equal(rgb, [[[10, 20, 30]]])


def test_png_rejects_unsupported():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(mm.make_png(rgb))
    assert mm.try_decode_png(b"JFIF" * 30) is None
    assert mm.try_decode_png(bytes(good[:20])) is None  # truncated
    bad_depth = good.copy(); bad_depth[8 + 8 + 8] = 16
    assert mm.try_decode_png(bytes(bad_depth)) is None
    bad_interlace = good.copy(); bad_interlace[8 + 8 + 12] = 1
    assert mm.try_decode_png(bytes(bad_interlace)) is None
    bad_ctype = good.copy(); bad_ctype[8 + 8 + 9] = 3  # palette
    assert mm.try_decode_png(bytes(bad_ctype)) is None


def test_png_malformed_filter_byte_returns_none():
    """A filter byte >= 5 in an otherwise-valid stream must fall back
    to None (the sha256 stand-in path), NOT raise out of the Spark
    task (r5 review finding, reproduced)."""
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    b = bytearray(mm.make_png(rgb, filter_type=0, stored=True))
    b[48] = 5  # corrupt row 0's filter byte (stored layout: offset 48)
    # the stored-block data changed, so fix nothing else: decompress
    # succeeds (stored blocks have no checksum of their own until the
    # adler at the end — which zlib.decompressobj with max_length never
    # reaches), length matches, and the unfilter must reject cleanly
    assert mm.try_decode_png(bytes(b)) is None


def test_png_decompression_bomb_rejected():
    """An IHDR declaring huge dimensions with a tiny high-ratio IDAT
    must be rejected BEFORE inflating gigabytes (r5 review)."""
    import struct
    import zlib

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    w = h = 20_000  # 20000*(1+60000) ≈ 1.2 GB raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00" * 1_000_000, 9)  # ~1 KB compressed
    bomb = (mm._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
    assert mm.try_decode_png(bomb) is None
    # and a LYING header over a small corpus-plausible size must be
    # caught by the capped inflate, not a full decompress
    w2, h2 = 64, 64
    ihdr2 = struct.pack(">IIBBBBB", w2, h2, 8, 2, 0, 0, 0)
    idat2 = zlib.compress(b"\x00" * 10_000_000, 9)  # inflates past expected
    lying = (mm._PNG_SIG + chunk(b"IHDR", ihdr2) + chunk(b"IDAT", idat2)
             + chunk(b"IEND", b""))
    assert mm.try_decode_png(lying) is None


def test_decode_and_resize_png_physical_truth(spark):
    """A PNG goes through the REAL raster path in decode_images and
    resize_images (not the sha256 stand-in): true dimensions, exact
    channel means, exact NN source pixels."""
    rgb = np.zeros((6, 5, 3), dtype=np.uint8)
    rgb[..., 0] = 200; rgb[..., 1] = 100; rgb[..., 2] = 50
    media = spark.createDataFrame(
        [(1, "u", "image", mm.make_png(rgb, filter_type=4, stored=False),
          {})], mm.MEDIA_SCHEMA
    )
    r = mm.decode_images(media).collect()[0]
    assert (r.width, r.height) == (5, 6)
    assert abs(r.feature[0] - 200 / 255) < 1e-6
    assert abs(r.feature[6] - 50 / 255) < 1e-6
    rgb2 = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    media2 = spark.createDataFrame(
        [(1, "u", "image", mm.make_png(rgb2, filter_type=1), {})],
        mm.MEDIA_SCHEMA
    )
    r2 = mm.resize_images(media2, width=2, height=2).collect()[0]
    got = np.frombuffer(bytes(r2.pixels), dtype=np.uint8).reshape(2, 2, 3)
    assert np.array_equal(got, rgb2[[0, 2]][:, [0, 2]])


def test_decode_images_bmp_physical_truth(spark):
    """A solid-color BMP must decode to its REAL dimensions and exact
    channel means — physically true values, not digest stand-ins."""
    rgb = np.zeros((6, 5, 3), dtype=np.uint8)
    rgb[..., 0] = 200  # R
    rgb[..., 1] = 100  # G
    rgb[..., 2] = 50   # B
    media = spark.createDataFrame(
        [(1, "u", "image", mm.make_bmp(rgb), {})], mm.MEDIA_SCHEMA
    )
    r = mm.decode_images(media).collect()[0]
    assert (r.width, r.height) == (5, 6)
    f = r.feature
    assert abs(f[0] - 200 / 255) < 1e-6  # meanR
    assert abs(f[1] - 100 / 255) < 1e-6
    assert abs(f[2] - 50 / 255) < 1e-6
    assert abs(f[3] - 200 / 255) < 1e-6  # maxR
    assert abs(f[6] - 50 / 255) < 1e-6   # min over all
    assert abs(f[7] - (350 / 3) / 255) < 1e-6  # overall mean


def test_resize_images_bmp_nearest_neighbor(spark):
    """4×4 → 2×2 NN must pick source pixels (0,0),(0,2),(2,0),(2,2)."""
    rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    media = spark.createDataFrame(
        [(1, "u", "image", mm.make_bmp(rgb), {})], mm.MEDIA_SCHEMA
    )
    r = mm.resize_images(media, width=2, height=2).collect()[0]
    got = np.frombuffer(bytes(r.pixels), dtype=np.uint8).reshape(2, 2, 3)
    assert np.array_equal(got, rgb[[0, 2]][:, [0, 2]])


def test_audio_features_wav_physical_truth(spark):
    """A constant-amplitude WAV has an exactly known duration and RMS."""
    n, rate, amp = 2600, 13000, 1000
    s = np.full(n, amp, dtype=np.int16)
    media = spark.createDataFrame(
        [(1, "u", "audio", mm.make_wav(s, rate), {})], mm.MEDIA_SCHEMA
    )
    r = mm.audio_features(media).collect()[0]
    assert r.duration_ms == n * 1000 // rate == 200
    assert abs(r.rms - amp / 32768.0) < 1e-9
    assert all(abs(v - amp / 32768.0) < 1e-6 for v in r.mfcc)


def test_mixed_media_real_and_stub_paths(spark):
    """BMP rows take the real path while non-BMP 'image' rows keep the
    sha256 stand-in, in the same Arrow batch."""
    rgb = np.full((3, 3, 3), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "u1", "image", mm.make_bmp(rgb), {}),
         (2, "u2", "image", b"\x89PNG-not-really" * 8, {})],
        mm.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in mm.decode_images(media).collect()}
    assert (rows[1].width, rows[1].height) == (3, 3)
    w, h, _ = mm._fake_decode_image(b"\x89PNG-not-really" * 8)
    assert (rows[2].width, rows[2].height) == (w, h)


# ----------------------------------------------------------------- GIF


_lzw_encode_ref = mm.lzw_encode_reference


def test_gif_lzw_general_decode_vs_reference_encoder():
    """Random, repetitive (dictionary hits), and constant-run (maximal
    KwKwK) streams at mcs 2/4/8 and sizes through the 12-bit table
    freeze all round-trip through the general decoder."""
    rng = np.random.default_rng(3)
    for mcs in (2, 4, 8):
        for n in (1, 10, 500, 5000, 40000):
            data = bytes(rng.integers(0, 1 << mcs, n, dtype=np.uint8))
            for probe in (data, (data[:7] * (n // 7 + 1))[:n],
                          bytes([data[0]]) * n):
                dec = mm._lzw_decode(_lzw_encode_ref(probe, mcs), mcs, n)
                assert dec is not None and bytes(dec) == probe, (mcs, n)


def test_gif_lzw_rejects_malformed():
    stream = _lzw_encode_ref(b"abcabcabc", 8)
    assert mm._lzw_decode(stream[:-2], 8, 100) is None  # truncated, no EOI
    assert mm._lzw_decode(stream, 8, 4) is None          # output bomb guard
    # code far past the table
    assert mm._lzw_decode(bytes([0x00, 0x01, 0xFF, 0xFF]), 8, 100) is None


def test_gif_canonical_roundtrip_multi_group():
    """make_gif → try_decode_gif is pixel-exact, including >254-pixel
    images (multiple CLEAR groups) and >255-byte streams (sub-block
    framing)."""
    rng = np.random.default_rng(5)
    for (w, h) in [(1, 1), (4, 3), (20, 15), (255, 4)]:
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, (h, w), dtype=np.uint8)
        got = mm.try_decode_gif(mm.make_gif(idx, pal))
        assert got is not None, (w, h)
        gw, gh, rgb = got
        assert (gw, gh) == (w, h)
        assert np.array_equal(rgb, pal[idx.reshape(-1)].reshape(h, w, 3))


def test_gif_real_compressed_file_decodes():
    """A hand-assembled GIF with a REAL compressed LZW stream (not the
    canonical literal-only layout) decodes through try_decode_gif —
    proving the production path handles what real encoders emit."""
    rng = np.random.default_rng(11)
    w, h = 40, 25
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = (rng.integers(0, 7, (h, w), dtype=np.uint8) * 3)  # repetitive
    stream = _lzw_encode_ref(idx.reshape(-1).tobytes(), 8)
    blocks = bytearray()
    for g in range(0, len(stream), 255):
        chunk = stream[g:g + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    gif = (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
           + bytes([0xF7, 0, 0]) + pal.tobytes()
           # graphic-control extension: the skip path must walk it
           + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
           + b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little")
           + h.to_bytes(2, "little") + b"\x00" + bytes([8])
           + bytes(blocks) + b"\x3b")
    got = mm.try_decode_gif(gif)
    assert got is not None
    gw, gh, rgb = got
    assert (gw, gh) == (w, h)
    assert np.array_equal(rgb, pal[idx.reshape(-1)].reshape(h, w, 3))


def test_gif_local_color_table_wins():
    rng = np.random.default_rng(13)
    gct = np.zeros((256, 3), dtype=np.uint8)
    lct = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    stream = _lzw_encode_ref(idx.reshape(-1).tobytes(), 2)
    gif = (b"GIF89a" + b"\x02\x00\x02\x00" + bytes([0xF7, 0, 0])
           + gct.tobytes()
           + b"\x2c" + b"\x00" * 4 + b"\x02\x00\x02\x00"
           + bytes([0x81])  # LCT present, 4 entries (2^(1+1))
           + lct.tobytes() + bytes([2])
           + bytes([len(stream)]) + stream + b"\x00\x3b")
    got = mm.try_decode_gif(gif)
    assert got is not None
    assert np.array_equal(got[2], lct[idx.reshape(-1)].reshape(2, 2, 3))


def test_gif_rejects_unsupported():
    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    g = mm.make_gif(idx, pal)
    assert mm.try_decode_gif(b"NOTGIF" + g[6:]) is None
    assert mm.try_decode_gif(g[:40]) is None            # truncated
    interlaced = bytearray(g)
    interlaced[781 + 9] |= 0x40
    assert mm.try_decode_gif(bytes(interlaced)) is None
    trailer_first = g[:781] + b"\x3b" + g[781:]
    assert mm.try_decode_gif(trailer_first) is None
    # index beyond a small local palette → None, not garbage pixels
    small = (b"GIF89a" + b"\x01\x00\x01\x00" + bytes([0x00, 0, 0])
             + b"\x2c" + b"\x00" * 4 + b"\x01\x00\x01\x00"
             + bytes([0x80])  # LCT, 2 entries
             + b"\x00\x00\x00\xff\xff\xff"
             + bytes([2]) + bytes([len(s := _lzw_encode_ref(b"\x03", 2))])
             + s + b"\x00\x3b")
    assert mm.try_decode_gif(small) is None


def test_decode_images_gif_physical_truth(spark):
    """GIF payloads take the REAL raster path in decode_images: true
    dimensions and exact pixel stats, not the sha256 stand-in."""
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[7] = (200, 100, 50)
    idx = np.full((6, 5), 7, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "u", "image", mm.make_gif(idx, pal), {})], mm.MEDIA_SCHEMA
    )
    r = mm.decode_images(media).collect()[0]
    assert (r.width, r.height) == (5, 6)
    assert abs(r.feature[0] - 200 / 255) < 1e-6
    assert abs(r.feature[1] - 100 / 255) < 1e-6
    assert abs(r.feature[6] - 50 / 255) < 1e-6
