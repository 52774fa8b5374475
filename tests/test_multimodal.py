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
