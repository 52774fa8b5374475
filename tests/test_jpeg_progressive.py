"""Progressive JPEG (kernels/jpeg.py SOF2 path): the central pin is
CROSS-ENCODER pixel identity — make_jpeg and make_progressive_jpeg
share one quantization pipeline, so decoding the progressive stream
must yield BIT-IDENTICAL pixels to decoding the baseline stream of
the same (image, quality, sampling). That pins the whole progressive
entropy layer (spectral selection, successive approximation DC/AC
first + refinement, EOB runs, buffered correction bits, restart
resync) against the already-verified baseline decoder without a
second reference implementation. JPEG stays pytest-evidence-class
(lossy; the Huffman stream is not SQL-expressible)."""

import numpy as np
import pytest

from o2g_spark.kernels import jpeg as J
from o2g_spark.operators import multimodal as mm


def _pair(img, **kw):
    bkw = {k: v for k, v in kw.items() if k != "spectral_only"}
    base = J.try_decode_jpeg(J.make_jpeg(img, **bkw))
    prog = J.try_decode_jpeg(J.make_progressive_jpeg(img, **kw))
    assert base is not None and prog is not None
    return base, prog


def _assert_identical(img, **kw):
    (bw, bh, bpx), (pw, ph, ppx) = _pair(img, **kw)
    assert (bw, bh) == (pw, ph)
    assert np.array_equal(bpx, ppx), kw


@pytest.mark.parametrize("shape", [(16, 16), (37, 53), (8, 8), (24, 31)])
@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"grayscale": True},
        {"subsample": True},
        {"spectral_only": True},
        {"subsample": True, "spectral_only": True},
        {"restart_interval": 3},
        {"quality": 40},
    ],
)
def test_progressive_equals_baseline(shape, kw):
    rng = np.random.default_rng(7 + shape[0])
    img = rng.integers(0, 256, size=shape + (3,)).astype(np.uint8)
    _assert_identical(img, **kw)


def test_flat_color_long_eob_runs():
    """All-zero AC across every block → the EOB run spans the whole
    scan (the 15-bit-run encoder cap and the decoder's run carry)."""
    flat = np.full((64, 80, 3), 137, np.uint8)
    _assert_identical(flat, quality=90)
    _assert_identical(flat, quality=90, subsample=True)
    _assert_identical(flat, quality=90, restart_interval=2)


def test_sparse_spikes_zrl_and_refinement():
    """Isolated high-frequency spikes → long zero runs inside blocks
    (ZRL in both first and refinement AC passes) between EOB runs."""
    sp = np.full((80, 80, 3), 128, np.uint8)
    sp[3, 70] = [255, 0, 0]
    sp[40, 5] = [0, 255, 0]
    sp[77, 77] = [0, 0, 255]
    _assert_identical(sp, quality=95)
    _assert_identical(sp, quality=30)


def test_checkerboard_max_frequency():
    cb = (np.indices((64, 64)).sum(0) % 2 * 255).astype(np.uint8)
    img = np.repeat(cb[..., None], 3, 2)
    _assert_identical(img, quality=90)
    _assert_identical(img, quality=90, subsample=True)


def test_quality_sweep_noise():
    rng = np.random.default_rng(123)
    img = rng.integers(0, 256, size=(120, 160, 3)).astype(np.uint8)
    for q in (5, 25, 75, 95, 100):
        _assert_identical(img, quality=q)
        _assert_identical(img, quality=q, subsample=True)


def test_scan_script_exercises_successive_approximation():
    """The default script must actually contain refinement passes
    (Ah > 0) and point transforms (Al > 0) — otherwise the identity
    tests above would silently stop covering them."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    b = J.make_progressive_jpeg(img)
    # walk SOS headers: Ss, Se, Ah, Al live at the scan-header tail
    scans = []
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(b[pos + 2 : pos + 4], "big")
        if marker == 0xDA:
            body = b[pos + 4 : pos + 2 + ln]
            ns = body[0]
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            scans.append((ns, ss, se, ahal >> 4, ahal & 15))
            nxt = pos + 2 + ln
            while nxt + 1 < len(b):
                if b[nxt] == 0xFF and b[nxt + 1] not in (0x00,) and not (
                    0xD0 <= b[nxt + 1] <= 0xD7
                ):
                    break
                nxt += 2 if b[nxt] == 0xFF else 1
            pos = nxt
            continue
        pos += 2 + ln
    assert len(scans) == 10
    assert any(ah > 0 and ss > 0 for _ns, ss, _se, ah, _al in scans)  # AC refine
    assert any(ah > 0 and ss == 0 for _ns, ss, _se, ah, _al in scans)  # DC refine
    assert any(al > 0 for *_x, al in scans)  # point transform
    assert all(ns == 1 for ns, ss, *_x in scans if ss > 0)  # AC never interleaved


def test_rejects_malformed_progressive():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    good = J.make_progressive_jpeg(img)
    assert J.try_decode_jpeg(good[:40]) is None
    assert J.try_decode_jpeg(good[:-20]) is None  # EOI gone → no finish
    # two SOF markers → reject
    sof_at = good.find(b"\xff\xc2")
    ln = int.from_bytes(good[sof_at + 2 : sof_at + 4], "big")
    doubled = good[: sof_at + 2 + ln] + good[sof_at : sof_at + 2 + ln] \
        + good[sof_at + 2 + ln :]
    assert J.try_decode_jpeg(doubled) is None


def test_fuzz_never_raises():
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (24, 24, 3), np.uint8)
    p = J.make_progressive_jpeg(img)
    for _trial in range(300):
        m = bytearray(p)
        for _ in range(int(rng.integers(1, 4))):
            m[int(rng.integers(2, len(m)))] = int(rng.integers(0, 256))
        J.try_decode_jpeg(bytes(m))  # any outcome but an exception
    for cut in range(2, len(p), 83):
        J.try_decode_jpeg(p[:cut])


def test_decode_images_progressive_physical_truth(spark):
    """The multimodal operator path decodes progressive payloads for
    real: width/height are the physical header values, the feature is
    the pixel-stat vector of the decoded raster (identical to the
    baseline payload's feature for the same image)."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (24, 40, 3), np.uint8)
    rows = [
        (1, "u1", "image", J.make_jpeg(img, quality=90), {}),
        (2, "u2", "image", J.make_progressive_jpeg(img, quality=90), {}),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.decode_images(media).collect()}
    assert (out[2].width, out[2].height) == (40, 24)
    assert out[1].feature == out[2].feature  # same pixels → same stats
