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


# ------------------------- hand-assembled SOF2 fixture (ADVICE r5 #2)


def _seg(marker, body):
    import struct
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def _hand_assembled_sof2() -> bytes:
    """A spec-derived progressive stream built WITHOUT the sibling
    encoder: 8×8, one component, all-ones quant table, coefficients
    DC=16 / AC(zigzag 1)=3, delivered over FOUR scans exercising every
    Annex G path the r5 ADVICE flagged — DC first at Al=1, DC
    refinement raw bit, AC first at Al=1 with an EOB run, AC
    refinement whose correction bit rides an EOB-run skip.

    Bitstreams (derived by hand from T.81 §G.1.2, canonical Huffman):
      DC table: counts [1,0,...], vals [4]          → '0' = category 4
      AC table: counts [1,1,0,...], vals [0x01,0x00] → '0'=0x01, '10'=EOB0
      scan1 DC first (Al=1): send DC>>1 = 8: '0' + '1000'  → 0x47 padded
      scan2 DC refine:       raw bit DC&1 = 0: '0'         → 0x7F
      scan3 AC first (Al=1): AC1>>1 = 1: '0'+'1', EOB '10' → 0x6F
      scan4 AC refine:       EOB '10' + correction bit '1' → 0xBF
    """
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof2 = _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([4]))
    dht_ac = _seg(0xC4, bytes([0x10]) + bytes([1, 1] + [0] * 14)
                  + bytes([0x01, 0x00]))

    def sos(ss, se, ah, al, data):
        return _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) + data

    return (b"\xff\xd8" + dqt + sof2 + dht_dc + dht_ac
            + sos(0, 0, 0, 1, b"\x47")    # DC first, Al=1
            + sos(0, 0, 1, 0, b"\x7f")    # DC refine
            + sos(1, 63, 0, 1, b"\x6f")   # AC first, Al=1, EOB run
            + sos(1, 63, 1, 0, b"\xbf")   # AC refine, bit in EOB skip
            + b"\xff\xd9")


def test_hand_assembled_sof2_pins_decoder_independently():
    got = J.try_decode_jpeg(_hand_assembled_sof2())
    assert got is not None, "decoder rejected the spec-derived stream"
    w, h, px = got
    assert (w, h) == (8, 8)
    # expected pixels from the hand-written COEFFICIENT matrix through
    # the (independently round-trip-tested) IDCT — entropy decode and
    # Annex G ordering are what this fixture pins
    zz = np.zeros(64)
    zz[0], zz[1] = 16.0, 3.0
    nat = np.zeros(64)
    nat[J.ZIGZAG] = zz
    block = nat.reshape(8, 8)
    plane = J._C.T @ block @ J._C + 128.0
    want = np.repeat(
        np.clip(np.round(plane), 0, 255).astype(np.uint8)[..., None],
        3, axis=2)
    assert np.array_equal(px, want)
