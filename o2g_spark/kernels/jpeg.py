"""Baseline + progressive JPEG codec in pure numpy + stdlib (no
PIL/libjpeg).

Decoder (:func:`try_decode_jpeg`) handles the interchange format every
real-world JPEG uses: marker walk, DQT/DHT/SOF0/SOF2/SOS/DRI,
byte-unstuffed entropy stream, canonical Huffman decode, per-component
DC prediction, EOB/ZRL runs, restart markers, dequant → inverse zigzag
→ float64 IDCT → level shift, and BT.601 YCbCr→RGB. Sampling factors
h, v ∈ {1, 2} are supported — 4:4:4, 4:2:2, 4:4:0, 4:2:0 and
grayscale, i.e. the shapes real web JPEGs use — with subsampled
chroma upsampled by pixel REPLICATION (nearest): deterministic, and
there is no libjpeg here whose smoothing filter could be matched.
PROGRESSIVE (SOF2) streams decode for real: multi-scan coefficient
accumulation per ITU-T T.81 Annex G — spectral selection bands,
successive approximation (DC/AC first + refinement passes with
EOB-run codes and buffered correction bits), interleaved DC /
non-interleaved AC traversal, per-scan restart intervals.
Restrictions (returns None, the stand-in path): arithmetic /
hierarchical / lossless scans, 12-bit precision, factors > 2.

Encoder (:func:`make_jpeg`) emits spec-conformant baseline 4:4:4 —
or 4:2:0 with ``subsample=True``, or grayscale —
JPEGs with the Annex-K quantization and Huffman tables:
the fixture builder for decoder tests and the at-scale decode bench —
and an independent conformance check, since the decoder must agree
with plain-python/numpy reference math on everything the encoder
emits (round-trip error is bounded by quantization alone).
:func:`make_progressive_jpeg` emits SOF2 streams with a
libjpeg-shaped scan script (DC first at Al=1 → AC spectral bands at
Al>0 → AC refinement → DC refinement → final AC refinements) or a
spectral-selection-only script — the progressive fixture builder.
Since both encoders quantize through the identical pipeline, a
progressive round-trip must decode to EXACTLY the same pixels as the
baseline round-trip of the same image: the cross-check that pins the
progressive entropy coding without a second reference decoder.

Both sides are deterministic: the DCT/IDCT are float64 matrix
products with a fixed basis, all roundings are explicit.

JPEG is lossy by construction, so unlike BMP/PNG/GIF/WAV there is no
"exact pixels from payload hex" DuckDB twin — the entropy stream is
not SQL-expressible. The decode is pinned by pytest round-trips and
analytic error bounds instead (tests/test_jpeg.py), the same
pytest-only evidence class as the OSM XML parser (SURVEY §2.A A1).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K.1 — the reference quantization tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 — standard Huffman tables as (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Progressive AC scans emit EOBn symbols (0x10..0xE0) that the Annex-K
# baseline AC tables don't contain — real progressive encoders ship
# custom (optimized) Huffman tables in their DHT segments. The fixture
# encoder uses this spec-conformant FLAT table over all 256 RS symbols:
# 254 at length 8 plus 2 at length 9 (the all-ones code stays reserved
# per T.81 C.2). Decoders always read tables from the stream.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(256))

# 8x8 DCT-II orthonormal basis (float64, fixed forever)
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _a, _x


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# --------------------------------------------------------- Huffman


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman → {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman → {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits_val: int, size: int) -> int:
    """T.81 F.12: map `size` received bits to the signed amplitude."""
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


# ---------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _quant_scaled(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex-K table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


def _encode_component(blocks: np.ndarray, dc_enc: dict, ac_enc: dict,
                      writer: _BitWriter, pred: int) -> int:
    """Entropy-encode quantized blocks (n, 64 zigzag order)."""
    for zz in blocks:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        size = _category(diff)
        code, ln = dc_enc[size]
        writer.write(code, ln)
        if size:
            amp = diff if diff >= 0 else diff + (1 << size) - 1
            writer.write(amp, size)
        # AC: run-length of zeros + size
        nz = np.nonzero(zz[1:])[0]
        k = 0
        for idx in nz:
            pos = int(idx)
            run = pos - k
            while run > 15:
                code, ln = ac_enc[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            v = int(zz[1 + pos])
            size = _category(v)
            code, ln = ac_enc[(run << 4) | size]
            writer.write(code, ln)
            amp = v if v >= 0 else v + (1 << size) - 1
            writer.write(amp, size)
            k = pos + 1
        if k < 63:
            code, ln = ac_enc[0x00]  # EOB
            writer.write(code, ln)
    return pred


def _quantize_components(rgb: np.ndarray, quality: int,
                         grayscale: bool, subsample: bool):
    """Shared encoder front half: RGB → per-component quantized
    zigzag blocks indexed [by, bx, 64] on the MCU-padded grid, plus
    the layout facts both encoders serialize."""
    h, w, _ = rgb.shape
    ycc = _rgb_to_ycbcr(rgb)
    ncomp = 1 if grayscale else 3
    qluma = _quant_scaled(QUANT_LUMA, quality)
    qchroma = _quant_scaled(QUANT_CHROMA, quality)
    if subsample and ncomp == 3:
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        factors = [(1, 1)] * ncomp
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    nmx = (w + mcu_w - 1) // mcu_w
    nmy = (h + mcu_h - 1) // mcu_h
    ph, pw = nmy * mcu_h, nmx * mcu_w
    pad = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    comp_blocks = []
    for c in range(ncomp):
        qtab = (qluma if c == 0 else qchroma).astype(np.float64)
        hf, vf = factors[c]
        plane = pad[..., c]
        if vf < vmax or hf < hmax:  # mean-downsample to the factor grid
            sy, sx = vmax // vf, hmax // hf
            plane = np.round(
                plane.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
            )
        plane = plane - 128.0
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8))
        zzs = np.empty((blocks.shape[0], 64), dtype=np.int64)
        for i, blk in enumerate(blocks):
            q = np.round(_dct2(blk).reshape(64) / qtab)
            zzs[i] = q.astype(np.int64)[ZIGZAG]
        comp_blocks.append(zzs.reshape(nby, nbx, 64))
    return comp_blocks, factors, qluma, qchroma, ncomp, nmx, nmy


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dht_seg(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def _headers(h: int, w: int, ncomp: int, factors, qluma, qchroma,
             sof_marker: int, restart_interval: int,
             flat_ac: bool = False) -> bytearray:
    """SOI through DRI — everything before the first SOS, shared by
    the baseline (SOF0) and progressive (SOF2) encoders. ``flat_ac``
    swaps the Annex-K AC tables for the flat progressive table that
    carries the EOBn symbols."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qluma[ZIGZAG].tolist()))
    if ncomp == 3:
        out += _seg(0xDB, bytes([1]) + bytes(qchroma[ZIGZAG].tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for c in range(ncomp):
        hf, vf = factors[c]
        sof += bytes([c + 1, (hf << 4) | vf, 0 if c == 0 else 1])
    out += _seg(sof_marker, sof)
    ac0 = (PROG_AC_BITS, PROG_AC_VALS) if flat_ac \
        else (AC_LUMA_BITS, AC_LUMA_VALS)
    ac1 = (PROG_AC_BITS, PROG_AC_VALS) if flat_ac \
        else (AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_seg(1, 0, *ac0)
    if ncomp == 3:
        out += _dht_seg(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_seg(1, 1, *ac1)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    return out


def make_jpeg(rgb: np.ndarray, quality: int = 90,
              grayscale: bool = False,
              restart_interval: int = 0,
              subsample: bool = False) -> bytes:
    """Serialize (h, w, 3) uint8 RGB (or its luma when ``grayscale``)
    as a baseline JFIF JPEG with Annex-K Huffman tables and
    quality-scaled Annex-K quant tables — 4:4:4 by default,
    ``subsample=True`` → 4:2:0 (luma 2×2 factors, chroma planes
    2×2-mean downsampled; the dominant real-world web-JPEG shape).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (decoder-coverage for real-world streams)."""
    h, w, _ = rgb.shape
    comp_blocks, factors, qluma, qchroma, ncomp, nmx, nmy = \
        _quantize_components(rgb, quality, grayscale, subsample)

    dc_enc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_enc = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # entropy stream: interleaved MCUs, hf×vf data units per component
    writer = _BitWriter()
    preds = [0] * ncomp
    n_mcu = nmy * nmx
    rst = 0
    payload = bytearray()
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            payload += writer.out
            writer = _BitWriter()
            payload += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(m, nmx)
        for c in range(ncomp):
            t = 0 if c == 0 else 1
            hf, vf = factors[c]
            for v_ in range(vf):
                for h_ in range(hf):
                    preds[c] = _encode_component(
                        comp_blocks[c][my * vf + v_, mx * hf + h_][None],
                        dc_enc[t], ac_enc[t], writer, preds[c])
    writer.flush()
    payload += writer.out

    out = _headers(h, w, ncomp, factors, qluma, qchroma, 0xC0,
                   restart_interval)
    sos = bytes([ncomp])
    for c in range(ncomp):
        t = 0 if c == 0 else 1
        sos += bytes([c + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += payload
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder


def _real_block_grids(h, w, factors):
    """Per-component NON-interleaved block grids (bh, bw): progressive
    AC scans traverse the component's own ceil-dims grid (T.81 A.2.2),
    which can be smaller than the MCU-padded grid the DC interleave
    covers — padding blocks never carry AC coefficients."""
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    grids = []
    for hf, vf in factors:
        cw = -(-(w * hf) // hmax)
        ch = -(-(h * vf) // vmax)
        grids.append(((ch + 7) // 8, (cw + 7) // 8))
    return grids


def _encode_prog_scan(comp_blocks, factors, comps, ss, se, ah, al,
                      dc_enc, ac_enc, nmx, nmy, grids, dri) -> bytes:
    """Entropy data for ONE progressive scan (T.81 G.1.2): DC scans
    may be interleaved; AC scans are single-component by spec. EOB
    runs and (in refinement passes) buffered correction bits follow
    the Annex-G figures exactly — correction bits attach to the NEXT
    emitted symbol, EOB-run bits to the pending run."""
    payload = bytearray()
    writer = _BitWriter()
    rst = 0

    def restart():
        nonlocal writer, rst
        writer.flush()
        payload.extend(writer.out)
        writer = _BitWriter()
        payload.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
        rst += 1

    if ss == 0:  # ---- DC scan (first or refinement)
        preds = {c: 0 for c in comps}

        def dc_unit(c, by, bx):
            coef = int(comp_blocks[c][by, bx, 0])
            if ah == 0:
                t = 0 if c == 0 else 1
                val = coef >> al  # arithmetic shift per G.1.2.1
                diff = val - preds[c]
                preds[c] = val
                size = _category(diff)
                code, ln = dc_enc[t][size]
                writer.write(code, ln)
                if size:
                    amp = diff if diff >= 0 else diff + (1 << size) - 1
                    writer.write(amp, size)
            else:
                writer.write((coef >> al) & 1, 1)

        if len(comps) > 1:  # interleaved — DRI counts MCUs
            for m in range(nmy * nmx):
                if dri and m and m % dri == 0:
                    restart()
                    for c in comps:
                        preds[c] = 0
                my, mx = divmod(m, nmx)
                for c in comps:
                    hf, vf = factors[c]
                    for v_ in range(vf):
                        for h_ in range(hf):
                            dc_unit(c, my * vf + v_, mx * hf + h_)
        else:  # non-interleaved — DRI counts data units
            c = comps[0]
            bh, bw = grids[c]
            for i in range(bh * bw):
                if dri and i and i % dri == 0:
                    restart()
                    preds[c] = 0
                dc_unit(c, *divmod(i, bw))
        writer.flush()
        payload.extend(writer.out)
        return bytes(payload)

    # ---- AC scan: exactly one component
    c = comps[0]
    t = 0 if c == 0 else 1
    enc = ac_enc[t]
    bh, bw = grids[c]
    st = {"eobrun": 0, "be": []}  # pending EOB run + its buffered bits

    def flush_eob():
        if st["eobrun"] > 0:
            nb = st["eobrun"].bit_length() - 1
            code, ln = enc[nb << 4]
            writer.write(code, ln)
            if nb:
                writer.write(st["eobrun"] & ((1 << nb) - 1), nb)
            st["eobrun"] = 0
            for bit in st["be"]:
                writer.write(bit, 1)
            st["be"] = []

    for i in range(bh * bw):
        if dri and i and i % dri == 0:
            flush_eob()
            restart()
        by, bx = divmod(i, bw)
        zz = comp_blocks[c][by, bx]
        if ah == 0:  # ---- AC first pass (G.1.2.2)
            r = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                a = (v if v >= 0 else -v) >> al  # magnitude shift
                if a == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    code, ln = enc[0xF0]
                    writer.write(code, ln)
                    r -= 16
                nbits = a.bit_length()
                code, ln = enc[(r << 4) | nbits]
                writer.write(code, ln)
                amp = a if v >= 0 else (~a) & ((1 << nbits) - 1)
                writer.write(amp, nbits)
                r = 0
            if r > 0:
                st["eobrun"] += 1
                if st["eobrun"] == 0x7FFF:
                    flush_eob()
        else:  # ---- AC refinement pass (G.1.2.3)
            absv = [(int(zz[k]) if zz[k] >= 0 else -int(zz[k])) >> al
                    for k in range(ss, se + 1)]
            eobpos = ss - 1  # position of last NEWLY-significant coef
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eobpos = k
            cur = []  # correction bits since the last emitted symbol
            r = 0
            for k in range(ss, se + 1):
                a = absv[k - ss]
                if a == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    flush_eob()
                    code, ln = enc[0xF0]
                    writer.write(code, ln)
                    r -= 16
                    for bit in cur:
                        writer.write(bit, 1)
                    cur = []
                if a > 1:  # already significant: buffer its next bit
                    cur.append(a & 1)
                    continue
                flush_eob()
                code, ln = enc[(r << 4) | 1]
                writer.write(code, ln)
                writer.write(1 if int(zz[k]) >= 0 else 0, 1)
                for bit in cur:
                    writer.write(bit, 1)
                cur = []
                r = 0
            if r > 0 or cur:
                st["eobrun"] += 1
                st["be"].extend(cur)
                if st["eobrun"] == 0x7FFF or len(st["be"]) > 900:
                    flush_eob()
    flush_eob()
    writer.flush()
    payload.extend(writer.out)
    return bytes(payload)


def make_progressive_jpeg(rgb: np.ndarray, quality: int = 90,
                          grayscale: bool = False,
                          restart_interval: int = 0,
                          subsample: bool = False,
                          spectral_only: bool = False) -> bytes:
    """Serialize as a PROGRESSIVE (SOF2) JFIF JPEG — same quantization
    pipeline as :func:`make_jpeg`, so decoding this stream must yield
    bit-identical pixels to decoding the baseline stream of the same
    (image, quality, sampling). Default scan script mirrors libjpeg's
    simple progression: interleaved DC at Al=1, AC spectral bands with
    successive approximation, AC refinement passes, DC refinement,
    final AC refinements to Al=0. ``spectral_only=True`` emits the
    minimal spectral-selection script (no successive approximation).
    ``restart_interval`` applies per scan (MCUs when interleaved, data
    units otherwise)."""
    h, w, _ = rgb.shape
    comp_blocks, factors, qluma, qchroma, ncomp, nmx, nmy = \
        _quantize_components(rgb, quality, grayscale, subsample)
    grids = _real_block_grids(h, w, factors)
    dc_enc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    flat = _build_encode_table(PROG_AC_BITS, PROG_AC_VALS)
    ac_enc = [flat, flat]

    if spectral_only:
        script = [(list(range(ncomp)), 0, 0, 0, 0)]
        script += [([c], 1, 63, 0, 0) for c in range(ncomp)]
    elif ncomp == 1:
        script = [([0], 0, 0, 0, 1),
                  ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                  ([0], 1, 63, 2, 1),
                  ([0], 0, 0, 1, 0),
                  ([0], 1, 63, 1, 0)]
    else:
        script = [([0, 1, 2], 0, 0, 0, 1),
                  ([0], 1, 5, 0, 2),
                  ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
                  ([0], 6, 63, 0, 2),
                  ([0], 1, 63, 2, 1),
                  ([0, 1, 2], 0, 0, 1, 0),
                  ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0),
                  ([0], 1, 63, 1, 0)]

    out = _headers(h, w, ncomp, factors, qluma, qchroma, 0xC2,
                   restart_interval, flat_ac=True)
    for comps, ss, se, ah, al in script:
        payload = _encode_prog_scan(
            comp_blocks, factors, comps, ss, se, ah, al,
            dc_enc, ac_enc, nmx, nmy, grids, restart_interval)
        sos = bytes([len(comps)])
        for c in comps:
            t = 0 if c == 0 else 1
            sos += bytes([c + 1, (t << 4) | t])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += payload
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over the entropy segment with byte unstuffing;
    stops at any non-RST marker. ``resync`` aligns past an expected
    RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.done = False

    def _fill(self) -> bool:
        while self.n < 25:
            if self.pos >= len(self.d):
                self.done = True
                return self.n > 0
            b = self.d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.d):
                    self.done = True
                    return self.n > 0
                nxt = self.d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RST — consumed by resync only
                    self.done = True
                    return self.n > 0
                else:  # a real marker (EOI etc.) ends the stream
                    self.done = True
                    return self.n > 0
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                continue
            self.acc = (self.acc << 8) | b
            self.n += 8
            self.pos += 1
        return True

    def bit(self) -> int | None:
        if self.n == 0 and not self._fill():
            return None
        if self.n == 0:
            return None
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int | None:
        v = 0
        for _ in range(k):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def resync(self) -> bool:
        """Drop partial bits, step over the RSTn marker."""
        self.acc = 0
        self.n = 0
        self.done = False
        if (self.pos + 1 < len(self.d) and self.d[self.pos] == 0xFF
                and 0xD0 <= self.d[self.pos + 1] <= 0xD7):
            self.pos += 2
            return True
        return False


def _huff_decode(reader: _BitReader, table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        b = reader.bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def try_decode_jpeg(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Parse a baseline (SOF0) or progressive (SOF2) JPEG →
    (width, height, rgb). See the module docstring for the supported
    envelope; anything outside it (arithmetic/hierarchical, 12-bit,
    malformed) → None."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    dri = 0
    progressive = False
    coefs = None  # per-component zigzag coefficient grids (SOF2)
    scan_done = False
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            if progressive and scan_done:
                h, w, comps = sof
                return _finish_progressive(h, w, comps, coefs, qtabs)
            return None
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            return None  # arithmetic / hierarchical / lossless frames
        if pos + 4 > len(b):
            return None
        ln = int.from_bytes(b[pos + 2 : pos + 4], "big")
        body = b[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            return None
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq != 0 or p + 65 > len(body):
                    return None
                zz = np.frombuffer(body[p + 1 : p + 65], np.uint8)
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = zz
                qtabs[tq] = tab
                p += 65
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p + 17 <= len(body):
                cls, tid = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                if len(vals) != nv:
                    return None
                htabs[(cls, tid)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if sof is not None:
                return None  # one frame per stream
            progressive = marker == 0xC2
            if len(body) < 6:
                return None
            prec = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nf = body[5]
            if prec != 8 or nf not in (1, 3) or h == 0 or w == 0:
                return None
            if len(body) < 6 + 3 * nf:
                return None
            # decode-bomb guard, calibrated for THIS codec: the scan
            # materializes float64 planes (8 B/px/component, vs uint8
            # for BMP/GIF) and entropy-decodes per-bit in Python, and
            # in local mode 32 concurrent tasks share one heap
            # (CLAUDE.md rule 6). 4 MP caps peak memory ~0.3 GB/row;
            # larger files take the sha256 stand-in path (documented
            # envelope limit, not silent truncation).
            if h * w > 4 * 1024 * 1024:
                return None
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hf, vf = hv >> 4, hv & 15
                if hf not in (1, 2) or vf not in (1, 2):
                    return None  # beyond 2× subsampling — out of envelope
                comps.append((cid, hf, vf, tq))
            sof = (h, w, comps)
        elif marker == 0xDD:
            dri = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None or len(body) < 1:
                return None
            h, w, comps = sof
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                return None
            if not progressive:
                if ns != len(comps):
                    return None
                scan = {}
                for c in range(ns):
                    cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                    scan[cs] = (tt >> 4, tt & 15)
                return _decode_scan(b, pos + 2 + ln, h, w, comps, scan,
                                    qtabs, htabs, dri)
            if coefs is None:
                coefs = _alloc_prog_coefs(h, w, comps)
            scan_comps = []
            cid_index = {c[0]: i for i, c in enumerate(comps)}
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                if cs not in cid_index:
                    return None
                scan_comps.append((cid_index[cs], tt >> 4, tt & 15))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            nxt = _decode_prog_scan(b, pos + 2 + ln, h, w, comps,
                                    scan_comps, ss, se, ah, al,
                                    coefs, htabs, dri)
            if nxt is None:
                return None
            scan_done = True
            pos = nxt
            continue
        # APPn / COM / others: skip
        pos += 2 + ln
    return None


def _decode_block(reader, dc_tab, ac_tab, qtab, pred):
    """One 8×8 data unit → (new DC predictor, reconstructed block),
    or None on a malformed stream."""
    size = _huff_decode(reader, dc_tab)
    if size is None or size > 11:
        return None
    amp = reader.bits(size) if size else 0
    if amp is None:
        return None
    pred += _extend(amp, size)
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            return None
        amp = reader.bits(s)
        if amp is None:
            return None
        zz[k] = _extend(amp, s)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz * qtab[ZIGZAG]
    return pred, _idct2(coef.reshape(8, 8)) + 128.0


def _decode_scan(b, pos, h, w, comps, scan, qtabs, htabs, dri):
    """Interleaved baseline scan with per-component sampling factors
    (h, v ∈ {1, 2} — 4:4:4, 4:2:2, 4:4:0, 4:2:0, grayscale). Subsampled
    components are upsampled by pixel replication (nearest): exactness
    over libjpeg's smoothing filter — there is no libjpeg here to
    match, and replication is the deterministic choice."""
    ncomp = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if ncomp == 1:  # single-component scans are never interleaved
        comps = [(comps[0][0], 1, 1, comps[0][3])]
        hmax = vmax = 1
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    nmx = (w + mcu_w - 1) // mcu_w
    nmy = (h + mcu_h - 1) // mcu_h
    n_mcu = nmx * nmy
    planes = []
    try:
        tables = []
        for cid, hf, vf, tq in comps:
            dc_t, ac_t = scan[cid]
            tables.append((htabs[(0, dc_t)], htabs[(1, ac_t)], qtabs[tq]))
            planes.append(np.zeros((nmy * vf * 8, nmx * hf * 8),
                                   dtype=np.float64))
    except KeyError:
        return None
    reader = _BitReader(b, pos)
    preds = [0] * ncomp
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            if not reader.resync():
                return None
            preds = [0] * ncomp
        my, mx = divmod(m, nmx)
        for c in range(ncomp):
            _cid, hf, vf, _tq = comps[c]
            dc_tab, ac_tab, qtab = tables[c]
            for v_ in range(vf):
                for h_ in range(hf):
                    out = _decode_block(reader, dc_tab, ac_tab, qtab,
                                        preds[c])
                    if out is None:
                        return None
                    preds[c], blk = out
                    y0 = (my * vf + v_) * 8
                    x0 = (mx * hf + h_) * 8
                    planes[c][y0 : y0 + 8, x0 : x0 + 8] = blk
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


def _planes_to_rgb(planes, comps, h, w, hmax, vmax):
    """Upsample-by-replication, crop, and color-convert decoded
    component planes — shared by the baseline and progressive paths."""
    if len(planes) == 1:
        y = np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
        return w, h, np.repeat(y[..., None], 3, axis=2)
    full = []
    for c in range(len(planes)):
        _cid, hf, vf, _tq = comps[c]
        p = planes[c]
        if vf < vmax:
            p = np.repeat(p, vmax // vf, axis=0)
        if hf < hmax:
            p = np.repeat(p, hmax // hf, axis=1)
        full.append(p[:h, :w])
    return w, h, _ycbcr_to_rgb(np.stack(full, axis=-1))


# ------------------------------------------------- progressive decoder


def _alloc_prog_coefs(h, w, comps):
    """Per-component int32 zigzag-order coefficient grids on the
    MCU-padded layout (interleaved DC scans traverse padding blocks;
    non-interleaved AC scans stop at the real grid)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    nmx = (w + 8 * hmax - 1) // (8 * hmax)
    nmy = (h + 8 * vmax - 1) // (8 * vmax)
    return [np.zeros((nmy * vf * 8 // 8, nmx * hf * 8 // 8, 64),
                     dtype=np.int32)
            for _cid, hf, vf, _tq in comps]


def _prog_dc_unit(reader, zz, dc_tab, preds, ci, ah, al):
    """One DC data unit (first pass: Huffman diff at point transform
    ``al``; refinement: a single bit ORed in at bit ``al``)."""
    if ah == 0:
        size = _huff_decode(reader, dc_tab)
        if size is None or size > 11:
            return False
        amp = reader.bits(size) if size else 0
        if amp is None:
            return False
        preds[ci] += _extend(amp, size)
        zz[0] = preds[ci] << al
    else:
        bit = reader.bit()
        if bit is None:
            return False
        if bit:
            zz[0] = int(zz[0]) | (1 << al)
    return True


def _prog_ac_first(reader, zz, ac_tab, ss, se, al, st):
    """AC first pass for one block (T.81 G.1.2.2): EOB-run codes,
    ZRL, amplitudes at point transform ``al``."""
    if st["eobrun"] > 0:
        st["eobrun"] -= 1
        return True
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        if rs is None:
            return False
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            st["eobrun"] = (1 << r) - 1
            if r:
                ext = reader.bits(r)
                if ext is None:
                    return False
                st["eobrun"] += ext
            break
        k += r
        if k > se:
            return False
        amp = reader.bits(s)
        if amp is None:
            return False
        zz[k] = _extend(amp, s) << al
        k += 1
    return True


def _prog_ac_refine(reader, zz, ac_tab, ss, se, al, st):
    """AC refinement pass for one block (T.81 G.1.2.3): newly
    significant coefficients arrive as ±1<<al; already-significant
    ones take correction bits as the scan advances past them."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if st["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            if rs is None:
                return False
            r, s = rs >> 4, rs & 15
            newval = 0
            if s:
                if s != 1:
                    return False  # refinement amplitudes are ±1
                bit = reader.bit()
                if bit is None:
                    return False
                newval = p1 if bit else m1
            elif r != 15:
                st["eobrun"] = 1 << r
                if r:
                    ext = reader.bits(r)
                    if ext is None:
                        return False
                    st["eobrun"] += ext
                break
            # advance over r zero-history coefs, correcting nonzero ones
            while k <= se:
                cur = int(zz[k])
                if cur != 0:
                    bit = reader.bit()
                    if bit is None:
                        return False
                    if bit and (cur & p1) == 0:
                        zz[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if st["eobrun"] > 0:
        while k <= se:  # tail of the block inside the EOB run
            cur = int(zz[k])
            if cur != 0:
                bit = reader.bit()
                if bit is None:
                    return False
                if bit and (cur & p1) == 0:
                    zz[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        st["eobrun"] -= 1
    return True


def _next_marker_pos(b, pos):
    """Position of the next real (non-stuffed, non-RST) marker at or
    after ``pos`` — how a progressive scan's entropy segment ends."""
    while pos + 1 < len(b):
        if b[pos] == 0xFF:
            nxt = b[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return None


def _decode_prog_scan(b, pos, h, w, comps, scan_comps, ss, se, ah, al,
                      coefs, htabs, dri):
    """Decode ONE progressive scan into the coefficient grids; returns
    the position of the marker after the scan, or None on malformed
    input. DC scans (ss=0) may be interleaved; AC scans must be
    single-component (spec). DRI counts MCUs when interleaved, data
    units otherwise, resetting DC predictors and the EOB run."""
    if ss > se or se > 63 or (ss == 0) != (se == 0):
        return None
    if ah > 13 or al > 13:
        return None
    if ss > 0 and len(scan_comps) != 1:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    nmx = (w + 8 * hmax - 1) // (8 * hmax)
    nmy = (h + 8 * vmax - 1) // (8 * vmax)
    tabs = {}
    try:
        for ci, dc_t, ac_t in scan_comps:
            if ss == 0 and ah == 0:
                tabs[ci] = htabs[(0, dc_t)]
            elif ss > 0:
                tabs[ci] = htabs[(1, ac_t)]
            else:  # DC refinement reads raw bits — no table needed
                tabs[ci] = None
    except KeyError:
        return None
    reader = _BitReader(b, pos)
    interleaved = len(scan_comps) > 1
    preds = {ci: 0 for ci, _d, _a in scan_comps}
    st = {"eobrun": 0}

    def do_restart():
        if not reader.resync():
            return False
        for ci in preds:
            preds[ci] = 0
        st["eobrun"] = 0
        return True

    if ss == 0 and interleaved:
        for m in range(nmy * nmx):
            if dri and m and m % dri == 0:
                if not do_restart():
                    return None
            my, mx = divmod(m, nmx)
            for ci, _dc_t, _ac_t in scan_comps:
                _cid, hf, vf, _tq = comps[ci]
                for v_ in range(vf):
                    for h_ in range(hf):
                        zz = coefs[ci][my * vf + v_, mx * hf + h_]
                        if not _prog_dc_unit(reader, zz, tabs[ci],
                                             preds, ci, ah, al):
                            return None
    else:
        ci, _dc_t, _ac_t = scan_comps[0]
        _cid, hf, vf, _tq = comps[ci]
        cw = -(-(w * hf) // hmax)
        ch = -(-(h * vf) // vmax)
        bw, bh = (cw + 7) // 8, (ch + 7) // 8
        for i in range(bh * bw):
            if dri and i and i % dri == 0:
                if not do_restart():
                    return None
            by, bx = divmod(i, bw)
            zz = coefs[ci][by, bx]
            if ss == 0:
                ok = _prog_dc_unit(reader, zz, tabs[ci], preds, ci, ah, al)
            elif ah == 0:
                ok = _prog_ac_first(reader, zz, tabs[ci], ss, se, al, st)
            else:
                ok = _prog_ac_refine(reader, zz, tabs[ci], ss, se, al, st)
            if not ok:
                return None
    return _next_marker_pos(b, pos)


def _finish_progressive(h, w, comps, coefs, qtabs):
    """All scans consumed → dequantize, IDCT (vectorized over blocks),
    assemble planes, upsample, color-convert."""
    if coefs is None:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (_cid, hf, vf, tq) in enumerate(comps):
        q = qtabs.get(tq)
        if q is None:
            return None
        grid = coefs[ci]
        nby, nbx = grid.shape[0], grid.shape[1]
        flat = grid.reshape(-1, 64).astype(np.float64)
        deq = flat * q[ZIGZAG][None, :].astype(np.float64)
        nat = np.zeros_like(deq)
        nat[:, ZIGZAG] = deq
        blocks = nat.reshape(-1, 8, 8)
        out = np.matmul(np.matmul(_C.T, blocks), _C) + 128.0
        plane = (out.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(nby * 8, nbx * 8))
        planes.append(plane)
    if len(comps) == 1:
        return _planes_to_rgb(planes, comps, h, w, 1, 1)
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)
