"""Multimodal column plumbing (driver brief: image/audio/video as opaque
``binary`` columns with typed metadata; decode/feature steps STUBBED —
no media libs in this container — but the Spark-side schema,
partitioning, UDF signature and Arrow batch shape are real and tested).

The html→text extraction (BASELINE.json B3) lives here too: it is the
one production decode this corpus actually has (html binary → text
string), it is pure and deterministic, and the byte-identical-text
invariant is asserted against it (SURVEY.md §5.2 item 3).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoders, absent in this container (SURVEY.md §8)
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# ------------------------------------------------------------- html → text

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"[ \t\r\n]+")


def html_to_text_bytes(html: bytes) -> bytes:
    """Pure html→text: strip tags, collapse ASCII whitespace, trim.

    THE canonical extraction function — pinned, versioned by test
    golden hashes; every byte it emits must be stable forever
    (BASELINE.json input_hint: byte-identical extracted text per url).
    Operates on bytes so no unicode normalization can sneak in.
    """
    return _WS_RE.sub(b" ", _TAG_RE.sub(b"", html)).strip()


def html_to_text_udf():
    """Arrow pandas UDF wrapping :func:`html_to_text_bytes`."""

    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        # errors="replace": real crawls (--pages warc:) carry
        # latin-1/GBK/broken pages — U+FFFD per bad byte is
        # deterministic (the lineage text_sha stays stable) where a
        # strict decode would kill the whole job on one page; valid
        # UTF-8 (every gate fixture) is byte-unchanged
        return html.map(
            lambda b: html_to_text_bytes(bytes(b)).decode(
                "utf-8", errors="replace"
            )
        )

    return _extract


def extract_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages + ``text_extracted`` column (B3). Never mutates ``text``."""
    return pages.withColumn("text_extracted", html_to_text_udf()(F.col(html_col)))


# ----------------------------------------------------------- media schema

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


# ------------------------------------------------- real numpy decoders
#
# No PIL/ffmpeg in this container, but BMP (24-bit BI_RGB), PNG (8-bit,
# stdlib zlib + filter reversal), GIF (palette + a general LZW decoder),
# baseline JPEG (kernels/jpeg.py — Huffman entropy decode + IDCT +
# YCbCr, 4:4:4/grayscale envelope) and WAV (PCM16) are parseable in
# pure numpy/stdlib — so those formats decode FOR REAL inside the
# existing mapInPandas batches: physically-true width/height/pixels
# and sample-rate/duration/RMS (JPEG covers baseline AND progressive
# SOF2, 4:4:4 through 4:2:0 sampling). VIDEO decodes for real too for
# AVI containers — raw-DIB and MJPEG frames via kernels/avi.py,
# surfaced by operators/video.py (decode_video / video_frame_dhash /
# video_near_dup_pairs). MP3 and non-AVI video containers (MP4/H.264)
# still fall back to the deterministic sha256 stand-in below.


def try_decode_bmp(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Parse an uncompressed 24-bit BI_RGB BMP → (width, height, rgb).

    ``rgb`` is uint8 with shape (height, width, 3), top row first,
    channels in R,G,B order. Handles 4-byte row stride padding and both
    bottom-up (positive biHeight) and top-down (negative) layouts.
    Returns None for anything that is not such a BMP.
    """
    if len(b) < 54 or b[:2] != b"BM":
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h_raw = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    if off < 54 or len(b) < off + stride * h:
        return None
    arr = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
    arr = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up file order → top row first
        arr = arr[::-1]
    return w, h, arr[..., ::-1]  # file stores BGR


def try_decode_wav(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Parse a RIFF/WAVE PCM 16-bit payload → (rate, channels, samples).

    ``samples`` is int16 with shape (n_frames, channels). Walks the
    chunk list (not a fixed 44-byte assumption), honoring the odd-size
    pad byte. Returns None for non-PCM16 or malformed payloads.
    """
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt = data = None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16 or channels < 1 or rate <= 0:
        return None
    n = len(data) // (2 * channels)
    if n == 0:
        return None
    samples = np.frombuffer(data, dtype="<i2", count=n * channels)
    return rate, channels, samples.reshape(n, channels)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec filters 0-4) on the
    decompressed stream ``raw`` (h rows of 1 filter byte + w*ch pixel
    bytes). All arithmetic is mod-256 uint8 per the spec; Paeth's
    predictor compares in signed space. Sub/Up are vectorized
    (cumulative sums); Average/Paeth walk x per row (left-neighbor
    dependence with floor/branch breaks the prefix-sum form)."""
    rb = w * ch  # row bytes
    raw = raw.reshape(h, 1 + rb)
    ftypes = raw[:, 0]
    out = np.zeros((h, rb), dtype=np.uint8)
    prior = np.zeros(rb, dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        line = raw[y, 1:].copy()
        if f == 0:
            rec = line
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-ch] → cumsum/lane
            rec = (line.reshape(-1, ch).astype(np.uint64).cumsum(axis=0)
                   % 256).astype(np.uint8).reshape(rb)
        elif f == 2:  # Up
            rec = line + prior
        elif f == 3:  # Average
            rec = np.zeros(rb, dtype=np.uint8)
            for x in range(rb):
                a = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + (a + int(prior[x])) // 2) % 256
        elif f == 4:  # Paeth
            rec = np.zeros(rb, dtype=np.uint8)
            for x in range(rb):
                a = int(rec[x - ch]) if x >= ch else 0
                b_ = int(prior[x])
                c_ = int(prior[x - ch]) if x >= ch else 0
                p = a + b_ - c_
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c_)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                rec[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prior = rec
    return out


def try_decode_png(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Parse a non-interlaced 8-bit PNG → (width, height, rgb).

    Pure stdlib-zlib + numpy (no PIL): chunk walk, IDAT concat,
    inflate, filter reversal (all five spec filters, :func:`_png_unfilter`).
    Color types 2 (RGB — returned as-is), 6 (RGBA — alpha dropped) and
    0 (greyscale — replicated to 3 channels) are supported; anything
    else (palette, 16-bit, Adam7 interlace, malformed) returns None.
    ``rgb`` is uint8 (height, width, 3), top row first, R,G,B order —
    the same contract as :func:`try_decode_bmp`.
    """
    import zlib

    if len(b) < 8 + 25 or b[:8] != _PNG_SIG:
        return None
    pos = 8
    ihdr = None
    idat = b""
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        cid = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            return None
        if cid == b"IHDR":
            ihdr = body
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + ln  # len + type + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if (w <= 0 or h <= 0 or depth != 8 or channels is None
            or comp != 0 or filt != 0 or interlace != 0):
        return None
    expected = h * (1 + w * channels)
    # bomb guard: reject absurd declared dimensions BEFORE inflating,
    # and cap the inflate at expected+1 bytes (a 1 MB IDAT of deflated
    # zeros can otherwise expand to gigabytes inside the Python worker
    # before the length check ever runs)
    if expected > 256 * 1024 * 1024:
        return None
    try:
        raw = zlib.decompressobj().decompress(idat, expected + 1)
    except zlib.error:
        return None
    if len(raw) != expected:
        return None
    try:
        px = _png_unfilter(
            np.frombuffer(raw, dtype=np.uint8), h, w, channels
        ).reshape(h, w, channels)
    except ValueError:
        return None  # malformed filter byte — stand-in path, not a crash
    if ctype == 0:
        return w, h, np.repeat(px, 3, axis=2)
    return w, h, px[..., :3]  # RGBA → drop alpha; RGB as-is


def _lzw_decode(data: bytes, min_code_size: int,
                max_out: int) -> bytearray | None:
    """General GIF-flavor LZW decode of a concatenated sub-block stream
    (variable-width codes, LSB-first packing, CLEAR/EOI handling, the
    standard bump-at-2^width growth rule, 12-bit cap). Bails to None on
    truncation, codes past the table, or output beyond ``max_out``
    (decompression-bomb guard) — the caller treats None as
    not-a-decodable-GIF, never a crash."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None
    out = bytearray()
    acc = nbits = pos = 0
    n = len(data)
    bump_pending = False
    while True:
        while nbits < width:
            if pos >= n:
                return None  # truncated before EOI
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if bump_pending:
            # The table just reached 2^width — the encoder widened IF
            # it added one more entry, which requires one more DATA
            # code; if the stream instead ends (EOI) or resets (CLEAR)
            # right here, those were written at the OLD width (the
            # flush pair adds no entry — found by hypothesis fuzz:
            # an 11-symbol mcs=2 stream whose last append lands
            # exactly on the boundary). Peeking the old-width low
            # bits is UNAMBIGUOUS: a valid wider data code v with
            # v % 2^width == eoi (or clear) would have to be eoi/clear
            # itself or exceed the max valid index (len(table) = 2^w).
            bump_pending = False
            peek = acc & ((1 << width) - 1)
            if peek == eoi:
                return out
            if peek == clear:
                acc >>= width
                nbits -= width
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            width += 1
            continue  # refill: the wider code may need another byte
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= clear:
                return None  # first code after clear must be a literal
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # table frozen at the 12-bit cap
                table.append(prev + entry[:1])
        elif code == len(table) and code < 4096:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        if prev is not None and len(table) >= (1 << width) and width < 12:
            bump_pending = True  # deferred: see the peek above
        out += entry
        if len(out) > max_out:
            return None
        prev = entry


def try_decode_gif(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Parse a non-interlaced GIF87a/89a (first frame) → (width, height,
    rgb). Pure numpy + a general python LZW decoder (:func:`_lzw_decode`
    — handles REAL compressed streams, not just the literal-only layout
    :func:`make_gif` emits): header + logical screen descriptor, global
    or local color table, extension-block skip, sub-block concat.
    Interlaced images, missing palettes, indices past the palette, and
    malformed streams return None (stand-in path). ``rgb`` is uint8
    (height, width, 3), top row first, R,G,B — the same contract as
    :func:`try_decode_bmp` / :func:`try_decode_png`."""
    if len(b) < 14 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = b[10]
    pos = 13
    gct = None
    if packed >> 7:
        sz = 2 ** ((packed & 7) + 1)
        if pos + 3 * sz > len(b):
            return None
        gct = np.frombuffer(b, np.uint8, 3 * sz, offset=pos).reshape(-1, 3)
        pos += 3 * sz
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:  # extension: label byte then sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif blk == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                return None
            left = int.from_bytes(b[pos + 1 : pos + 3], "little")
            top = int.from_bytes(b[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(b[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(b[pos + 7 : pos + 9], "little")
            ipacked = b[pos + 9]
            pos += 10
            if iw <= 0 or ih <= 0 or (ipacked >> 6) & 1:  # interlaced
                return None
            sw = int.from_bytes(b[6:8], "little")
            sh = int.from_bytes(b[8:10], "little")
            if left or top or iw != sw or ih != sh:
                # cropped/offset first frame: the true image is the
                # logical-screen canvas with background fill — refusing
                # (stand-in path) beats silently reporting the
                # sub-frame's dims/pixels as the whole image
                return None
            pal = gct
            if ipacked >> 7:  # local color table wins
                sz = 2 ** ((ipacked & 7) + 1)
                if pos + 3 * sz > len(b):
                    return None
                pal = np.frombuffer(
                    b, np.uint8, 3 * sz, offset=pos
                ).reshape(-1, 3)
                pos += 3 * sz
            if pal is None or pos >= len(b) or iw * ih > 64 * 1024 * 1024:
                return None
            mcs = b[pos]
            pos += 1
            if not 2 <= mcs <= 8:
                return None
            chunks = []
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                chunks.append(b[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(b"".join(chunks), mcs, iw * ih)
            if idx is None or len(idx) < iw * ih:
                return None
            a = np.frombuffer(bytes(idx[: iw * ih]), np.uint8)
            if int(a.max()) >= pal.shape[0]:
                return None
            return iw, ih, pal[a].reshape(ih, iw, 3)
        else:  # trailer (0x3B) before any image, or junk
            return None
    return None


def lzw_encode_reference(data: bytes, mcs: int) -> bytes:
    """Conformant GIF-LZW ENCODER (greedy longest-match, late width
    change — bump after the just-added entry index reaches 2^width —
    and deferred clear: the table freezes at 4096). Fixture-class
    code, like :func:`make_gif`/:func:`make_png`: it exists so tests
    and benches can feed the general decoder REAL compressed streams
    without three drifting copies of these subtle conventions."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    stream = bytearray()
    acc = nbits = 0
    width = mcs + 1

    def emit(c: int) -> None:
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 255)
            acc >>= 8
            nbits -= 8

    emit(clear)
    table = {bytes([i]): i for i in range(1 << mcs)}
    next_code = eoi + 1
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        stream.append(acc & 255)
    return bytes(stream)


def make_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Serialize (h, w) uint8 palette indices + a (256, 3) uint8 palette
    as a CANONICAL single-frame GIF89a: 6-byte header, 7-byte logical
    screen descriptor (256-entry GCT), 768-byte GCT, 10-byte image
    descriptor (no local table, no interlace), then a literal-only LZW
    stream — min code size 8, a CLEAR code before every ≤254-literal
    group so the code width stays frozen at 9 bits, EOI last, data
    framed in 255-byte sub-blocks. That fixed layout puts data byte j
    at file offset 793 + j + j//255 and pixel i's 9-bit code at bit
    9*(i + i//254 + 1), which is what lets the gate's DuckDB twin reach
    every pixel with integer shifts — no LZW dictionary. The DECODER
    (:func:`try_decode_gif`) is general; this canonical form is only
    the fixture builder (same pattern as :func:`make_png`)."""
    h, w = indices.shape
    if palette.shape != (256, 3):
        raise ValueError("canonical GIF fixture needs a 256-entry palette")
    flat = indices.reshape(-1).astype(np.uint8)
    codes: list[int] = []
    clear, eoi = 256, 257
    for g in range(0, flat.shape[0], 254):
        codes.append(clear)
        codes.extend(int(v) for v in flat[g : g + 254])
    codes.append(eoi)
    acc = nbits = 0
    stream = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    blocks = bytearray()
    for g in range(0, len(stream), 255):
        chunk = stream[g : g + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    lsd = (w.to_bytes(2, "little") + h.to_bytes(2, "little")
           + bytes([0xF7, 0, 0]))  # GCT present, 256 entries
    desc = (b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little")
            + h.to_bytes(2, "little") + b"\x00")
    return (b"GIF89a" + lsd + palette.astype(np.uint8).tobytes()
            + desc + bytes([8]) + bytes(blocks) + b"\x3b")


def _png_filter_line(line: np.ndarray, prior: np.ndarray, ch: int,
                     f: int) -> np.ndarray:
    """Apply PNG filter ``f`` to a reconstructed scanline (encoder
    side of :func:`_png_unfilter`; all mod-256)."""
    rb = line.shape[0]
    left = np.zeros(rb, dtype=np.uint8)
    left[ch:] = line[:-ch]
    if f == 0:
        return line
    if f == 1:
        return line - left
    if f == 2:
        return line - prior
    if f == 3:
        return line - ((left.astype(np.uint16) + prior) // 2).astype(np.uint8)
    if f == 4:
        ul = np.zeros(rb, dtype=np.uint8)
        ul[ch:] = prior[:-ch]
        a, b_, c_ = (x.astype(np.int32) for x in (left, prior, ul))
        p = a + b_ - c_
        pa, pb, pc = np.abs(p - a), np.abs(p - b_), np.abs(p - c_)
        pred = np.where(
            (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b_, c_)
        ).astype(np.uint8)
        return line - pred
    raise ValueError(f"bad PNG filter type {f}")


def make_png(rgb: np.ndarray, filter_type: int = 0,
             stored: bool = True) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as a CANONICAL 8-bit
    truecolor PNG: 8-byte signature, IHDR, exactly ONE IDAT, IEND, no
    ancillary chunks; every scanline uses ``filter_type``.

    ``stored=True`` wraps the filtered stream in a single STORED
    (uncompressed) DEFLATE block — raw scanline bytes then sit at the
    FIXED file offset 48 (8 sig + 25 IHDR + 8 IDAT hdr + 2 zlib hdr +
    5 stored-block hdr), which is what lets the gate's DuckDB twin
    reach the pixels with byte arithmetic, no inflater. ``stored=
    False`` uses real zlib compression (decoder-side coverage).
    Raw stream must fit one stored block (h*(1+3w) ≤ 65535)."""
    import struct
    import zlib

    h, w, _ = rgb.shape
    lines = []
    prior = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        line = rgb[y].reshape(-1)
        lines.append(bytes([filter_type])
                     + _png_filter_line(line, prior, 3, filter_type).tobytes())
        prior = line
    raw = b"".join(lines)
    if stored:
        if len(raw) > 0xFFFF:
            raise ValueError("raw stream exceeds one stored DEFLATE block")
        comp = (b"\x78\x01"                      # zlib header (CM=8, no dict)
                + b"\x01"                        # BFINAL=1, BTYPE=00 (stored)
                + struct.pack("<HH", len(raw), len(raw) ^ 0xFFFF)
                + raw
                + struct.pack(">I", zlib.adler32(raw)))
    else:
        comp = zlib.compress(raw, 6)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


def make_bmp(rgb: np.ndarray, top_down: bool = False) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (54-byte header) — the fixture builder for decoder tests and the
    gate's hex-VALUES twin."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    bgr = rgb[..., ::-1]
    if not top_down:
        bgr = bgr[::-1]
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = bgr.reshape(h, w * 3)
    size = 54 + stride * h
    hdr = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + (h if not top_down else -h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + (stride * h).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return hdr + body.tobytes()


def make_wav(samples: np.ndarray, rate: int) -> bytes:
    """Serialize int16 samples (n,) or (n, channels) as a canonical
    44-byte-header PCM16 WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    hdr = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little")
    )
    return hdr + data


def _bmp_feature(rgb: np.ndarray) -> np.ndarray:
    """8-dim feature from exact integer pixel stats (cross-engine
    reproducible: sums are int64, each division float64, final float32):
    [meanR, meanG, meanB, maxR, maxG, maxB, min_all, mean_all] / 255."""
    n = rgb.shape[0] * rgb.shape[1]
    sums = rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    maxs = rgb.reshape(-1, 3).max(axis=0)
    vals = [float(sums[c]) / n / 255.0 for c in range(3)]
    vals += [float(maxs[c]) / 255.0 for c in range(3)]
    vals += [float(rgb.min()) / 255.0, float(sums.sum()) / (n * 3) / 255.0]
    return np.array(vals, dtype=np.float32)


def _try_decode_raster(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Sniff-and-decode the raster formats this container handles for
    real: 24-bit BMP, 8-bit PNG, palette GIF, then JPEG
    (kernels/jpeg.py — pure-numpy Huffman + IDCT; baseline AND
    progressive SOF2, 4:4:4 through 4:2:0 sampling + grayscale).
    One (w, h, rgb) contract."""
    out = try_decode_bmp(b)
    if out is None:
        out = try_decode_png(b)
    if out is None:
        out = try_decode_gif(b)
    if out is None and b[:2] == b"\xff\xd8":
        from ..kernels.jpeg import try_decode_jpeg

        out = try_decode_jpeg(b)
    return out


def _fake_decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real image decode.

    Derives (width, height, 8-dim feature) purely from payload bytes via
    sha256 — stable across machines/partitions, so tests can assert
    exact values. Replaced by PIL decode when available.

    The digest is over the LOWERCASE-HEX payload string (not the raw
    bytes): semantically equivalent as a fake, and it lets the gate's
    DuckDB twin reproduce every output value (DuckDB sha256 only
    accepts VARCHAR, and raw payload bytes need not be valid UTF-8).
    """
    d = hashlib.sha256(payload.hex().encode("ascii")).digest()  # 32 bytes
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    feat = np.frombuffer(d, dtype=np.uint8).reshape(8, 4)
    return width, height, (feat.sum(axis=1) / 255.0).astype(np.float32)


def decode_images(
    media: DataFrame, use_real_decoder: bool = False
) -> DataFrame:
    """image rows → (media_id, width, height, n_bytes, feature[8]).

    ``mapInPandas``: Arrow batches stream through a generator — payload
    bytes never accumulate beyond one batch per worker, which is the
    shape that survives 100 TB of media.

    Payloads are sniffed per row: 24-bit BMP, 8-bit PNG, palette GIF
    and JPEG (baseline + progressive) decode FOR REAL (pure numpy +
    stdlib zlib + a general LZW decoder + a Huffman/IDCT JPEG kernel,
    :func:`try_decode_bmp` / :func:`try_decode_png` /
    :func:`try_decode_gif` / ``kernels.jpeg.try_decode_jpeg``) with
    physically true width/height and :func:`_bmp_feature` pixel stats;
    other formats fall back to the deterministic sha256 stand-in.
    ``use_real_decoder=True`` demands a real decode for EVERY row, which
    needs PIL for the remaining codec formats — absent here, so it
    raises.
    """
    if use_real_decoder and not HAVE_PIL:
        raise NotImplementedError(
            "real decode of the remaining codec formats (MP3, "
            "MP4/H.264 video) needs PIL/pillow or ffmpeg — not in "
            "this container; BMP, PNG, GIF, JPEG (baseline AND "
            "progressive, 4:4:4 through 4:2:0) and AVI video "
            "(raw-DIB/MJPEG via operators/video.py) already decode "
            "for real"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                raster = _try_decode_raster(b)
                if raster is not None:
                    w, h, rgb = raster
                    feat = _bmp_feature(rgb)
                else:
                    w, h, feat = _fake_decode_image(b)
                rows.append((mid, w, h, len(payload), feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "feature"]
            )

    img = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return img.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), False),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("mfcc", T.ArrayType(T.FloatType()), False),
    ]
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32,
    use_real_decoder: bool = False,
) -> DataFrame:
    """image rows → fixed-size width*height*3 RGB pixel buffers.

    BMP, PNG, GIF and baseline-JPEG payloads are resampled FOR REAL:
    nearest-neighbor via
    numpy index arrays (``src_y = out_y * in_h // out_h``) over the
    actually decoded pixel grid. Remaining codec formats keep the
    deterministic sha256 stand-in (same schema and byte sizing)."""
    if use_real_decoder and not HAVE_PIL:
        raise NotImplementedError(
            "real resize of the remaining codec formats needs "
            "PIL/pillow — not in this container; BMP, PNG, GIF and "
            "baseline JPEG already "
            "resize for real"
        )

    n_bytes = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                raster = _try_decode_raster(b)
                if raster is not None:
                    in_w, in_h, rgb = raster
                    ys = np.arange(height) * in_h // height
                    xs = np.arange(width) * in_w // width
                    px = rgb[ys][:, xs].tobytes()
                    rows.append((mid, width, height, px))
                    continue
                # deterministic fake resample: stretch the sha256 stream
                seed = hashlib.sha256(b).digest()
                reps = (n_bytes + len(seed) - 1) // len(seed)
                rows.append((mid, width, height, (seed * reps)[:n_bytes]))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixels"]
            )

    img = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return img.mapInPandas(batches, schema=RESIZED_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """audio rows → (duration, rms, 13-dim MFCC-shaped features).

    PCM16 WAV payloads decode FOR REAL (:func:`try_decode_wav`):
    physically true sample-rate-derived duration, RMS from an exact
    int64 sum of squares over all channels, and 13 channel-0 segment
    energies as the MFCC-shaped stand-in (band of sample j is
    ``j*13//n`` — integer math, cross-engine reproducible; a true MFCC
    needs an FFT + mel filterbank, out of scope offline). Non-WAV
    payloads keep the deterministic sha256 stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                wav = try_decode_wav(b)
                if wav is not None:
                    rate, ch, samples = wav
                    n = samples.shape[0]
                    duration = n * 1000 // rate
                    s64 = samples.astype(np.int64)
                    sumsq = int((s64 * s64).sum())
                    rms = float(np.sqrt(sumsq / (n * ch)) / 32768.0)
                    c0 = s64[:, 0]
                    band = np.arange(n) * 13 // n
                    segsq = np.zeros(13, dtype=np.int64)
                    np.add.at(segsq, band, c0 * c0)  # exact int64 sums
                    segn = np.bincount(band, minlength=13)
                    mfcc = (np.sqrt(segsq / np.maximum(segn, 1))
                            / 32768.0).astype(np.float32)
                    rows.append((mid, duration, rms, mfcc.tolist()))
                    continue
                d = hashlib.sha256(b).digest()
                duration = 500 + int.from_bytes(d[:2], "big") % 10_000
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                rms = float(np.sqrt((arr * arr).mean())) if len(arr) else 0.0
                mfcc = (np.frombuffer(d[:26], dtype=np.uint8)
                        .astype(np.float32).reshape(13, 2).mean(axis=1) / 255.0)
                rows.append((mid, duration, round(rms, 6), mfcc.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "duration_ms", "rms", "mfcc"]
            )

    aud = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return aud.mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows → sampled frame rows (STUB decode, real plumbing).

    Frame count/timestamps derive from declared ``meta['duration_ms']``;
    frame payloads are deterministic digests of (payload, idx). The
    explode shape (one media row → n frame rows) and the downstream
    partitioning are exactly what a real ffmpeg-backed decoder needs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                dur = int((meta or {}).get("duration_ms", "0"))
                for i, ts in enumerate(range(0, dur, every_ms)):
                    frame = hashlib.sha256(
                        bytes(payload) + i.to_bytes(4, "big")
                    ).digest()
                    rows.append((mid, i, ts, frame))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"]
            )

    vid = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "meta"
    )
    return vid.mapInPandas(batches, schema=FRAME_SCHEMA)


_HTML_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def synth_html_rows(n: int = 80, seed: int = 7) -> list[tuple[str, str]]:
    """Deterministic (url, html) fixture rows — ASCII-only, no quotes —
    exposed so the gate's DuckDB oracle can serialize the SAME html
    strings into a VALUES CTE while re-implementing the extraction in
    SQL independently of :func:`html_to_text_bytes` (the pattern
    :func:`synth_media_rows` set). Covers the extraction edges: nested
    tags, attribute-bearing tags, tab/newline/CRLF whitespace runs,
    leading/trailing whitespace, and one tags-only page that extracts
    to the empty string."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = [_HTML_WORDS[int(x)] for x in rng.integers(0, len(_HTML_WORDS), 6)]
        if i % 17 == 0:
            html = f"<html>\n<body>\t<br/><div class=x{i}></div> </body></html>"
        else:
            html = (
                f"<html>\n <head><title>{w[0]} {w[1]}</title></head>\n"
                f"<body>\t<p id={i}>{w[2]}  {w[3]}</p>\r\n"
                f"<div class=c{i % 5}>{w[4]}\n\n{w[5]} page{i}</div> \n"
                f"</body>\n</html>\n"
            )
        rows.append((f"https://example.org/p/{i}", html))
    return rows


def synth_decodable_media_rows(
    n_img: int = 20, n_wav: int = 20, seed: int = 13
) -> list[tuple]:
    """Deterministic REAL-format media rows: 24-bit BMPs (varied sizes,
    padded and unpadded strides, one top-down) and PCM16 WAVs (mono and
    stereo, varied rates, n_frames ≥ 13). Exposed so the gate's DuckDB
    twin can serialize the SAME payload bytes into a hex VALUES CTE and
    re-decode them with byte arithmetic — proving the decode is
    physically real, not a digest stand-in."""
    rng = np.random.default_rng(seed)
    rows = []
    widths = [5, 6, 8, 3, 7]   # 5,3,7 → padded stride; 6,8 → unpadded
    heights = [4, 6, 5, 3]
    for i in range(n_img):
        w, h = widths[i % len(widths)], heights[i % len(heights)]
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = make_bmp(rgb, top_down=(i % 7 == 3))
        rows.append((i, f"https://media.example/bmp/{i}", "image",
                     payload, {}))
    rates = [8000, 16000, 22050, 44100]
    for j in range(n_wav):
        rate = rates[j % len(rates)]
        ch = 1 + j % 2
        n = int(rng.integers(13, 400))
        samples = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
        payload = make_wav(samples, rate)
        rows.append((n_img + j, f"https://media.example/wav/{j}", "audio",
                     payload, {}))
    return rows


def synth_png_media_rows(n_img: int = 18, seed: int = 29) -> list[tuple]:
    """Deterministic REAL-PNG media rows for the ``png_decode`` gate
    query: canonical stored-DEFLATE layout (raw scanlines at file
    offset 48 — see :func:`make_png`), each image uniformly filtered
    with None/Sub/Up cycling by index. Those three filters unfilter in
    PURE SQL (None = raw byte; Sub = mod-256 cumsum across a row's
    channel lane; Up = mod-256 cumsum down a column), so the DuckDB
    twin re-derives every pixel from the payload hex alone — no
    inflater, no Python. Average/Paeth and real zlib streams are
    pinned by pytest round-trips instead (tests/test_multimodal.py).
    Kept SEPARATE from :func:`synth_decodable_media_rows` (whose image
    rows feed the bmp_decode twin — a BMP-only VALUES set)."""
    rng = np.random.default_rng(seed)
    widths = [4, 6, 3, 8, 5]
    heights = [3, 5, 4, 6]
    rows = []
    for i in range(n_img):
        w, h = widths[i % len(widths)], heights[i % len(heights)]
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = make_png(rgb, filter_type=i % 3, stored=True)
        rows.append((i, f"https://media.example/png/{i}", "image",
                     payload, {}))
    return rows


def synth_gif_media_rows(n_img: int = 18, seed: int = 31) -> list[tuple]:
    """Deterministic REAL-GIF media rows for the ``gif_decode`` gate
    query: canonical literal-only-LZW layout (see :func:`make_gif`) —
    data byte j at offset 793 + j + j//255, pixel i's 9-bit code at
    bit 9*(i + i//254 + 1) — so the DuckDB twin re-derives every pixel
    with integer shifts + palette lookups from the payload hex alone.
    Sizes include >254-pixel images so the multi-group (interleaved
    CLEAR) indexing is exercised in SQL, not just in pytest. REAL
    compressed LZW streams (dictionary hits, width growth, KwKwK) are
    pinned by pytest round-trips instead (tests/test_multimodal.py)."""
    rng = np.random.default_rng(seed)
    dims = [(4, 3), (6, 5), (3, 4), (20, 15), (8, 6), (17, 16)]
    rows = []
    for i in range(n_img):
        w, h = dims[i % len(dims)]
        palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        payload = make_gif(idx, palette)
        rows.append((i, f"https://media.example/gif/{i}", "image",
                     payload, {}))
    return rows


def synth_media_rows(n: int = 50, seed: int = 42) -> list[tuple]:
    """Deterministic fake media rows (driver-side python) — exposed so
    the gate's DuckDB oracle can serialize the SAME payload bytes into
    a VALUES CTE."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "video", "audio"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 192)))
        meta = {"duration_ms": str(int(rng.integers(1000, 8000)))} if kind == "video" else {}
        rows.append((i, f"https://media.example/{kind}/{i}", kind, payload, meta))
    return rows


def synth_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    return spark.createDataFrame(synth_media_rows(n, seed), MEDIA_SCHEMA)
