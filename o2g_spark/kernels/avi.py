"""AVI (RIFF) video container codec in pure numpy/stdlib.

Closes the video half of the multimodal decode family without
ffmpeg: an AVI file is a RIFF chunk tree (12-byte lists, 8-byte chunk
headers, little-endian sizes, even padding) whose frames are either
raw bottom-up BGR DIBs ('DIB ' handler, biCompression 0 — the exact
pixel layout the BMP decoder already handles) or whole JPEG streams
per frame ('MJPG' — decoded by :mod:`.jpeg`, the pure-numpy baseline
Huffman+IDCT codec). Both paths are REAL decodes of real container
bytes; nothing here is a digest stand-in.

The canonical writer (:func:`make_avi`) emits the fixed header
layout below, which makes every raw-DIB frame's pixel bytes sit at
an ARITHMETIC offset of the payload — the property the driver-gate
DuckDB twins exploit to re-derive frame pixels from payload hex
(like the BMP twin, __spark_entry__._bmp_decode_oracle_sql):

    offset 0    'RIFF' <size> 'AVI '
    offset 12   'LIST' <size> 'hdrl'
    offset 24   'avih' 56 <main header: µs/frame, ..., frames, w, h>
    offset 88   'LIST' <size> 'strl'
    offset 100  'strh' 56 <'vids', handler, ..., scale, rate, length>
    offset 164  'strf' 40 <BITMAPINFOHEADER>
    offset 212  'LIST' <size> 'movi'
    offset 224  first '00db'/'00dc' chunk; raw frames are stride-
                padded bottom-up BGR, so frame f's byte (y, x, c) is
                224 + f*(8 + stride*h) + 8 + (h-1-y)*stride + 3x + c

The READER walks the chunk tree properly (scans for lists/chunks,
honours sizes and even padding, ignores unknown chunks like 'idx1'
or 'JUNK') — canonical layout is what we write, not what we require.
"""

from __future__ import annotations

import struct

import numpy as np

MOVI_DATA_OFFSET = 224  # canonical writer: first frame chunk header


def _stride(w: int) -> int:
    return (w * 3 + 3) & ~3


def make_avi(
    frames: list[np.ndarray], fps: int = 10, codec: str = "rawdib",
    quality: int = 90,
) -> bytes:
    """Serialize (h, w, 3) uint8 RGB frames as a canonical AVI.

    codec="rawdib": frames as stride-padded bottom-up BGR DIB chunks
    ('00db'). codec="mjpeg": each frame a full baseline-JPEG stream
    ('00dc', kernels.jpeg.make_jpeg). All frames must share one
    (h, w).
    """
    if codec not in ("rawdib", "mjpeg"):
        raise ValueError("codec must be 'rawdib' or 'mjpeg'")
    if not frames:
        raise ValueError("need at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must share one (h, w, 3) shape")
    stride = _stride(w)

    def frame_bytes(rgb: np.ndarray) -> bytes:
        if codec == "mjpeg":
            from . import jpeg as J

            return J.make_jpeg(rgb, quality=quality)
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
        return body.tobytes()

    chunks = bytearray()
    cid = b"00db" if codec == "rawdib" else b"00dc"
    max_size = 0
    for f in frames:
        data = frame_bytes(f)
        max_size = max(max_size, len(data))
        chunks += cid + struct.pack("<I", len(data)) + data
        if len(data) % 2:
            chunks += b"\x00"

    n = len(frames)
    us_per_frame = 1_000_000 // fps
    avih = struct.pack(
        "<14I", us_per_frame, max_size * fps, 0, 0x10, n, 0, 1,
        max_size, w, h, 0, 0, 0, 0,
    )
    handler = b"DIB " if codec == "rawdib" else b"MJPG"
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n,
                      max_size, 0, -1)
        + struct.pack("<4H", 0, 0, w, h)
    )
    compression = 0 if codec == "rawdib" else int.from_bytes(b"MJPG", "little")
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, stride * h,
        0, 0, 0, 0,
    )
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) \
        + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) \
        + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" \
        + bytes(chunks)
    body = b"AVI " + hdrl + movi
    out = b"RIFF" + struct.pack("<I", len(body)) + body
    if codec == "rawdib":
        assert out.index(b"movi") + 4 == MOVI_DATA_OFFSET
    return out


def _walk_chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, data_start, data_size) over a chunk run,
    honouring even padding; LIST chunks yield ('LIST:<type>', ...)
    with data_start past the 4-byte list type."""
    end = min(end, len(b))
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        data = pos + 8
        if cid == b"LIST" and size >= 4 and data + 4 <= end:
            # a truncated tail may chop inside this list: clamp its
            # extent so the complete leading children still decode.
            # Clamp to the ENCLOSING walk's end, not len(b) — a lying
            # inner size must not leak the scan past its parent list
            yield (b"LIST:" + b[data : data + 4], data + 4,
                   min(size - 4, end - data - 4))
        elif data + size > len(b):  # truncated leaf chunk: stop here
            return
        else:
            yield (cid, data, size)
        pos = data + size + (size % 2)


def try_decode_avi(
    b: bytes,
) -> tuple[int, int, int, list[np.ndarray]] | None:
    """(width, height, fps, frames as (h, w, 3) uint8 RGB) — or None
    if the payload is not an AVI this decoder understands. Raw-DIB
    ('00db'/biCompression 0) frames unpack with numpy byte
    arithmetic; MJPEG ('00dc'/'MJPG') frames decode through
    kernels.jpeg.try_decode_jpeg. Unknown chunks (idx1, JUNK, extra
    streams) are skipped, truncated frame runs keep the complete
    leading frames."""
    if len(b) < 24 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    w = h = None
    rate, scale = 0, 1
    compression = None
    last_stream = None  # fourcc of the most recent strh (strf follows it)
    frames: list[np.ndarray] = []

    def scan(pos: int, end: int) -> None:
        nonlocal w, h, rate, scale, compression, last_stream
        for cid, dstart, dsize in _walk_chunks(b, pos, end):
            if cid.startswith(b"LIST:"):
                scan(dstart, dstart + dsize)
            elif cid == b"avih" and dsize >= 40:
                vals = struct.unpack_from("<10I", b, dstart)
                w, h = int(vals[8]), int(vals[9])
            elif cid == b"strh" and dsize >= 28:
                last_stream = b[dstart : dstart + 4]
                if last_stream == b"vids":
                    scale, rate = struct.unpack_from("<II", b, dstart + 20)
            elif (cid == b"strf" and dsize >= 20
                  and last_stream == b"vids" and compression is None):
                # only the VIDEO stream's format chunk — an audio
                # stream's WAVEFORMAT must not overwrite biCompression
                compression = struct.unpack_from("<I", b, dstart + 16)[0]
            elif cid in (b"00db", b"00dc"):
                frames.append((cid, dstart, dsize))  # type: ignore[arg-type]

    scan(12, 8 + int.from_bytes(b[4:8], "little"))
    if w is None or h is None or w <= 0 or h <= 0:
        return None
    fps = rate // scale if scale else 0
    stride = _stride(w)
    mjpg = int.from_bytes(b"MJPG", "little")
    if compression is not None and compression not in (0, mjpg):
        return None  # a codec fourcc this decoder does not speak
    out: list[np.ndarray] = []
    for cid, dstart, dsize in frames:  # type: ignore[misc]
        raw = b[dstart : dstart + dsize]
        # biCompression decides the frame codec when present (real
        # muxers put JPEG frames in '00db' and raw frames in '00dc'
        # often enough); the chunk id is only the fallback
        if compression == mjpg or (compression is None and cid == b"00dc"):
            from . import jpeg as J

            dec = J.try_decode_jpeg(raw)
            if dec is None:
                return None
            # a frame whose embedded JPEG dims differ from the container
            # header would yield mixed-shape frame arrays — np.stack in
            # the hashing/resize consumers then raises inside the task.
            # Treat the clip as undecodable instead (the documented
            # malformed-payload contract: no rows, not a crashed stage).
            if dec[2].shape != (h, w, 3):
                return None
            out.append(dec[2])
        else:
            if dsize < stride * h:
                return None
            body = np.frombuffer(raw[: stride * h], dtype=np.uint8)
            bgr = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            out.append(bgr[::-1, :, ::-1].copy())
    return w, h, fps, out
