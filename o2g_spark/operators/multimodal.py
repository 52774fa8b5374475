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
        return html.map(lambda b: html_to_text_bytes(bytes(b)).decode("utf-8"))

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
    shape that survives 100 TB of media. Real decode path raises until
    an image lib exists in the environment.
    """
    if use_real_decoder and not HAVE_PIL:
        raise NotImplementedError(
            "real image decode needs PIL/pillow — not in this container; "
            "run with use_real_decoder=False for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, feat = _fake_decode_image(bytes(payload))
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
    """image rows → fixed-size pixel buffers (STUB resample, real
    plumbing: the output schema, byte sizing and batch shape are what a
    PIL-backed resize produces — width*height*3 RGB bytes per row)."""
    if use_real_decoder and not HAVE_PIL:
        raise NotImplementedError(
            "real resize needs PIL/pillow — not in this container"
        )

    n_bytes = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # deterministic fake resample: stretch the sha256 stream
                seed = hashlib.sha256(bytes(payload)).digest()
                reps = (n_bytes + len(seed) - 1) // len(seed)
                rows.append((mid, width, height, (seed * reps)[:n_bytes]))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixels"]
            )

    img = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return img.mapInPandas(batches, schema=RESIZED_SCHEMA)


def audio_features(media: DataFrame) -> DataFrame:
    """audio rows → (duration, rms, 13-dim MFCC-shaped features).

    STUB decode (no audio libs in this container): values derive
    deterministically from payload bytes; the Spark-side schema,
    partitioning and Arrow batch shape are the real pipeline."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
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
