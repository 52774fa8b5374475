"""WARC (Web ARChive, ISO 28500) source: the wire format real crawls
arrive in (Common Crawl, Heritrix, wget --warc). Pure-stdlib parsing
(gzip is stdlib; multi-member .warc.gz is concatenated gzip streams),
distributed via ``binaryFile`` + ``mapInPandas`` — the same
generator-streaming shape as operators/multimodal.py.

Graft note: the reference ingests its domain's raw interchange format
(OSM XML) the same way — a self-contained parser feeding the relational
layer (SURVEY §2 A1); WARC is the web-table counterpart, feeding the
``--stage extract`` html→text path. Like A1, there is no SQL twin
(DuckDB cannot parse WARC), so the evidence class is pytest round-trips
over :func:`make_warc` fixtures plus malformed-input pins.

Scale shape: ``binaryFile`` yields ONE ROW PER FILE and does not split
files, so parallelism = number of WARC files per job — exactly how
production crawl sets ship (Common Crawl segments are ~1 GB × 64k
files). The parser is a streaming walk (no per-record regex, no
whole-file splits). Memory is O(ONE FILE) per task — raw bytes +
decompressed bytes + the record rows, the standard binaryFile WARC
shape — so size executors for ~3× the largest segment; ``max_payload``
guards only the pathological single record, and oversized/malformed
records are COUNTED into ``warc_skipped`` rather than silently
dropped (a file whose parse yields ZERO rows still reports its count
through a sentinel row with a NULL url).
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("src_file", T.StringType()),
        T.StructField("warc_skipped", T.LongType()),  # per-file counter ride-along
    ]
)

_CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return out


def _iter_records(
    raw: bytes, max_payload: int
) -> Iterator[tuple[dict[str, str], bytes] | None]:
    """Yield (warc_headers, payload) per record; ``None`` per skipped
    (malformed / oversized) record. A streaming walk over offsets —
    never splits the whole buffer."""
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and raw[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if raw[pos:pos + 5] != b"WARC/":
            # not a record boundary: cannot resync, and everything
            # after this point is lost — surface it as a skip rather
            # than vanishing silently
            yield None
            return
        hdr_end = raw.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            yield None
            return
        headers = _parse_headers(raw[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            yield None
            return  # cannot resync without a length
        body_start = hdr_end + 4
        body_end = body_start + length
        if length < 0 or body_end > n:
            yield None
            return
        if length > max_payload:
            yield None  # oversized: counted, not crashed on
        else:
            yield headers, raw[body_start:body_end]
        pos = body_end


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP response payload;
    (None, None, payload) when it isn't HTTP."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return None, None, payload
    head = payload[:sep]
    status: int | None = None
    first = head.split(_CRLF, 1)[0].split(b" ")
    if len(first) >= 2:
        try:
            status = int(first[1])
        except ValueError:
            status = None
    ctype = _parse_headers(head).get("content-type")
    return status, ctype, payload[sep + 4:]


def _decompress(raw: bytes) -> bytes:
    """Plain or multi-member gzip (the standard .warc.gz layout: one
    member per record). NOT stdlib ``gzip.decompress``: its member
    loop re-slices the remaining buffer per member — O(members ×
    bytes), measured 6.8 s on a 4 MB / 12.5k-member segment (~50 GB
    of copying). This walk feeds bounded memoryview chunks to one
    ``decompressobj`` per member and rewinds by ``unused_data``, so
    it is O(bytes); a truncated tail keeps every COMPLETE leading
    member and drops the partial one."""
    if raw[:2] != _GZ_MAGIC:
        return raw
    mv = memoryview(raw)
    n = len(raw)
    out: list[bytes] = []
    pos = 0
    while pos < n and raw[pos:pos + 2] == _GZ_MAGIC:
        d = zlib.decompressobj(wbits=31)
        member_start = len(out)
        # chunks grow geometrically WITHIN a member (8 KB → 1 MB), so
        # the unused_data overshoot copied per member is proportional
        # to the member's own size — tiny-record segments stay O(bytes)
        chunk_sz = 8 << 10
        try:
            while not d.eof and pos < n:
                piece = mv[pos:pos + chunk_sz]
                out.append(d.decompress(piece))
                pos += len(piece)
                chunk_sz = min(chunk_sz * 4, 1 << 20)
        except zlib.error:
            del out[member_start:]  # corrupt member: unusable bytes
            break
        if not d.eof:
            del out[member_start:]  # truncated member
            break
        pos -= len(d.unused_data)  # rewind the last chunk's overshoot
    return b"".join(out)


def _parse_warc_date(v: str):
    """WARC-Date: whole-second (1.0) or fractional-second (1.1 —
    wget / recent Heritrix write e.g. 00:00:00.123456Z)."""
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(v, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    return None


def parse_warc_bytes(
    raw: bytes, src_file: str = "", max_payload: int = 64 << 20
) -> tuple[list[tuple], int]:
    """(rows, skipped) for one WARC file's bytes. Rows match
    :data:`WARC_SCHEMA` minus the counter column; only ``response``
    records with a target URI become rows (warcinfo/request/metadata
    records are structural, not skips)."""
    rows: list[tuple] = []
    skipped = 0
    for rec in _iter_records(_decompress(raw), max_payload):
        if rec is None:
            skipped += 1
            continue
        headers, payload = rec
        wtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri")
        if wtype != "response" or not url:
            continue
        ts = _parse_warc_date(headers.get("warc-date", ""))
        if ts is None:
            skipped += 1
            continue
        status, ctype, body = _split_http(payload)
        rows.append((url, ts, wtype, status, ctype, body, src_file))
    return rows, skipped


def read_warc(
    spark: SparkSession, path: str, max_payload: int = 64 << 20
) -> DataFrame:
    """Distributed WARC scan → one row per ``response`` record
    (:data:`WARC_SCHEMA`). Parallelism = files (binaryFile does not
    split them, and packs small ones per maxPartitionBytes — crawl
    segments are partition-sized, so one task per file in practice);
    ``warc_skipped`` repeats each file's skip count on its rows so
    ``max(warc_skipped)`` grouped by ``src_file`` audits the
    no-silent-drop contract downstream."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows, skipped = parse_warc_bytes(
                    bytes(row["content"]), row["path"], max_payload
                )
                if not rows:
                    # a file that produced NOTHING must still surface
                    # its skip count, else the audit reads clean
                    # exactly when everything was dropped
                    rows = [(None, None, None, None, None, None,
                             row["path"])]
                yield pd.DataFrame(
                    [(*r, skipped) for r in rows], columns=cols
                )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


# --------------------------------------------------------------- fixture

def make_warc(
    records: list[tuple[str, str, bytes]],
    gzip_members: bool = False,
    content_type: str = "text/html",
) -> bytes:
    """Fixture builder (the make_gif/make_png pattern): serialize
    (url, iso_ts, body) triples as WARC/1.0 response records wrapping
    an HTTP/1.1 200 response; ``gzip_members=True`` emits the standard
    one-gzip-member-per-record .warc.gz layout."""
    out = bytearray()
    for i, (url, iso_ts, body) in enumerate(records):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + content_type.encode() + b"\r\n\r\n" + body
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:test:{i}>\r\n".encode()
            + f"WARC-Date: {iso_ts}\r\n".encode()
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n" + http + b"\r\n\r\n"
        )
        out += gzip.compress(rec, 6) if gzip_members else rec
    return bytes(out)
