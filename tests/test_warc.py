"""WARC source (sources/warc.py): the raw-crawl ingest format.

Evidence class: pytest round-trips over make_warc fixtures (no SQL
twin exists — DuckDB cannot parse WARC; same class as the OSM XML
parser, SURVEY §2 A1). Pins: plain + gzip-member round-trips, header
extraction, non-response records ignored, malformed/oversized records
COUNTED not silently dropped, truncated-gzip salvage, distributed
read_warc over several files, and the --pages warc: CLI path feeding
--stage extract end-to-end.
"""

import gzip
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

import pytest

from o2g_spark.sources import warc as W

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RECS = [
    ("https://a.org/1", "2024-06-01T00:00:00Z", b"<html><body>hello a</body></html>"),
    ("https://b.org/2", "2024-06-01T01:02:03Z", b"<html><p>b two</p></html>"),
    ("https://c.org/3", "2024-06-02T10:00:00Z", b"<html>c three</html>"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    raw = W.make_warc(RECS, gzip_members=gz)
    rows, skipped = W.parse_warc_bytes(raw, "f")
    assert skipped == 0
    assert [(r[0], r[5]) for r in rows] == [(u, b) for u, _, b in RECS]
    for r, (_, iso, _) in zip(rows, RECS):
        assert r[1] == datetime.strptime(iso, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
        assert r[2] == "response"
        assert r[3] == 200
        assert r[4] == "text/html"
        assert r[6] == "f"


def test_non_response_records_ignored_not_skipped():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"Content-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    raw = info + W.make_warc(RECS[:1])
    rows, skipped = W.parse_warc_bytes(raw)
    assert len(rows) == 1 and skipped == 0


def test_oversized_record_counted():
    raw = W.make_warc(RECS)
    rows, skipped = W.parse_warc_bytes(raw, max_payload=40)
    # record 1 payload (http head + body) exceeds 40 bytes → skipped
    assert skipped >= 1
    assert len(rows) + skipped == len(RECS)


def test_bad_length_counted():
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.org\r\n"
        b"Content-Length: notanumber\r\n\r\n"
    )
    rows, skipped = W.parse_warc_bytes(raw)
    assert rows == [] and skipped == 1


def test_truncated_gzip_salvages_leading_members():
    raw = W.make_warc(RECS, gzip_members=True)
    # cut inside the LAST member: the first two must still parse
    cut = raw[: len(raw) - 7]
    rows, skipped = W.parse_warc_bytes(cut)
    assert [r[0] for r in rows] == [u for u, _, _ in RECS[:2]]


def test_non_http_payload_passthrough():
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: ftp://x.org/f\r\n"
        b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
        b"Content-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    rows, skipped = W.parse_warc_bytes(raw)
    assert skipped == 0
    (r,) = rows
    assert (r[3], r[4], r[5]) == (None, None, b"hello")


def test_read_warc_distributed(spark, tmp_path):
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    for j in range(4):
        recs = [
            (f"https://s{j}.org/p{i}", "2024-06-01T00:00:00Z",
             f"<html>doc {j}/{i}</html>".encode())
            for i in range(5)
        ]
        ext = "warc.gz" if j % 2 else "warc"
        with open(os.path.join(d, f"f{j}.{ext}"), "wb") as f:
            f.write(W.make_warc(recs, gzip_members=bool(j % 2)))
    df = W.read_warc(spark, d)
    rows = df.collect()
    assert len(rows) == 20
    assert {r["url"] for r in rows} == {
        f"https://s{j}.org/p{i}" for j in range(4) for i in range(5)
    }
    assert all(r["http_status"] == 200 for r in rows)
    assert all(r["warc_skipped"] == 0 for r in rows)
    assert {os.path.basename(r["src_file"]).split(".")[0][1]
            for r in rows} == {"0", "1", "2", "3"}


def test_cli_warc_to_extract(spark, tmp_path):
    """--pages warc: feeds --stage extract end-to-end through the
    production CLI (subprocess; the CLI owns its session)."""
    d = str(tmp_path / "crawl")
    os.makedirs(d)
    recs = [
        (f"https://w.org/p{i}", "2024-06-01T00:00:00Z",
         f"<html><body>page {i} text</body></html>".encode())
        for i in range(12)
    ]
    with open(os.path.join(d, "c.warc.gz"), "wb") as f:
        f.write(W.make_warc(recs, gzip_members=True))
    wh = str(tmp_path / "wh")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         "--pages", f"warc:{d}", "--out", wh, "--stage", "extract",
         "--master", "local[4]"],
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = next(json.loads(ln) for ln in out.stdout.strip().splitlines()
             if json.loads(ln).get("stage") == "extract")
    assert m["rows"] == 12
    got = spark.read.parquet(f"{wh}/extract/data")
    assert got.count() == 12
    assert got.where("text_sha IS NULL").count() == 0


def test_warc11_fractional_seconds():
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.org/f\r\n"
        b"WARC-Date: 2024-06-01T00:00:00.123456Z\r\n"
        b"Content-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    rows, skipped = W.parse_warc_bytes(raw)
    assert skipped == 0 and len(rows) == 1
    assert rows[0][1].microsecond == 123456


def test_mid_file_garbage_counted():
    raw = W.make_warc(RECS[:1]) + b"GARBAGE-NOT-A-RECORD" + W.make_warc(RECS[1:])
    rows, skipped = W.parse_warc_bytes(raw)
    # everything after the garbage is unreachable — that loss must be
    # visible as a skip, not silent
    assert [r[0] for r in rows] == [RECS[0][0]]
    assert skipped >= 1


def test_zero_row_file_surfaces_skips(spark, tmp_path):
    d = str(tmp_path / "badwarcs")
    os.makedirs(d)
    # file whose only record has a bad length → zero rows, 1 skip
    with open(os.path.join(d, "bad.warc"), "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: https://x.org\r\n"
                b"Content-Length: nan\r\n\r\n")
    with open(os.path.join(d, "good.warc"), "wb") as f:
        f.write(W.make_warc(RECS[:1]))
    df = W.read_warc(spark, d)
    audit = {os.path.basename(r["src_file"]): r["mx"] for r in
             df.groupBy("src_file").max("warc_skipped")
             .withColumnRenamed("max(warc_skipped)", "mx").collect()}
    assert audit["bad.warc"] == 1  # the sentinel row carried the count
    assert audit["good.warc"] == 0
    # sentinel rows are NULL-url and carry no payload
    assert df.where("url IS NULL").count() == 1


def test_cli_warc_text_chain(spark, tmp_path):
    """The raw-crawl text path COMPOSES: --pages warc: + --stage
    extract persists the extracted text, and the later text stages
    (clean, stats) read it back through text_pages() on the same
    warehouse — no canonical text column ever existed on the input."""
    d = str(tmp_path / "crawl2")
    os.makedirs(d)
    recs = [
        (f"https://chain.org/p{i}", "2024-06-01T00:00:00Z",
         (f"<html><body>“page” {i} —text {'x' * (i % 7)}"
          + (f" Coordinates: {52.5 + i / 100:.2f}, 13.40" if i < 4 else "")
          + "</body></html>").encode())
        for i in range(10)
    ]
    with open(os.path.join(d, "c.warc"), "wb") as f:
        f.write(W.make_warc(recs))
    wh = str(tmp_path / "wh2")

    def run_stage(stage, extra=()):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
             "--pages", f"warc:{d}", "--out", wh, "--stage", stage,
             *extra, "--master", "local[4]"],
            env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
            capture_output=True, text=True, timeout=420,
        )
        assert out.returncode == 0, (stage, out.stderr[-2000:])
        return [json.loads(ln) for ln in out.stdout.strip().splitlines()]

    # without extract, a text stage must fail with the routing message
    bad = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         "--pages", f"warc:{d}", "--out", wh, "--stage", "clean",
         "--master", "local[4]"],
        capture_output=True, text=True, timeout=420,
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
    )
    assert bad.returncode != 0
    assert "--stage extract first" in (bad.stderr + bad.stdout)

    run_stage("extract")
    ex = spark.read.parquet(f"{wh}/extract/data")
    assert "text" in ex.columns  # persisted on the raw-crawl path
    assert ex.count() == 10

    lines = run_stage("clean")
    m = next(ln for ln in lines if ln.get("stage") == "clean")
    assert m["rows"] == 10
    assert m["docs_changed"] == 10  # every page carries curly quotes
    cleaned = {r["url"]: r["text"] for r in
               spark.read.parquet(f"{wh}/clean/data").collect()}
    assert cleaned["https://chain.org/p3"].startswith('"page" 3 -text')

    lines = run_stage("stats", ("--stats-hll-p", "4"))
    m = next(ln for ln in lines if ln.get("stage") == "corpus_stats")
    assert m["total_docs"] == 10

    # the geospatial core composes too: --stage all on the raw crawl
    # (geotag routes text through the extract snapshot, lang NULLed)
    lines = run_stage("all")
    got = {ln["stage"]: ln for ln in lines if "stage" in ln}
    assert got["geotag"]["rows"] == 4  # the planted coordinate pages
    assert "report" in got
