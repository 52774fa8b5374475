"""Production-CLI PII scrub (--stage pii): the checkpointed redaction
stage. Subprocess (the CLI owns its SparkSession); asserts planted-PII
accounting, rewritten text, and the resume path."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pages() -> pd.DataFrame:
    rows = []
    # 10 clean docs
    for i in range(10):
        body = " ".join(f"w{i}t{j}" for j in range(20))
        rows.append((f"https://clean.org/p{i:02d}", body))
    # planted: 3 docs with one email each, 2 with an IP, 1 with
    # email + phone + IP
    for i in range(3):
        rows.append((f"https://mail.org/p{i}",
                     f"write to user{i}@example.com for details"))
    for i in range(2):
        rows.append((f"https://net.org/p{i}",
                     f"host 10.0.{i}.7 is primary"))
    rows.append(("https://all.org/p0",
                 "bob@corp.io at 192.168.1.1, call (555) 123-4567 now"))
    df = pd.DataFrame(rows, columns=["url", "text"])
    df["warc_ts"] = pd.Timestamp("2024-06-01")
    df["html"] = [t.encode() for t in df["text"]]
    df["lang"] = "en"
    return df[["url", "warc_ts", "html", "text", "lang"]]


def _run_cli(argv, timeout=420):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         *argv],
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(ln) for ln in out.stdout.strip().splitlines()]


@pytest.fixture(scope="module")
def scrubbed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pii")
    pages_path = str(root / "pages")
    wh = str(root / "wh")
    spark.createDataFrame(_pages()).write.parquet(pages_path)
    lines = _run_cli([
        "--pages", pages_path, "--out", wh, "--stage", "pii",
        "--master", "local[4]",
    ])
    return spark, wh, pages_path, lines


def test_metrics_exact(scrubbed):
    _, _, _, lines = scrubbed
    m = next(ln for ln in lines if ln.get("stage") == "pii")
    assert m["rows"] == 16
    assert m["masked_email"] == 4
    assert m["masked_ipv4"] == 3
    assert m["masked_phone"] == 1
    assert m["docs_touched"] == 6


def test_rewritten_text(scrubbed):
    spark, wh, _, _ = scrubbed
    out = {r.url: r for r in
           spark.read.parquet(f"{wh}/pii/data").collect()}
    assert len(out) == 16
    r = out["https://all.org/p0"]
    assert r.text == "|||EMAIL||| at |||IP|||, call |||PHONE||| now"
    assert (r.n_email, r.n_ipv4, r.n_phone) == (1, 1, 1)
    for i in range(3):
        t = out[f"https://mail.org/p{i}"].text
        assert f"user{i}" not in t and "|||EMAIL|||" in t
    for i in range(10):
        r = out[f"https://clean.org/p{i:02d}"]
        assert (r.n_email, r.n_ipv4, r.n_phone) == (0, 0, 0)


def test_resume_is_noop(scrubbed):
    _, wh, pages_path, _ = scrubbed
    lines2 = _run_cli([
        "--pages", pages_path, "--out", wh, "--stage", "pii",
        "--master", "local[4]",
    ])
    m = next(ln for ln in lines2 if ln.get("stage") == "pii")
    assert m["resumed"] is True
    assert m["masked_email"] == 4 and m["docs_touched"] == 6
