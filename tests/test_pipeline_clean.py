"""Production-CLI unicode normalization (--stage clean): the
checkpointed pre-dedup pass. Subprocess (the CLI owns its
SparkSession); asserts planted-mojibake rewrites, the docs_changed
accounting, ASCII pages untouched, and the resume path.
"""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pages() -> pd.DataFrame:
    rows = []
    # 8 plain-ASCII docs: must come through BYTE-identical
    for i in range(8):
        rows.append((f"https://clean.org/p{i}",
                     f"plain ascii body {i} with\nnewlines kept."))
    # 4 mojibake docs with known normalizations
    rows.append(("https://dirty.org/quotes", "“Smart” and ‘curly’ text"))
    rows.append(("https://dirty.org/dash", "em—dash fig‒ure and wait…"))
    rows.append(("https://dirty.org/space", "nbsp here zero​width\r\nCRLF"))
    rows.append(("https://dirty.org/ctl", "bel\x07 and esc\x1b   runs"))
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
def cleaned(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("clean")
    pages_path = str(root / "pages")
    wh = str(root / "wh")
    spark.createDataFrame(_pages()).write.parquet(pages_path)
    lines = _run_cli([
        "--pages", pages_path, "--out", wh, "--stage", "clean",
        "--master", "local[4]",
    ])
    return spark, wh, pages_path, lines


def test_metrics_exact(cleaned):
    _, _, _, lines = cleaned
    m = next(ln for ln in lines if ln.get("stage") == "clean")
    assert m["rows"] == 12
    assert m["docs_changed"] == 4


def test_rewritten_text(cleaned):
    spark, wh, _, _ = cleaned
    out = {r.url: r for r in
           spark.read.parquet(f"{wh}/clean/data").collect()}
    assert len(out) == 12
    assert out["https://dirty.org/quotes"].text == '"Smart" and \'curly\' text'
    assert out["https://dirty.org/dash"].text == "em-dash fig-ure and wait..."
    assert out["https://dirty.org/space"].text == "nbsp here zerowidth\nCRLF"
    assert out["https://dirty.org/ctl"].text == "bel and esc runs"
    for i in range(8):
        r = out[f"https://clean.org/p{i}"]
        assert r.text == f"plain ascii body {i} with\nnewlines kept."
        assert r.changed is False


def test_resume_is_noop(cleaned):
    _, wh, pages_path, _ = cleaned
    lines2 = _run_cli([
        "--pages", pages_path, "--out", wh, "--stage", "clean",
        "--master", "local[4]",
    ])
    m = next(ln for ln in lines2 if ln.get("stage") == "clean")
    assert m["resumed"] is True
    assert m["docs_changed"] == 4
