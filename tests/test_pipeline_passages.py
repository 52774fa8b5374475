"""Production-CLI passage dedup (--stage passages): the checkpointed
cross-doc exact-substring stage. Subprocess (the CLI owns its
SparkSession); asserts planted-passage accounting, rebuilt text, and
the resume path."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PASSAGE = ("the quick brown fox jumps over the lazy dog "
           "every single shiny day")  # 13 tokens


def _pages() -> pd.DataFrame:
    rows = []
    # 12 clean docs with unique bodies (unique tokens break windows)
    for i in range(12):
        body = " ".join(f"w{i}t{j}" for j in range(30))
        rows.append((f"https://clean.org/p{i:02d}", body))
    # 5 docs sharing the planted passage; zz-prefixed urls sort AFTER
    # every clean url, so the keeper is deterministic: zz/p00
    for i in range(5):
        rows.append((f"https://zz.org/p{i:02d}",
                     f"pre{i}a pre{i}b {PASSAGE} post{i}a post{i}b"))
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
def deduped(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("passages")
    pages_path = str(root / "pages")
    wh = str(root / "wh")
    spark.createDataFrame(_pages()).write.parquet(pages_path)
    lines = _run_cli([
        "--pages", pages_path, "--out", wh, "--stage", "passages",
        "--passage-k", "8", "--master", "local[4]",
    ])
    return spark, wh, pages_path, lines


def test_metrics_exact(deduped):
    _, _, _, lines = deduped
    m = next(ln for ln in lines if ln.get("stage") == "passages")
    assert m["rows"] == 17
    assert m["passage_k"] == 8
    # 4 of the 5 planted docs lose exactly the 13-token passage
    assert m["removed_tokens"] == 4 * 13
    assert m["docs_touched"] == 4


def test_rebuilt_text_and_keeper(deduped):
    spark, wh, _, _ = deduped
    out = {r.url: r for r in
           spark.read.parquet(f"{wh}/passages/data").collect()}
    assert len(out) == 17
    keeper = out["https://zz.org/p00"]
    assert PASSAGE in keeper.text and keeper.n_removed == 0
    for i in range(1, 5):
        r = out[f"https://zz.org/p{i:02d}"]
        assert r.text == f"pre{i}a pre{i}b post{i}a post{i}b"
        assert (r.n_removed, r.n_spans) == (13, 1)
    for i in range(12):
        assert out[f"https://clean.org/p{i:02d}"].n_removed == 0


def test_resume_is_noop(deduped):
    _, wh, pages_path, _ = deduped
    lines2 = _run_cli([
        "--pages", pages_path, "--out", wh, "--stage", "passages",
        "--passage-k", "8", "--master", "local[4]",
    ])
    m = next(ln for ln in lines2 if ln.get("stage") == "passages")
    assert m["resumed"] is True
    assert m["removed_tokens"] == 52 and m["docs_touched"] == 4
