"""Production-CLI BPE stage (--stage bpe): train-once + encode through
the checkpoint layer. Subprocess (the CLI owns its SparkSession);
asserts the learned merges, token accounting, and that resume neither
retrains nor re-encodes."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pages() -> pd.DataFrame:
    rows = []
    # 'zz' is the runaway pair: every doc repeats 'zzzz' words
    for i in range(12):
        body = " ".join(f"w{i}x{j}" for j in range(10)) + " zzzz zzzz"
        rows.append((f"https://corpus.org/p{i:02d}", body))
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
def trained(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bpe")
    pages_path = str(root / "pages")
    wh = str(root / "wh")
    spark.createDataFrame(_pages()).write.parquet(pages_path)
    lines = _run_cli([
        "--pages", pages_path, "--out", wh, "--stage", "bpe",
        "--bpe-merges", "3", "--master", "local[4]",
    ])
    return spark, wh, pages_path, lines


def test_metrics_and_merges(trained):
    spark, wh, _, lines = trained
    m = next(ln for ln in lines if ln.get("stage") == "bpe_tokens")
    assert m["rows"] == 12 and m["n_merges"] == 3
    merges = {r.step: (r.pair, r.weight) for r in
              spark.read.parquet(f"{wh}/bpe_merges/data").collect()}
    # 'z z' occurs 3 adjacencies × 24 occurrences = 72 — the top pair
    # ('w 1' is next at 30: docs 1, 10, 11 contribute 10 words each)
    assert merges[1] == ("z z", 72)
    assert len(merges) == 3
    toks = {r.url: r.n_tokens for r in
            spark.read.parquet(f"{wh}/bpe_tokens/data").collect()}
    assert len(toks) == 12
    assert m["total_tokens"] == sum(toks.values())
    # 'zzzz' contributes 2 'zz' symbols after merge 1 (no later merge
    # outranks 'zz zz' at weight 24), so every doc ends under its raw
    # char count
    assert all(v < 10 * 4 + 8 for v in toks.values())


def test_resume_skips_retraining(trained):
    _, wh, pages_path, _ = trained
    lines2 = _run_cli([
        "--pages", pages_path, "--out", wh, "--stage", "bpe",
        "--bpe-merges", "3", "--master", "local[4]",
    ])
    m = next(ln for ln in lines2 if ln.get("stage") == "bpe_tokens")
    assert m["resumed"] is True
