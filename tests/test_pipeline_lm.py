"""Production-CLI LM stage (--stage lm): train-once bigram LM +
perplexity-third bucketing through the checkpoint layer. Subprocess
(the CLI owns its SparkSession); asserts the score discrimination,
the thirds accounting, the self-contained model snapshot, and that
resume neither retrains nor re-scores."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GOOD = "the quick brown fox jumps over the lazy dog again and again"


def _pages() -> pd.DataFrame:
    rows = []
    for i in range(24):
        body = GOOD if i % 3 else f"xq{i} zzk{i} qwv{i} jjr{i} wpp{i}"
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
def scored(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lm")
    pages_path = str(root / "pages")
    wh = str(root / "wh")
    spark.createDataFrame(_pages()).write.parquet(pages_path)
    argv = ["--pages", pages_path, "--out", wh, "--stage", "lm",
            "--master", "local[4]"]
    lines = _run_cli(argv)
    return spark, wh, pages_path, argv, lines


def test_metrics_and_discrimination(scored):
    spark, wh, _, _, lines = scored
    m = next(ln for ln in lines if ln.get("stage") == "lm_scores")
    assert m["rows"] == 24 and not m["resumed"]
    thirds = m["ppl_thirds"]
    assert thirds["head"] + thirds["middle"] + thirds["tail"] == 24
    assert thirds["cut_head"] <= thirds["cut_middle"]

    scores = {r.url: r.nll_per_tok for r in
              spark.read.parquet(f"{wh}/lm_scores/data").collect()}
    good = [v for u, v in scores.items() if int(u[-2:]) % 3]
    junk = [v for u, v in scores.items() if not int(u[-2:]) % 3]
    # every gibberish page scores strictly worse than every clean page
    assert min(junk) > max(good)


def test_model_snapshot_self_contained(scored):
    spark, wh, _, _, lines = scored
    m = next(ln for ln in lines if ln.get("stage") == "lm_scores")
    model = spark.read.parquet(f"{wh}/lm_model/data")
    assert m["model_bigrams"] == model.count()
    cols = set(model.columns)
    assert {"w1", "w2", "c_pair", "c_ctx", "p_ppm", "v", "bigram"} <= cols
    # constant vocab column — the snapshot scores without the corpus
    assert model.select("v").distinct().count() == 1


def test_resume_neither_retrains_nor_rescores(scored):
    spark, wh, _, argv, lines = scored
    again = _run_cli(argv)
    m = next(ln for ln in again if ln.get("stage") == "lm_scores")
    assert m["resumed"]
    assert m["model_bigrams"] == next(
        ln for ln in lines if ln.get("stage") == "lm_scores"
    )["model_bigrams"]
    # identical thirds from the committed snapshot
    assert m["ppl_thirds"] == next(
        ln for ln in lines if ln.get("stage") == "lm_scores"
    )["ppl_thirds"]
