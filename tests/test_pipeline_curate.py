"""Production-CLI corpus curation (--stage curate): keep-best per dup
cluster → deterministic split → per-domain cap → chunking → sequence
packing, all checkpointed. Runs the CLI in a SUBPROCESS because it
owns (and stops) its SparkSession; asserts the committed snapshots'
structural invariants and the resume path."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pages(n=120, seed=17) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(
        [f"w{i:03d}" for i in range(300)]
        + ["the", "and", "of", "to", "in"] * 10  # quality signal
    )
    texts = [
        " ".join(rng.choice(vocab, size=30, replace=True)) + f" tail{i}"
        for i in range(n)
    ]
    # planted exact-dup clusters: every 10th doc shares text with its
    # successor, so keep-best must drop one of each pair
    for i in range(0, n - 1, 10):
        texts[i + 1] = texts[i]
    return pd.DataFrame({
        # 8 registered domains → the per-domain cap has teeth
        "url": [f"https://sub.d{i % 8}-x.org/p{i}" for i in range(n)],
        "warc_ts": pd.Timestamp("2024-06-01"),
        "html": [f"<html>{t}</html>".encode() for t in texts],
        "text": texts,
        "lang": "en",
    })


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
def curated(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("curate")
    pages_path = str(root / "pages")
    wh = str(root / "wh")
    pdf = _pages()
    spark.createDataFrame(pdf).write.parquet(pages_path)
    args = [
        "--pages", pages_path, "--out", wh, "--stage", "curate",
        "--max-per-domain", "3", "--chunk-tokens", "16",
        "--chunk-overlap", "4", "--pack-budget", "64",
        "--pack-shards", "4", "--master", "local[4]",
    ]
    metrics = _run_cli(args)
    return wh, pdf, args, metrics


def _snapshot(spark, wh, stage):
    from o2g_spark.plans.checkpoint import CheckpointManager

    return CheckpointManager(spark, wh).read_snapshot(stage)


def test_curate_kept_invariants(spark, curated):
    wh, pdf, _, metrics = curated
    kept = _snapshot(spark, wh, "curate_kept").toPandas()
    # subset of the corpus, unique urls
    assert set(kept["url"]) <= set(pdf["url"])
    assert kept["url"].is_unique
    # planted dup pairs: at most one member of each survives
    texts = dict(zip(pdf["url"], pdf["text"]))
    for i in range(0, len(pdf) - 1, 10):
        a, b = pdf["url"].iloc[i], pdf["url"].iloc[i + 1]
        assert texts[a] == texts[b]
        assert not ({a, b} <= set(kept["url"])), (a, b)
    # per-domain cap exact
    per = kept.groupby("domain").size()
    assert (per <= 3).all()
    assert (kept["domain"].str.fullmatch(r"d\d-x\.org")).all()
    # splits partition the kept set; metrics agree
    m = next(m for m in metrics if m["stage"] == "curate_kept")
    counts = kept["split"].value_counts().to_dict()
    assert m["train_rows"] == counts.get("train", 0)
    assert m["val_rows"] == counts.get("val", 0)
    assert m["test_rows"] == counts.get("test", 0)
    assert sum(counts.values()) == len(kept) == m["rows"]


def test_curate_chunks_cover_kept_pages(spark, curated):
    wh, pdf, _, _ = curated
    kept = _snapshot(spark, wh, "curate_kept").toPandas()
    chunks = _snapshot(spark, wh, "curate_chunks").toPandas()
    assert set(chunks["url"]) == set(kept["url"])  # every kept doc chunked
    assert (chunks["n_tokens"] <= 16).all()
    assert (chunks["n_tokens"] > 0).all()
    # stride = 16 - 4: chunk_idx dense from 0 per url
    for url, grp in chunks.groupby("url"):
        assert sorted(grp["chunk_idx"]) == list(range(len(grp)))


def test_curate_packing_budget_and_scope(spark, curated):
    wh, _, _, metrics = curated
    chunks = _snapshot(spark, wh, "curate_chunks").toPandas()
    packed = _snapshot(spark, wh, "curate_packed").toPandas()
    n_train_chunks = (chunks["split"] == "train").sum()
    assert len(packed) == n_train_chunks  # train chunks only, all of them
    per_bin = packed.groupby("bin_id")["n_tokens"].sum()
    assert (per_bin <= 64).all()  # no chunk exceeds budget here
    m = next(m for m in metrics if m["stage"] == "curate_packed")
    assert m["bins_used"] == packed["bin_id"].nunique()
    assert 0 < m["fill_ratio"] <= 1.0


def test_curate_resumes(spark, curated):
    wh, _, args, _ = curated
    again = _run_cli(args)
    stages = [m for m in again if "stage" in m and m["stage"].startswith("curate")]
    assert len(stages) == 3
    assert all(m["resumed"] for m in stages)
