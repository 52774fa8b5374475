"""Production-CLI training-data mixing (--stage mix): the committed
weighted copy plan. Subprocess (the CLI owns its SparkSession);
asserts the per-domain budget accounting, upsampling of the
under-weighted domain, exclusion of unweighted domains, and the
resume path.
"""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WEIGHTS = {"small.org": 0.6, "big.org": 0.4}


def _pages() -> pd.DataFrame:
    rows = []
    # big.org: 40 pages of ~40 tokens; small.org: 4 pages — the 0.6
    # weight forces small.org past one epoch
    for i in range(40):
        rows.append((f"https://www.big.org/p{i}",
                     " ".join(f"w{i}t{j}" for j in range(40))))
    for i in range(4):
        rows.append((f"https://small.org/d{i}",
                     " ".join(f"s{i}t{j}" for j in range(40))))
    for i in range(6):
        rows.append((f"https://skip.net/x{i}",
                     " ".join(f"k{i}t{j}" for j in range(40))))
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
def mixed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mix")
    pages_path = str(root / "pages")
    wh = str(root / "wh")
    spark.createDataFrame(_pages()).write.parquet(pages_path)
    argv = [
        "--pages", pages_path, "--out", wh, "--stage", "mix",
        "--mix-weights", json.dumps(WEIGHTS), "--mix-tokens", "1200",
        "--master", "local[4]",
    ]
    lines = _run_cli(argv)
    return spark, wh, argv, lines


def test_metrics_budget_accounting(mixed):
    _, _, _, lines = mixed
    m = next(ln for ln in lines if ln.get("stage") == "mix_plan")
    assert m["budget_tokens"] == 1200
    assert 0 < m["tokens_emitted"] <= 1200


def test_plan_semantics(mixed):
    spark, wh, _, _ = mixed
    plan = spark.read.parquet(f"{wh}/mix_plan/data")
    rows = {r["url"]: r for r in plan.collect()}
    assert all(r["domain"] in WEIGHTS for r in rows.values())
    # small.org: budget 720 >> its ~160 available tokens → >= 4 epochs
    small = [r for r in rows.values() if r["domain"] == "small.org"]
    assert len(small) == 4
    assert all(r["n_copies"] >= 4 for r in small)
    # big.org downsamples: a strict subset, single copies
    big = [r for r in rows.values() if r["domain"] == "big.org"]
    assert 0 < len(big) < 40
    assert all(r["n_copies"] == 1 for r in big)


def test_report_snapshot(mixed):
    spark, wh, _, _ = mixed
    rep = {r["domain"]: r for r in
           spark.read.parquet(f"{wh}/mix_report/data").collect()}
    assert set(rep) == set(WEIGHTS)
    for d, r in rep.items():
        assert r["tokens_emitted"] <= r["budget"]
    assert rep["small.org"]["budget"] == 1200 * 600_000 // 1_000_000
    assert rep["small.org"]["copies"] > rep["small.org"]["docs_kept"]


def test_resume_is_noop(mixed):
    spark, wh, argv, _ = mixed
    before = sorted(
        map(tuple, spark.read.parquet(f"{wh}/mix_plan/data").collect())
    )
    lines2 = _run_cli(argv)
    m = next(ln for ln in lines2 if ln.get("stage") == "mix_plan")
    assert m["resumed"] is True
    after = sorted(
        map(tuple, spark.read.parquet(f"{wh}/mix_plan/data").collect())
    )
    assert after == before


def test_missing_args_rejected(mixed, tmp_path):
    spark, _, argv, _ = mixed
    pages_path = argv[1]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         "--pages", pages_path, "--out", str(tmp_path / "wh2"),
         "--stage", "mix", "--master", "local[4]"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode != 0
    assert "--mix-weights" in (out.stderr + out.stdout)
