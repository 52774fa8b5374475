"""Production-CLI corpus report card (--stage stats): per-language
counts, token totals, sketch length quantiles, HLL distinct-word
estimates. Subprocess (the CLI owns its SparkSession); asserts exact
counts/totals, the quantile error bound against brute force, the HLL
estimate against the true distinct count, and the resume path.
"""

import json
import os
import re
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")


def _pages() -> pd.DataFrame:
    rows = []
    rid = 0
    # two languages with different length profiles
    # mostly-unique words: the HLL raw estimator needs true distinct
    # >= ~2.5 * 2^p (no linear-counting correction — see sketches.py);
    # the CLI run below passes --stats-hll-p 8, so ~2k distinct works
    for lang, n_docs, base in (("en", 60, 20), ("de", 40, 60)):
        for i in range(n_docs):
            n_words = base + (rid * 7) % 30
            text = " ".join(f"{lang}w{rid}x{j}" for j in range(n_words))
            rows.append((f"https://s.org/{lang}/{rid}", text, lang))
            rid += 1
    df = pd.DataFrame(rows, columns=["url", "text", "lang"])
    df["warc_ts"] = pd.Timestamp("2024-06-01")
    df["html"] = [t.encode() for t in df["text"]]
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
def stats(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stats")
    pages_path = str(root / "pages")
    wh = str(root / "wh")
    spark.createDataFrame(_pages()).write.parquet(pages_path)
    argv = ["--pages", pages_path, "--out", wh, "--stage", "stats",
            "--stats-hll-p", "8", "--master", "local[4]"]
    lines = _run_cli(argv)
    return spark, wh, argv, lines


def test_counts_and_totals_exact(stats):
    spark, wh, _, lines = stats
    pdf = _pages()
    toks = pdf["text"].map(lambda t: len(_TOKEN_RE.findall(t)))
    out = {r["lang"]: r for r in
           spark.read.parquet(f"{wh}/corpus_stats/data").collect()}
    assert set(out) == {"en", "de"}
    for lang in ("en", "de"):
        mask = pdf["lang"] == lang
        assert out[lang]["docs"] == int(mask.sum())
        assert out[lang]["total_tokens"] == int(toks[mask].sum())
    m = next(ln for ln in lines if ln.get("stage") == "corpus_stats")
    assert m["total_docs"] == 100
    assert m["total_tokens"] == int(toks.sum())


def test_quantiles_within_bound(stats):
    spark, wh, _, _ = stats
    pdf = _pages()
    toks = pdf["text"].map(lambda t: len(_TOKEN_RE.findall(t)))
    out = {r["lang"]: r for r in
           spark.read.parquet(f"{wh}/corpus_stats/data").collect()}
    for lang in ("en", "de"):
        vs = sorted(toks[pdf["lang"] == lang])
        n = len(vs)
        for lbl, q in (("len_p50", 0.5), ("len_p90", 0.9), ("len_p99", 0.99)):
            true = vs[(n - 1) * round(q * 1e6) // 1_000_000 + 1 - 1]
            assert abs(out[lang][lbl] - true) <= true * 2 ** -5 + 0.5


def test_distinct_words_estimate(stats):
    spark, wh, _, _ = stats
    pdf = _pages()
    out = {r["lang"]: r for r in
           spark.read.parquet(f"{wh}/corpus_stats/data").collect()}
    for lang in ("en", "de"):
        true = len({
            w.lower()
            for t in pdf.loc[pdf["lang"] == lang, "text"]
            for w in t.split()
        })
        est = out[lang]["distinct_words_est"]
        assert abs(est - true) <= 0.25 * true  # p=8 → 6.5% rse, 4σ head


def test_resume_is_noop(stats):
    _, wh, argv, _ = stats
    lines2 = _run_cli(argv)
    m = next(ln for ln in lines2 if ln.get("stage") == "corpus_stats")
    assert m["resumed"] is True
    assert m["total_docs"] == 100
