"""Production-CLI corpus filtering (--stage filter): boilerplate
strip → repetition/quality/length rejects → optional benchmark
decontamination, committed as filter_labels + filter_kept. Subprocess
(the CLI owns its SparkSession); asserts per-reason counts against
the planted corpus and the resume path."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BANNER = "accept all cookies to continue"
FOOTER = "copyright example site all rights reserved"

GOOD = (
    "the quick brown fox jumps over the lazy dog and then wanders off "
    "to find some other interesting animals in the deep green forest "
    "where many curious things happen every single day of the year "
    "including some rather unusual encounters with friendly travelers "
    "who pass through on their way to the distant mountain villages"
)

# a passage that appears ONLY in the benchmark and the leak docs — any
# 13-gram overlap with GOOD would (correctly) flag the good docs too
BENCH_TEXT = (
    "seventeen silver llamas quietly negotiated complicated treaties "
    "regarding sunflower tariffs while five bureaucratic penguins "
    "stamped endless forms beneath flickering fluorescent lights in "
    "the abandoned lighthouse archive of forgotten maritime disputes"
)


def _pages() -> pd.DataFrame:
    rows = []
    # 20 good docs (unique tails keep them distinct)
    for i in range(20):
        rows.append((f"https://good.org/p{i}",
                     f"{BANNER}\n{GOOD} unique tail {i}\n{FOOTER}"))
    # 3 spam docs: one 10-gram repeated enough to trip dup10 AND top2
    spam_core = "buy cheap pills online now best price great deal wow "
    for i in range(3):
        rows.append((f"https://spam.net/p{i}",
                     f"{BANNER}\n{spam_core * 12} tail {i}\n{FOOTER}"))
    # 2 docs that are ONLY boilerplate lines
    for i in range(2):
        rows.append((f"https://empty.org/p{i}", f"{BANNER}\n{FOOTER}"))
    # 2 too-short docs
    for i in range(2):
        rows.append((f"https://short.org/p{i}",
                     f"{BANNER}\ntiny page {i}\n{FOOTER}"))
    # 2 docs copying a benchmark item verbatim (decontam)
    for i in range(2):
        rows.append((f"https://leak.org/p{i}",
                     f"{BANNER}\n{BENCH_TEXT} leaked copy {i}\n{FOOTER}"))
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
def filtered(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("filter")
    pages_path = str(root / "pages")
    bench_path = str(root / "bench")
    wh = str(root / "wh")
    spark.createDataFrame(_pages()).write.parquet(pages_path)
    bench = pd.DataFrame({"text": [BENCH_TEXT]})
    spark.createDataFrame(bench).write.parquet(bench_path)
    lines = _run_cli([
        "--pages", pages_path, "--out", wh, "--stage", "filter",
        "--benchmark", bench_path, "--min-words", "10",
        "--master", "local[4]",
    ])
    return spark, wh, lines


def test_reason_counts_exact(filtered):
    _, _, lines = filtered
    m = next(ln for ln in lines if ln.get("stage") == "filter_kept")
    assert m["rejected_boilerplate_empty"] == 2
    assert m["rejected_too_short"] == 2
    assert m["rejected_repetition"] == 3
    assert m["rejected_decontam"] == 2
    assert m["rows"] == 20


def test_kept_text_is_boilerplate_stripped(filtered):
    spark, wh, _ = filtered
    kept = spark.read.parquet(f"{wh}/filter_kept/data")
    texts = [r.text for r in kept.collect()]
    assert len(texts) == 20
    for t in texts:
        assert BANNER not in t and FOOTER not in t
        assert t.startswith("the quick brown fox")
    assert set(kept.columns) >= {"url", "text", "lang"}


def test_labels_cover_every_input(filtered):
    spark, wh, _ = filtered
    labels = spark.read.parquet(f"{wh}/filter_labels/data")
    assert labels.count() == 29
    reasons = {r.reason for r in labels.select("reason").distinct().collect()}
    assert reasons == {
        "kept", "boilerplate_empty", "too_short", "repetition", "decontam"
    }


def test_resume_is_noop(filtered):
    spark, wh, lines = filtered
    # identical rerun resumes both stages without rebuilding
    _, _, first = filtered[0], filtered[1], lines
    root = os.path.dirname(wh)
    lines2 = _run_cli([
        "--pages", os.path.join(root, "pages"), "--out", wh,
        "--stage", "filter", "--benchmark", os.path.join(root, "bench"),
        "--min-words", "10", "--master", "local[4]",
    ])
    m = next(ln for ln in lines2 if ln.get("stage") == "filter_kept")
    assert m["resumed"] is True
    assert m["rows"] == 20
    assert m["rejected_repetition"] == 3
