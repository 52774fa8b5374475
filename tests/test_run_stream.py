"""Production streaming CLI (jobs/run_stream.py) smoke: a drain-mode
run over a small doc stream completes, prints the contract JSON, and
its sink matches the batch twin. Runs in a SUBPROCESS because the CLI
owns (and stops) its SparkSession — calling main() in-process would
tear down the shared test session. The kill -9/resume protocol through
this CLI is evidenced at scale in BENCH/BASELINE.md §streaming-resume."""

import json
import os
import subprocess
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_stream_neardup_drain(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from stream_resume_demo import synth_docs

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    synth_docs(2_000, 4, src)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_stream.py"),
         "--op", "neardup", "--src", src, "--sink", sink, "--ckpt", ckpt,
         "--timeout-ms", "86400000", "--watermark", "1 minute",
         "--mode", "drain"],
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["op"] == "neardup" and payload["mode"] == "drain"

    from o2g_spark.streaming import stateful

    pdf = pd.concat(
        pd.read_parquet(os.path.join(src, f))
        for f in sorted(os.listdir(src)) if f.endswith(".parquet")
    )
    expected = stateful.near_dup_candidates_batch(
        spark.createDataFrame(pdf), ts_col="ts"
    ).count()
    assert payload["sink_rows"] == expected > 0
    got = spark.read.parquet(sink).count()
    assert got == expected
