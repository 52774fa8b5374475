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


def test_run_stream_quantiles_drain(spark, tmp_path):
    """--op quantiles drains to a sink that matches the batch twin
    (sketches.qsketch_window_batch) on every closed window."""
    import datetime as dt

    from o2g_spark.operators import sketches as SK

    src = str(tmp_path / "qsrc")
    sink = str(tmp_path / "qsink")
    ckpt = str(tmp_path / "qckpt")
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (f"g{i % 2}", 10 + (i * 37) % 9000, t0 + dt.timedelta(minutes=3 * i))
        for i in range(800)
    ]
    pdf = pd.DataFrame(rows, columns=["grp", "v", "ts"])
    os.makedirs(src)
    # TIME-CONTIGUOUS slices (a replayed ordered feed): with the
    # 0-second watermark a time-shuffled split would legitimately
    # drop sparse keys' later rows as late (that semantics is pinned
    # by test_qsketch.py::test_quantile_window_stream_drops_late_rows)
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    for j in range(4):  # several files → several micro-batches
        # micro-second timestamps: pandas' default ns INT64 physical
        # type is unreadable under Spark's `timestamp` stream schema
        pdf.iloc[j * 200:(j + 1) * 200].to_parquet(
            os.path.join(src, f"part{j}.parquet"),
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_stream.py"),
         "--op", "quantiles", "--src", src, "--sink", sink, "--ckpt", ckpt,
         "--window-seconds", "3600", "--watermark", "0 seconds",
         "--mode", "drain"],
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["op"] == "quantiles" and payload["sink_rows"] > 0

    batch = {
        (r["grp"], r["ws_s"]): (r["p50"], r["p90"], r["p99"])
        for r in SK.qsketch_window_batch(
            spark.createDataFrame(pdf), ["grp"], "v", "ts", 3600,
            {"p50": 0.5, "p90": 0.9, "p99": 0.99},
        ).collect()
    }
    got = spark.read.parquet(sink).collect()
    assert len(got) == payload["sink_rows"]
    for r in got:
        assert batch[(r["grp"], r["ws_s"])] == (r["p50"], r["p90"], r["p99"])


def test_run_stream_neardup_video_drain(spark, tmp_path):
    """--op neardup-media --media-kind video drains to a sink that
    matches the batch twin (stateful.near_dup_video_batch) exactly —
    the real-AVI-decode frame-hash funnel through the production CLI."""
    import datetime as dt

    from o2g_spark.operators import video as V
    from o2g_spark.streaming import stateful

    src = str(tmp_path / "vsrc")
    sink = str(tmp_path / "vsink")
    ckpt = str(tmp_path / "vckpt")
    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        (mid, kind, payload,
         t0 + dt.timedelta(minutes=(10 + mid % 37 if mid >= 1000
                                    else mid % 7)))
        for mid, _u, kind, payload, _m in V.synth_avi_media_rows()
    ]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "ts"])
    os.makedirs(src)
    # base clips in the first micro-batch, twins in the second — the
    # cross-batch dup shape; timestamps to µs (ns is stream-unreadable)
    for j, part in enumerate((pdf[pdf["media_id"] < 1000],
                              pdf[pdf["media_id"] >= 1000])):
        part.reset_index(drop=True).to_parquet(
            os.path.join(src, f"part{j}.parquet"),
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_stream.py"),
         "--op", "neardup-media", "--media-kind", "video",
         "--src", src, "--sink", sink, "--ckpt", ckpt,
         "--timeout-ms", "86400000", "--watermark", "1 minute",
         "--mode", "drain"],
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["op"] == "neardup-media" and payload["mode"] == "drain"

    expected = sorted(
        map(tuple, stateful.near_dup_video_batch(
            spark.createDataFrame(pdf), ts_col="ts"
        ).collect())
    )
    assert payload["sink_rows"] == len(expected) > 0
    got = sorted(
        (r.id_a, r.id_b, r.band)
        for r in spark.read.parquet(sink).collect()
    )
    assert got == expected
