"""Kill -9 / resume evidence for the quantiles streaming op, driven
END-TO-END through the production CLI (jobs/run_stream.py --op
quantiles) — the same protocol as BENCH §streaming-resume's CLI row:

1. synthesize a metric stream (grp, v, ts) as time-contiguous files +
   a watermark-pusher file so every real window closes in drain mode;
2. launch the documented CLI invocation under a durable --ckpt,
   SIGKILL the WHOLE process group after K committed micro-batches;
3. re-run the IDENTICAL command (resume is implicit in --ckpt) to
   drain completion;
4. read the sink through its _spark_metadata manifest and compare as
   a row MULTISET against sketches.qsketch_window_batch on the full
   input (restricted to closed windows).

Run:  python scripts/stream_resume_quantiles.py [--rows 400000]
          [--files 20] [--state-store rocksdb] [--kill-after 3]
One JSON line to stdout; exits non-zero on any lost/dup row.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW_S = 3600
QS = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
PUSHER_MS = 4102444800000  # 2100-01-01: closes every real window


def synth_metrics(n: int, n_files: int, out: str) -> None:
    import numpy as np
    import pandas as pd

    os.makedirs(out)
    t0 = 1717200000000  # 2024-06-01 UTC, ms
    ids = np.arange(n, dtype=np.int64)
    pdf = pd.DataFrame({
        "grp": np.char.add("g", (ids % 8).astype(str)),
        "v": (ids * 2654435761 % (1 << 31)).astype(np.int64),
        # ~25 h of data → ~26 windows per group
        "ts": pd.to_datetime(t0 + ids * (25 * 3600 * 1000 // n), unit="ms"),
    })
    per = (n + n_files - 1) // n_files
    for j in range(n_files):  # time-contiguous slices, like a real feed
        pdf.iloc[j * per:(j + 1) * per].to_parquet(
            os.path.join(out, f"part-{j:04d}.parquet"),
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
    pd.DataFrame({
        "grp": ["g0"], "v": [1],
        "ts": pd.to_datetime([PUSHER_MS], unit="ms"),
    }).to_parquet(os.path.join(out, f"part-{n_files:04d}-pusher.parquet"),
                  coerce_timestamps="us", allow_truncated_timestamps=True)


def _cli_cmd(src: str, sink: str, ckpt: str, state_store: str) -> list[str]:
    return [
        sys.executable, os.path.join(REPO, "jobs", "run_stream.py"),
        "--op", "quantiles", "--src", src, "--sink", sink, "--ckpt", ckpt,
        "--window-seconds", str(WINDOW_S), "--watermark", "1 minute",
        "--mode", "drain", "--state-store", state_store,
        "--shuffle-partitions", "8",
    ]


def _commits(ckpt: str) -> int:
    d = os.path.join(ckpt, "commits")
    if not os.path.isdir(d):
        return 0
    return len([f for f in os.listdir(d) if not f.startswith(".")])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--state-store", default="rocksdb")
    ap.add_argument("--kill-after", type=int, default=3)
    ap.add_argument("--work", default="/tmp/qsk_resume")
    args = ap.parse_args()

    work = args.work
    if os.path.isdir(work):
        if not os.path.exists(os.path.join(work, ".qsk_resume_marker")):
            raise SystemExit(
                f"refusing to delete {work!r}: no marker from a prior "
                "run (pass a fresh --work dir)")
        shutil.rmtree(work)
    os.makedirs(work)
    open(os.path.join(work, ".qsk_resume_marker"), "w").close()
    src = os.path.join(work, "src")
    sink = os.path.join(work, "sink")
    ckpt = os.path.join(work, "ckpt")
    synth_metrics(args.rows, args.files, src)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")

    # ---- run 1: kill -9 the whole process group after K commits
    proc = subprocess.Popen(
        _cli_cmd(src, sink, ckpt, args.state_store),
        start_new_session=True,  # SIGKILL takes the JVM too
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env,
    )
    t0 = time.time()
    killed_at = None
    deadline = time.time() + 600
    while time.time() < deadline:
        if _commits(ckpt) >= args.kill_after:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            killed_at = time.time() - t0
            break
        if proc.poll() is not None:
            raise SystemExit("child finished before the kill threshold — "
                             "lower --kill-after or raise --rows")
        time.sleep(0.3)
    proc.wait()
    if killed_at is None:
        raise SystemExit("never reached the kill threshold")
    commits_at_kill = _commits(ckpt)

    # ---- run 2: the IDENTICAL command, to drain completion
    t1 = time.time()
    out = subprocess.run(
        _cli_cmd(src, sink, ckpt, args.state_store),
        capture_output=True, text=True, timeout=1200, env=env,
    )
    resume_s = time.time() - t1
    if out.returncode != 0:
        raise SystemExit(f"resume run failed: {out.stderr[-2000:]}")

    # ---- validate: manifest-read sink vs the batch twin, multiset
    from o2g_spark.operators import sketches
    from o2g_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="qsk-resume-validate",
                      shuffle_partitions=8)
    full = spark.read.parquet(src)
    twin = sketches.qsketch_window_batch(
        full, ["grp"], "v", "ts", WINDOW_S, QS
    )
    pusher_ws = PUSHER_MS // 1000 // WINDOW_S * WINDOW_S
    expected = Counter(
        tuple(r) for r in twin.where(f"ws_s < {pusher_ws}").collect()
    )
    got_rows = spark.read.parquet(sink).select(
        "grp", "ws_s", *QS.keys()
    ).collect()
    got = Counter(tuple(r) for r in got_rows)
    lost = sum((expected - got).values())
    dup_or_extra = sum((got - expected).values())
    print(json.dumps(dict(
        op="quantiles (CLI)", state_store=args.state_store,
        rows_in=args.rows, files=args.files,
        commits_at_kill=commits_at_kill,
        killed_after_s=round(killed_at, 1), resume_run_s=round(resume_s, 1),
        rows_expected=sum(expected.values()), rows_got=sum(got.values()),
        lost=lost, duplicated_or_extra=dup_or_extra,
        exact=(lost == 0 and dup_or_extra == 0),
    )), flush=True)
    spark.stop()
    if lost or dup_or_extra:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
