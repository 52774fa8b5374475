"""Kill -9 / resume evidence for the VIDEO streaming funnel, driven
END-TO-END through the production CLI (jobs/run_stream.py --op
neardup-media --media-kind video) — the same protocol as the
quantiles/text rows in BENCH §streaming-resume:

1. synthesize a clip stream (media_id, kind, payload AVI, ts) as
   time-contiguous files with planted CROSS-FILE drop-last-frame
   twins (the candidate a resumed run must still catch);
2. launch the documented CLI invocation under a durable --ckpt,
   SIGKILL the WHOLE process group after K committed micro-batches;
3. re-run the IDENTICAL command (resume is implicit in --ckpt) to
   drain completion;
4. read the sink through its _spark_metadata manifest and compare as
   a row MULTISET against stateful.near_dup_video_batch on the full
   input — one row per shared frame-hash bucket, so lost OR
   duplicated candidate rows both fail.

Run:  python scripts/stream_resume_video.py [--clips 100000]
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

PLANT_EVERY = 20
N_FRAMES = 6
T0_MS = 1717200000000  # 2024-06-01 UTC


def synth_clips(n: int, n_files: int, out: str) -> int:
    """n base clips + n/PLANT_EVERY twins (base i → twin i+n, placed
    n/2 positions later so the pair always CROSSES micro-batch
    files). Returns the planted pair count."""
    import numpy as np
    import pandas as pd

    from o2g_spark.kernels.avi import make_avi
    from o2g_spark.operators.video import _grid_frame

    os.makedirs(out)
    slots: list[tuple[int, bytes]] = []
    rng = np.random.default_rng(47)
    planted = 0
    for i in range(n):
        grids = [rng.integers(0, 251, size=(8, 9)).astype(np.int64)
                 for _ in range(N_FRAMES)]
        slots.append((i, make_avi([_grid_frame(g) for g in grids], fps=10)))
        if i % PLANT_EVERY == 0:
            twin = make_avi([_grid_frame(g) for g in grids[:-1]], fps=10)
            slots.append((i + n, twin))
            planted += 1
    # order by arrival slot: base i at position i, twin at i + n/2 —
    # ts strictly increasing in arrival order (time-contiguous files)
    order = sorted(range(len(slots)),
                   key=lambda j: slots[j][0] if slots[j][0] < n
                   else (slots[j][0] - n) + n // 2 + 0.5)
    rows = [slots[j] for j in order]
    pdf = pd.DataFrame({
        "media_id": [r[0] for r in rows],
        "kind": "video",
        "payload": [r[1] for r in rows],
        "ts": pd.to_datetime(T0_MS + np.arange(len(rows), dtype=np.int64)
                             * 200, unit="ms"),
    })
    per = (len(pdf) + n_files - 1) // n_files
    for j in range(n_files):
        pdf.iloc[j * per:(j + 1) * per].to_parquet(
            os.path.join(out, f"part-{j:04d}.parquet"),
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
    return planted


def _cli_cmd(src: str, sink: str, ckpt: str, state_store: str) -> list[str]:
    return [
        sys.executable, os.path.join(REPO, "jobs", "run_stream.py"),
        "--op", "neardup-media", "--media-kind", "video",
        "--src", src, "--sink", sink, "--ckpt", ckpt,
        "--timeout-ms", "86400000", "--watermark", "1 minute",
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
    ap.add_argument("--clips", type=int, default=100_000)
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--state-store", default="rocksdb")
    ap.add_argument("--kill-after", type=int, default=3)
    ap.add_argument("--work", default="/tmp/video_resume")
    args = ap.parse_args()

    work = args.work
    if os.path.isdir(work):
        if not os.path.exists(os.path.join(work, ".video_resume_marker")):
            raise SystemExit(
                f"refusing to delete {work!r}: no marker from a prior "
                "run (pass a fresh --work dir)")
        shutil.rmtree(work)
    os.makedirs(work)
    open(os.path.join(work, ".video_resume_marker"), "w").close()
    src = os.path.join(work, "src")
    sink = os.path.join(work, "sink")
    ckpt = os.path.join(work, "ckpt")
    t_synth = time.time()
    planted = synth_clips(args.clips, args.files, src)
    synth_s = time.time() - t_synth
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")

    # ---- run 1: kill -9 the whole process group after K commits
    proc = subprocess.Popen(
        _cli_cmd(src, sink, ckpt, args.state_store),
        start_new_session=True,  # SIGKILL takes the JVM too
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env,
    )
    t0 = time.time()
    killed_at = None
    deadline = time.time() + 900
    while time.time() < deadline:
        if _commits(ckpt) >= args.kill_after:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            killed_at = time.time() - t0
            break
        if proc.poll() is not None:
            raise SystemExit("child finished before the kill threshold — "
                             "lower --kill-after or raise --clips")
        time.sleep(0.3)
    proc.wait()
    if killed_at is None:
        raise SystemExit("never reached the kill threshold")
    commits_at_kill = _commits(ckpt)

    # ---- run 2: the IDENTICAL command, to drain completion
    t1 = time.time()
    out = subprocess.run(
        _cli_cmd(src, sink, ckpt, args.state_store),
        capture_output=True, text=True, timeout=2400, env=env,
    )
    resume_s = time.time() - t1
    if out.returncode != 0:
        raise SystemExit(f"resume run failed: {out.stderr[-2000:]}")

    # ---- validate: manifest-read sink vs the batch twin, multiset
    from o2g_spark.session import get_spark
    from o2g_spark.streaming import stateful

    spark = get_spark(master="local[8]", app_name="video-resume-validate",
                      shuffle_partitions=8)
    full = spark.read.parquet(src)
    twin = stateful.near_dup_video_batch(full, ts_col="ts")
    expected = Counter(tuple(r) for r in twin.collect())
    got = Counter(
        tuple(r)
        for r in spark.read.parquet(sink).select("id_a", "id_b", "band")
        .collect()
    )
    lost = sum((expected - got).values())
    dup_or_extra = sum((got - expected).values())
    print(json.dumps(dict(
        op="neardup-media --media-kind video (CLI)",
        state_store=args.state_store,
        clips_in=args.clips + args.clips // PLANT_EVERY,
        planted_pairs=planted, files=args.files,
        synth_s=round(synth_s, 1),
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
