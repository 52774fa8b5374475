"""Streaming near-dup recall vs idle-timeout curve (VERDICT r3 #7).

near_dup_candidates_stream trades recall for bounded state: an idle
LSH bucket is evicted after ``timeout_ms`` of DATA time, so a
duplicate arriving later than that after its source starts a fresh
bucket and the pair is never emitted. The no-silent-cap rule applies
to the TIME dimension too — this script MEASURES the trade instead of
asserting it:

  - a replayed multi-file doc stream plants duplicate pairs at
    controlled data-time gaps (5/30/90/180/300 minutes),
  - the stream runs once per timeout setting (event-time mode, so the
    eviction points are data-deterministic — reruns give identical
    recall),
  - recall = planted pairs the stream emits / pairs the (time-blind)
    batch twin emits, overall and per gap bucket.

Run: python scripts/bench_stream_recall.py [--docs 20000] [--files 20]
         [--timeouts 15,60,240]   (minutes of data time)

Prints JSON lines + a markdown table recorded in STATUS.md next to the
streaming near-dup operator row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_MS = 1_717_243_200_000  # 2024-06-01T12:00:00Z
GAP_MINUTES = [5, 30, 90, 180, 300]
DOC_STEP_S = 2  # one doc per 2 s of data time


def synth_docs(n: int) -> tuple[pd.DataFrame, dict]:
    """Docs at 2 s spacing; every 20th doc repeats the text of the doc
    closest to a planted gap earlier (gaps cycle GAP_MINUTES). Returns
    (frame, {(src_id, dup_id): gap_minutes})."""
    rng = np.random.default_rng(11)
    # 200-word vocabulary: large enough that coincidental shingle/band
    # collisions are rare and the planted pairs dominate the signal
    words = [f"w{k:03d}" for k in range(200)]
    texts = [
        " ".join(rng.choice(words, size=12, replace=True)) + f" tail{i}"
        for i in range(n)
    ]
    planted = {}
    gi = 0
    for i in range(0, n, 20):
        gap_min = GAP_MINUTES[gi % len(GAP_MINUTES)]
        gi += 1
        # +7 keeps the source OFF the every-20th dup slots for every
        # gap (gap*60/STEP is divisible by 20 for the round gaps, so
        # without the offset j would always be a dup slot and skipped)
        back = (gap_min * 60) // DOC_STEP_S + 7
        j = i - back
        if j < 0 or j % 20 == 0:
            continue  # source out of range or itself a dup slot
        texts[i] = texts[j]
        planted[(f"d{j:07d}", f"d{i:07d}")] = gap_min
    pdf = pd.DataFrame({
        "doc_id": [f"d{i:07d}" for i in range(n)],
        "text": texts,
        "ts": pd.to_datetime(
            BASE_MS + np.arange(n, dtype=np.int64) * DOC_STEP_S * 1000,
            unit="ms",
        ),
    })
    return pdf, planted


def write_files(pdf: pd.DataFrame, n_files: int, out: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    per = len(pdf) // n_files
    schema = pa.schema([
        pa.field("doc_id", pa.string()),
        pa.field("text", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ])
    for i in range(n_files):
        lo = i * per
        hi = len(pdf) if i == n_files - 1 else (i + 1) * per
        tbl = pa.Table.from_pandas(
            pdf.iloc[lo:hi], preserve_index=False
        ).cast(schema)
        f = os.path.join(out, f"doc_{i:04d}.parquet")
        pq.write_table(tbl, f)
        os.utime(f, times=(1_000_000 + i, 1_000_000 + i))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--timeouts", default="15,60,240",
                    help="idle timeouts to measure, minutes of data time")
    ap.add_argument("--out", default="/tmp/stream_recall")
    ap.add_argument("--force", action="store_true",
                    help="delete --out even if it pre-exists without "
                         "a scratch marker from a previous run")
    ap.add_argument("--master", default="local[16]")
    args = ap.parse_args()

    from o2g_spark.fsutil import reset_scratch_dir
    from o2g_spark.session import get_spark
    from o2g_spark.streaming import stateful

    reset_scratch_dir(args.out, force=args.force)
    pdf, planted = synth_docs(args.docs)
    src = os.path.join(args.out, "src")
    write_files(pdf, args.files, src)

    spark = get_spark("bench-stream-recall", master=args.master,
                      shuffle_partitions=8)
    batch_pairs = {
        (r.id_a, r.id_b)
        for r in stateful.near_dup_candidates_batch(
            spark.createDataFrame(pdf), ts_col="ts"
        ).select("id_a", "id_b").distinct().collect()
    }
    planted_in_batch = {p: g for p, g in planted.items() if p in batch_pairs}
    by_gap_total = {}
    for p, g in planted_in_batch.items():
        by_gap_total[g] = by_gap_total.get(g, 0) + 1
    print(json.dumps({
        "docs": args.docs, "batch_pairs": len(batch_pairs),
        "planted_pairs_in_batch": len(planted_in_batch),
        "per_gap_planted": by_gap_total,
    }), flush=True)

    results = []
    for tmin in [int(x) for x in args.timeouts.split(",")]:
        t0 = time.time()
        stream = (
            spark.readStream.schema("doc_id string, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stateful.near_dup_candidates_stream(
            stream, timeout_ms=tmin * 60_000, time_mode="event",
            watermark="1 minute",
        )
        name = f"rec_{tmin}"
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("append").start()
        )
        q.processAllAvailable()
        time.sleep(3)
        q.processAllAvailable()
        got = {
            (r.id_a, r.id_b)
            for r in spark.sql(
                f"SELECT DISTINCT id_a, id_b FROM {name}"
            ).collect()
        }
        q.stop()
        by_gap_found = {}
        for p, g in planted_in_batch.items():
            if p in got:
                by_gap_found[g] = by_gap_found.get(g, 0) + 1
        row = {
            "timeout_min": tmin,
            "recall_vs_batch": round(
                len(got & batch_pairs) / max(len(batch_pairs), 1), 4
            ),
            "per_gap_recall": {
                g: round(by_gap_found.get(g, 0) / by_gap_total[g], 3)
                for g in sorted(by_gap_total)
            },
            "sec": round(time.time() - t0, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    gaps = sorted(by_gap_total)
    print("\n| idle timeout | overall recall | "
          + " | ".join(f"gap {g}m" for g in gaps) + " |")
    print("|" + "---|" * (len(gaps) + 2))
    for r in results:
        print(
            f"| {r['timeout_min']} min | {r['recall_vs_batch']} | "
            + " | ".join(str(r["per_gap_recall"][g]) for g in gaps)
            + " |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
