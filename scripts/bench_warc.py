"""WARC ingest at crawl scale (evidence for sources/warc.py).

Synthesizes N response records across M .warc.gz files (the standard
one-gzip-member-per-record layout real crawls ship), then measures the
distributed read_warc scan end-to-end: records recovered EXACTLY, zero
skips, throughput in records/s and compressed MB/s. Parallelism =
files (binaryFile does not split), matching how production crawl sets
arrive (many ~1 GB segments).

Run:  python scripts/bench_warc.py [--records 400000] [--files 32]
One JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from o2g_spark.session import get_spark  # noqa: E402
from o2g_spark.sources import warc as W  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=400_000)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--work", default="/tmp/bench_warc")
    args = ap.parse_args()

    work = args.work
    if os.path.isdir(work):
        if not os.path.exists(os.path.join(work, ".bench_warc_marker")):
            raise SystemExit(f"refusing to delete {work!r}: no marker")
        shutil.rmtree(work)
    os.makedirs(work)
    open(os.path.join(work, ".bench_warc_marker"), "w").close()
    src = os.path.join(work, "warcs")
    os.makedirs(src)

    per = (args.records + args.files - 1) // args.files
    total_bytes = 0
    rid = 0
    t_synth = time.time()
    for j in range(args.files):
        n = min(per, args.records - rid)
        recs = [
            (
                f"https://site{(rid + i) % 997}.org/p/{rid + i}",
                "2024-06-01T00:00:00Z",
                (f"<html><head><title>t{rid + i}</title></head><body>"
                 + " ".join(f"w{rid + i}x{k}" for k in range(40))
                 + "</body></html>").encode(),
            )
            for i in range(n)
        ]
        b = W.make_warc(recs, gzip_members=True)
        total_bytes += len(b)
        with open(os.path.join(src, f"seg-{j:05d}.warc.gz"), "wb") as f:
            f.write(b)
        rid += n
    synth_s = time.time() - t_synth

    spark = get_spark("bench_warc", master=args.master)
    df = W.read_warc(spark, src)
    # warmup (JIT + python workers) on one file
    W.read_warc(spark, os.path.join(src, "seg-00000.warc.gz")).count()

    t0 = time.time()
    agg = df.groupBy().agg(
        {"url": "count", "warc_skipped": "max"}
    ).collect()[0]
    n_rows, max_skip = agg["count(url)"], agg["max(warc_skipped)"]
    dt = time.time() - t0
    print(json.dumps(dict(
        op="warc_ingest", records=args.records, files=args.files,
        gz_mb=round(total_bytes / 1e6, 1), synth_s=round(synth_s, 1),
        wall_s=round(dt, 2), records_per_s=int(args.records / dt),
        mb_per_s=round(total_bytes / 1e6 / dt, 1),
        exact=(n_rows == args.records and max_skip == 0),
    )), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
