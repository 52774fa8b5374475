"""Training-data mixing at crawl scale (round-5 evidence for the
corpus.py mixing section).

Claim measured: the exact-fill window strategy pays ONE domain-key
shuffle and its hot-domain window task; the rate strategy scans the
corpus once with zero exchanges and still lands each domain's token
budget within concentration bounds. Input: ``--scale 1.0`` = 50M docs
over 5 domains with a planted 60%-mass mega-domain (the skew axis a
real crawl has), budget rebalancing the mega-domain DOWN (0.2 weight)
and a small domain UP past one epoch. Checked exactly: window never
exceeds any budget and undershoots by < 1 doc; rate lands within 1%
per domain; both plans recover the planted epoch counts.

Run:  python scripts/bench_mixing.py [--scale 1.0] [--master local[32]]
JSON line per strategy to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.operators import corpus as C  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

# planted corpus: dom0 has 60% of docs (the mega-domain), dom4 is tiny
DOM_PCT = (60, 20, 10, 8, 2)
W = {"dom0": 0.2, "dom1": 0.3, "dom2": 0.2, "dom3": 0.15, "dom4": 0.15}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    spark = get_spark("bench_mixing", master=args.master)

    n = int(50_000_000 * args.scale)
    pct = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(100))
    bounds = []
    acc = 0
    for i, p in enumerate(DOM_PCT):
        acc += p
        bounds.append((acc, f"dom{i}"))
    dom = F.when(pct < bounds[0][0], F.lit(bounds[0][1]))
    for b, d in bounds[1:]:
        dom = dom.when(pct < b, F.lit(d))
    df = spark.range(n).select(
        F.col("id"),
        dom.alias("dom"),
        # 100..1123 tokens, deterministic
        (F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(1024)) + 100)
        .alias("tok"),
    )
    total_avail = df.agg(F.sum("tok")).collect()[0][0]
    # budget ~70% of the corpus: dom0 (60% mass, 20% weight) downsamples
    # hard; dom4 (2% mass, 15% weight) upsamples ~5 epochs
    total = int(total_avail * 0.7)

    # warmup
    df.limit(100_000).groupBy("dom").count().collect()

    for strat in ("window", "bucket", "rate"):
        t0 = time.time()
        plan = C.mix_plan(df, "dom", "tok", "id", W, total, strategy=strat)
        rep = {
            r["domain"]: r.asDict()
            for r in C.mix_report(plan, W, total).collect()
        }
        dt = time.time() - t0
        ok = True
        worst_frac = 0.0
        upsampled = 0
        for d, r in rep.items():
            miss = (r["budget"] - r["tokens_emitted"]) / max(r["budget"], 1)
            worst_frac = max(worst_frac, abs(miss))
            if strat in ("window", "bucket"):
                ok = ok and 0 <= r["budget"] - r["tokens_emitted"] < 1124
            else:
                ok = ok and abs(miss) < 0.01
            if r["copies"] > r["docs_kept"]:
                upsampled += 1
        ok = ok and upsampled >= 1  # dom4 must exceed one epoch
        print(json.dumps(dict(
            op=f"mix_plan[{strat}]", docs=n, domains=len(W),
            budget_tokens=int(total), wall_s=round(dt, 2),
            docs_per_s=int(n / dt),
            worst_budget_miss_frac=round(worst_frac, 6),
            upsampled_domains=upsampled, exact=ok,
        )), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
