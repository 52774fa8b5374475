"""kNN ring-vs-brute crossover measurement (r4 VERDICT #7).

choose_strategy's early brute exit claims a shape when |T| ≤ 5000 AND
|Q|·|T| ≤ 120M (200M before this script existed — the measurement
below moved it). This script MEASURES
both strategies at shapes bracketing the two bounds so the exit's
claim region is empirical: brute must win (or tie) inside it and the
ring path must win beyond it. Rows are asserted identical per shape
(same (qid,tid,rank) multiset) before any timing is recorded.

Run: python scripts/bench_knn_crossover.py [--master local[32]]
Prints one JSON line per shape + a markdown table for
BENCH/BASELINE.md.
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

# (|Q|, |T|) shapes: inside both bounds / at the product bound /
# over the product bound / over the |T| bound
SHAPES = [
    # inside the claim region (brute must win or tie)
    (80_000, 1_000),     # 80M product, wide-Q shape
    (40_000, 2_000),     # 80M product
    (25_000, 4_000),     # 100M product
    (40_000, 3_000),     # 120M product — the claim boundary itself
    (60_000, 2_000),     # 120M product, second boundary shape
    # outside it (ring must win)
    (40_000, 5_000),     # 200M product — the r4 budget (ring wins here!)
    (100_000, 5_000),    # 500M product — ring territory (product)
    (20_000, 20_000),    # 400M product, |T| > 5000 — ring territory (|T|)
]
K = 3


def synth(spark, n: int, prefix: str, seed: int):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        f"{prefix}id": np.arange(n),
        "lat": np.round(rng.uniform(-60, 60, n), 5),
        "lon": np.round(rng.uniform(-150, 150, n), 5),
    })
    return spark.createDataFrame(pdf).repartition(16).localCheckpoint()


def timed(fn, runs: int = 3) -> float:
    fn()  # warm
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    from o2g_spark.operators import knn
    from o2g_spark.session import get_spark

    spark = get_spark("knn-crossover", master=args.master)
    rows_md = ["| |Q| | |T| | product | in claim region | brute s | ring s | winner |",
               "|---|---|---|---|---|---|---|"]
    for nq, nt in SHAPES:
        q = synth(spark, nq, "q", 11)
        t = synth(spark, nt, "t", 23)
        claimed, res = knn.choose_strategy(K, nq, nt)

        def brute_df():
            return knn.knn_bruteforce(q, t, K)

        def ring_df():
            # pin the iterative ring machinery: explicit res skips the
            # strategy dispatch; tail_brute_cap=0 forbids the tail exit
            return knn.knn_join(
                q, t, K, res=res, n_queries=nq, n_targets=nt,
                tail_brute_cap=0,
            )

        def brute():
            return brute_df().count()

        def ring():
            return ring_df().count()

        # REAL multiset equivalence, not row counts (both paths always
        # emit ~|Q|·k rows, so a wrong-neighbor bug would pass a count
        # check): symmetric exceptAll over the full result rows
        cols = ["qid", "tid", "dist2", "knn_rank"]
        b_res, r_res = brute_df().select(cols), ring_df().select(cols)
        diff = (b_res.exceptAll(r_res).count()
                + r_res.exceptAll(b_res).count())
        assert diff == 0, f"result mismatch at ({nq},{nt}): {diff} rows differ"
        nb = b_res.count()
        tb, tr = timed(brute), timed(ring)
        winner = "brute" if tb < tr else "ring"
        print(json.dumps({
            "n_queries": nq, "n_targets": nt, "product": nq * nt,
            "claimed_by_brute": claimed, "brute_sec": round(tb, 3),
            "ring_sec": round(tr, 3), "winner": winner, "rows": nb,
        }), flush=True)
        rows_md.append(
            f"| {nq:,} | {nt:,} | {nq * nt / 1e6:.0f}M | "
            f"{'yes' if claimed else 'no'} | {tb:.2f} | {tr:.2f} | "
            f"**{winner}** |"
        )
    print("\n".join(rows_md))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
