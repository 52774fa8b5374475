"""Quantile sketch at crawl scale (round-5 evidence for the
sketches.py quantile section).

Claim measured: per-group quantiles off the integer relative-error
sketch shuffle <= ~2e3 rows per group (bucket histogram, map-side
combined) where the exact path shuffles one row per DISTINCT value
and then funnels each group through ONE window task for the cumsum —
the part that stops scaling when distinct values grow with the
corpus. Input: ``--scale 1.0`` = 200M rows across 8 groups, values a
30-octave mixture (heavy dynamic range, ~1.9M distinct by
construction so the exact path stays runnable AT ALL — at true crawl
cardinality it wouldn't be). Every sketch answer is checked against
the exact nearest-rank value and the guaranteed 2^-(B+1) bound;
Spark's builtin approx_percentile is timed alongside for context
(different algorithm — no exactness contract, not gate-able).

Run:  python scripts/bench_qsketch.py [--scale 1.0] [--master local[32]]
JSON line per path to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.operators import sketches  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

QS = {"p01": 0.01, "p50": 0.5, "p90": 0.9, "p99": 0.99, "p999": 0.999}
PPM = 1_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--sub-bits", type=int, default=4)
    args = ap.parse_args()
    spark = get_spark("bench_qsketch", master=args.master)

    n = int(200_000_000 * args.scale)
    groups = 8
    # 30-octave mixture: e = xxh % 30, value = 2^e + floor(off * 2^e /
    # 65536) — wide dynamic range (1 .. ~1e9) but <= 30*65536 distinct
    # per group so the EXACT reference stays computable
    h1 = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(30))
    h2 = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(65536))
    df = (
        spark.range(n)
        .withColumn("__e", h1.cast("int"))
        .withColumn("__off", h2)
        .select(
            F.pmod(F.col("id"), F.lit(groups)).alias("g"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), __e) "
                "+ (__off * shiftleft(CAST(1 AS BIGINT), __e)) DIV 65536"
            ).cast("long").alias("v"),
        )
    )

    # warmup (JIT + codegen)
    df.limit(100_000).groupBy("g").count().agg(F.count(F.lit(1))).collect()

    # ---- exact nearest-rank via distinct-value histogram + cumsum
    t0 = time.time()
    hist = df.groupBy("g", "v").agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "g", "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("n"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("cum")
                >= F.expr(f"(n - 1) * {round(q * PPM)} DIV {PPM} + 1"),
                F.col("v"),
            )
        ).alias(lbl)
        for lbl, q in QS.items()
    ]
    exact = {r["g"]: r.asDict() for r in cum.groupBy("g").agg(*aggs).collect()}
    dt_exact = time.time() - t0
    n_distinct = hist.count()
    print(json.dumps(dict(
        op="quantiles[exact distinct-hist]", rows=n, groups=groups,
        distinct=n_distinct, wall_s=round(dt_exact, 2),
        rows_per_s=int(n / dt_exact),
    )), flush=True)

    # ---- the sketch
    b = args.sub_bits
    t0 = time.time()
    got = {
        r["g"]: r.asDict()
        for r in sketches.quantile_sketch(df, ["g"], "v", QS, b).collect()
    }
    dt_sk = time.time() - t0
    sk_rows = sketches.qsketch_build(df, ["g"], "v", b).count()
    bound = sketches.qsketch_error_bound(b)
    worst = 0.0
    ok = True
    for g, row in exact.items():
        for lbl in QS:
            true, est = row[lbl], got[g][lbl]
            rel = abs(est - true) / max(abs(true), 1)
            worst = max(worst, rel)
            ok = ok and abs(est - true) <= abs(true) * bound + 0.5
    print(json.dumps(dict(
        op="quantiles[qsketch]", rows=n, groups=groups, sub_bits=b,
        sketch_rows=int(sk_rows), wall_s=round(dt_sk, 2),
        rows_per_s=int(n / dt_sk), worst_rel_err=round(worst, 5),
        bound=bound, within_bound=ok,
    )), flush=True)

    # ---- builtin for context (t-digest-ish GK; no exactness contract)
    t0 = time.time()
    df.groupBy("g").agg(
        F.expr(
            f"approx_percentile(v, array({', '.join(str(q) for q in QS.values())}), 10000)"
        ).alias("qs")
    ).collect()
    dt_ap = time.time() - t0
    print(json.dumps(dict(
        op="quantiles[approx_percentile 10k]", rows=n, groups=groups,
        wall_s=round(dt_ap, 2), rows_per_s=int(n / dt_ap),
    )), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
