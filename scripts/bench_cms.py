"""Count-Min heavy hitters at crawl scale (round-5 evidence for the
sketches.py count-min section).

Claim measured: at HIGH value cardinality the plain
``groupBy(value).count().where(n >= T)`` shuffles ~one row per
distinct value per task (map-side partial agg barely combines when
most values are unique), while the CMS prefilter's exact aggregation
shuffles only the maybe-heavy sliver. Input: ``--scale 1.0`` = 50M
rows, ~49.9M-distinct tail + 50 planted heavy keys (~2,000
occurrences each, threshold 1,500). Both paths must return the
IDENTICAL 50-key result (checked exactly); the survivor row count
(what the exact agg actually shuffles) is reported alongside the
walls.

Run:  python scripts/bench_cms.py [--scale 1.0] [--master local[32]]
JSON line per path to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.operators import sketches  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    spark = get_spark("bench_cms", master=args.master)

    n = int(50_000_000 * args.scale)
    hot_every, n_hot = 500, 50
    threshold = int(0.75 * n / hot_every / n_hot)
    # CMS additive error is ~N/w: w must dwarf N/threshold or the
    # tail load alone clears the threshold in every cell (first cut
    # ran w=4096 at N/T=33k and the prefilter kept 100% of rows)
    w = max(4096, 1 << (8 * n // threshold).bit_length())
    d = 4
    i = F.col("id")
    # NOTE (i DIV hot_every) % n_hot, not i % n_hot: hot ids are the
    # multiples of 500, and 500 % 50 == 0 would fold them all onto one key
    df = spark.range(n).select(
        F.when(
            i % hot_every == 0,
            F.concat(F.lit("hot"), ((i / hot_every).cast("long") % n_hot).cast("string")),
        )
        .otherwise(F.concat(F.lit("u"), i.cast("string")))
        .alias("v")
    )
    expect_hot = {f"hot{j}" for j in range(n_hot)}

    # warmup (JIT + codegen)
    df.limit(100_000).groupBy("v").count().agg(F.count(F.lit(1))).collect()

    t0 = time.time()
    plain = {
        (r.v, r["count"])
        for r in df.groupBy("v").count().where(F.col("count") >= threshold).collect()
    }
    dt_plain = time.time() - t0
    print(json.dumps(dict(
        op="heavy_hitters[plain groupBy]", rows=n, threshold=threshold,
        wall_s=round(dt_plain, 2), rows_per_s=int(n / dt_plain),
        found=len(plain), exact=({v for v, _ in plain} == expect_hot),
    )), flush=True)

    t0 = time.time()
    cms = {
        (r.value, r.n)
        for r in sketches.cms_heavy_hitters(
            df, "v", threshold, w=w, d=d
        ).collect()
    }
    dt_cms = time.time() - t0
    # what the exact agg actually shuffled: rows whose min-cell
    # estimate cleared the threshold (re-derived with the same sketch)
    from o2g_spark.session import cache_latest
    sk = cache_latest("bench_cms.sketch", sketches.cms_build(df, "v", w=w, d=d))
    est_rows = df.withColumn("__h", sketches._cms_hash(F.col("v"), "cms"))
    for j, (a, b) in enumerate(sketches._cms_affine(d)):
        row_j = sk.where(F.col("row") == j).select(
            F.col("col").alias(f"__col{j}"), F.col("c").alias(f"__c{j}")
        )
        est_rows = est_rows.withColumn(
            f"__col{j}", sketches._cms_col(F.col("__h"), a, b, w)
        ).join(F.broadcast(row_j), f"__col{j}", "left")
    est = F.least(*[F.coalesce(F.col(f"__c{j}"), F.lit(0)) for j in range(d)])
    survivors = est_rows.agg(
        F.sum((est >= threshold).cast("long")).alias("s")
    ).collect()[0].s
    print(json.dumps(dict(
        op="heavy_hitters[cms prefilter]", rows=n, threshold=threshold,
        w=w, d=d, wall_s=round(dt_cms, 2), rows_per_s=int(n / dt_cms),
        found=len(cms), survivor_rows=int(survivors),
        survivor_frac=round(survivors / n, 6),
        exact=(cms == plain and {v for v, _ in cms} == expect_hot),
    )), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
