"""Bench harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": ..., "pages_per_sec": ...}

The headline spatial pipeline runs over SYNTH_PAGES distributed-
generated pages (the BASELINE.json input shape) — table-derived
queries run over the sf parquet tables. Every timing is end-to-end
wall time of plan + execute (count() action).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from o2g_spark.functions import cellfns, geotag  # noqa: E402
from o2g_spark.operators import dedup, knn, pip, similarity, tiles  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402
from o2g_spark.sources import synth, synth_dist, tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SYNTH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "1000000"))
JACCARD_MAX_DF = 200


def _cpu_control_sec() -> float:
    """Machine-noise control: MIN-of-5 of a fixed single-threaded
    integer workload (numpy element-wise affine hashing — no BLAS, no
    JVM, no disk). On a quiet host this is stable to a few percent;
    on a noisy shared-VM window it inflates together with the Spark
    timings, so a drift that ALSO shows here is attributable to the
    window, not to a code regression (r4 VERDICT #1: the bench must be
    self-attributing — the ±25% shared-VM variance was previously only
    provable by an out-of-protocol quiet-window rerun).

    MIN of 5 passes after a short settle, not the median: the min is
    the least-contended pass, so it skips our own JVM's transient
    post-suite GC bursts (measured 3× inflation right after the last
    query) while still inflating under sustained external load —
    which is the thing being detected."""
    import numpy as np

    time.sleep(1.0)  # let our own JVM's post-query cleanup settle
    x = np.arange(4_000_000, dtype=np.uint64)
    runs = []
    for _ in range(5):
        t0 = time.time()
        y = x
        for _ in range(24):
            y = (y * np.uint64(0x9E3779B97F4A7C15) + np.uint64(12345)) \
                & np.uint64(0xFFFFFFFFFFFF)
        assert int(y[0]) >= 0
        runs.append(time.time() - t0)
    return round(min(runs), 4)


def main():
    spark = get_spark("o2g_bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # materialize once (localCheckpoint): timings measure the operators,
    # not page generation — same protocol as scripts/bench_scaling.py
    pages = synth_dist.gen_pages_dist(spark, SYNTH_PAGES).localCheckpoint()
    rings = synth.zone_rings(synth.gen_zones())
    gaz = tables.gazetteer_df(spark, synth.gen_gazetteer()).localCheckpoint()
    tgt = gaz.select(F.monotonically_increasing_id().alias("tid"), "lat", "lon").localCheckpoint()

    def spatial_pipeline():
        tagged = geotag.extract_coords(pages).withColumn(
            "cell", cellfns.cell_encode("lat", "lon", 9)
        )
        joined = pip.pip_join(tagged, rings)
        t = tiles.assign_tiles(joined, zoom=11)
        return t.groupBy("zone_id", "tile_x", "tile_y").agg(
            F.count("*").alias("n")
        )

    def knn_queries():
        # deterministic ~2% hash sample — a global limit() would
        # collapse the query side to one partition
        sample = pages.filter(F.pmod(F.xxhash64("url"), F.lit(50)) == 0)
        return geotag.extract_coords(sample).select(
            F.col("url").alias("qid"), "lat", "lon"
        )

    queries = {
        "spatial_pipeline": spatial_pipeline,
        # auto strategy: small broadcast targets → one-job brute force
        "knn_auto": lambda: knn.knn_join(knn_queries(), tgt, k=3),
        # k-ring entry point. Since r4 the cost model takes its EARLY
        # brute exit here (|Q|×|T| ≈ 4M fits the budget — paying ring
        # rounds at this shape was pure fixed cost); the iterative
        # ring machinery itself is measured by the 20M-page pipeline
        # knn stage (14M queries, over budget → real rings) and pinned
        # by the gate's tail_brute_cap=0 oracle query.
        "knn_kring": lambda: knn.knn_join(knn_queries(), tgt, k=3, res=5),
        "pip_tables": lambda: E.queries()["pip_rows"](spark, SF_DIR),
        "tile_assign_tables": lambda: E.queries()["tile_assign"](spark, SF_DIR),
        "agg_summary": lambda: E.queries()["agg_summary"](spark, SF_DIR),
        "join_agg": lambda: E.queries()["join_agg"](spark, SF_DIR),
        "window_topk": lambda: E.queries()["window_topk"](spark, SF_DIR),
        "minhash_lsh": lambda: dedup.minhash_lsh_pairs(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            "doc_id", "text", 32, 16, 0.4,
        ),
        "simhash_pairs": lambda: dedup.simhash_pairs(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            "doc_id", "text", 3,
        ),
        "cosine_topk": lambda: E.queries()["cosine_topk"](spark, SF_DIR),
        "token_quality": lambda: E.queries()["quality"](spark, SF_DIR),
        "dedup_exact_pages": lambda: dedup.dedup_exact(pages, "url", "text"),
        "minhash_sig_pages": lambda: pages.select(
            "url", dedup.minhash_signature("text", 16).alias("sig")
        ),
        # the 100-TB candidate path: df-capped inverted-index jaccard
        # (the exact path is Σ df² in boilerplate shingles); the cap is
        # not silent — dropped-shingle count reported in the JSON below
        "jaccard_capped": lambda: dedup.jaccard_pairs(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            "doc_id", "text", n=3, threshold=0.4, max_df=JACCARD_MAX_DF,
        ),
        # banded-LSH embedding near-dup incl. planted pairs (rows > 0)
        "embedding_near_dup": lambda: E.queries()["embedding_near_dup"](spark, SF_DIR),
        "events_window": lambda: E.queries()["events_window"](spark, SF_DIR),
    }

    # global warmup: pay JVM JIT tiers + Python worker spawn once,
    # untimed — the metric of record is steady-state throughput (the
    # 100 TB story; measured 4-5× first-run inflation from C2 alone)
    spatial_pipeline().count()
    spatial_pipeline().count()

    # per query: ONE discarded warm-up run (each query type still pays
    # its own codegen/UDF-worker spin-up the first time), then the
    # median of THREE timed runs — an odd count makes the median a true
    # middle value, immune to a single GC/compaction outlier (two runs
    # would average it in)
    # CPU control BEFORE the suite (and again after): any driver-window
    # drift that reproduces in this pure-CPU number is machine noise
    cpu_before = _cpu_control_sec()

    timings = {}
    spread = {}
    for name, fn in queries.items():
        fn().count()  # discarded warmup
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn().count()
            runs.append(time.time() - t0)
        runs.sort()
        mid = len(runs) // 2
        med = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
        timings[name] = round(med, 3)
        # per-query spread across the 3 timed runs: a wide (min, max)
        # band marks the median itself as window-noisy, so a cross-round
        # median delta inside the band needs no bisect
        spread[name] = {
            "min": round(runs[0], 3),
            "med": round(med, 3),
            "max": round(runs[-1], 3),
        }

    cpu_after = _cpu_control_sec()

    dropped = dedup.jaccard_dropped_shingles(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"),
        "doc_id", "text", n=3, max_df=JACCARD_MAX_DF,
    )

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "o2g_spark headline suite wall time (warm medians)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "synth_pages": SYNTH_PAGES,
        "pages_per_sec": round(SYNTH_PAGES / timings["spatial_pipeline"], 1),
        "jaccard_max_df": JACCARD_MAX_DF,
        "jaccard_dropped_shingles": dropped,
        "queries_spread": spread,
        "cpu_control_sec": {"before": cpu_before, "after": cpu_after},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
