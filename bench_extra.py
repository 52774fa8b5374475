"""Targeted per-query measurement harness (guide §1.4/§1.5) — NOT the
driver contract (bench.py is frozen for that). Times a subset of the
headline queries with the same methodology (1 discarded warmup + median
of 3 timed `.count()` runs) so per-operator optimizations can be
measured without paying the full suite. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [query ...]

With no args runs the table-derived heavy set (no synth-page
generation): jaccard_capped, simhash_pairs, minhash_lsh, cosine_topk,
embedding_near_dup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from o2g_spark.operators import dedup  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("o2g_bench_extra")
    docs = lambda: spark.read.parquet(f"{SF_DIR}/documents.parquet")  # noqa: E731

    queries = {
        "jaccard_capped": lambda: dedup.jaccard_pairs(
            docs(), "doc_id", "text", n=3, threshold=0.4, max_df=200),
        "simhash_pairs": lambda: dedup.simhash_pairs(
            docs(), "doc_id", "text", 3),
        "minhash_lsh": lambda: dedup.minhash_lsh_pairs(
            docs(), "doc_id", "text", 32, 16, 0.4),
        "cosine_topk": lambda: E.queries()["cosine_topk"](spark, SF_DIR),
        "embedding_near_dup": lambda: E.queries()["embedding_near_dup"](
            spark, SF_DIR),
    }
    names = sys.argv[1:] or list(queries)

    timings, spread = {}, {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name} warmup")
        fn().count()
        runs = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"bench_extra: {name} #{i}")
            t0 = time.time()
            fn().count()
            runs.append(time.time() - t0)
        runs.sort()
        timings[name] = round(runs[1], 3)
        spread[name] = [round(r, 3) for r in runs]
    print(json.dumps({"sf_dir": SF_DIR, "queries": timings,
                      "spread": spread}))


if __name__ == "__main__":
    main()
