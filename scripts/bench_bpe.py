"""BPE tokenizer training + encoding at crawl scale (round-5 evidence
for operators/bpe.py).

Claims measured:

1. Training cost is dominated by ONE corpus scan (the word-frequency
   dictionary); each of the k merge iterations then runs on DISTINCT
   words only — seconds per iteration at a 200k vocabulary regardless
   of corpus row count.
2. Planted truth: every 10th word is ``qqqqqq`` and no other word
   contains 'q' (the synthetic vocab renders digits as a-j), so merge
   #1 MUST be ('q q') with weight = 5 adjacencies × its exact corpus
   occurrence count.
3. Encoding is one map pass (explode → 2k codegen replaces → count):
   docs/s over the full corpus.

Run:  python scripts/bench_bpe.py [--docs 10000000] [--master local[32]]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.operators import bpe  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

VOCAB = 200_000
WORDS_PER_DOC = 16
PLANT_EVERY = 10  # every 10th word slot is the planted hot word


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--merges", type=int, default=16)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    spark = get_spark("bench_bpe", master=args.master)
    n = args.docs
    i = F.col("id")

    # word for (doc i, slot j): digits of a hashed index rendered a-j,
    # pure column math; slot j%10==0 plants the hot word
    def word(j):
        if j % PLANT_EVERY == 0:
            return F.lit("qqqqqq")
        idx = F.pmod(i * (2654435761 + j) + j * j, F.lit(VOCAB))
        return F.translate(idx.cast("string"), "0123456789", "abcdefghij")

    docs = spark.range(n).select(
        i.alias("doc_id"),
        F.concat_ws(" ", *[word(j) for j in range(WORDS_PER_DOC)])
        .alias("text"),
    )

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    # warm
    bpe.bpe_train(docs.where(i < 20_000), "text", 2)

    t0 = time.time()
    merges = bpe.bpe_train(docs, "text", args.merges)
    dt_train = time.time() - t0
    # qqqqqq has 5 'q q' adjacencies; no other word contains q
    planted_ok = merges[0] == ("q q", 5 * n * 2)  # 2 planted slots/doc
    emit(op="bpe_train", docs=n, vocab=VOCAB, merges=args.merges,
         wall_s=round(dt_train, 2),
         s_per_merge=round(dt_train / args.merges, 2),
         merge1=list(merges[0]), exact=bool(planted_ok))

    t0 = time.time()
    agg = bpe.bpe_encode(docs, "doc_id", "text", merges).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens").alias("tokens"),
    ).collect()[0]
    dt = time.time() - t0
    emit(op="bpe_encode", docs=n, wall_s=round(dt, 2),
         docs_per_s=int(n / dt), total_tokens=int(agg.tokens),
         exact=bool(agg.rows == n))
    spark.stop()


if __name__ == "__main__":
    main()
