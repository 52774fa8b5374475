"""Filtering family at crawl scale (round-5 evidence for
operators/decontam.py, boilerplate.py, repetition.py,
corpus.url_canonical).

Claims measured (inputs synthesized deterministically in Spark):

1. decontam: the benchmark gram set BROADCASTS — the 10M-doc corpus
   side never shuffles its gram stream; planted leak count recovered
   exactly.
2. strip_boilerplate: hot-set anti-join at 10M docs × 5 lines; the
   planted universal banner/footer strip everywhere (n_removed exact),
   bodies survive.
3. repetition_report: per-doc HOF feature cost at 2M docs — no
   shuffle besides the rule-8 boundary; planted spam docs are the
   only ones over the Gopher caps (bodies carry a unique token every
   8 words, so clean docs have dup10 exactly 0).
4. passage_dedup: window-fingerprint shuffle at 1M docs x ~70
   tokens; the planted 24-token passage (every 100th doc) is removed
   exactly — one merged span per planted doc minus the one keeper.
5. url_canonical: pure column math at 20M urls; idempotence checked
   on a sample.

Run:  python scripts/bench_textfilters.py [--scale 1.0] [--master local[32]]
JSON line per op to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from o2g_spark.functions import pii as pii_fns  # noqa: E402
from o2g_spark.functions import text as text_fns  # noqa: E402
from o2g_spark.operators import boilerplate, decontam, passages, repetition  # noqa: E402
from o2g_spark.operators import corpus as corpus_ops  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _body(i_col):
    """~24-word pseudo-random body line from the doc id (pure column)."""
    parts = [
        F.element_at(
            F.array(*[F.lit(w) for w in WORDS]),
            ((i_col * (7 + k) + k * k) % len(WORDS) + 1).cast("int"),
        )
        for k in range(24)
    ]
    return F.concat_ws(" ", *parts, F.concat(F.lit("tail"), i_col.cast("string")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    spark = get_spark("bench_textfilters", master=args.master)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    # ---------------------------------------------------------- decontam
    n_docs = int(10_000_000 * args.scale)
    n_bench = 10_000
    leak_every = 100  # 1% planted leaks
    i = F.col("id")
    docs = spark.range(n_docs).select(
        i.alias("doc_id"),
        F.when(
            i % leak_every == 0,
            # leaked docs embed benchmark item (id div 100) mod n_bench
            F.concat(F.lit("bench item number "),
                     ((i / leak_every).cast("long") % n_bench).cast("string"),
                     F.lit(" secret passage alpha beta gamma delta "
                           "epsilon zeta eta theta iota kappa end")),
        ).otherwise(_body(i)).alias("text"),
    )
    bench = spark.range(n_bench).select(
        F.concat(F.lit("bench item number "), F.col("id").cast("string"),
                 F.lit(" secret passage alpha beta gamma delta epsilon "
                       "zeta eta theta iota kappa end")).alias("text"),
    )
    # warm
    decontam.contamination_report(docs.limit(50_000), bench, "doc_id", "text", n=8).count()
    t0 = time.time()
    flagged = decontam.contamination_report(docs, bench, "doc_id", "text", n=8).count()
    dt = time.time() - t0
    emit(op="decontam", docs=n_docs, bench=n_bench, flagged=flagged,
         planted=n_docs // leak_every, wall_s=round(dt, 2),
         docs_per_s=int(n_docs / dt),
         exact=(flagged == n_docs // leak_every))

    # --------------------------------------------------- strip_boilerplate
    n_docs2 = int(10_000_000 * args.scale)
    multi = spark.range(n_docs2).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.lit("accept all cookies to continue"),
            _body(F.col("id")),
            F.when(F.col("id") % 2 == 0, F.lit("subscribe to the newsletter")),
            _body(F.col("id") + 7_777_777),
            F.lit("all rights reserved"),
        ).alias("text"),
    )
    boilerplate.strip_boilerplate(multi.limit(50_000), "doc_id", "text",
                                  min_frac=0.4).count()
    t0 = time.time()
    out = boilerplate.strip_boilerplate(multi, "doc_id", "text", min_frac=0.4)
    agg = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("n_removed").alias("rm"),
                  F.min("n_kept").alias("mink")).collect()[0]
    dt = time.time() - t0
    # banner+footer everywhere, subscribe on evens ⇒ removed = 2.5 n
    emit(op="strip_boilerplate", docs=n_docs2, lines=int(n_docs2 * 4.5),
         wall_s=round(dt, 2), docs_per_s=int(n_docs2 / dt),
         removed=int(agg.rm), exact=(agg.n == n_docs2
                                     and agg.rm == n_docs2 * 2 + n_docs2 // 2
                                     and agg.mink == 2))

    # ------------------------------------------------------- repetition
    # body: 12 blocks of 7 vocab words + one per-(doc, block) unique
    # token — every 10-gram contains a unique token, so clean docs
    # have dup10_char_frac EXACTLY 0 (the first generator drew all 24
    # words from a quadratic index mod 20, which is period-10 for even
    # ids: every doc had honest 10-gram repeats and "exact" failed).
    # The hot count is a conditional SUM, not where().count(): a
    # Filter on a report column pushes below the operator's rule-8
    # boundary and re-inlines the gram fold (measured 4.5x).
    n_docs3 = int(2_000_000 * args.scale)
    spam_every = 1000
    i3 = F.col("id")
    blocks = []
    for g in range(12):
        blocks.extend(
            F.element_at(
                F.array(*[F.lit(w) for w in WORDS]),
                ((i3 * (7 + k) + g + k * k) % len(WORDS) + 1).cast("int"),
            )
            for k in range(7)
        )
        blocks.append(
            F.concat(F.lit("u"), i3.cast("string"), F.lit("x"), F.lit(str(g)))
        )
    rdocs = spark.range(n_docs3).select(
        i3.alias("doc_id"),
        F.when(
            i3 % spam_every == 0,
            F.concat_ws(" ", *([F.lit("buy cheap pills online now")] * 20)),
        ).otherwise(F.concat_ws(" ", *blocks)).alias("text"),
    )
    warm = repetition.repetition_report(
        rdocs.where(i3 < 20_000), "doc_id", "text", top_ns=(2,), dup_ns=(10,)
    )
    warm.agg(F.count(F.lit(1))).collect()
    t0 = time.time()
    rep = repetition.repetition_report(
        rdocs, "doc_id", "text", top_ns=(2,), dup_ns=(10,)
    )
    hot = rep.agg(
        F.sum((F.col("dup10_char_frac") > 0.10).cast("long"))
    ).collect()[0][0]
    dt = time.time() - t0
    emit(op="repetition_report", docs=n_docs3, wall_s=round(dt, 2),
         docs_per_s=int(n_docs3 / dt), over_dup10=int(hot),
         planted=n_docs3 // spam_every,
         exact=(hot == n_docs3 // spam_every))

    # ----------------------------------------------------- passage_dedup
    # bodies are 8 blocks of 7 vocab words + a per-(doc, block) unique
    # token, so every 16-token window straddles a block boundary and
    # carries a doc-specific token -> zero accidental cross-doc
    # windows. Every 100th doc gets the same 24-token passage spliced
    # mid-doc: exactly that span must go from every planted doc but
    # the globally-first, as ONE merged span.
    n_docs4 = int(1_000_000 * args.scale)
    plant_every = 100
    kp = 16
    passage24 = " ".join(f"pp{j}" for j in range(24))
    i4 = F.col("id")

    def _block(g):
        # vocab index varies by i%97, NOT i alone: planted ids are all
        # = 0 mod 20, so any linear-in-i index would give every
        # planted doc an IDENTICAL vocab body and passage windows
        # would legitimately bleed into the following block
        toks = [
            F.element_at(
                F.array(*[F.lit(w) for w in WORDS]),
                (((i4 % 97) * (11 + k) + g + k * k) % len(WORDS) + 1).cast("int"),
            )
            for k in range(7)
        ]
        toks.append(
            F.concat(F.lit("q"), i4.cast("string"), F.lit("x"), F.lit(str(g)))
        )
        return F.concat_ws(" ", *toks)

    head = F.concat_ws(" ", *[_block(g) for g in range(4)])
    tail4 = F.concat_ws(" ", *[_block(g) for g in range(4, 8)])
    # the doc-unique token directly after the passage stops straddling
    # windows (pp9..pp23 + next vocab token) from matching between
    # planted docs that share a vocab class (i = i' mod 9700)
    stop_tok = F.concat(F.lit("q"), i4.cast("string"), F.lit("xs"))
    pdocs = spark.range(n_docs4).select(
        i4.alias("doc_id"),
        F.when(
            i4 % plant_every == 0,
            F.concat_ws(" ", head, F.lit(passage24), stop_tok, tail4),
        ).otherwise(F.concat_ws(" ", head, tail4)).alias("text"),
    )
    passages.passage_dedup(
        pdocs.where(i4 < 20_000), "doc_id", "text", k=kp
    ).agg(F.count(F.lit(1))).collect()
    t0 = time.time()
    agg4 = passages.passage_dedup(pdocs, "doc_id", "text", k=kp).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_removed").alias("rm"),
        F.sum("n_spans").alias("sp"),
    ).collect()[0]
    dt = time.time() - t0
    n_planted = (n_docs4 + plant_every - 1) // plant_every
    emit(op="passage_dedup", docs=n_docs4, k=kp, wall_s=round(dt, 2),
         docs_per_s=int(n_docs4 / dt), removed_tokens=int(agg4.rm),
         dup_docs=int(agg4.sp),
         exact=(agg4.n == n_docs4
                and agg4.rm == 24 * (n_planted - 1)
                and agg4.sp == n_planted - 1))

    # -------------------------------------------------------- pii scrub
    # planted email / IPv4 / phone on disjoint-period id classes; the
    # vocab body can't collide with any pattern (no '@', no dotted
    # quads, no digit-separator runs). sum(length(text)) keeps the
    # final replace pass alive under column pruning — without it the
    # agg would prune the masked text and skip the last rewrite.
    n_docs5 = int(10_000_000 * args.scale)
    i5 = F.col("id")
    pii_docs = spark.range(n_docs5).select(
        i5.alias("doc_id"),
        F.concat_ws(
            " ",
            _body(i5),
            F.when(i5 % 50 == 0,
                   F.concat(F.lit("mail z"), i5.cast("string"),
                            F.lit("@ex.org"))),
            F.when(i5 % 70 == 0,
                   F.concat(F.lit("host 10."),
                            (i5 % 200).cast("string"), F.lit(".3.7"))),
            F.when(i5 % 110 == 0, F.lit("call (555) 123-4567")),
        ).alias("text"),
    )
    pii_fns.scrub_pii(pii_docs.limit(50_000), "doc_id", "text").agg(
        F.count(F.lit(1))).collect()
    t0 = time.time()
    agg5 = pii_fns.scrub_pii(pii_docs, "doc_id", "text").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_email").alias("e"),
        F.sum("n_ipv4").alias("ip"),
        F.sum("n_phone").alias("ph"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]
    dt = time.time() - t0
    exp = lambda p: (n_docs5 + p - 1) // p  # noqa: E731
    emit(op="pii_scrub", docs=n_docs5, wall_s=round(dt, 2),
         docs_per_s=int(n_docs5 / dt),
         masked_email=int(agg5.e), masked_ipv4=int(agg5.ip),
         masked_phone=int(agg5.ph),
         exact=(agg5.n == n_docs5 and agg5.e == exp(50)
                and agg5.ip == exp(70) and agg5.ph == exp(110)))

    # ----------------------------------------------------- url_canonical
    n_urls = int(20_000_000 * args.scale)
    urls = spark.range(n_urls).select(
        F.col("id").alias("i"),
        F.concat(
            F.lit("HTTPS://W"), (F.col("id") % 9).cast("string"),
            F.lit(".Site"), (F.col("id") % 40_000).cast("string"),
            F.lit(".ORG:443/p/"), F.col("id").cast("string"),
            F.lit("/?utm_source=x&b=2&a=1#frag"),
        ).alias("url"),
    )
    urls.limit(100_000).select(corpus_ops.url_canonical("url")).count()
    t0 = time.time()
    n = urls.select(corpus_ops.url_canonical("url").alias("c")).where(
        F.col("c").contains("?a=1&b=2") & ~F.col("c").contains("utm")
    ).count()
    dt = time.time() - t0
    emit(op="url_canonical", urls=n_urls, wall_s=round(dt, 2),
         urls_per_s=int(n_urls / dt), exact=(n == n_urls))

    # -------------------------------------------------------- clean_text
    # every 3rd doc decorated with mojibake (curly quotes, nbsp,
    # ellipsis, CRLF, em-dash, tab run, zero-width); the rest pure
    # ASCII single-spaced bodies that the passes must return
    # BYTE-identical (changed == planted exactly, zero ASCII touches)
    n_docs6 = int(10_000_000 * args.scale)
    dirty_every = 3
    raw6 = spark.range(n_docs6).select(
        i.alias("doc_id"),
        F.when(
            i % dirty_every == 0,
            F.concat(F.lit("“q”  …\r\n"), _body(i),
                     F.lit(" —\t\tend​")),
        ).otherwise(_body(i)).alias("text"),
    )
    cleaned6 = raw6.withColumn(
        "t", text_fns.clean_text(F.col("text"))
    ).withColumn("chg", ~F.col("t").eqNullSafe(F.col("text")))
    # warm up through the regex chain itself (a count(1) would let the
    # optimizer prune the clean_text projection to a no-op warmup)
    cleaned6.limit(100_000).agg(F.sum(F.col("chg").cast("long"))).collect()
    t0 = time.time()
    agg6 = cleaned6.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("chg").cast("long")).alias("changed"),
        F.sum(
            F.when((F.col("doc_id") % dirty_every != 0) & F.col("chg"), 1)
            .otherwise(0)
        ).alias("ascii_touched"),
    ).collect()[0]
    dt = time.time() - t0
    planted6 = (n_docs6 + dirty_every - 1) // dirty_every
    emit(op="clean_text", docs=n_docs6, wall_s=round(dt, 2),
         docs_per_s=int(n_docs6 / dt), changed=int(agg6.changed),
         exact=(agg6.n == n_docs6 and agg6.changed == planted6
                and agg6.ascii_touched == 0))

    spark.stop()


if __name__ == "__main__":
    main()
