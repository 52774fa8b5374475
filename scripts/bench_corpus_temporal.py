"""Corpus-curation / temporal / sketch family at crawl scale
(round-5 evidence for operators/corpus.py, temporal.py, sketches.py).

Claims measured here, each against its naive alternative where one
exists (all inputs synthesized deterministically in Spark — no
external data):

1. asof_join's union+window plan is O(|L|+|R|) rows per key, where
   the rank-form theta join materializes |L|·|R| pairs per key. The
   two are compared head-to-head at a shape the naive plan can still
   survive (and checked row-identical there); the union plan then
   runs a 10× larger shape the naive plan cannot.
2. hll_distinct bounds shuffle at 2^p rows/group/task; wall time is
   compared against exact count(DISTINCT) at the same input, and the
   estimate's relative error is asserted inside 5× the 1.04/sqrt(m)
   bound.
3. doc_chunks / domain_cap / interval_join throughput at tens of
   millions of rows, with structural checks (chunk-count formula,
   per-domain cap exactness incl. a planted 50%-hot megahost,
   bucketed == theta join at the verification shape).

Run:  python scripts/bench_corpus_temporal.py [--scale 1.0]
          [--master local[32]] [--update-baseline]

JSON lines to stdout; --update-baseline splices a table into
BENCH/BASELINE.md between the corpus-temporal markers.
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
from o2g_spark.operators import sketches as SK  # noqa: E402
from o2g_spark.operators import temporal as TP  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402

BEGIN = "<!-- corpus-temporal:begin -->"
END = "<!-- corpus-temporal:end -->"

EPOCH0 = 1_700_000_000  # fixed base so runs are deterministic


def _events(spark, n, keys, tag):
    """n synthetic events over `keys` entities, 30-day window."""
    return spark.range(n).select(
        F.col("id").alias("eid"),
        F.pmod(F.xxhash64("id", F.lit(tag)), F.lit(keys)).alias("k"),
        F.timestamp_seconds(
            F.lit(EPOCH0)
            + F.pmod(F.xxhash64("id", F.lit(tag + 1)), F.lit(30 * 86400))
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(tag + 2)), F.lit(1000)) / 10.0).alias("v"),
    )


def _digest(df):
    # bit_xor: order-insensitive, overflow-free multiset digest (same
    # flavor as the checkpoint layer's lineage digests)
    cols = ", ".join(df.columns)
    return df.select(
        F.count("*").alias("n"),
        F.expr(f"bit_xor(xxhash64({cols}))").alias("h"),
    ).collect()[0]


def bench_asof(spark, scale):
    out = {}
    # --- verification shape: dense per-key history (200 rows/side/key
    # → the naive plan materializes ~40k pairs/key before pruning;
    # the union plan's cost is linear in rows/key either way)
    nv = int(1_000_000 * scale)
    kv = max(int(5_000 * scale), 1)
    left = _events(spark, nv, kv, 10).localCheckpoint(eager=True)
    right = _events(spark, nv, kv, 20).select(
        F.col("eid").alias("rid"), "k", "ts", "v"
    ).localCheckpoint(eager=True)

    # JIT/codegen warmup (CLAUDE.md rule 5): first runs pay 4-5x
    a = TP.asof_join(left, right, "k", "ts", "ts", ["rid", "v"], tie_col="rid")
    a.count()

    t0 = time.time()
    da = _digest(a)
    out["asof_union_small_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    naive = (
        left.alias("l")
        .join(right.alias("r"), (F.col("l.k") == F.col("r.k"))
              & (F.col("r.ts") <= F.col("l.ts")), "left")
        .withColumn(
            "__rk",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("l.eid")
                .orderBy(F.col("r.ts").desc_nulls_last(),
                         F.col("r.rid").desc_nulls_last())
            ),
        )
        .where(F.col("__rk") == 1)
        .select(
            F.col("l.eid").alias("eid"), F.col("l.k").alias("k"),
            F.col("l.ts").alias("ts"), F.col("l.v").alias("v"),
            F.col("r.rid").alias("r_rid"), F.col("r.v").alias("r_v"),
        )
    )
    dn = _digest(naive)
    out["asof_naive_small_sec"] = round(time.time() - t0, 2)
    out["asof_small_rows"] = da["n"]
    out["asof_identical"] = bool(da["n"] == dn["n"] and da["h"] == dn["h"])

    # --- scale shape: 10× rows, denser per-key history
    nb = int(10_000_000 * scale)
    kb = max(int(100_000 * scale), 1)
    bl = _events(spark, nb, kb, 30).localCheckpoint(eager=True)
    br = _events(spark, nb, kb, 40).select(
        F.col("eid").alias("rid"), "k", "ts", "v"
    ).localCheckpoint(eager=True)
    t0 = time.time()
    big = TP.asof_join(bl, br, "k", "ts", "ts", ["rid", "v"], tie_col="rid")
    nbig = big.count()
    out["asof_union_big_sec"] = round(time.time() - t0, 2)
    out["asof_big_rows"] = nbig
    out["asof_big_rows_per_sec"] = int(
        (nb * 2) / max(out["asof_union_big_sec"], 1e-9)
    )
    return out


def bench_asof_skew(spark, scale):
    """Planted hot entity: 50% of both sides on ONE key. The default
    plan sorts that key's whole timeline in one window partition; the
    time-bucketed plan splits it into bounded (key, bucket) partitions
    + a tiny bucket-carry. Digest-checked identical."""
    out = {}
    n = int(5_000_000 * scale)
    keys = max(int(10_000 * scale), 2)
    hot = F.when(
        F.pmod(F.xxhash64("id", F.lit(70)), F.lit(2)) == 0, F.lit(0)
    ).otherwise(F.pmod(F.xxhash64("id", F.lit(71)), F.lit(keys)))

    def mk(tag, idcol):
        return spark.range(n).select(
            F.col("id").alias(idcol),
            hot.alias("k"),
            F.timestamp_seconds(
                F.lit(EPOCH0)
                + F.pmod(F.xxhash64("id", F.lit(tag)), F.lit(30 * 86400))
            ).alias("ts"),
        ).localCheckpoint(eager=True)

    left, right = mk(80, "eid"), mk(90, "rid")
    # warm both plans once
    TP.asof_join(left, right, "k", "ts", "ts", ["rid"], tie_col="rid").count()

    t0 = time.time()
    d_plain = _digest(
        TP.asof_join(left, right, "k", "ts", "ts", ["rid"], tie_col="rid")
    )
    out["asof_hot_plain_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    d_skew = _digest(
        TP.asof_join(
            left, right, "k", "ts", "ts", ["rid"], tie_col="rid",
            time_bucket_seconds=6 * 3600,
        )
    )
    out["asof_hot_skew_sec"] = round(time.time() - t0, 2)
    out["asof_hot_rows"] = n
    out["asof_hot_identical"] = bool(
        d_plain["n"] == d_skew["n"] and d_plain["h"] == d_skew["h"]
    )
    return out


def bench_hll(spark, scale):
    out = {}
    n = int(100_000_000 * scale)
    distinct_space = n // 2
    df = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(5)).alias("g"),
        F.concat(
            F.lit("v"),
            F.pmod(F.xxhash64("id"), F.lit(distinct_space)).cast("string"),
        ).alias("v"),
    )
    p = 12
    t0 = time.time()
    sk = SK.hll_distinct(df, ["g"], "v", p=p).collect()
    out["hll_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    out["exact_sec"] = round(time.time() - t0, 2)
    rels = [abs(r["hll_est"] - exact[r["g"]]) / exact[r["g"]] for r in sk]
    out["hll_rows"] = n
    out["hll_p"] = p
    out["hll_max_relerr"] = round(max(rels), 4)
    out["hll_bound_5sigma"] = round(5 * SK.hll_error_bound(p), 4)
    out["hll_within_bound"] = bool(max(rels) < 5 * SK.hll_error_bound(p))
    return out


def bench_chunks(spark, scale):
    out = {}
    n = int(2_000_000 * scale)
    tokens_per_doc = 120
    # deterministic ~120-token docs without a python loop
    words = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id") * tokens_per_doc + i), F.lit(5000))
            .cast("string"),
        ),
    )
    docs = (
        spark.range(n)
        .withColumn("__ws", words)
        .select(F.col("id").alias("doc_id"),
                F.concat_ws(" ", F.col("__ws")).alias("text"))
        .localCheckpoint(eager=True)
    )
    size, overlap = 128, 16
    t0 = time.time()
    nchunks = C.doc_chunks(docs, "doc_id", "text", size, overlap).count()
    out["chunks_sec"] = round(time.time() - t0, 2)
    step = size - overlap
    expect_per_doc = (tokens_per_doc + step - 1) // step
    out["chunks_docs"] = n
    out["chunks_rows"] = nchunks
    out["chunks_expected"] = n * expect_per_doc
    out["chunks_exact"] = bool(nchunks == n * expect_per_doc)
    out["chunks_docs_per_sec"] = int(n / max(out["chunks_sec"], 1e-9))
    return out


def bench_tfidf(spark, scale):
    """Corpus-df join + per-doc top-k at millions of docs: the
    rarity-weighted term ranking whose build side is one row per
    distinct term (never per occurrence)."""
    out = {}
    n = int(1_000_000 * scale)
    tokens_per_doc = 60
    words = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id") * tokens_per_doc + i), F.lit(20000))
            .cast("string"),
        ),
    )
    docs = (
        spark.range(n)
        .withColumn("__ws", words)
        .select(F.col("id").alias("doc_id"),
                F.concat_ws(" ", F.col("__ws")).alias("text"))
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    rows = C.tfidf_topk(docs, "doc_id", "text", k=5).count()
    out["tfidf_sec"] = round(time.time() - t0, 2)
    out["tfidf_docs"] = n
    out["tfidf_rows"] = rows
    out["tfidf_ok"] = bool(rows == n * 5)  # every doc gets its top-5
    out["tfidf_docs_per_sec"] = int(n / max(out["tfidf_sec"], 1e-9))
    return out


def bench_pack(spark, scale):
    """Next-fit packing at chunk-table scale: one shard shuffle + an
    O(rows/shard) python pass per shard."""
    from o2g_spark.operators import packing as P

    out = {}
    n = int(10_000_000 * scale)
    shards = 256
    chunks = spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(400)) + 32).alias("toks"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    packed = P.pack_sequences(chunks, "id", "toks", budget=2048, shards=shards)
    rows = packed.count()
    out["pack_sec"] = round(time.time() - t0, 2)
    st = P.pack_stats(packed, 2048).collect()[0]
    out["pack_rows"] = rows
    out["pack_ok"] = bool(rows == n)
    out["pack_fill"] = float(st["fill_ratio"])
    out["pack_bins"] = int(st["bins_used"])
    out["pack_rows_per_sec"] = int(n / max(out["pack_sec"], 1e-9))
    return out


def bench_bloom(spark, scale):
    """Frontier dedup at crawl shape: 20M seen urls, a 10M new batch
    with 10% true overlap. Headline metric: rows that still reach the
    EXACT anti join (the 100-TB cost driver) — the bloom pass routes
    only the maybe-seen sliver there. Wall times are single-box; on a
    cluster the seen table is the thing that doesn't fit, and the
    exact join's probe side shrinking ~10x is the win."""
    from o2g_spark.operators import membership as MB

    out = {}
    n_seen = int(20_000_000 * scale)
    n_new = int(10_000_000 * scale)
    seen = spark.range(n_seen).select(
        F.concat(F.lit("https://h"), F.col("id").cast("string"),
                 F.lit(".org/")).alias("u")
    ).localCheckpoint(eager=True)
    # 10% of new overlap seen; the rest are fresh ids past the range
    new = spark.range(n_new).select(
        F.when(
            F.pmod(F.xxhash64("id"), F.lit(10)) == 0,
            F.concat(F.lit("https://h"),
                     F.pmod(F.xxhash64("id", F.lit(5)), F.lit(n_seen))
                     .cast("string"), F.lit(".org/")),
        ).otherwise(
            F.concat(F.lit("https://h"), (F.col("id") + n_seen).cast("string"),
                     F.lit(".org/"))
        ).alias("u")
    ).localCheckpoint(eager=True)

    m_bits, k = MB.bloom_params(n_seen, 0.01)
    t0 = time.time()
    bloom = MB.bloom_build(seen, "u", m_bits, k).localCheckpoint(eager=True)
    out["bloom_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    probed = MB.bloom_probe(new, "u", bloom, m_bits, k)
    maybe = probed.where(F.col("maybe_seen")).count()
    out["bloom_probe_sec"] = round(time.time() - t0, 2)
    out["bloom_seen"] = n_seen
    out["bloom_new"] = n_new
    out["bloom_maybe_rows"] = maybe
    out["bloom_exact_join_fraction"] = round(maybe / n_new, 4)

    t0 = time.time()
    n_pre = MB.bloom_prefilter_anti_join(
        new, seen, "u", fp_rate=0.01, n_seen=n_seen
    ).count()
    out["bloom_prefilter_anti_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    n_plain = new.join(
        seen.withColumnRenamed("u", "v"), F.col("u") == F.col("v"), "left_anti"
    ).count()
    out["plain_anti_sec"] = round(time.time() - t0, 2)
    out["bloom_anti_rows"] = n_pre
    out["bloom_anti_identical"] = bool(n_pre == n_plain)
    return out


def bench_domain_cap(spark, scale):
    out = {}
    n = int(20_000_000 * scale)
    n_domains = int(1_000_000 * scale)
    # planted megahost: 50% of the corpus on one domain — the hot-key
    # shape the rank window must bound
    dom = F.when(
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(2)) == 0, F.lit(0)
    ).otherwise(F.pmod(F.xxhash64("id", F.lit(8)), F.lit(n_domains)))
    urls = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id", F.lit(9)), F.lit(100_000)).alias("score"),
        # the varying label must sit in the REGISTERED domain (last two
        # labels), not a subdomain, or every url collapses to one domain
        F.concat(F.lit("https://www.h"), dom.cast("string"), F.lit("-site.org/p/"),
                 F.col("id").cast("string")).alias("url"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    capped = C.domain_cap(urls, "url", "score", "doc_id", max_per_domain=10)
    kept = capped.count()
    out["domain_cap_sec"] = round(time.time() - t0, 2)
    worst = (
        capped.groupBy("domain").count().agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    out["domain_cap_rows_in"] = n
    out["domain_cap_rows_kept"] = kept
    out["domain_cap_max_per_domain"] = worst
    out["domain_cap_bound_held"] = bool(worst <= 10)
    out["domain_cap_rows_per_sec"] = int(n / max(out["domain_cap_sec"], 1e-9))
    return out


def bench_interval(spark, scale):
    out = {}
    npts = int(10_000_000 * scale)
    niv = int(1_000_000 * scale)
    keys = max(int(10_000 * scale), 1)
    pts = _events(spark, npts, keys, 50).select(
        F.col("eid").alias("pid"), F.col("k").alias("user"), F.col("ts").alias("t")
    ).localCheckpoint(eager=True)
    iv = (
        _events(spark, niv, keys, 60)
        .select(
            F.col("eid").alias("iid"),
            F.col("k").alias("user"),
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("e"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    nrows = TP.interval_join(
        pts, iv, "t", "s", "e", bucket_seconds=3600, keys=["user"]
    ).count()
    out["interval_sec"] = round(time.time() - t0, 2)
    out["interval_points"] = npts
    out["interval_intervals"] = niv
    out["interval_keys"] = keys
    out["interval_pairs"] = nrows
    out["interval_rows_per_sec"] = int(
        (npts + niv) / max(out["interval_sec"], 1e-9)
    )
    return out


def update_baseline(r) -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "BASELINE.md",
    )
    lines = [
        BEGIN,
        "",
        "## Corpus-curation / temporal / sketch ops at scale — round 5",
        "",
        "| op | shape | wall s | throughput | check |",
        "|---|---|---|---|---|",
        f"| asof_join (union+window) | {r['asof_big_rows']:,} left + same right, "
        f"100k keys | {r['asof_union_big_sec']} | "
        f"{r['asof_big_rows_per_sec']:,} rows/s | left-outer: rows == left |",
        f"| asof_join vs rank-form theta join | 1M+1M, 5k keys "
        f"(~40k pairs/key naive) | **{r['asof_union_small_sec']}** vs "
        f"{r['asof_naive_small_sec']} | — | "
        f"row-identical: {r['asof_identical']} |",
        f"| asof_join hot-key escape (6h buckets) | "
        f"{r['asof_hot_rows']:,}+same, 50% on ONE key | "
        f"**{r['asof_hot_skew_sec']}** vs {r['asof_hot_plain_sec']} "
        f"(single-window) | — | digest-identical: "
        f"{r['asof_hot_identical']} |",
        f"| hll_distinct (p={r['hll_p']}) vs count(DISTINCT) | "
        f"{r['hll_rows']:,} rows, 5 groups | {r['hll_sec']} vs "
        f"{r['exact_sec']} | — | max relerr {r['hll_max_relerr']} "
        f"(5σ bound {r['hll_bound_5sigma']}) |",
        f"| doc_chunks (128 tok / 16 overlap) | {r['chunks_docs']:,} docs "
        f"× 120 tok | {r['chunks_sec']} | "
        f"{r['chunks_docs_per_sec']:,} docs/s | chunk count exact: "
        f"{r['chunks_exact']} |",
        f"| tfidf_topk (k=5, 20k vocab) | {r['tfidf_docs']:,} docs "
        f"× 60 tok | {r['tfidf_sec']} | {r['tfidf_docs_per_sec']:,} docs/s "
        f"| rows == 5·docs: {r['tfidf_ok']} |",
        f"| pack_sequences (2048 budget, 256 shards) | "
        f"{r['pack_rows']:,} chunks | {r['pack_sec']} | "
        f"{r['pack_rows_per_sec']:,} rows/s | every chunk placed; fill "
        f"{r['pack_fill']:.3f} over {r['pack_bins']:,} bins |",
        f"| bloom_prefilter_anti_join (fp 1%) | {r['bloom_new']:,} new vs "
        f"{r['bloom_seen']:,} seen urls, 10% true overlap | "
        f"{r['bloom_prefilter_anti_sec']} vs {r['plain_anti_sec']} plain "
        f"anti | exact-join probe side shrunk to "
        f"{r['bloom_exact_join_fraction']:.1%} of new "
        f"({r['bloom_maybe_rows']:,} rows; build {r['bloom_build_sec']} s) "
        f"| rows == plain anti-join: {r['bloom_anti_identical']} |",
        f"| domain_cap (planted 50% megahost) | "
        f"{r['domain_cap_rows_in']:,} urls, cap 10 | {r['domain_cap_sec']} | "
        f"{r['domain_cap_rows_per_sec']:,} rows/s | max/domain = "
        f"{r['domain_cap_max_per_domain']} |",
        f"| interval_join (keyed, 1h buckets) | {r['interval_points']:,} pts × "
        f"{r['interval_intervals']:,} 45-min intervals, "
        f"{r['interval_keys']:,} entities | {r['interval_sec']} | "
        f"{r['interval_rows_per_sec']:,} input rows/s "
        f"({r['interval_pairs']:,} pairs) | bucketed == theta "
        f"(pytest, keyed + 3 widths) |",
        "",
        "- The asof union+window plan carries ONE hash shuffle and no "
        "join fan-out; the rank-form theta join pays |L|x|R| per key "
        "before pruning, which is why it only appears at the "
        "verification shape.",
        "- hll_distinct's shuffle is bounded at 2^p rows per group per "
        "map task (map-side partial agg) — at cluster scale the exact "
        "count's shuffle grows with distinct values, the sketch's "
        "does not; wall times here are single-box.",
        "- domain_cap's megahost partition is scanned once and emits "
        "10 rows — the window IS the skew mitigation.",
        "- bloom_prefilter's wall time is single-box overhead-bound "
        "(the plain anti wins locally); the cluster win is the exact "
        "join's probe side shrinking ~10x — only the maybe-seen "
        "sliver shuffles against the 100-TB seen table.",
        "",
        END,
    ]
    block = "\n".join(lines)
    with open(path) as f:
        doc = f.read()
    if BEGIN in doc:
        doc = doc[: doc.index(BEGIN)] + block + doc[doc.index(END) + len(END):]
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(doc)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    spark = get_spark("bench-corpus-temporal", master=args.master)
    r = {}
    for name, fn in (
        ("asof", bench_asof),
        ("asof_skew", bench_asof_skew),
        ("hll", bench_hll),
        ("chunks", bench_chunks),
        ("tfidf", bench_tfidf),
        ("pack", bench_pack),
        ("bloom", bench_bloom),
        ("domain_cap", bench_domain_cap),
        ("interval", bench_interval),
    ):
        r.update(fn(spark, args.scale))
        print(json.dumps({k: v for k, v in r.items()}), flush=True)

    ok = (
        r["asof_identical"]
        and r["asof_hot_identical"]
        and r["hll_within_bound"]
        and r["chunks_exact"]
        and r["tfidf_ok"]
        and r["pack_ok"]
        and r["bloom_anti_identical"]
        and r["domain_cap_bound_held"]
    )
    print(json.dumps({"ok": ok}), flush=True)
    if args.update_baseline and ok:
        update_baseline(r)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
