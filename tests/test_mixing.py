"""Training-data mixing (operators/corpus.py mixing section): the
weighted domain-rebalance copy plan.

Pins: budget arithmetic against a pure-python reference (upsampling,
downsampling, zero budgets), the exact-fill invariant of the window
strategy, rate-strategy expectation behavior, cross-engine exactness
for BOTH strategies, determinism under repartitioning, expand/report
accounting, and domain guards.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from o2g_spark.functions import text as X
from o2g_spark.operators import corpus as C

W = {"a": 4.0, "b": 2.0, "c": 1.0, "d": 1.0}
PPM = 1_000_000


def _hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_plan(rows, weights, total, seed="mix", strategy="window"):
    tot_w = sum(weights.values())
    ppms = {d: round(w / tot_w * PPM) for d, w in weights.items()}
    by_dom: dict[str, list] = {}
    for rid, dom, tok in rows:
        if dom in weights and tok and tok > 0:
            by_dom.setdefault(dom, []).append((rid, tok))
    out = []
    for dom, docs in by_dom.items():
        budget = total * ppms[dom] // PPM
        avail = sum(t for _, t in docs)
        full, rem = budget // avail, budget % avail
        docs = sorted(docs, key=lambda p: (_hash60(f"{seed}:{dom}:{p[0]}"), p[0]))
        cum = 0
        rate = rem * PPM // avail
        for rid, tok in docs:
            cum += tok
            if strategy == "window":
                extra = 1 if cum <= rem else 0
            else:
                extra = 1 if _hash60(f"{seed}:{dom}:{rid}") % PPM < rate else 0
            n = full + extra
            if n >= 1:
                out.append((rid, dom, tok, n))
    return sorted(out)


@pytest.fixture(scope="module")
def data(spark):
    rows = []
    rid = 0
    for dom, count, base in (("a", 30, 90), ("b", 25, 110), ("c", 40, 70),
                             ("d", 10, 200), ("skip", 20, 100)):
        for i in range(count):
            rows.append((rid, dom, base + (rid * 37) % 120))
            rid += 1
    rows.append((rid, "a", None))  # null tokens excluded
    rows.append((rid + 1, "b", 0))  # non-positive excluded
    df = spark.createDataFrame(rows, "id long, dom string, tok long")
    return rows, df


TOTAL = 30_000  # "a" budget 15k > avail (~4.3k) → upsampling


def test_plan_matches_python_reference_all_strategies(spark, data):
    rows, df = data
    for strat in ("window", "bucket", "rate"):
        got = sorted(
            map(tuple, C.mix_plan(df, "dom", "tok", "id", W, TOTAL,
                                  strategy=strat).collect())
        )
        ref = "window" if strat == "bucket" else strat
        assert got == py_plan(rows, W, TOTAL, strategy=ref), strat


def test_bucket_identical_to_window_under_skew(spark):
    # one domain holding ~90% of docs — the shape the bucket strategy
    # exists for; output must be bit-identical to the single window
    rows = [(i, "mega" if i % 10 else "small", 50 + (i * 13) % 400)
            for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, dom string, tok long")
    w = {"mega": 0.3, "small": 0.7}
    total = 2_000_000
    a = sorted(map(tuple, C.mix_plan(df, "dom", "tok", "id", w, total,
                                     strategy="window").collect()))
    b = sorted(map(tuple, C.mix_plan(df, "dom", "tok", "id", w, total,
                                     strategy="bucket").collect()))
    assert a == b
    assert len(a) > 0


def test_window_never_exceeds_budget(spark, data):
    rows, df = data
    plan = C.mix_plan(df, "dom", "tok", "id", W, TOTAL)
    rep = {r["domain"]: r.asDict() for r in C.mix_report(plan, W, TOTAL).collect()}
    max_tok = max(t for _, d, t in rows if d in W and t)
    for d, r in rep.items():
        assert r["tokens_emitted"] <= r["budget"]
        # undershoot < one document (the exact-fill contract)
        assert r["budget"] - r["tokens_emitted"] < max_tok


def test_upsampling_epochs(spark, data):
    rows, df = data
    plan = C.mix_plan(df, "dom", "tok", "id", W, TOTAL)
    a = {r["id"]: r["n_copies"] for r in plan.where("domain = 'a'").collect()}
    avail = sum(t for _, d, t in rows if d == "a" and t)
    budget = TOTAL * round(4.0 / 8.0 * PPM) // PPM
    full = budget // avail
    assert full >= 2
    assert set(a.values()) <= {full, full + 1}
    assert len(a) == 30  # every doc kept when upsampling


def test_rate_hits_budget_in_expectation(spark):
    # one big domain, many small docs: the rate strategy's emitted
    # token count concentrates around the budget
    rows = [(i, "a", 100) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, dom string, tok long")
    plan = C.mix_plan(df, "dom", "tok", "id", {"a": 1.0}, 250_000,
                      strategy="rate")
    emitted = plan.agg(F.sum(F.col("tokens") * F.col("n_copies"))).collect()[0][0]
    assert abs(emitted - 250_000) < 0.05 * 250_000


def test_duckdb_twin_both_strategies(spark, data):
    rows, df = data
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, dom VARCHAR, tok BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    for strat in ("window", "bucket", "rate"):
        spk = sorted(map(tuple, C.mix_plan(df, "dom", "tok", "id", W, TOTAL,
                                           strategy=strat).collect()))
        duck = sorted(map(tuple, con.execute(
            C.mix_plan_sql("t", "dom", "tok", "id", W, TOTAL,
                           strategy=strat)
        ).fetchall()))
        assert spk == duck, strat


def test_partitioning_invariance(spark, data):
    _, df = data
    a = sorted(map(tuple, C.mix_plan(df, "dom", "tok", "id", W, TOTAL).collect()))
    b = sorted(map(tuple, C.mix_plan(df.repartition(17), "dom", "tok",
                                     "id", W, TOTAL).collect()))
    assert a == b


def test_unweighted_domain_dropped(spark, data):
    _, df = data
    plan = C.mix_plan(df, "dom", "tok", "id", W, TOTAL)
    assert plan.where("domain = 'skip'").count() == 0


def test_zero_budget_domain_empty(spark, data):
    _, df = data
    w = dict(W, c=0.0)
    plan = C.mix_plan(df, "dom", "tok", "id", w, TOTAL)
    assert plan.where("domain = 'c'").count() == 0


def test_expand_matches_copies(spark, data):
    _, df = data
    plan = C.mix_plan(df, "dom", "tok", "id", W, TOTAL)
    n_exp = C.mix_expand(plan).count()
    n_cop = plan.agg(F.sum("n_copies")).collect()[0][0]
    assert n_exp == n_cop
    # copy_idx tiles 0..n-1 per doc
    bad = (
        C.mix_expand(plan)
        .groupBy("id")
        .agg(F.count("*").alias("n"), F.max("copy_idx").alias("mx"),
             F.min("copy_idx").alias("mn"))
        .where((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
        .count()
    )
    assert bad == 0


def test_missing_weighted_domain_ok(spark, data):
    _, df = data
    w = dict(W, nosuch=5.0)
    plan = C.mix_plan(df, "dom", "tok", "id", w, TOTAL)
    assert plan.where("domain = 'nosuch'").count() == 0
    # rate strategy exercises the collect path
    plan_r = C.mix_plan(df, "dom", "tok", "id", w, TOTAL, strategy="rate")
    assert plan_r.where("domain = 'nosuch'").count() == 0


def test_guards(spark, data):
    _, df = data
    with pytest.raises(ValueError, match="at least one"):
        C.mix_plan(df, "dom", "tok", "id", {}, TOTAL)
    with pytest.raises(ValueError, match="non-negative"):
        C.mix_plan(df, "dom", "tok", "id", {"a": -1.0}, TOTAL)
    with pytest.raises(ValueError, match="total_tokens"):
        C.mix_plan(df, "dom", "tok", "id", W, -5)
    with pytest.raises(ValueError, match="strategy"):
        C.mix_plan(df, "dom", "tok", "id", W, TOTAL, strategy="nope")
    dd = df.withColumn("tok", F.col("tok").cast("double"))
    with pytest.raises(TypeError, match="integral"):
        C.mix_plan(dd, "dom", "tok", "id", W, TOTAL)


def test_hash_is_shared_hash60(spark, data):
    # the ordering hash is the repo-wide md5_hash60 (the no-leakage
    # audit property: membership is re-derivable row-wise downstream)
    _, df = data
    one = df.where("id = 3").select(
        C._mix_hash(F.col("dom"), F.col("id"), "mix").alias("h"),
        X.md5_hash60(F.concat_ws(":", F.lit("mix"), "dom",
                                 F.col("id").cast("string"))).alias("h2"),
    ).collect()[0]
    assert one["h"] == one["h2"]
