"""Quantile sketch (operators/sketches.py quantile section): the
DDSketch-shaped base-2 integer-exact relative-error histogram.

Pins: bucket ids and counts against a pure-python reference (incl.
zero / negatives / octave boundaries / exact-small values), nearest-
rank quantiles against brute-force sort, the guaranteed 2^-(B+1)
relative-error bound, cross-engine exactness vs the DuckDB twin,
merge distributivity, partitioning invariance, and domain guards.
"""

import random
from collections import Counter

import duckdb
import pytest

from o2g_spark.operators import sketches as SK

B = 4
K = 1 << B
Q = {"p01": 0.01, "p50": 0.5, "p90": 0.9, "p99": 0.99, "q0": 0.0, "q1": 1.0}


def py_qb(x: int, b: int = B) -> int:
    if x == 0:
        return -1
    ax = abs(x)
    e = ax.bit_length() - 1
    k = 1 << b
    s = (ax - (1 << e)) >> (e - b) if e >= b else (ax - (1 << e)) << (b - e)
    pid = e * k + s
    return pid if x > 0 else -pid - 2


def py_est(qb: int, b: int = B) -> int:
    if qb == -1:
        return 0
    pid = qb if qb >= 0 else -qb - 2
    e, s = divmod(pid, 1 << b)
    if e >= b:
        lo = (1 << e) + s * (1 << (e - b))
        est = lo + ((1 << (e - b)) - 1) // 2
    else:
        est = (1 << e) + (s >> (b - e))
    return est if qb >= 0 else -est


def py_quantiles(vals: list[int], b: int = B) -> dict[str, int]:
    vs = sorted(vals)
    n = len(vs)
    out = {}
    for lbl, q in Q.items():
        ppm = round(q * 1_000_000)
        r = (n - 1) * ppm // 1_000_000 + 1
        out[lbl] = py_est(py_qb(vs[r - 1], b), b)
    return out


@pytest.fixture(scope="module")
def data(spark):
    random.seed(7)
    vals = (
        [0, 1, 2, 3, 15, 16, 17, -1, -5, 100, 10**9, 2**62, -(2**40)]
        + [random.randint(-(10**6), 10**12) for _ in range(2000)]
        + [random.randint(0, 50) for _ in range(500)]
    )
    rows = [(i, f"g{i % 3}", v) for i, v in enumerate(vals)]
    return rows, spark.createDataFrame(rows, "i long, g string, v long")


def test_buckets_match_python_reference(spark, data):
    rows, df = data
    ref: dict[str, Counter] = {}
    for _, g, v in rows:
        ref.setdefault(g, Counter())[py_qb(v)] += 1
    got: dict[str, dict] = {}
    for r in SK.qsketch_build(df, ["g"], "v").collect():
        got.setdefault(r["g"], {})[r["__qb"]] = r["__cnt"]
    assert got == {g: dict(c) for g, c in ref.items()}


def test_quantiles_match_brute_force(spark, data):
    rows, df = data
    out = {
        r["g"]: r.asDict()
        for r in SK.quantile_sketch(df, ["g"], "v", Q).collect()
    }
    for g in ("g0", "g1", "g2"):
        exp = py_quantiles([v for _, gg, v in rows if gg == g])
        assert {lbl: out[g][lbl] for lbl in Q} == exp


def test_relative_error_bound(spark, data):
    rows, df = data
    out = {
        r["g"]: r.asDict()
        for r in SK.quantile_sketch(df, ["g"], "v", Q).collect()
    }
    bound = SK.qsketch_error_bound(B)
    assert bound == 2.0 ** -(B + 1)
    for g in ("g0", "g1", "g2"):
        vs = sorted(v for _, gg, v in rows if gg == g)
        n = len(vs)
        for lbl, q in Q.items():
            r = (n - 1) * round(q * 1e6) // 1_000_000 + 1
            true = vs[r - 1]
            assert abs(out[g][lbl] - true) <= abs(true) * bound + 0.5


def test_duckdb_twin_exact(spark, data):
    rows, df = data
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = SK.quantile_sketch_sql("t", ["g"], "v", Q)
    duck = {
        r[0]: dict(zip(["g", *Q], r)) for r in con.execute(sql).fetchall()
    }
    spk = {
        r["g"]: r.asDict()
        for r in SK.quantile_sketch(df, ["g"], "v", Q).collect()
    }
    assert spk.keys() == duck.keys()
    for g in spk:
        for lbl in Q:
            assert spk[g][lbl] == duck[g][lbl], (g, lbl)


def test_merge_distributivity(spark, data):
    rows, df = data
    full = {
        r["g"]: r.asDict()
        for r in SK.quantile_sketch(df, ["g"], "v", Q).collect()
    }
    merged = SK.qsketch_merge(
        ["g"],
        SK.qsketch_build(df.where("i % 3 != 2"), ["g"], "v"),
        SK.qsketch_build(df.where("i % 3 = 2"), ["g"], "v"),
    )
    got = {
        r["g"]: r.asDict()
        for r in SK.qsketch_quantiles(merged, ["g"], Q).collect()
    }
    assert got == full


def test_partitioning_invariance(spark, data):
    rows, df = data
    a = SK.quantile_sketch(df, ["g"], "v", Q).collect()
    b = SK.quantile_sketch(df.repartition(13), ["g"], "v", Q).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_small_values_exact(spark):
    # below 2^B every integer has its own bucket: quantiles are EXACT
    vals = list(range(0, 16)) * 3
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    )
    sk = SK.qsketch_build(df, [], "v")
    out = SK.qsketch_quantiles(sk, [], {"q1": 1.0, "q0": 0.0, "p50": 0.5})
    row = out.collect()[0]
    assert (row["q0"], row["p50"], row["q1"]) == (0, 7, 15)


def test_sub_bits_trades_error(spark):
    # higher sub_bits → tighter buckets → closer estimates
    vals = [10**6 + 137 * i for i in range(1000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    )
    true = sorted(vals)[(len(vals) - 1) // 2]
    errs = {}
    for b in (2, 6, 10):
        est = SK.quantile_sketch(df, [], "v", {"p50": 0.5}, sub_bits=b)
        errs[b] = abs(est.collect()[0]["p50"] - true)
        assert errs[b] <= true * SK.qsketch_error_bound(b) + 0.5
    assert errs[10] <= errs[6] <= errs[2]


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "i long, v long"
    )
    row = SK.quantile_sketch(df, [], "v", {"q0": 0.0, "q1": 1.0}).collect()[0]
    assert (row["q0"], row["q1"]) == (5, 7)


def test_long_min_raises(spark):
    df = spark.createDataFrame([(1, -(1 << 63))], "i long, v long")
    with pytest.raises(Exception, match="out of domain"):
        SK.qsketch_build(df, [], "v").collect()


def test_non_integral_rejected(spark):
    df = spark.createDataFrame([(1, 1.5)], "i long, v double")
    with pytest.raises(TypeError, match="integral"):
        SK.qsketch_build(df, [], "v")


def test_bad_quantile_rejected(spark, data):
    _, df = data
    with pytest.raises(ValueError, match="outside"):
        SK.quantile_sketch(df, ["g"], "v", {"bad": 1.5})
    with pytest.raises(ValueError, match="at least one"):
        SK.quantile_sketch(df, ["g"], "v", {})
    with pytest.raises(ValueError, match="sub_bits"):
        SK.qsketch_build(df, ["g"], "v", sub_bits=0)
