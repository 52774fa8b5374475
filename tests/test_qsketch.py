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


def test_qb_of_matches_jvm_buckets(spark, data):
    """The shipped pure-python twin (SK.qb_of) equals the JVM
    _q_bucket_cols expressions on real data — closes the loop the
    property tests run on (they fuzz qb_of/qb_value against each
    other; this pins qb_of to the production path)."""
    rows, df = data
    from collections import Counter as C

    jvm = C()
    for r in SK.qsketch_build(df, [], "v").collect():
        jvm[r["__qb"]] += r["__cnt"]
    py = C(SK.qb_of(v) for _, _, v in rows)
    assert jvm == py


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


# ------------------------------------------------- streaming windows

def test_quantile_window_batch_equals_per_window_sketch(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(minutes=9 * i), f"g{i % 2}", 10 + (i * 37) % 9000)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, g STRING, v LONG")
    qs = {"p50": 0.5, "p95": 0.95}
    win = SK.qsketch_window_batch(df, ["g"], "v", "ts", 3600, qs)
    got = {(r["g"], r["ws_s"]): (r["p50"], r["p95"]) for r in win.collect()}
    assert got
    ws = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    slices = df.withColumn("ws_s", ws)
    for (g, w), vals in got.items():
        alone = SK.quantile_sketch(
            slices.where((F.col("g") == g) & (F.col("ws_s") == w)),
            [], "v", qs,
        ).collect()[0]
        assert (alone["p50"], alone["p95"]) == vals


def test_quantile_window_stream_matches_batch_twin(spark, tmp_path):
    """The streaming sketch (bounded bucket-histogram state per open
    window) must equal sketches.qsketch_window_batch bit-for-bit on
    every CLOSED window."""
    import time

    from o2g_spark.streaming import stateful

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    batch = {
        (r["event_type"], r["ws_s"]): (r["p50"], r["p90"], r["p99"])
        for r in SK.qsketch_window_batch(
            ev, ["event_type"], "user_id", "ts", 6 * 3600, qs
        ).collect()
    }
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful.quantile_window_stream(
        stream, "event_type", "user_id", "ts", 6 * 3600, qs,
        watermark="0 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("qsk_window_test")
        .outputMode("append")
        .start()
    )
    n_groups = ev.select("event_type").distinct().count()
    want = len(batch) - n_groups  # last window per group stays open
    try:
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM qsk_window_test").collect()
            if len(got) >= want:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert len(got) >= want
    for r in got:
        assert batch[(r["grp"], r["ws_s"])] == (r["p50"], r["p90"], r["p99"])
        assert r["n"] > 0


def test_quantile_window_stream_drops_late_rows(spark, tmp_path):
    """Rows arriving after their window closed must be dropped, not
    re-create the key — every window emits at most once."""
    import time

    from pyspark.sql import functions as F

    from o2g_spark.streaming import stateful

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_type", "user_id", "ts")
    )
    src = str(tmp_path / "shuffled")
    ev.orderBy(F.xxhash64("user_id", "ts")).repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("event_type string, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful.quantile_window_stream(
        stream, "event_type", "user_id", "ts", 6 * 3600,
        {"p50": 0.5}, watermark="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("qsk_disorder_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(3)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM qsk_disorder_test").collect()
    finally:
        q.stop()
    seen = set()
    twin = {
        (r["event_type"], r["ws_s"]): r["n"]
        for r in SK.qsketch_window_batch(
            ev, ["event_type"], "user_id", "ts", 6 * 3600, {"p50": 0.5}
        ).withColumnRenamed("p50", "drop")
        .join(
            SK.qsketch_build(
                ev.withColumn(
                    "ws_s",
                    (F.floor(F.unix_timestamp("ts") / (6 * 3600)) * 6 * 3600)
                    .cast("long"),
                ),
                ["event_type", "ws_s"], "user_id",
            ).groupBy("event_type", "ws_s").agg(F.sum("__cnt").alias("n")),
            ["event_type", "ws_s"],
        ).collect()
    }
    for r in rows:
        k = (r["grp"], r["ws_s"])
        assert k not in seen, f"duplicate emission for window {k}"
        seen.add(k)
        assert k in twin
        assert r["n"] <= twin[k]  # on-time subset
    assert rows


def test_quantile_window_stream_unsorted_labels(spark, tmp_path):
    """Labels given out of q order still map to the right quantiles
    (the close path walks one sorted cumsum)."""
    import time

    from o2g_spark.streaming import stateful

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev2")
    ev.write.parquet(src)
    qs = {"hi": 0.95, "lo": 0.05, "mid": 0.5}
    batch = {
        (r["event_type"], r["ws_s"]): (r["lo"], r["mid"], r["hi"])
        for r in SK.qsketch_window_batch(
            ev, ["event_type"], "user_id", "ts", 6 * 3600, qs
        ).collect()
    }
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(src)
    )
    out = stateful.quantile_window_stream(
        stream, "event_type", "user_id", "ts", 6 * 3600, qs,
        watermark="0 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("qsk_label_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM qsk_label_test").collect()
    finally:
        q.stop()
    assert rows
    for r in rows:
        assert batch[(r["grp"], r["ws_s"])] == (r["lo"], r["mid"], r["hi"])
