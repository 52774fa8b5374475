"""HyperLogLog distinct sketch (operators/sketches.py): accuracy
bounds, merge-invariance under partitioning, and the scaled-integer
exactness property."""

import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import sketches as SK


def _ids(spark, n, groups=1):
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )


def test_hll_within_error_bound(spark):
    """Relative error within 5 sigma of the 1.04/sqrt(m) bound at a
    cardinality safely above the raw estimator's small-range floor."""
    for p in (8, 10, 12):
        n = 200_000
        est = SK.hll_distinct(_ids(spark, n), ["g"], "v", p=p).collect()[0]["hll_est"]
        rel = abs(est - n) / n
        assert rel < 5 * SK.hll_error_bound(p), (p, est, rel)


def test_hll_partition_invariance(spark):
    """The sketch is a commutative fold: any physical layout yields
    the bit-identical registers and estimate."""
    df = _ids(spark, 50_000, groups=3)
    a = sorted(tuple(r) for r in SK.hll_distinct(df, ["g"], "v", p=10).collect())
    b = sorted(
        tuple(r)
        for r in SK.hll_distinct(df.repartition(17, "v"), ["g"], "v", p=10).collect()
    )
    assert a == b


def test_hll_duplicates_do_not_move_estimate(spark):
    """Cardinality, not multiplicity: unioning the corpus with itself
    leaves every register — hence the estimate — unchanged."""
    df = _ids(spark, 30_000)
    once = SK.hll_distinct(df, ["g"], "v", p=10).collect()[0]
    twice = SK.hll_distinct(df.unionAll(df), ["g"], "v", p=10).collect()[0]
    assert once["hll_est"] == twice["hll_est"]
    assert once["n_regs"] == twice["n_regs"]


def test_hll_groups_are_independent(spark):
    """Per-group estimates equal the same data sketched alone."""
    df = _ids(spark, 40_000, groups=4)
    grouped = {
        r["g"]: (r["n_regs"], r["hll_est"])
        for r in SK.hll_distinct(df, ["g"], "v", p=10).collect()
    }
    for g in range(4):
        alone = SK.hll_distinct(
            df.where(F.col("g") == g), ["g"], "v", p=10
        ).collect()[0]
        assert grouped[g] == (alone["n_regs"], alone["hll_est"])


def test_hll_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(0, "a"), (0, None), (0, "b"), (0, None)], "g LONG, v STRING"
    )
    r = SK.hll_distinct(df, ["g"], "v", p=8).collect()[0]
    assert r["n_regs"] == 2  # two distinct non-null values, two registers


def test_hll_p_validation():
    with pytest.raises(ValueError):
        SK.hll_register(F.lit("x"), p=3)
    with pytest.raises(ValueError):
        SK.hll_register(F.lit("x"), p=19)


def test_hll_registers_match_python_reference(spark):
    """Pin the register derivation against an independent pure-python
    md5 computation (same 60-bit hash contract as functions/text)."""
    import hashlib

    p = 10
    vals = [f"v{i}" for i in range(500)]
    expect = {}
    width = 60 - p
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg = h % (1 << p)
        rem = h >> p
        rho = (width + 1) if rem == 0 else width + 1 - rem.bit_length()
        expect[reg] = max(expect.get(reg, 0), rho)
    df = spark.createDataFrame([(v,) for v in vals], "v STRING")
    reg, rho = SK.hll_register("v", p=p)
    got = {}
    for r in df.select(reg.alias("reg"), rho.alias("rho")).collect():
        got[r["reg"]] = max(got.get(r["reg"], 0), r["rho"])
    assert got == expect


# ------------------------------------------------------ windowed HLL

def test_hll_window_batch_equals_per_window_sketch(spark):
    """Windowed fold == hll_distinct run on each window's slice."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(minutes=7 * i), f"g{i % 2}", f"v{i % 97}")
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, g STRING, v STRING")
    win = SK.hll_window_batch(df, ["g"], "v", "ts", 3600, p=8)
    got = {(r["g"], r["ws_s"]): (r["n_regs"], r["hll_est"]) for r in win.collect()}
    ws = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    slices = df.withColumn("ws_s", ws)
    for (g, w), (n, est) in got.items():
        alone = SK.hll_distinct(
            slices.where((F.col("g") == g) & (F.col("ws_s") == w)),
            ["g"], "v", p=8,
        ).collect()[0]
        assert (alone["n_regs"], alone["hll_est"]) == (n, est)


def test_hll_window_stream_matches_batch_twin(spark, tmp_path):
    """The streaming sketch (bounded 2^p-byte state per open window)
    must equal sketches.hll_window_batch bit-for-bit on every CLOSED
    window; only the final (never-watermarked-past) windows stay open."""
    import time

    from o2g_spark.streaming import stateful

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    batch = {
        (r["event_type"], r["ws_s"]): (r["n_regs"], r["hll_est"])
        for r in SK.hll_window_batch(
            ev, ["event_type"], "user_id", "ts", 6 * 3600, p=8
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
    out = stateful.hll_window_stream(
        stream, "event_type", "user_id", "ts", 6 * 3600, p=8,
        watermark="0 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hll_window_test")
        .outputMode("append")
        .start()
    )
    n_groups = ev.select("event_type").distinct().count()
    want = len(batch) - n_groups  # last window per group stays open
    try:
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM hll_window_test").collect()
            if len(got) >= want:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert len(got) >= want
    for r in got:
        assert batch[(r["grp"], r["ws_s"])] == (r["n_regs"], r["hll_est"])


def test_hll_window_stream_no_duplicate_emissions_on_disorder(spark, tmp_path):
    """Late rows arriving after their window closed must be DROPPED,
    not re-create the key: without the guard a replayed out-of-order
    stream emitted duplicate partial sketches (867 rows for 477
    windows). Every window appears at most once, and its registers
    are a subset of the batch twin's (the on-time portion)."""
    import time

    from pyspark.sql import functions as F

    from o2g_spark.streaming import stateful

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            F.col("event_type").alias("grp"),
            F.col("user_id").cast("string").alias("v"),
            F.col("ts").cast("timestamp").alias("ts"),
        )
    )
    src = str(tmp_path / "shuffled")
    # deliberately time-shuffled files → heavy cross-file disorder
    ev.orderBy(F.xxhash64("v", "ts")).repartition(4).write.parquet(src)
    twin = {
        (r["grp"], r["ws_s"]): r["n_regs"]
        for r in SK.hll_window_batch(ev, ["grp"], "v", "ts", 6 * 3600, p=8)
        .collect()
    }
    stream = (
        spark.readStream.schema("grp string, v string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful.hll_window_stream(
        stream, "grp", "v", "ts", 6 * 3600, p=8, watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hll_disorder_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(3)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM hll_disorder_test").collect()
    finally:
        q.stop()
    seen = set()
    for r in rows:
        k = (r["grp"], r["ws_s"])
        assert k not in seen, f"duplicate emission for window {k}"
        seen.add(k)
        assert k in twin
        assert r["n_regs"] <= twin[k]  # on-time subset of the full sketch
    assert rows  # disorder must not suppress everything
