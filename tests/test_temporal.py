"""As-of join + bucketed interval join (operators/temporal.py) —
brute-force oracles and the scale-guard behavior."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

EV = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EV)


def _brute_asof(left_rows, right_rows, inclusive=True):
    """Reference: latest right (ts, tie) ≤/< left ts per key."""
    out = {}
    for lid, k, lts in left_rows:
        best = None
        for rid, rk, rts, rv in right_rows:
            if rk != k:
                continue
            ok = rts <= lts if inclusive else rts < lts
            if ok and (best is None or (rts, rid) > (best[2], best[0])):
                best = (rid, rk, rts, rv)
        out[lid] = (best[0], best[3]) if best else (None, None)
    return out


@pytest.mark.parametrize("inclusive", [True, False])
def test_asof_matches_bruteforce(spark, events, inclusive):
    from o2g_spark.operators import temporal as TP

    clicks = events.where("event_type = 'click'").select(
        "event_id", "user_id", "ts"
    )
    views = events.where("event_type = 'view'").select(
        F.col("event_id").alias("v_id"), "user_id", "ts", "value"
    )
    got = {
        r["event_id"]: (r["r_v_id"], r["r_value"])
        for r in TP.asof_join(
            clicks, views, "user_id", "ts", "ts", ["v_id", "value"],
            tie_col="v_id", inclusive=inclusive,
        ).collect()
    }
    exp = _brute_asof(
        [(r["event_id"], r["user_id"], r["ts"]) for r in clicks.collect()],
        [(r["v_id"], r["user_id"], r["ts"], r["value"]) for r in views.collect()],
        inclusive=inclusive,
    )
    assert got == exp
    assert len(got) == clicks.count()  # left-outer semantics: every left row


def test_asof_equal_ts_tie_and_inclusivity(spark):
    from o2g_spark.operators import temporal as TP

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, 7, t0)], "lid LONG, k LONG, ts TIMESTAMP")
    right = spark.createDataFrame(
        [(10, 7, t0, "a"), (11, 7, t0, "b"), (5, 7, t0 - dt.timedelta(hours=1), "c")],
        "rid LONG, k LONG, ts TIMESTAMP, v STRING",
    )
    inc = TP.asof_join(left, right, "k", "ts", "ts", ["rid", "v"], tie_col="rid")
    r = inc.collect()[0]
    assert (r["r_rid"], r["r_v"]) == (11, "b")  # equal ts visible, max tie wins
    exc = TP.asof_join(
        left, right, "k", "ts", "ts", ["rid", "v"], tie_col="rid", inclusive=False
    ).collect()[0]
    assert (exc["r_rid"], exc["r_v"]) == (5, "c")  # equal ts excluded


@pytest.mark.parametrize("bucket", [60, 3600, 86400])
@pytest.mark.parametrize("inclusive", [True, False])
def test_asof_skew_plan_row_identical(spark, events, bucket, inclusive):
    """time_bucket_seconds engages the (key, bucket) split + carry —
    output must be row-identical to the default single-window plan."""
    from o2g_spark.operators import temporal as TP

    clicks = events.where("event_type = 'click'").select(
        "event_id", "user_id", "ts"
    )
    views = events.where("event_type = 'view'").select(
        F.col("event_id").alias("v_id"), "user_id", "ts", "value"
    )
    base = sorted(
        tuple(r)
        for r in TP.asof_join(
            clicks, views, "user_id", "ts", "ts", ["v_id", "value"],
            tie_col="v_id", inclusive=inclusive,
        ).collect()
    )
    skew = sorted(
        tuple(r)
        for r in TP.asof_join(
            clicks, views, "user_id", "ts", "ts", ["v_id", "value"],
            tie_col="v_id", inclusive=inclusive,
            time_bucket_seconds=bucket,
        ).collect()
    )
    assert base == skew


def test_asof_null_payload_row_is_atomic(spark):
    """A right row whose payload VALUE is null must still win as a
    whole row — per-column carries would mix it with older rows."""
    import datetime as dt

    from o2g_spark.operators import temporal as TP

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 7, t0 + dt.timedelta(hours=3))], "lid LONG, k LONG, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(10, 7, t0, 5.0), (11, 7, t0 + dt.timedelta(hours=1), None)],
        "rid LONG, k LONG, ts TIMESTAMP, v DOUBLE",
    )
    for tbs in (None, 1800):
        r = TP.asof_join(
            left, right, "k", "ts", "ts", ["rid", "v"],
            tie_col="rid", time_bucket_seconds=tbs,
        ).collect()[0]
        assert (r["r_rid"], r["r_v"]) == (11, None), tbs


def test_asof_no_prior_row_is_null(spark):
    from o2g_spark.operators import temporal as TP

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, 7, t0)], "lid LONG, k LONG, ts TIMESTAMP")
    right = spark.createDataFrame(
        [(9, 7, t0 + dt.timedelta(days=1), 1.5)],
        "rid LONG, k LONG, ts TIMESTAMP, v DOUBLE",
    )
    r = TP.asof_join(left, right, "k", "ts", "ts", ["rid", "v"], tie_col="rid")
    row = r.collect()[0]
    assert row["r_rid"] is None and row["r_v"] is None


def test_asof_column_collision_raises(spark):
    from o2g_spark.operators import temporal as TP

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, 7, t0, 0)], "lid LONG, k LONG, ts TIMESTAMP, r_x INT")
    right = spark.createDataFrame([(2, 7, t0, 0)], "rid LONG, k LONG, ts TIMESTAMP, x INT")
    with pytest.raises(ValueError):
        TP.asof_join(left, right, "k", "ts", "ts", ["x"], tie_col="rid")


@pytest.mark.parametrize("bucket_seconds", [60, 3600, 86400])
def test_interval_join_matches_theta_join(spark, events, bucket_seconds):
    """Bucketed plan == plain range predicate for every bucket width
    (bucketing is a superset filter; the refine makes it exact)."""
    from o2g_spark.operators import temporal as TP

    iv = events.where("event_type = 'signup'").select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("e"),
    )
    pts = events.where("event_type = 'click'").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("t")
    )
    got = sorted(
        (r["iid"], r["p_pid"])
        for r in TP.interval_join(
            pts, iv, "t", "s", "e", bucket_seconds=bucket_seconds
        ).select("iid", "p_pid").collect()
    )
    exp = sorted(
        (r["iid"], r["pid"])
        for r in iv.join(
            pts, (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e"))
        ).select("iid", "pid").collect()
    )
    assert got == exp and len(got) > 0


def test_interval_join_keyed_matches_theta(spark, events):
    """keys=[user_id]: a point only meets its own entity's intervals."""
    from o2g_spark.operators import temporal as TP

    iv = events.where("event_type = 'signup'").select(
        F.col("event_id").alias("iid"), "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
    )
    pts = events.where("event_type = 'click'").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("t")
    )
    got = sorted(
        (r["iid"], r["p_pid"])
        for r in TP.interval_join(
            pts, iv, "t", "s", "e", bucket_seconds=1800, keys=["user_id"]
        ).select("iid", "p_pid").collect()
    )
    exp = sorted(
        (r["iid"], r["pid"])
        for r in iv.alias("i").join(
            pts.alias("p"),
            (F.col("i.user_id") == F.col("p.user_id"))
            & (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")),
        ).select("iid", "pid").collect()
    )
    assert got == exp and len(got) > 0
    with pytest.raises(ValueError, match="join key"):
        TP.interval_join(pts, iv.drop("user_id"), "t", "s", "e", keys=["user_id"])


def test_interval_join_end_exclusive(spark):
    from o2g_spark.operators import temporal as TP

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    iv = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(hours=1))], "iid LONG, s TIMESTAMP, e TIMESTAMP"
    )
    pts = spark.createDataFrame(
        [(10, t0 + dt.timedelta(hours=1)), (11, t0)], "pid LONG, t TIMESTAMP"
    )
    inc = TP.interval_join(pts, iv, "t", "s", "e", bucket_seconds=600)
    assert {r["p_pid"] for r in inc.collect()} == {10, 11}
    exc = TP.interval_join(
        pts, iv, "t", "s", "e", bucket_seconds=600, inclusive_end=False
    )
    assert {r["p_pid"] for r in exc.collect()} == {11}


def test_interval_join_fanout_guard_raises(spark):
    """A degenerate interval spanning more buckets than the budget
    must fail loudly at runtime, not silently explode the plan."""
    from o2g_spark.operators import temporal as TP

    t0 = dt.datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(days=30))], "iid LONG, s TIMESTAMP, e TIMESTAMP"
    )
    pts = spark.createDataFrame([(10, t0)], "pid LONG, t TIMESTAMP")
    bad = TP.interval_join(
        pts, iv, "t", "s", "e", bucket_seconds=60, max_buckets_per_interval=100
    )
    with pytest.raises(Exception, match="interval_join"):
        bad.collect()
