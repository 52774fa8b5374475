"""Windowed aggregations: batch over events + true Structured Streaming."""

import time

import duckdb
import pytest
from pyspark.sql import functions as F

from o2g_spark import streaming as st


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_tumbling_agg_matches_duckdb(events, sf_dir):
    got = sorted(
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in st.tumbling_agg(events, "1 hour").collect()
    )
    con = duckdb.connect()
    exp = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
                   count(*) AS n, round(sum(value), 4) AS sv
            FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
            """
        ).fetchall()
    )
    con.close()
    assert got == exp


def test_sliding_counts_total(events):
    out = st.sliding_counts(events, "1 hour", "30 minutes").collect()
    # every event is in exactly 2 sliding windows
    assert sum(r.n_events for r in out) == 2 * events.count()


def test_sessionize(events):
    out = st.sessionize(events, "30 minutes")
    rows = out.collect()
    assert all(r.session_end > r.session_start for r in rows)
    # sessions partition all events
    assert sum(r.n_events for r in rows) == events.count()


def test_stream_tumbling_counts_rate_source(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 50).load()
    )
    out = st.stream_tumbling_counts(stream, "1 second", "2 seconds")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM win_counts").first().c
            if n >= 2:
                break
            time.sleep(1)
        assert n >= 2, "no watermarked windows emitted"
        rows = spark.sql("SELECT * FROM win_counts").collect()
        assert all(r.n_events > 0 for r in rows)
    finally:
        q.stop()


def test_stream_guard(events):
    with pytest.raises(ValueError):
        st.stream_tumbling_counts(events)


def test_running_counts_stateful(spark):
    """applyInPandasWithState: per-key running counts over a stream."""
    from o2g_spark.streaming import stateful

    stream = spark.readStream.format("rate").option("rowsPerSecond", 100).load()
    keyed = stream.selectExpr(
        "CAST(value % 3 AS STRING) AS event_type", "CAST(value AS DOUBLE) AS value"
    )
    out = stateful.running_counts(keyed)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_counts")
        .start()
    )
    try:
        deadline = time.time() + 90
        ok = False
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT key, max(n_events) n FROM running_counts GROUP BY key"
            ).collect()
            if len(rows) == 3 and all(r.n >= 10 for r in rows):
                ok = True
                break
            time.sleep(1)
        assert ok, rows
        # counts are monotone per key across micro-batches
        hist = spark.sql("SELECT key, n_events FROM running_counts").collect()
        by_key = {}
        for r in hist:
            by_key.setdefault(r.key, []).append(r.n_events)
        for counts in by_key.values():
            assert counts == sorted(counts)
    finally:
        q.stop()


def test_dedup_stream_guard_and_batch_error(events):
    from o2g_spark.streaming import stateful

    with pytest.raises(ValueError):
        stateful.dedup_stream(events)
    with pytest.raises(ValueError):
        stateful.running_counts(events)
