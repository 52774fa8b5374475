"""Custom stateful streaming op (B16): cell visits — batch twin vs
brute force, and the applyInPandasWithState path vs the batch twin."""

import datetime as dt

import pandas as pd

from o2g_spark.streaming import stateful

BASE = dt.datetime(2024, 5, 1, 8, 0, 0)


def _events():
    rows = []
    eid = 0
    # user 1: cells 5,5,7,7,7,5 → visits (5×2)(7×3)(5×1)
    for i, cell in enumerate([5, 5, 7, 7, 7, 5]):
        rows.append((1, eid, BASE + dt.timedelta(minutes=10 * i), cell))
        eid += 1
    # user 2: single-cell run
    for i in range(4):
        rows.append((2, eid, BASE + dt.timedelta(minutes=7 * i), 9))
        eid += 1
    # user 3: alternating cells → all visits length 1
    for i, cell in enumerate([1, 2, 1, 2]):
        rows.append((3, eid, BASE + dt.timedelta(minutes=5 * i), cell))
        eid += 1
    return pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "cell"])


def _brute_visits(pdf):
    out = []
    for uid, g in pdf.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        cur = None
        for r in g.itertuples():
            if cur is None or r.cell != cur[1]:
                if cur is not None:
                    out.append(cur)
                cur = [uid, r.cell, r.ts, r.ts, 1]
            else:
                cur[3], cur[4] = r.ts, cur[4] + 1
        out.append(cur)
    return sorted(map(tuple, out))


def test_cell_visits_batch_matches_bruteforce(spark):
    pdf = _events()
    got = sorted(
        (r.user_id, r.cell, r.enter_ts, r.exit_ts, r.n_events)
        for r in stateful.cell_visits_batch(spark.createDataFrame(pdf)).collect()
    )
    assert got == _brute_visits(pdf)


def test_cell_visits_batch_partition_invariant(spark):
    pdf = _events()
    a = sorted(
        map(tuple, stateful.cell_visits_batch(spark.createDataFrame(pdf)).collect())
    )
    b = sorted(
        map(
            tuple,
            stateful.cell_visits_batch(
                spark.createDataFrame(pdf).repartition(7)
            ).collect(),
        )
    )
    assert a == b


def test_cell_visits_stateful_stream(spark, tmp_path):
    """applyInPandasWithState emits exactly the CLOSED visits: the batch
    twin's output minus each user's final (still-open) visit."""
    pdf = _events()
    src = str(tmp_path / "events_src")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, cell long")
        .parquet(src)
    )
    batch = _brute_visits(pdf)
    open_visits = {}  # the LATEST visit per user stays open (no timeout)
    for v in batch:
        if v[0] not in open_visits or v[2] > open_visits[v[0]][2]:
            open_visits[v[0]] = v
    expected = sorted(v for v in batch if v != open_visits[v[0]])

    visits = stateful.cell_visits_stateful(stream, timeout_ms=3_600_000)
    q = (
        visits.writeStream.format("memory")
        .queryName("visits_test")
        .outputMode("append")
        .start()
    )
    try:
        # ProcessingTimeTimeout keeps scheduling state-cleanup
        # micro-batches, so processAllAvailable() never returns — poll
        # the sink for the expected rows instead (bounded deadline)
        import time

        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = sorted(
                (r.user_id, r.cell, r.enter_ts, r.exit_ts, r.n_events)
                for r in spark.sql("SELECT * FROM visits_test").collect()
            )
            if len(got) >= len(expected):
                break
            time.sleep(2)
    finally:
        q.stop()
    assert got == expected


def test_cell_visits_stateful_rejects_batch_df(spark):
    import pytest

    with pytest.raises(ValueError):
        stateful.cell_visits_stateful(spark.createDataFrame(_events()))


# ------------------------------- streaming near-dup candidates (r3)


def _docs():
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    texts = {
        "a1": "the quick brown fox jumps over the lazy dog again and again today",
        "a2": "the quick brown fox jumps over the lazy dog again and again tonight",
        "b1": "completely different subject matter about spark structured streaming state",
        "b2": "completely different subject matter about spark structured streaming state",
        "c1": "unrelated third document with entirely original words nobody else uses",
    }
    return pd.DataFrame(
        [(k, v, base + dt.timedelta(minutes=i)) for i, (k, v) in
         enumerate(sorted(texts.items()))],
        columns=["doc_id", "text", "ts"],
    )


def test_near_dup_candidates_batch_shape(spark):
    pdf = _docs()
    got = {
        (r.id_a, r.id_b)
        for r in stateful.near_dup_candidates_batch(
            spark.createDataFrame(pdf), ts_col="ts"
        ).collect()
    }
    # exact dup pair always collides in every band; near-dup pair in
    # most; the unrelated doc never pairs
    assert ("b1", "b2") in got
    assert ("a1", "a2") in got
    assert all("c1" not in p for p in got)
    # canonical is the earlier arrival: pairs are (first, later)
    assert all(a < b for a, b in got)


def test_near_dup_candidates_batch_partition_invariant(spark):
    pdf = _docs()
    a = sorted(map(tuple, stateful.near_dup_candidates_batch(
        spark.createDataFrame(pdf), ts_col="ts").collect()))
    b = sorted(map(tuple, stateful.near_dup_candidates_batch(
        spark.createDataFrame(pdf).repartition(7), ts_col="ts").collect()))
    assert a == b


def test_near_dup_candidates_stream_matches_batch(spark, tmp_path):
    """Every candidate the batch twin finds is emitted by the stateful
    stream (single source file → one micro-batch → identical
    canonical choice), and nothing extra."""
    pdf = _docs()
    src = str(tmp_path / "docs_src")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .parquet(src)
    )
    expected = sorted(
        map(tuple, stateful.near_dup_candidates_batch(
            spark.createDataFrame(pdf), ts_col="ts").collect())
    )
    out = stateful.near_dup_candidates_stream(stream, timeout_ms=3_600_000)
    q = (
        out.writeStream.format("memory")
        .queryName("near_dup_test")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            got = sorted(
                (r.id_a, r.id_b, r.band)
                for r in spark.sql("SELECT * FROM near_dup_test").collect()
            )
            if len(got) >= len(expected):
                break
            time.sleep(2)
    finally:
        q.stop()
    assert got == expected


def test_near_dup_candidates_stream_rejects_batch_df(spark):
    import pytest

    with pytest.raises(ValueError):
        stateful.near_dup_candidates_stream(spark.createDataFrame(_docs()))
