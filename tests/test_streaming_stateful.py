"""Custom stateful streaming op (B16): cell visits — batch twin vs
brute force, and the applyInPandasWithState path vs the batch twin."""

import datetime as dt

import pandas as pd
import pytest

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


# ------------------------- event-time replay determinism (r4)


def _write_replay_files(path, frames):
    """One parquet file per micro-batch with strictly increasing
    mtimes, so the file source replays them in a fixed order under
    maxFilesPerTrigger=1."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for i, pdf in enumerate(frames):
        f = os.path.join(path, f"batch_{i}.parquet")
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        # Spark-friendly microsecond timestamps (pandas default is ns)
        schema = pa.schema(
            [
                pa.field(fld.name, pa.timestamp("us"))
                if pa.types.is_timestamp(fld.type)
                else fld
                for fld in tbl.schema
            ]
        )
        pq.write_table(tbl.cast(schema), f)
        os.utime(f, times=(1_000_000 + i * 1000, 1_000_000 + i * 1000))


def _drain_stream(spark, out, name, n_expected, timeout_s=120,
                  process_all=True):
    """Start out → memory sink, poll until n_expected rows (event-time
    timeouts fire in watermark-advancing no-data batches, so
    processAllAvailable alone can return before evictions land).
    process_all=False skips the initial processAllAvailable for
    PROCESSING-time queries, whose perpetual cleanup batches make it
    never return."""
    import time

    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        if process_all:
            q.processAllAvailable()
        deadline = time.time() + timeout_s
        rows = []
        while time.time() < deadline:
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            if len(rows) >= n_expected:
                break
            time.sleep(1)
    finally:
        q.stop()
    return rows


def test_cell_visits_event_time_replay_deterministic(spark, tmp_path):
    """Replaying historical events evicts idle visits at DATA-time
    points: the watermark passing last_event + timeout closes them —
    identically on every replay, regardless of wall-clock speed (a
    10-minute idle timeout fires in a seconds-long test run). Under
    processing-time timeouts the same replay would emit NO timed-out
    visit (the wall clock never advances 10 minutes here)."""
    t0 = dt.datetime(2024, 5, 1, 8, 0, 0)
    early = pd.DataFrame(
        [
            (1, 0, t0, 5),
            (1, 1, t0 + dt.timedelta(minutes=10), 5),
            (1, 2, t0 + dt.timedelta(minutes=20), 7),
            (2, 3, t0, 9),
            (2, 4, t0 + dt.timedelta(minutes=21), 9),
        ],
        columns=["user_id", "event_id", "ts", "cell"],
    )
    # watermark pusher: one far-future event drives the watermark past
    # every earlier visit's (last_event + timeout), forcing eviction
    pusher = pd.DataFrame(
        [(99, 5, t0 + dt.timedelta(hours=4), 1)],
        columns=["user_id", "event_id", "ts", "cell"],
    )
    # expected: the FULL batch twin of users 1-2 (every visit closed,
    # the trailing ones by event-time eviction); user 99 stays open
    expected = sorted(
        v for v in _brute_visits(pd.concat([early, pusher]))
        if v[0] != 99
    )

    runs = []
    for run in range(2):
        src = str(tmp_path / f"replay_{run}")
        _write_replay_files(src, [early, pusher])
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, cell long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        visits = stateful.cell_visits_stateful(
            stream, timeout_ms=600_000, time_mode="event",
            watermark="1 minute",
        )
        rows = _drain_stream(
            spark, visits, f"visits_replay_{run}", len(expected)
        )
        runs.append(sorted(
            (r.user_id, r.cell, r.enter_ts, r.exit_ts, r.n_events)
            for r in rows
        ))
    assert runs[0] == expected  # eviction points live in data time
    assert runs[0] == runs[1]   # replay-deterministic


def test_near_dup_event_time_replay_evicts_buckets(spark, tmp_path):
    """Bucket eviction is data-time deterministic: a duplicate arriving
    after the watermark passed its bucket's idle timeout starts a NEW
    bucket (no pair) — the bounded-state recall trade, pinned at exact
    replay points instead of wall-clock chance."""
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    txt_a = "the quick brown fox jumps over the lazy dog again and again today"
    txt_b = "completely different subject matter about spark structured streaming state"
    txt_c = "unrelated third document with entirely original words nobody else uses"
    cols = ["doc_id", "text", "ts"]
    f1 = pd.DataFrame(
        [("a1", txt_a, t0),
         ("b1", txt_b, t0 + dt.timedelta(minutes=1)),
         ("b2", txt_b, t0 + dt.timedelta(minutes=2))],
        columns=cols,
    )
    # two watermark pushers: the first advances the watermark past the
    # a/b buckets' timeout, the second is the batch in which those
    # buckets (receiving no data) actually fire hasTimedOut — a bucket
    # getting data in the same batch would NOT time out
    f2 = pd.DataFrame([("c1", txt_c, t0 + dt.timedelta(hours=2))], columns=cols)
    f3 = pd.DataFrame(
        [("c2", "totally separate musings regarding medieval falconry "
          "techniques and gloves", t0 + dt.timedelta(hours=2, minutes=1))],
        columns=cols,
    )
    # a2 is an EXACT dup of a1 — the batch twin pairs them in all
    # bands, but on replay a1's buckets were evicted 90 min (data
    # time) before a2 arrives, so the stream emits no (a1, a2) pair
    f4 = pd.DataFrame([("a2", txt_a, t0 + dt.timedelta(hours=3))], columns=cols)

    batch_pairs = {
        (r.id_a, r.id_b)
        for r in stateful.near_dup_candidates_batch(
            spark.createDataFrame(pd.concat([f1, f2, f3, f4])), ts_col="ts"
        ).collect()
    }
    assert ("a1", "a2") in batch_pairs  # the twin, blind to time, pairs them

    runs = []
    for run in range(2):
        src = str(tmp_path / f"nd_replay_{run}")
        _write_replay_files(src, [f1, f2, f3, f4])
        stream = (
            spark.readStream.schema("doc_id string, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stateful.near_dup_candidates_stream(
            stream, timeout_ms=1_800_000, time_mode="event",
            watermark="1 minute",
        )
        rows = _drain_stream(spark, out, f"nd_replay_{run}", 16)
        runs.append(sorted((r.id_a, r.id_b, r.band) for r in rows))
    # exact dups collide in every band: 16 (b1, b2) pairs — and ONLY b
    # pairs; (a1, a2) is gone because its bucket was evicted in data time
    assert {(a, b) for a, b, _ in runs[0]} == {("b1", "b2")}
    assert len(runs[0]) == 16
    assert runs[0] == runs[1]


def test_near_dup_processing_mode_pairs_across_batches(spark, tmp_path):
    """Processing-mode pruning must use WALL time for the stored bucket
    timestamps: replaying historical data (event ts far in the past)
    must still pair duplicates across micro-batches — storing event
    time and pruning against the wall clock would evict every bucket
    of the replay on its second batch (r4 review finding)."""
    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)  # years before "now"
    txt = "the quick brown fox jumps over the lazy dog again and again"
    cols = ["doc_id", "text", "ts"]
    f1 = pd.DataFrame([("x1", txt, t0)], columns=cols)
    f2 = pd.DataFrame([("x2", txt, t0 + dt.timedelta(minutes=1))],
                      columns=cols)
    src = str(tmp_path / "proc_src")
    _write_replay_files(src, [f1, f2])
    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful.near_dup_candidates_stream(
        stream, timeout_ms=3_600_000, time_mode="processing",
    )
    # ProcessingTimeTimeout keeps scheduling cleanup batches, so
    # processAllAvailable never returns — poll the sink instead
    rows = _drain_stream(spark, out, "proc_pairs", 16, process_all=False)
    assert {(r.id_a, r.id_b) for r in rows} == {("x1", "x2")}
    assert len(rows) == 16  # exact dup collides in every band


def test_near_dup_late_row_does_not_rewind_eviction_clock(spark, tmp_path):
    """A late-but-above-watermark row must not move its bucket's
    last-arrival timestamp BACKWARD (r4 ADVICE): the eviction point is
    'latest arrival + timeout' in data time, independent of which
    micro-batch the late row lands in. Pre-fix, re-encoding the bucket
    with the late row's older ts made the bucket evict at 'late ts +
    timeout', so the x3 duplicate below would find its bucket gone."""
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    txt = "the quick brown fox jumps over the lazy dog again and again"
    cols = ["doc_id", "text", "ts"]
    # x1 fresh at +60 min; x2 is LATE (35 min, above the 30-min
    # watermark after f1) and lands in the NEXT micro-batch; pusher
    # advances the watermark to +110 min; x3 duplicates at +139 min.
    # timeout 60 min: bucket last must stay 60 (60+60=120 >= 110 →
    # alive when x3 arrives). Buggy last=35 → 35+60=95 < 110 → evicted.
    f1 = pd.DataFrame([("x1", txt, t0 + dt.timedelta(minutes=60))],
                      columns=cols)
    f2 = pd.DataFrame([("x2", txt, t0 + dt.timedelta(minutes=35))],
                      columns=cols)
    f3 = pd.DataFrame(
        [("p1", "watermark pusher text totally unlike the duplicates",
          t0 + dt.timedelta(minutes=140))], columns=cols)
    f4 = pd.DataFrame([("x3", txt, t0 + dt.timedelta(minutes=139))],
                      columns=cols)
    runs = []
    for run in range(2):
        src = str(tmp_path / f"late_src_{run}")
        _write_replay_files(src, [f1, f2, f3, f4])
        stream = (
            spark.readStream.schema("doc_id string, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stateful.near_dup_candidates_stream(
            stream, timeout_ms=3_600_000, time_mode="event",
            watermark="30 minutes",
        )
        rows = _drain_stream(spark, out, f"late_pairs_{run}", 32)
        runs.append(sorted((r.id_a, r.id_b, r.band) for r in rows))
    # both dups pair with the canonical x1, in every band
    assert {(a, b) for a, b, _ in runs[0]} == {("x1", "x2"), ("x1", "x3")}
    assert len(runs[0]) == 32
    assert runs[0] == runs[1]  # replay-deterministic


@pytest.mark.parametrize("shards", [None, 8])
def test_cell_visits_late_row_keeps_batch_twin_bounds(spark, tmp_path,
                                                      shards):
    """A late-but-above-watermark SAME-CELL row must not move the open
    visit's enter_ts forward or exit_ts backward (r5 review): the
    batch twin's min(ts)/max(ts) over the run is arrival-order-blind,
    so the streamed visit must carry the same bounds regardless of
    which micro-batch the late row lands in. Covers per-user and
    sharded keying."""
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    cols = ["user_id", "event_id", "ts", "cell"]
    f1 = pd.DataFrame([(1, 0, t0 + dt.timedelta(minutes=10), 7)],
                      columns=cols)
    # late same-cell row: 5 min < watermark cutoff (10 - 30 < 5) ✓
    f2 = pd.DataFrame([(1, 1, t0 + dt.timedelta(minutes=5), 7)],
                      columns=cols)
    # pusher advances the watermark a day → evicts and emits the visit
    f3 = pd.DataFrame([(9, 2, t0 + dt.timedelta(days=1, minutes=30), 0)],
                      columns=cols)
    src = str(tmp_path / f"late_visit_{shards}")
    _write_replay_files(src, [f1, f2, f3])
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, cell long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful.cell_visits_stateful(
        stream, timeout_ms=3_600_000, time_mode="event",
        watermark="30 minutes", shards=shards,
    )
    rows = [r for r in _drain_stream(spark, out, f"late_visit_q_{shards}", 1)
            if r.user_id == 1]
    assert len(rows) == 1
    v = rows[0]
    assert v.enter_ts == t0 + dt.timedelta(minutes=5)   # min over the run
    assert v.exit_ts == t0 + dt.timedelta(minutes=10)   # max over the run
    assert v.n_events == 2


def test_near_dup_stream_separator_in_doc_id(spark, tmp_path):
    """A doc id containing the state-encoding separator byte must not
    corrupt the parse (tail fields are rsplit from the right)."""
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    txt = "completely different subject matter about spark streaming state"
    weird_a, weird_b = "a\x1f1\x1f2", "b\x1f9"
    cols = ["doc_id", "text", "ts"]
    f1 = pd.DataFrame([(weird_a, txt, t0)], columns=cols)
    f2 = pd.DataFrame([(weird_b, txt, t0 + dt.timedelta(minutes=1))],
                      columns=cols)
    src = str(tmp_path / "sep_src")
    _write_replay_files(src, [f1, f2])
    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful.near_dup_candidates_stream(stream, timeout_ms=3_600_000)
    rows = _drain_stream(spark, out, "sep_pairs", 16)
    assert {(r.id_a, r.id_b) for r in rows} == {(weird_a, weird_b)}


def test_stateful_ops_on_rocksdb_state_store(spark, tmp_path):
    """Both custom stateful ops run unchanged on RocksDB — the state
    backend for state larger than executor memory (the endless-crawl
    shape). Provider is a session-scoped SQL conf read at query start."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        pdf = _docs()
        src = str(tmp_path / "rocks_docs")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id string, text string, ts timestamp")
            .parquet(src)
        )
        expected = sorted(
            map(tuple, stateful.near_dup_candidates_batch(
                spark.createDataFrame(pdf), ts_col="ts").collect())
        )
        out = stateful.near_dup_candidates_stream(stream,
                                                  timeout_ms=3_600_000)
        rows = _drain_stream(spark, out, "rocks_nd", len(expected))
        assert sorted((r.id_a, r.id_b, r.band) for r in rows) == expected

        # cell visits, per-user AND sharded (the MapType shard state
        # must round-trip through RocksDB's encoding too)
        ev = _events()
        esrc = str(tmp_path / "rocks_events")
        spark.createDataFrame(ev).write.parquet(esrc)
        batch = _brute_visits(ev)
        open_v = {}
        for v in batch:
            if v[0] not in open_v or v[2] > open_v[v[0]][2]:
                open_v[v[0]] = v
        exp_visits = sorted(v for v in batch if v != open_v[v[0]])
        for shards, qn in ((None, "rocks_cv"), (4, "rocks_cv_sh")):
            estream = (
                spark.readStream.schema(
                    "user_id long, event_id long, ts timestamp, cell long"
                ).parquet(esrc)
            )
            visits = stateful.cell_visits_stateful(
                estream, timeout_ms=3_600_000, shards=shards
            )
            vrows = _drain_stream(spark, visits, qn, len(exp_visits))
            got = sorted(
                (r.user_id, r.cell, r.enter_ts, r.exit_ts, r.n_events)
                for r in vrows
            )
            assert got == exp_visits
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_cell_visits_sharded_matches_per_user(spark, tmp_path):
    """shards=N keys the visit op by hash(user)%N with a per-shard map
    (bounded Python calls per batch — CLAUDE.md rule 9); the visits it
    emits must be identical to per-user keying on the same replay."""
    t0 = dt.datetime(2024, 5, 1, 8, 0, 0)
    early = pd.DataFrame(
        [(u, u * 10 + i, t0 + dt.timedelta(minutes=3 * i), (u * 7 + i // 2))
         for u in range(1, 9) for i in range(6)],
        columns=["user_id", "event_id", "ts", "cell"],
    )
    pusher = pd.DataFrame(
        [(99, 999, t0 + dt.timedelta(hours=4), 1)],
        columns=["user_id", "event_id", "ts", "cell"],
    )
    expected = sorted(
        v for v in _brute_visits(pd.concat([early, pusher])) if v[0] != 99
    )
    results = []
    for shards in (None, 4):
        src = str(tmp_path / f"shard_{shards}")
        _write_replay_files(src, [early, pusher])
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, cell long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        visits = stateful.cell_visits_stateful(
            stream, timeout_ms=600_000, time_mode="event",
            watermark="1 minute", shards=shards,
        )
        rows = _drain_stream(
            spark, visits, f"shard_visits_{shards}", len(expected)
        )
        results.append(sorted(
            (r.user_id, r.cell, r.enter_ts, r.exit_ts, r.n_events)
            for r in rows
        ))
    assert results[0] == expected
    assert results[0] == results[1]


# ---------------------- streaming embedding near-dup (r4)


def _vecs():
    import numpy as np

    base = dt.datetime(2024, 7, 1, 9, 0, 0)
    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        v = rng.normal(size=16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v], base + dt.timedelta(minutes=i)))
    # planted exact duplicates of vec 0 and vec 2, arriving later
    rows.append((100, rows[0][1], base + dt.timedelta(minutes=10)))
    rows.append((102, rows[2][1], base + dt.timedelta(minutes=11)))
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "ts"])


def test_near_dup_embedding_batch_shape(spark):
    pdf = _vecs()
    got = {
        (r.id_a, r.id_b)
        for r in stateful.near_dup_embedding_batch(
            spark.createDataFrame(pdf), ts_col="ts", dim=16
        ).collect()
    }
    # identical vectors share every band bucket; canonical = earlier
    assert ("0", "100") in got and ("2", "102") in got


def test_near_dup_embedding_stream_matches_batch(spark, tmp_path):
    """Embedding stream == batch twin on a replayed 2-file stream (the
    state machinery is shared with the text stream; this pins the
    banding plumbing end-to-end)."""
    pdf = _vecs()
    expected = sorted(
        map(tuple, stateful.near_dup_embedding_batch(
            spark.createDataFrame(pdf), ts_col="ts", dim=16
        ).collect())
    )
    src = str(tmp_path / "vec_src")
    _write_replay_files(src, [pdf.iloc[:6], pdf.iloc[6:]])
    stream = (
        spark.readStream.schema(
            "vec_id long, embedding array<double>, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful.near_dup_embedding_stream(
        stream, dim=16, timeout_ms=3_600_000
    )
    rows = _drain_stream(spark, out, "emb_nd", len(expected))
    assert sorted((r.id_a, r.id_b, r.band) for r in rows) == expected
    import pytest

    with pytest.raises(ValueError):
        stateful.near_dup_embedding_stream(
            spark.createDataFrame(pdf), dim=16
        )


# ---------------------- streaming MEDIA near-dup (r5)


def _media_pdf():
    """Image + audio fixture rows (media_dedup's gate fixtures, audio
    ids offset to stay unique) with event timestamps: base rows first,
    their planted near-dup twins ten+ minutes later — the cross-batch
    shape the stream must catch."""
    from o2g_spark.operators import media_dedup as M

    base = dt.datetime(2024, 8, 1, 9, 0, 0)
    rows = []
    for mid, _u, kind, payload, _m in M.synth_phash_media_rows(n_base=8):
        ts = base + dt.timedelta(minutes=(10 + mid % 37 if mid >= 1000 else mid % 7))
        rows.append((mid, kind, payload, ts))
    for mid, _u, kind, payload, _m in M.synth_afp_media_rows(n_base=6):
        ts = base + dt.timedelta(minutes=(12 + mid % 31 if mid >= 1000 else mid % 5))
        rows.append((mid + 50_000, kind, payload, ts))
    return pd.DataFrame(rows, columns=["media_id", "kind", "payload", "ts"])


def _media_df(spark, pdf):
    return spark.createDataFrame(
        [
            (int(r.media_id), r.kind, bytes(r.payload), r.ts.to_pydatetime())
            for r in pdf.itertuples(index=False)
        ],
        "media_id long, kind string, payload binary, ts timestamp",
    )


def test_near_dup_media_batch_shape(spark):
    pdf = _media_pdf()
    got = {
        (r.id_a, r.id_b)
        for r in stateful.near_dup_media_batch(
            _media_df(spark, pdf), kind="image", ts_col="ts"
        ).collect()
    }
    # the byte-identical duplicate (id 2000 duplicates id 1000's
    # payload) shares every band with its earlier-ts canonical
    assert ("1000", "2000") in got
    # a planted near-dup twin (hamming <= 3) shares >= C(5,2)=10 of
    # the 28 bands with its base -> must appear
    assert ("0", "1000") in got
    aud = {
        (r.id_a, r.id_b)
        for r in stateful.near_dup_media_batch(
            _media_df(spark, pdf), kind="audio", ts_col="ts",
            frame_samples=128,
        ).collect()
    }
    assert ("50000", "51000") in aud


def test_near_dup_media_stream_matches_batch(spark, tmp_path):
    """Media stream == batch twin on a replayed 2-file stream for BOTH
    kinds (the state machinery is shared with the text/embedding
    streams; this pins the signature + banding plumbing end-to-end,
    including the kind filter on a mixed stream)."""
    pdf = _media_pdf()
    early = pdf[pdf["media_id"] % 50_000 < 1000].reset_index(drop=True)
    late = pdf[pdf["media_id"] % 50_000 >= 1000].reset_index(drop=True)
    for kind, fs in (("image", 256), ("audio", 128)):
        expected = sorted(
            map(tuple, stateful.near_dup_media_batch(
                _media_df(spark, pdf), kind=kind, ts_col="ts",
                frame_samples=fs,
            ).collect())
        )
        assert expected, kind  # fixture must actually plant pairs
        src = str(tmp_path / f"media_src_{kind}")
        _write_replay_files(src, [early, late])
        stream = (
            spark.readStream.schema(
                "media_id long, kind string, payload binary, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stateful.near_dup_media_stream(
            stream, kind=kind, timeout_ms=3_600_000, frame_samples=fs
        )
        rows = _drain_stream(spark, out, f"media_nd_{kind}", len(expected))
        assert sorted((r.id_a, r.id_b, r.band) for r in rows) == expected


def test_near_dup_media_stream_rejects_batch_frame(spark):
    import pytest

    with pytest.raises(ValueError):
        stateful.near_dup_media_stream(_media_df(spark, _media_pdf()))
    with pytest.raises(ValueError):
        stateful.near_dup_media_batch(
            _media_df(spark, _media_pdf()), kind="video"
        )


# ---------------------- streaming VIDEO near-dup (r5)


def _video_pdf():
    """AVI fixture rows (operators/video's gate fixtures) with event
    timestamps: base clips first, their planted frame-subset twins
    ten+ minutes later — the cross-batch shape the stream must catch."""
    from o2g_spark.operators import video as V

    base = dt.datetime(2024, 8, 1, 9, 0, 0)
    rows = []
    for mid, _u, kind, payload, _m in V.synth_avi_media_rows():
        ts = base + dt.timedelta(
            minutes=(10 + mid % 37 if mid >= 1000 else mid % 7))
        rows.append((mid, kind, payload, ts))
    return pd.DataFrame(rows, columns=["media_id", "kind", "payload", "ts"])


def test_near_dup_video_batch_shape(spark):
    pdf = _video_pdf()
    got = {
        (r.id_a, r.id_b)
        for r in stateful.near_dup_video_batch(
            _media_df(spark, pdf), ts_col="ts"
        ).collect()
    }
    # twin 1000 drops base 0's last frame (its frames ⊂ base 0's) and
    # clip 2000 is byte-identical to 1000 — base 0 has the earliest
    # ts, so it is the canonical of every shared frame bucket
    assert ("0", "1000") in got
    assert ("0", "2000") in got
    # twinless base clips (1, 2: 8×9 random grids) share no frame
    ids_in_pairs = {x for p in got for x in p}
    assert "1" not in ids_in_pairs and "2" not in ids_in_pairs


def test_near_dup_video_stream_matches_batch(spark, tmp_path):
    """Video stream == batch twin on a replayed 2-file stream: one
    candidate row per shared frame-hash bucket, canonical = first
    arrival (the state machinery is shared with the other three
    modality streams; this pins the AVI decode + frame-hash banding
    plumbing end-to-end)."""
    pdf = _video_pdf()
    early = pdf[pdf["media_id"] < 1000].reset_index(drop=True)
    late = pdf[pdf["media_id"] >= 1000].reset_index(drop=True)
    expected = sorted(
        map(tuple, stateful.near_dup_video_batch(
            _media_df(spark, pdf), ts_col="ts",
        ).collect())
    )
    assert len(expected) >= 6  # fixtures must actually plant pairs
    src = str(tmp_path / "video_src")
    _write_replay_files(src, [early, late])
    stream = (
        spark.readStream.schema(
            "media_id long, kind string, payload binary, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful.near_dup_video_stream(stream, timeout_ms=3_600_000)
    rows = _drain_stream(spark, out, "video_nd", len(expected))
    assert sorted((r.id_a, r.id_b, r.band) for r in rows) == expected


def test_near_dup_video_stream_rejects_batch_frame(spark):
    import pytest

    with pytest.raises(ValueError):
        stateful.near_dup_video_stream(_media_df(spark, _video_pdf()))
