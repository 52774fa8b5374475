"""o2g parity suite (SURVEY.md §2.C): the reference's GTFS stop/route
fixture assertions, run BOTH as the direct GTFS pipeline AND
re-expressed as spatial-join assertions — counts must agree exactly."""

import hashlib
import zipfile

import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import gtfs, pip
from o2g_spark.sources import synth, tables


@pytest.fixture(scope="module")
def parity(spark):
    stops_pdf, routes_pdf, zones_pdf = synth.gen_parity()
    return (
        tables.stops_df(spark, stops_pdf),
        tables.routes_df(spark, routes_pdf),
        zones_pdf,
        stops_pdf,
        routes_pdf,
    )


def test_tag_filter_counts(parity):
    """o2g: N stop nodes pass the tag filter (A3)."""
    stops, _, _, stops_pdf, _ = parity
    got = gtfs.filter_stops(stops).count()
    exp = sum(
        1 for t in stops_pdf["tags"] if t.get("public_transport") == "stop_position"
    )
    assert got == exp == 36  # 40 nodes, every 10th is a bench


def test_member_resolution_counts(parity):
    """o2g: route with M resolvable members → M join rows (A5/A6/A7)."""
    stops, routes, _, stops_pdf, routes_pdf = parity
    resolved = gtfs.resolve_members(routes, gtfs.filter_stops(stops))
    got = {r.route_id: r.n for r in resolved.groupBy("route_id").agg(F.count("*").alias("n")).collect()}
    stop_ids = {
        r.stop_id
        for r in stops_pdf.itertuples()
        if r.tags.get("public_transport") == "stop_position"
    }
    exp = {
        r.route_id: sum(1 for m in r.members if m["ref"] in stop_ids)
        for r in routes_pdf.itertuples()
    }
    assert got == exp


def test_dangling_refs_audited(parity):
    """o2g: dangling member refs skipped, not errors (A7)."""
    stops, routes, _, _, _ = parity
    dang = gtfs.dangling_members(routes, gtfs.filter_stops(stops)).collect()
    # each route has exactly one ref=999 dangling member + benches
    assert sum(1 for d in dang if d.ref == 999) == 3


def test_shared_stop_dedup(parity):
    """o2g: a stop served by several routes appears once (A8)."""
    stops, routes, _, _, _ = parity
    resolved = gtfs.resolve_members(routes, gtfs.filter_stops(stops))
    built = gtfs.build_stops(resolved)
    assert built.count() == resolved.select("stop_id").distinct().count()
    # stops 0 and 1 are served by route 0 AND route 2 but appear once
    assert built.filter(F.col("stop_id").isin(0, 1)).count() == 2


def test_member_order_preserved(parity):
    """o2g: stop_sequence == relation member order (A5/A11)."""
    stops, routes, _, stops_pdf, routes_pdf = parity
    resolved = gtfs.resolve_members(routes, gtfs.filter_stops(stops))
    lists = {r.route_id: r.stop_ids for r in gtfs.route_stop_lists(resolved).collect()}
    stop_ids = {
        r.stop_id
        for r in stops_pdf.itertuples()
        if r.tags.get("public_transport") == "stop_position"
    }
    for r in routes_pdf.itertuples():
        exp = [m["ref"] for m in r.members if m["ref"] in stop_ids]
        # ordered by ORIGINAL member position even after the shuffle
        got_seq = sorted(
            (
                (row.stop_sequence, row.stop_id)
                for row in resolved.filter(F.col("route_id") == r.route_id).collect()
            )
        )
        assert [s for _, s in got_seq] == exp
        assert lists[r.route_id] == exp


def test_spatial_reexpression_matches_gtfs_counts(parity, spark):
    """THE graft assertion: 'M resolvable members of route R' ==
    'M stop points inside parity zone R' (PIP join row counts)."""
    stops, routes, zones_pdf, _, _ = parity
    resolved = gtfs.resolve_members(routes, gtfs.filter_stops(stops))
    # route r's resolvable members, EXCLUDING cross-band shared stops
    # (stops 0/1 on route 2 lie in band 0's strip, not zone 2)
    member_counts = {
        r.route_id: r.n
        for r in resolved.filter(
            (F.col("stop_id") % 3) == F.col("route_id")
        ).groupBy("route_id").agg(F.count("*").alias("n")).collect()
    }
    pts = gtfs.filter_stops(stops).select("stop_id", "lat", "lon")
    rings = synth.zone_rings(zones_pdf)
    pip_counts = {
        r.zone_id: r.n
        for r in pip.pip_join(pts, rings, res=9)
        .groupBy("zone_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert pip_counts == member_counts


def test_dummy_schedule_monotonic(parity):
    """o2g gtfs_dummy: stop_times strictly increase along each trip (A10)."""
    stops, routes, _, _, _ = parity
    resolved = gtfs.resolve_members(routes, gtfs.filter_stops(stops))
    trips, stop_times = gtfs.dummy_schedule(resolved, trips_per_route=2)
    assert trips.count() == 6  # 3 routes × 2 trips
    rows = stop_times.orderBy("trip_id", "stop_sequence").collect()
    by_trip = {}
    for r in rows:
        by_trip.setdefault(r.trip_id, []).append(r.arrival_time)
    for times in by_trip.values():
        assert times == sorted(times) and len(set(times)) == len(times)


def test_gtfs_zip_roundtrip(parity, tmp_path):
    """o2g sink: a complete, deterministic GTFS zip (A12)."""
    stops, routes, _, _, _ = parity
    fs = gtfs.filter_stops(stops)
    resolved = gtfs.resolve_members(routes, fs)
    trips, st = gtfs.dummy_schedule(resolved)
    # frequency-based feed: template trips only + frequencies rows —
    # declaring BOTH all explicit trips and frequencies would
    # double-count every departure for a GTFS consumer
    t0, st0, freq = gtfs.frequencies_feed(trips, st)
    p1 = gtfs.write_gtfs_zip(
        str(tmp_path / "a.zip"), gtfs.build_stops(resolved),
        gtfs.build_routes(routes), t0, st0, frequencies=freq,
    )
    p2 = gtfs.write_gtfs_zip(
        str(tmp_path / "b.zip"), gtfs.build_stops(resolved.repartition(13)),
        gtfs.build_routes(routes), t0, st0, frequencies=freq,
    )
    names = set(zipfile.ZipFile(p1).namelist())
    assert names == {
        "stops.txt", "routes.txt", "trips.txt", "stop_times.txt",
        "agency.txt", "calendar.txt", "frequencies.txt",
    }
    # one frequencies row per route, dummy-schedule window + headway
    freq_txt = zipfile.ZipFile(p1).read("frequencies.txt").decode().splitlines()
    assert freq_txt[0] == "trip_id,start_time,end_time,headway_secs"
    assert len(freq_txt) == 1 + 3  # header + 3 routes
    assert all(ln.endswith(",06:00:00,07:00:00,1800") for ln in freq_txt[1:])
    # byte-deterministic under any partitioning
    h1 = [hashlib.sha256(zipfile.ZipFile(p1).read(n)).hexdigest() for n in sorted(names)]
    h2 = [hashlib.sha256(zipfile.ZipFile(p2).read(n)).hexdigest() for n in sorted(names)]
    assert h1 == h2


def test_frequencies_window_derived_from_data(parity):
    """build_frequencies reads the service window FROM the schedule —
    a non-default dummy_schedule needs no matching parameters, and a
    mismatch is impossible by construction (the r2 ADVICE failure
    mode: silently wrong window on mismatched args)."""
    stops, routes, _, _, _ = parity
    resolved = gtfs.resolve_members(routes, gtfs.filter_stops(stops))
    trips, st = gtfs.dummy_schedule(
        resolved, trips_per_route=4, start_s=5 * 3600 + 900, headway_s=600
    )
    freq = gtfs.build_frequencies(trips, st).collect()
    assert len(freq) == 3  # one row per route
    for r in freq:
        assert r.start_time == "05:15:00"
        assert r.headway_secs == 600
        # window closes one headway after the LAST trip starts:
        # 05:15 + 4 × 10 min
        assert r.end_time == "05:55:00"
    # template = the earliest-departing trip of each route
    tmpl, st0, freq_df = gtfs.frequencies_feed(trips, st)
    assert tmpl.count() == 3
    assert st0.join(tmpl, "trip_id", "left_anti").count() == 0
    # tied departures (headway_s=0 dummy schedule) must NOT emit a
    # headway_secs=0 row — a frequencies-expanding consumer would loop
    trips0, st_tied = gtfs.dummy_schedule(resolved, trips_per_route=2,
                                          headway_s=0)
    for r in gtfs.build_frequencies(trips0, st_tied).collect():
        assert r.headway_secs == 1800  # default, not 0


def test_route_type_enum(parity, spark):
    _, routes, _, _, _ = parity
    got = {r.route_id: r.route_type for r in gtfs.build_routes(routes).collect()}
    assert got == {0: 3, 1: 0, 2: 2}  # bus→3, tram→0, rail→2


def test_frequencies_rejects_nonuniform_gaps(spark):
    """GTFS frequencies semantics assume uniform headway: departures at
    06:00/06:10/06:30 cannot be summarized by one (start, end, headway)
    row, so build_frequencies refuses unless the caller opts out
    (ADVICE r3 #5)."""
    trips = spark.createDataFrame(
        [("t1", 1, "S"), ("t2", 1, "S"), ("t3", 1, "S")],
        "trip_id string, route_id int, service_id string",
    )
    st = spark.createDataFrame(
        [("t1", 1, 10, "06:00:00", "06:00:00"),
         ("t2", 1, 10, "06:10:00", "06:10:00"),
         ("t3", 1, 10, "06:30:00", "06:30:00")],
        "trip_id string, stop_sequence int, stop_id int, "
        "arrival_time string, departure_time string",
    )
    with pytest.raises(ValueError, match="non-uniform"):
        gtfs.build_frequencies(trips, st)
    rows = gtfs.build_frequencies(trips, st, check_uniform=False).collect()
    assert len(rows) == 1 and rows[0].headway_secs == 600


def test_frequencies_feed_forwards_check_uniform(spark):
    """frequencies_feed must expose the same escape hatch its error
    message advertises (r4 review finding)."""
    trips = spark.createDataFrame(
        [("t1", 1, "S"), ("t2", 1, "S"), ("t3", 1, "S")],
        "trip_id string, route_id int, service_id string",
    )
    st = spark.createDataFrame(
        [("t1", 1, 10, "06:00:00", "06:00:00"),
         ("t2", 1, 10, "06:10:00", "06:10:00"),
         ("t3", 1, 10, "06:30:00", "06:30:00")],
        "trip_id string, stop_sequence int, stop_id int, "
        "arrival_time string, departure_time string",
    )
    with pytest.raises(ValueError, match="non-uniform"):
        gtfs.frequencies_feed(trips, st)
    t0, st0, freq = gtfs.frequencies_feed(trips, st, check_uniform=False)
    assert freq.count() == 1 and t0.count() == 1
