"""o2g compatibility layer: OSM-shaped stop/route extraction → GTFS.

This module re-expresses the reference's ACTUAL pipeline (SURVEY.md
§2.A A3–A12 [o2g-PK:o2g transform + gtfs_dummy + writer]) as DataFrame
ops, so a user of the reference can run the queries they run today:

    o2g semantics                      here
    ---------------------------------  --------------------------------
    A3 tag filter (stops, routes)      filter_stops / filter_routes
    A4 tag → GTFS field projection     build_routes (route_type enum)
    A5 ordered member unnest           resolve_members (posexplode)
    A6 member.ref → node.id FK join    resolve_members (inner join)
    A7 dangling refs silently dropped  inner join; dangling_members audit
    A8 shared stop dedup               build_stops (dropDuplicates)
    A9 route → ordered stop list       route_stop_lists (ordered collect)
    A10 dummy calendar/trips/times     dummy_schedule (range cross join +
                                       running-sum window)
    A11 sequence numbering             posexplode pos → stop_sequence
    A12 GTFS zip sink                  write_gtfs_zip

Input shapes (OSM-entity tables, SURVEY.md §1.1):
- stops/nodes: (stop_id long, lat double, lon double,
  tags map<string,string>)
- routes/relations: (route_id long, route_type string,
  members array<struct<ref long, role string>>)  — member order is the
  stop order, exactly o2g's relation-member semantics.

Every transform is JVM-side Column algebra; join row counts and
orderings are partition-invariant (the graft's §2.C parity bar).
"""

from __future__ import annotations

import csv
import io
import os
import zipfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# OSM route=* value → GTFS route_type (reference mapping, SURVEY.md §1.1)
ROUTE_TYPE_MAP = {
    "tram": 0,
    "light_rail": 0,
    "subway": 1,
    "rail": 2,
    "train": 2,
    "bus": 3,
    "trolleybus": 3,
    "ferry": 4,
}

def stop_tag_predicate():
    """A3 tag predicate (built lazily: Columns need a live session)."""
    return (
        (F.element_at("tags", "public_transport").isin("stop_position", "platform"))
        | (F.element_at("tags", "highway") == "bus_stop")
        | (F.element_at("tags", "railway").isin("station", "halt"))
    )


def filter_stops(nodes: DataFrame) -> DataFrame:
    """A3: nodes that are public-transport stops (pure Catalyst
    predicates on the MapType tag bag)."""
    return nodes.filter(stop_tag_predicate())


def resolve_members(routes: DataFrame, stops: DataFrame) -> DataFrame:
    """A5+A6+A7+A11: ordered member unnest, FK join to stop coords.

    Output: (route_id, route_type, stop_sequence, stop_id, lat, lon).
    ``stop_sequence`` is the 0-based member position (order-significant,
    o2g's relation-member order). Dangling refs drop silently — the
    inner join IS the reference semantics; row count per route ==
    number of RESOLVABLE members (the §2.C exact-count assertion).
    """
    members = routes.select(
        "route_id",
        "route_type",
        F.posexplode("members").alias("stop_sequence", "m"),
    )
    return members.join(
        F.broadcast(stops.select("stop_id", "lat", "lon")),
        members["m.ref"] == F.col("stop_id"),
        "inner",
    ).select("route_id", "route_type", "stop_sequence", "stop_id", "lat", "lon")


def dangling_members(routes: DataFrame, stops: DataFrame) -> DataFrame:
    """A7 audit: member refs that resolve to no stop (left_anti)."""
    members = routes.select(
        "route_id", F.posexplode("members").alias("stop_sequence", "m")
    ).select("route_id", "stop_sequence", F.col("m.ref").alias("ref"))
    return members.join(
        stops.select(F.col("stop_id").alias("ref")), "ref", "left_anti"
    )


def build_stops(resolved: DataFrame) -> DataFrame:
    """A8: one GTFS stop per node, however many routes serve it."""
    return (
        resolved.select(
            "stop_id",
            F.col("lat").alias("stop_lat"),
            F.col("lon").alias("stop_lon"),
        )
        .dropDuplicates(["stop_id"])
        .withColumn("stop_name", F.concat(F.lit("stop"), F.col("stop_id")))
        .select("stop_id", "stop_name", "stop_lat", "stop_lon")
    )


def build_routes(routes: DataFrame) -> DataFrame:
    """A4: tag projection + route_type enum map (literal CASE chain —
    a broadcast dimension would also do; the enum is 8 entries)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in ROUTE_TYPE_MAP.items() for x in kv]
    )
    return routes.select(
        "route_id",
        F.lit("o2g").alias("agency_id"),
        F.concat(F.lit("route"), F.col("route_id")).alias("route_short_name"),
        F.coalesce(mapping[F.col("route_type")], F.lit(3)).alias("route_type"),
    )


def route_stop_lists(resolved: DataFrame) -> DataFrame:
    """A9: route → member-ordered stop id array (deterministic)."""
    return resolved.groupBy("route_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("stop_sequence", "stop_id"))
            ),
            lambda s: s["stop_id"],
        ).alias("stop_ids")
    )


def dummy_schedule(
    resolved: DataFrame,
    trips_per_route: int = 2,
    start_s: int = 6 * 3600,
    headway_s: int = 1800,
    inter_stop_s: int = 120,
) -> tuple[DataFrame, DataFrame]:
    """A10: synthesize trips + stop_times (OSM has no timetables; o2g
    emits dummies so the feed validates [o2g-PK:o2g/gtfs_dummy.py]).

    trips = routes × range(k) cross join; stop_times get monotonically
    increasing times via a running offset over stop_sequence — the
    window-function re-expression of o2g's enumerate loop.
    """
    spark = resolved.sparkSession
    trips = (
        resolved.select("route_id").distinct()
        .crossJoin(spark.range(trips_per_route).select(F.col("id").alias("trip_idx")))
        .withColumn(
            "trip_id",
            F.concat_ws("_", F.lit("t"), F.col("route_id"), F.col("trip_idx")),
        )
        .withColumn("service_id", F.lit("always"))
    )
    st = resolved.join(trips, "route_id")
    secs = (
        F.lit(start_s)
        + F.col("trip_idx") * headway_s
        + F.col("stop_sequence") * inter_stop_s
    )
    hhmmss = F.format_string(
        "%02d:%02d:%02d",
        (secs / 3600).cast("int"),
        (secs % 3600 / 60).cast("int"),
        (secs % 60).cast("int"),
    )
    stop_times = st.select(
        "trip_id",
        F.col("stop_sequence"),
        "stop_id",
        hhmmss.alias("arrival_time"),
        hhmmss.alias("departure_time"),
    )
    return trips.select("trip_id", "route_id", "service_id"), stop_times


def build_frequencies(
    trips: DataFrame,
    stop_times: DataFrame,
    default_headway_s: int = 1800,
    check_uniform: bool = True,
) -> DataFrame:
    """GTFS ``frequencies.txt`` rows DERIVED from the schedule itself
    (SURVEY.md §1.1: the reference output is agency/stops/routes/trips/
    stop_times/calendar "+ possibly frequencies" [o2g-PK]).

    One row per route: the template trip is the route's earliest-
    departing trip, the headway is the gap between its first departure
    and the next sibling's, and the window closes one headway after the
    last trip starts — all read from (trips, stop_times), so there are
    no scalar parameters to mismatch against :func:`dummy_schedule` and
    no dependence on trip-id string patterns. ``default_headway_s``
    only applies to single-trip routes (no sibling gap to measure).

    A GTFS service must be declared EITHER via scheduled trips OR via
    frequencies, never both (a consumer would expand the frequencies
    window AND run the explicit sibling trips — every departure
    double-counted). Use :func:`frequencies_feed` to get the coherent
    (template trips, template stop_times, frequencies) triple.
    """
    dep_s = (
        F.substring("departure_time", 1, 2).cast("int") * 3600
        + F.substring("departure_time", 4, 2).cast("int") * 60
        + F.substring("departure_time", 7, 2).cast("int")
    )
    first_dep = stop_times.groupBy("trip_id").agg(F.min(dep_s).alias("__dep"))
    w = Window.partitionBy("route_id").orderBy("__dep", "trip_id")
    ranked = (
        trips.join(first_dep, "trip_id")
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__gap", F.col("__dep") - F.lag("__dep").over(w))
    )
    if check_uniform:
        # GTFS frequencies semantics assume uniform headway: a single
        # (start, end, headway) row misrepresents any route whose
        # sibling gaps differ, so refuse to emit one (cheap: dimension-
        # scale data, one extra aggregate). check_uniform=False is the
        # explicit opt-out for callers who accept the approximation.
        bad = (
            ranked.groupBy("route_id")
            .agg(F.min("__gap").alias("__gmin"), F.max("__gap").alias("__gmax"))
            .filter(F.col("__gmax") != F.col("__gmin"))
            .limit(5)
            .collect()
        )
        if bad:
            routes = ", ".join(str(r["route_id"]) for r in bad)
            raise ValueError(
                "build_frequencies: non-uniform departure gaps on "
                f"route(s) {routes} — a frequencies window would "
                "misrepresent their trip times. Fix the schedule or "
                "pass check_uniform=False to accept the approximation."
            )
    per_route = (
        ranked.groupBy("route_id")
        .agg(
            F.min(F.when(F.col("__rn") == 1, F.col("trip_id"))).alias("trip_id"),
            F.min("__dep").alias("__start"),
            F.max("__dep").alias("__last"),
            F.min(F.when(F.col("__rn") == 2, F.col("__dep"))).alias("__second"),
        )
        .withColumn(
            "__headway",
            # default covers BOTH single-trip routes (no sibling gap)
            # and tied departures (gap 0 — a literal headway_secs=0 row
            # would make a frequencies-expanding consumer loop forever)
            F.when(
                F.col("__second") - F.col("__start") > 0,
                F.col("__second") - F.col("__start"),
            ).otherwise(F.lit(default_headway_s)),
        )
        .withColumn("__end", F.col("__last") + F.col("__headway"))
    )

    def hhmmss(col):
        return F.format_string(
            "%02d:%02d:%02d",
            (col / 3600).cast("int"),
            (col % 3600 / 60).cast("int"),
            (col % 60).cast("int"),
        )

    return per_route.select(
        "trip_id",
        hhmmss(F.col("__start")).alias("start_time"),
        hhmmss(F.col("__end")).alias("end_time"),
        F.col("__headway").cast("int").alias("headway_secs"),
    )


def frequencies_feed(
    trips: DataFrame,
    stop_times: DataFrame,
    default_headway_s: int = 1800,
    check_uniform: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(template trips, template stop_times, frequencies) — the
    frequency-based representation of the dummy schedule: ONE template
    trip per route whose stop_times define relative travel offsets,
    plus a frequencies row expanding it across the service window.
    Replaces the explicit sibling trips so no departure is declared
    twice. Template selection rides on :func:`build_frequencies`'
    derived earliest-departure trip, not an id pattern."""
    # forwarded so build_frequencies' "pass check_uniform=False"
    # escape hatch is actually reachable from this path too
    freq = build_frequencies(trips, stop_times, default_headway_s,
                             check_uniform=check_uniform)
    tmpl = freq.select("trip_id")
    t0 = trips.join(tmpl, "trip_id", "left_semi")
    st0 = stop_times.join(tmpl, "trip_id", "left_semi")
    return t0, st0, freq


def write_gtfs_zip(
    out_path: str,
    stops: DataFrame,
    routes: DataFrame,
    trips: DataFrame,
    stop_times: DataFrame,
    frequencies: DataFrame | None = None,
) -> str:
    """A12: the GTFS zip sink. Tables collect to the driver (GTFS feeds
    are dimension-sized — the fact tables of this engine checkpoint via
    plans.checkpoint instead) and serialize deterministically (sorted)."""
    agency = [
        {"agency_id": "o2g", "agency_name": "o2g_spark", "agency_url": "https://example.org", "agency_timezone": "UTC"}
    ]
    calendar = [
        {
            "service_id": "always",
            **{d: 1 for d in ("monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday")},
            "start_date": "20240101",
            "end_date": "20341231",
        }
    ]

    def rows_of(df: DataFrame):
        cols = df.columns
        data = sorted([tuple(r[c] for c in cols) for r in df.collect()])
        return cols, data

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        tables = [
            ("stops.txt", stops),
            ("routes.txt", routes),
            ("trips.txt", trips),
            ("stop_times.txt", stop_times),
        ]
        if frequencies is not None:
            tables.append(("frequencies.txt", frequencies))
        for name, df in tables:
            cols, data = rows_of(df)
            buf = io.StringIO()
            wr = csv.writer(buf, lineterminator="\n")
            wr.writerow(cols)
            wr.writerows(data)
            zf.writestr(name, buf.getvalue())
        for name, recs in (("agency.txt", agency), ("calendar.txt", calendar)):
            buf = io.StringIO()
            wr = csv.DictWriter(buf, fieldnames=list(recs[0]), lineterminator="\n")
            wr.writeheader()
            wr.writerows(recs)
            zf.writestr(name, buf.getvalue())
    return out_path
