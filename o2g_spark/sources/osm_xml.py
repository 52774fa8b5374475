"""OSM XML source (reference parity: SURVEY.md §2.A A1 [o2g-PK:o2g/osm
parser] — o2g stream-parses .osm files into node/way/relation entities).

Here the stream parse (stdlib ``xml.etree.iterparse``, element cleared
as consumed — bounded memory like the reference's SAX approach) feeds
three DataFrames with the OSM entity schemas from SURVEY.md §1.1:

    nodes(id, lat, lon, tags map)
    ways(id, nd array<long>, tags map)            (nd order-significant)
    relations(id, members array<struct<type,ref,role>>, tags map)

OSM region extracts are driver-ingestible by definition (o2g's own
unit of work is one region file); planet-scale OSM arrives as PBF via
dedicated connectors, out of scope offline. The DataFrames themselves
are fully distributed from there on.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NODES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
)
WAYS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("nd", T.ArrayType(T.LongType()), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
)
RELATIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField(
            "members",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType(), False),
                        T.StructField("ref", T.LongType(), False),
                        T.StructField("role", T.StringType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
)


def parse_osm(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """path to an .osm XML extract → (nodes, ways, relations)."""
    nodes, ways, rels = [], [], []
    tags: dict[str, str] = {}
    nd: list[int] = []
    members: list[tuple[str, int, str]] = []

    for event, el in ET.iterparse(path, events=("start", "end")):
        if event == "start":
            if el.tag in ("node", "way", "relation"):
                tags, nd, members = {}, [], []
            continue
        if el.tag == "tag":
            tags[el.get("k", "")] = el.get("v", "")
        elif el.tag == "nd":
            nd.append(int(el.get("ref")))
        elif el.tag == "member":
            members.append(
                (el.get("type", ""), int(el.get("ref")), el.get("role", ""))
            )
        elif el.tag == "node":
            nodes.append(
                (int(el.get("id")), float(el.get("lat")), float(el.get("lon")), tags)
            )
            el.clear()
        elif el.tag == "way":
            ways.append((int(el.get("id")), nd, tags))
            el.clear()
        elif el.tag == "relation":
            rels.append((int(el.get("id")), members, tags))
            el.clear()

    return (
        spark.createDataFrame(nodes, NODES_SCHEMA),
        spark.createDataFrame(ways, WAYS_SCHEMA),
        spark.createDataFrame(rels, RELATIONS_SCHEMA),
    )


def osm_to_gtfs_inputs(
    nodes: DataFrame, relations: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """OSM entity frames → the (stops, routes) shapes operators.gtfs
    consumes: the reference's A3 route-relation filter + A4 route_type
    projection, as pure Catalyst expressions."""
    from pyspark.sql import functions as F

    stops = nodes.select(
        F.col("id").alias("stop_id"), "lat", "lon", "tags"
    )
    routes = (
        relations.filter(
            (F.element_at("tags", "type") == "route")
            & F.element_at("tags", "route").isin(
                "bus", "trolleybus", "tram", "train", "subway", "light_rail", "ferry"
            )
        )
        .select(
            F.col("id").alias("route_id"),
            F.element_at("tags", "route").alias("route_type"),
            F.expr(
                "transform(filter(members, m -> m.type = 'node'),"
                " m -> struct(m.ref AS ref, m.role AS role))"
            ).alias("members"),
        )
    )
    return stops, routes
