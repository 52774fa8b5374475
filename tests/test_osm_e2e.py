"""Reference end-to-end parity: .osm XML → GTFS zip, via library AND
HTTP service (SURVEY.md §2.A A1, A2, A14 + §3.1 lifecycle)."""

import io
import json
import urllib.request
import zipfile

import pytest

from o2g_spark import service
from o2g_spark.sources import osm_xml, overpass

OSM_FIXTURE = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1" lat="52.5200" lon="13.4050">
    <tag k="public_transport" v="stop_position"/>
    <tag k="name" v="Alexanderplatz"/>
  </node>
  <node id="2" lat="52.5230" lon="13.4110">
    <tag k="public_transport" v="stop_position"/>
    <tag k="name" v="Rosa-Luxemburg-Platz"/>
  </node>
  <node id="3" lat="52.5280" lon="13.4170">
    <tag k="highway" v="bus_stop"/>
    <tag k="name" v="Torstrasse"/>
  </node>
  <node id="4" lat="52.5300" lon="13.4000"/>
  <node id="5" lat="52.5310" lon="13.4210">
    <tag k="railway" v="station"/>
    <tag k="name" v="Nordbahnhof"/>
  </node>
  <way id="100">
    <nd ref="1"/><nd ref="2"/><nd ref="3"/>
    <tag k="highway" v="primary"/>
  </way>
  <relation id="200">
    <member type="node" ref="1" role="stop"/>
    <member type="node" ref="2" role="stop"/>
    <member type="node" ref="3" role="stop"/>
    <member type="node" ref="999" role="stop"/>
    <member type="way" ref="100" role=""/>
    <tag k="type" v="route"/>
    <tag k="route" v="bus"/>
    <tag k="name" v="Bus 100"/>
  </relation>
  <relation id="201">
    <member type="node" ref="2" role="stop"/>
    <member type="node" ref="5" role="stop"/>
    <tag k="type" v="route"/>
    <tag k="route" v="tram"/>
  </relation>
  <relation id="202">
    <member type="node" ref="4" role="stop"/>
    <tag k="type" v="multipolygon"/>
  </relation>
</osm>
"""


@pytest.fixture(scope="module")
def osm_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("osm") / "fixture.osm"
    p.write_text(OSM_FIXTURE)
    return str(p)


def test_parse_osm_entities(spark, osm_path):
    nodes, ways, rels = osm_xml.parse_osm(spark, osm_path)
    assert nodes.count() == 5 and ways.count() == 1 and rels.count() == 3
    n1 = nodes.filter("id = 1").first()
    assert n1.tags["public_transport"] == "stop_position"
    w = ways.first()
    assert list(w.nd) == [1, 2, 3]  # order preserved
    r = rels.filter("id = 200").first()
    assert [m.ref for m in r.members] == [1, 2, 3, 999, 100]


def test_osm_route_filter(spark, osm_path):
    nodes, _w, rels = osm_xml.parse_osm(spark, osm_path)
    _stops, routes = osm_xml.osm_to_gtfs_inputs(nodes, rels)
    got = {r.route_id: r.route_type for r in routes.collect()}
    assert got == {200: "bus", 201: "tram"}  # multipolygon 202 filtered out
    # way members dropped from route members (node refs only)
    r200 = routes.filter("route_id = 200").first()
    assert [m.ref for m in r200.members] == [1, 2, 3, 999]


def test_osm_to_gtfs_zip(spark, osm_path, tmp_path):
    out = str(tmp_path / "feed.zip")
    service.build_gtfs_zip_from_osm(spark, osm_path, out)
    zf = zipfile.ZipFile(out)
    stops = zf.read("stops.txt").decode().strip().splitlines()
    assert len(stops) - 1 == 4  # nodes 1,2,3,5 (4 untagged, 999 dangling)
    routes = zf.read("routes.txt").decode().strip().splitlines()
    assert len(routes) - 1 == 2
    st = zf.read("stop_times.txt").decode().strip().splitlines()
    # frequency-based feed: ONE template trip per route (route 200: 3
    # resolvable stops, route 201: 2) + a frequencies row expanding it
    # — not explicit sibling trips (that would double-declare service)
    assert len(st) - 1 == 3 + 2
    freq = zf.read("frequencies.txt").decode().strip().splitlines()
    assert len(freq) - 1 == 2  # one row per route's template trip
    trips = zf.read("trips.txt").decode().strip().splitlines()
    assert len(trips) - 1 == 2


def test_http_service_roundtrip(spark, osm_path):
    srv = service.serve(spark, port=0)
    port = srv.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/gtfs?osm={osm_path}"
        ) as r:
            assert r.headers["Content-Type"] == "application/zip"
            zf = zipfile.ZipFile(io.BytesIO(r.read()))
            assert "stops.txt" in zf.namelist()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/gtfs") as r:
            pass
    except urllib.error.HTTPError as ex:
        assert ex.code == 400  # missing params → clean error
    finally:
        srv.shutdown()


def test_overpass_query_builder():
    q = overpass.build_area_query("Berlin")
    assert '"name"="Berlin"' in q and '"type"="route"' in q and "out body;" in q
    qb = overpass.build_bbox_query(52.3, 13.0, 52.7, 13.8)
    assert "52.3,13.0,52.7,13.8" in qb
    with pytest.raises(ConnectionError):
        overpass.fetch(q, timeout_s=2)  # offline sandbox
