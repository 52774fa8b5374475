"""HTTP service entry point (reference parity: SURVEY.md §2.A A14
[o2g-PK:o2g web module] — o2g exposes `GET /gtfs?...` returning the
generated GTFS zip).

Stdlib-only (no web framework in this environment). One SparkSession
serves all requests; each request runs the osm→gtfs pipeline:

    GET /health              → {"status": "ok"}
    GET /gtfs?osm=<path>     → application/zip (the GTFS feed)
    GET /gtfs?area=<name>    → Overpass fetch → pipeline (needs network)

Production traffic would run the pipeline as spark-submit jobs; this
endpoint exists for API-surface parity with the reference (small
region extracts, interactive use).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from .operators import gtfs
from .sources import osm_xml, overpass


def build_gtfs_zip_from_osm(spark: SparkSession, osm_path: str, out_zip: str) -> str:
    """The full reference pipeline: parse → filter → resolve → dummy
    schedule → zip (A1 + A3-A12)."""
    nodes, _ways, relations = osm_xml.parse_osm(spark, osm_path)
    stops_in, routes_in = osm_xml.osm_to_gtfs_inputs(nodes, relations)
    stops = gtfs.filter_stops(stops_in)
    resolved = gtfs.resolve_members(routes_in, stops)
    trips, stop_times = gtfs.dummy_schedule(resolved)
    # frequency-based feed: template trips + frequencies rows (a GTFS
    # service is declared via trips OR frequencies, never both)
    t0, st0, freq = gtfs.frequencies_feed(trips, stop_times)
    return gtfs.write_gtfs_zip(
        out_zip,
        gtfs.build_stops(resolved),
        gtfs.build_routes(routes_in),
        t0,
        st0,
        frequencies=freq,
    )


class _Handler(BaseHTTPRequestHandler):
    spark: SparkSession = None  # set by serve()

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        url = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(url.query)
        if url.path == "/health":
            self._send(200, json.dumps({"status": "ok"}).encode(), "application/json")
            return
        if url.path != "/gtfs":
            self._send(404, b'{"error": "not found"}', "application/json")
            return
        try:
            if "osm" in q:
                osm_path = q["osm"][0]
                if not os.path.exists(osm_path):
                    raise FileNotFoundError(osm_path)
            elif "area" in q:
                xml = overpass.fetch(overpass.build_area_query(q["area"][0]))
                tmp = tempfile.NamedTemporaryFile(suffix=".osm", delete=False)
                tmp.write(xml)
                tmp.close()
                osm_path = tmp.name
            else:
                self._send(400, b'{"error": "need ?osm=<path> or ?area=<name>"}',
                           "application/json")
                return
            out = tempfile.NamedTemporaryFile(suffix=".zip", delete=False).name
            build_gtfs_zip_from_osm(self.spark, osm_path, out)
            with open(out, "rb") as f:
                self._send(200, f.read(), "application/zip")
        except Exception as ex:  # noqa: BLE001 — service boundary
            self._send(500, json.dumps({"error": str(ex)}).encode(), "application/json")


def serve(spark: SparkSession, port: int = 0) -> ThreadingHTTPServer:
    """Start the service on a daemon thread; returns the server (its
    .server_address[1] is the bound port; .shutdown() stops it)."""
    handler = type("BoundHandler", (_Handler,), {"spark": spark})
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
