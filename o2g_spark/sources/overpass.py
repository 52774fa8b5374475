"""Overpass API connector (reference parity: SURVEY.md §2.A A2
[o2g-PK:o2g osm/overpass] — o2g builds an Overpass QL query for an
area/relation and downloads the extract over HTTP).

The QL construction — the testable logic — is pure; the HTTP fetch is
gated behind a network probe (this environment is offline, SURVEY.md
§8). Conceptually this is the engine's source-side predicate pushdown:
the area constraint prunes at the SOURCE, exactly like cell-range
partition pruning does on the Iceberg/parquet side (§2.A A2 mapping).
"""

from __future__ import annotations

DEFAULT_ENDPOINT = "https://overpass-api.de/api/interpreter"

ROUTE_TYPES = ("bus", "trolleybus", "tram", "train", "subway", "light_rail", "ferry")


def build_area_query(area_name: str, timeout_s: int = 180) -> str:
    """Overpass QL fetching all route relations + their members for a
    named administrative area (the reference's --area path)."""
    routes = "|".join(ROUTE_TYPES)
    return (
        f"[out:xml][timeout:{timeout_s}];\n"
        f'area["name"="{area_name}"]->.a;\n'
        f'(relation(area.a)["type"="route"]["route"~"^({routes})$"];);\n'
        "(._;>;);\n"
        "out body;"
    )


def build_bbox_query(
    lat_min: float, lon_min: float, lat_max: float, lon_max: float,
    timeout_s: int = 180,
) -> str:
    """Overpass QL for a bounding box (source-side spatial pushdown)."""
    routes = "|".join(ROUTE_TYPES)
    bbox = f"{lat_min},{lon_min},{lat_max},{lon_max}"
    return (
        f"[out:xml][timeout:{timeout_s}];\n"
        f'(relation({bbox})["type"="route"]["route"~"^({routes})$"];);\n'
        "(._;>;);\n"
        "out body;"
    )


def fetch(query: str, endpoint: str = DEFAULT_ENDPOINT, timeout_s: int = 300) -> bytes:
    """POST the QL query, return the .osm XML bytes. Raises a clear
    error offline (no network in this environment)."""
    import urllib.error
    import urllib.request

    try:
        req = urllib.request.Request(
            endpoint, data=query.encode(), headers={"User-Agent": "o2g_spark"}
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.read()
    except (urllib.error.URLError, OSError) as ex:
        raise ConnectionError(
            f"Overpass fetch needs network access (offline sandbox): {ex}"
        ) from ex
