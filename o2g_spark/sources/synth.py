"""Deterministic synthetic fixtures (FIXTURES.md §A; seed=42).

Everything is a pure function of (seed, size): identical bytes on every
run, machine, and parallelism level — required because the correctness
gate compares digests across runs and the byte-identical-text invariant
(BASELINE.json input_hint) is checked end-to-end.

Generated tables
----------------
- ``pages(url, warc_ts, html, text, lang)`` — the north-rule input;
  30% of rows embed a coordinate literal, 30% a gazetteer place mention,
  10% both, 30% no geo signal. ~5% of urls are duplicated with a later
  ``warc_ts`` (dedup-keep-latest tests). Coordinates are skewed: 50% in
  3 "hot city" disks (salting / adaptive-split tests), 40% uniform, 10%
  edge cases on zone/cell boundaries.
- ``zones(zone_id, name, ring, holes)`` — polygon mix per FIXTURES.md A2.
- ``gazetteer(place, lat, lon)`` — 200 invented place names.
- parity fixtures (``parity_stops`` / ``parity_routes`` /
  ``parity_zones``) mirroring o2g's GTFS stop/route fixtures as spatial
  tables (SURVEY.md §2.C).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

LANGS = np.array(["en", "de", "fr", "es", "zh"])
LANG_W = np.array([0.4, 0.2, 0.15, 0.15, 0.1])

# Hot-city disk centers (inside the uniform lon∈[-30,30], lat∈[-30,60] box)
HOT_CITIES = [(13.40, 52.52), (2.35, 48.85), (-3.70, 40.42)]
HOT_RADIUS = 0.05

BASE_TS = np.datetime64("2024-01-01T00:00:00")


def gen_gazetteer(n: int = 200, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 1)
    lat = np.round(rng.uniform(-28.0, 58.0, n), 4)
    lon = np.round(rng.uniform(-28.0, 28.0, n), 4)
    # push some places into the hot cities so place-mentions also skew
    k = n // 5
    for i, (clon, clat) in enumerate(HOT_CITIES):
        s = slice(i * k // 3, (i + 1) * k // 3)
        lat[s] = np.round(clat + rng.uniform(-HOT_RADIUS, HOT_RADIUS, lat[s].size), 4)
        lon[s] = np.round(clon + rng.uniform(-HOT_RADIUS, HOT_RADIUS, lon[s].size), 4)
    return pd.DataFrame(
        {"place": [f"Altstadt{i:03d}" for i in range(n)], "lat": lat, "lon": lon}
    )


def _gen_points(n: int, rng: np.random.Generator):
    """Skewed coordinate sample: 50% hot disks, 40% uniform, 10% edges."""
    kind = rng.choice(3, n, p=[0.5, 0.4, 0.1])
    lat = np.empty(n)
    lon = np.empty(n)
    hot = kind == 0
    city = rng.integers(0, len(HOT_CITIES), hot.sum())
    centers = np.array(HOT_CITIES)  # (3, 2) lon, lat
    lon[hot] = centers[city, 0] + rng.uniform(-HOT_RADIUS, HOT_RADIUS, hot.sum())
    lat[hot] = centers[city, 1] + rng.uniform(-HOT_RADIUS, HOT_RADIUS, hot.sum())
    uni = kind == 1
    lon[uni] = rng.uniform(-30, 30, uni.sum())
    lat[uni] = rng.uniform(-30, 60, uni.sum())
    edge = kind == 2
    # boundary-ish points: on integer lattice lines used by zone rects
    lon[edge] = rng.integers(-30, 31, edge.sum()).astype(float)
    lat[edge] = rng.integers(-30, 61, edge.sum()).astype(float)
    return np.round(lat, 4), np.round(lon, 4)


def gen_pages(n: int = 1000, seed: int = 42, gazetteer: pd.DataFrame | None = None):
    """Return ``(pages, truth)`` pandas frames.

    ``truth`` has one row per *expected geotag extraction*:
    ``(url, lat, lon, geo_source, mention)`` — the oracle for B2.
    """
    rng = np.random.default_rng(seed)
    gaz = gazetteer if gazetteer is not None else gen_gazetteer(seed=seed)

    langs = rng.choice(len(LANGS), n, p=LANG_W)
    kind = rng.choice(4, n, p=[0.3, 0.3, 0.1, 0.3])  # coord, place, both, none
    lat, lon = _gen_points(n, rng)
    place_idx = rng.integers(0, len(gaz), n)

    filler = np.array(
        [
            "The quick brown fox jumps over the lazy dog.",
            "Weather updates and local news every morning.",
            "Subscribe to our newsletter for more stories.",
            "Archived from the original on 2019-05-14.",
            "All rights reserved worldwide by the publisher.",
        ]
    )
    fill = filler[rng.integers(0, len(filler), n)]

    urls = np.array(
        [f"https://site{i % 257}.example/{LANGS[langs[i]]}/p{i}" for i in range(n)]
    )
    texts = []
    truth_rows = []
    gp = gaz["place"].to_numpy()
    gla = gaz["lat"].to_numpy()
    glo = gaz["lon"].to_numpy()
    for i in range(n):
        parts = [fill[i]]
        if kind[i] in (0, 2):
            parts.append(f"Coordinates: {lat[i]:.4f}, {lon[i]:.4f} (map).")
            truth_rows.append((urls[i], lat[i], lon[i], "coord", f"{lat[i]:.4f}, {lon[i]:.4f}"))
        if kind[i] in (1, 2):
            j = place_idx[i]
            parts.append(f"Our bureau in {gp[j]} covers the region.")
            truth_rows.append((urls[i], gla[j], glo[j], "place", gp[j]))
        parts.append(f"Story id {i}.")
        texts.append(" ".join(parts))

    ts = BASE_TS + (rng.integers(0, 365 * 24 * 3600, n)).astype("timedelta64[s]")
    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts.astype("datetime64[us]"),
            "html": [f"<html><body>{t}</body></html>".encode() for t in texts],
            "text": texts,
            "lang": LANGS[langs],
        }
    )

    # ~5% recrawls: duplicate url with strictly later warc_ts, same text
    n_dup = max(1, n // 20) if n >= 20 else 0
    if n_dup:
        dup_i = rng.choice(n, n_dup, replace=False)
        dup = pages.iloc[dup_i].copy()
        dup["warc_ts"] = dup["warc_ts"] + pd.to_timedelta(
            rng.integers(1, 30 * 24 * 3600, n_dup), unit="s"
        )
        pages = pd.concat([pages, dup], ignore_index=True)
        # truth is keyed per-url; recrawled urls share the same extractions

    truth = pd.DataFrame(
        truth_rows, columns=["url", "lat", "lon", "geo_source", "mention"]
    )
    return pages, truth


def _rect(lon0, lat0, lon1, lat1):
    return [
        (lon0, lat0), (lon1, lat0), (lon1, lat1), (lon0, lat1), (lon0, lat0),
    ]


def _rot_rect(clon, clat, w, h, deg):
    t = np.deg2rad(deg)
    c, s = np.cos(t), np.sin(t)
    pts = [(-w / 2, -h / 2), (w / 2, -h / 2), (w / 2, h / 2), (-w / 2, h / 2)]
    ring = [(clon + x * c - y * s, clat + x * s + y * c) for x, y in pts]
    return ring + ring[:1]


def _star(clon, clat, r_out, r_in, n=5):
    ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    rad = np.where(np.arange(2 * n) % 2 == 0, r_out, r_in)
    ring = [(clon + r * np.cos(a), clat + r * np.sin(a)) for r, a in zip(rad, ang)]
    return ring + ring[:1]


def gen_zones(seed: int = 42) -> pd.DataFrame:
    """~50 polygons covering the FIXTURES.md A2 shape mix."""
    rng = np.random.default_rng(seed + 2)
    zones = []

    # 1) cell-aligned / integer-lattice rectangles (DuckDB BETWEEN oracle)
    for i in range(15):
        lon0 = float(rng.integers(-30, 20))
        lat0 = float(rng.integers(-30, 50))
        w = float(rng.integers(2, 9))
        h = float(rng.integers(2, 9))
        zones.append((_rect(lon0, lat0, lon0 + w, lat0 + h), []))

    # 2) rotated rectangles
    for i in range(10):
        zones.append(
            (
                _rot_rect(
                    float(rng.uniform(-25, 25)), float(rng.uniform(-25, 55)),
                    float(rng.uniform(2, 8)), float(rng.uniform(2, 8)),
                    float(rng.uniform(5, 85)),
                ),
                [],
            )
        )

    # 3) convex polygons (random hulls around a center)
    for i in range(10):
        clon, clat = float(rng.uniform(-25, 25)), float(rng.uniform(-25, 55))
        k = int(rng.integers(5, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(1.5, 5.0, k)
        ring = [(clon + r * np.cos(a), clat + r * np.sin(a)) for r, a in zip(rad, ang)]
        zones.append((ring + ring[:1], []))

    # 4) concave stars (>=3)
    for i in range(5):
        zones.append(
            (
                _star(
                    float(rng.uniform(-20, 20)), float(rng.uniform(-20, 50)),
                    float(rng.uniform(3, 7)), float(rng.uniform(1, 2.5)),
                ),
                [],
            )
        )

    # 5) polygons with holes (>=2)
    for i in range(3):
        lon0 = float(rng.uniform(-25, 15))
        lat0 = float(rng.uniform(-25, 45))
        outer = _rect(lon0, lat0, lon0 + 10, lat0 + 10)
        hole = _rect(lon0 + 3, lat0 + 3, lon0 + 6, lat0 + 6)
        zones.append((outer, [hole]))

    # 6) hot-city zones (skew inside PIP) — one disk-bounding box per city,
    #    the first two deliberately overlapping (multi-zone membership).
    for j, (clon, clat) in enumerate(HOT_CITIES):
        d = 0.08 + 0.04 * j
        zones.append((_rect(clon - d, clat - d, clon + d, clat + d), []))
        if j < 2:
            zones.append((_rect(clon - 0.06, clat - 0.06, clon + 0.10, clat + 0.10), []))

    rows = []
    for zid, (ring, holes) in enumerate(zones):
        rows.append(
            {
                "zone_id": zid,
                "name": f"zone{zid}",
                "ring": [{"lon": float(x), "lat": float(y)} for x, y in ring],
                "holes": [
                    [{"lon": float(x), "lat": float(y)} for x, y in h] for h in holes
                ],
            }
        )
    return pd.DataFrame(rows)


def zone_rings(zones_pdf: pd.DataFrame) -> dict[int, list[np.ndarray]]:
    """zones frame → {zone_id: [outer_ring, hole, ...]} numpy rings."""
    out = {}
    for r in zones_pdf.itertuples():
        rings = [np.array([(p["lon"], p["lat"]) for p in r.ring])]
        for h in r.holes:
            rings.append(np.array([(p["lon"], p["lat"]) for p in h]))
        out[int(r.zone_id)] = rings
    return out


# ---------------------------------------------------------------- parity (§2.C)

def gen_parity(seed: int = 42):
    """o2g GTFS stop/route fixtures re-expressed spatially (SURVEY.md §2.C).

    Mirrors the reference's test semantics [o2g-PK:tests/]: stop nodes
    with tag filters, route relations with ordered members including one
    dangling ref, two stops shared between routes — re-expressed so that
    "members of route R resolvable against stops" ≡ "points inside
    parity zone R" with exactly equal row counts.
    """
    rng = np.random.default_rng(seed + 3)
    n_stops = 40
    # Stops laid out on 3 disjoint horizontal strips, one per route.
    rows = []
    for sid in range(n_stops):
        route_band = sid % 3
        lat = 5.0 * route_band + rng.uniform(0.5, 4.5)
        lon = rng.uniform(0.5, 19.5)
        is_stop = sid % 10 != 9  # every 10th node is NOT a stop (tag filter)
        tags = (
            {"public_transport": "stop_position", "name": f"stop{sid}"}
            if is_stop
            else {"amenity": "bench"}
        )
        rows.append(
            {"stop_id": sid, "lat": round(lat, 4), "lon": round(lon, 4), "tags": tags}
        )
    stops = pd.DataFrame(rows)

    routes = []
    for rid in range(3):
        member_ids = [sid for sid in range(n_stops) if sid % 3 == rid and sid % 10 != 9]
        members = [{"ref": int(s), "role": "stop"} for s in member_ids]
        members.append({"ref": 999, "role": "stop"})  # dangling ref (A7)
        routes.append(
            {
                "route_id": rid,
                "route_type": ["bus", "tram", "rail"][rid],
                "members": members,
            }
        )
    # shared stops: stop 0 and 1 also served by route 2
    routes[2]["members"] = (
        [{"ref": 0, "role": "stop"}, {"ref": 1, "role": "stop"}]
        + routes[2]["members"]
    )
    routes_pdf = pd.DataFrame(routes)

    # parity zone r = band strip covering route r's stops exactly
    zones = []
    for rid in range(3):
        zones.append(
            {
                "zone_id": rid,
                "name": f"route_area{rid}",
                "ring": [
                    {"lon": float(x), "lat": float(y)}
                    for x, y in _rect(0.0, 5.0 * rid, 20.0, 5.0 * rid + 5.0)
                ],
                "holes": [],
            }
        )
    return stops, routes_pdf, pd.DataFrame(zones)
