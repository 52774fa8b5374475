"""Vectorized planar geometry: ray-cast PIP, polygon cell covers, haversine.

Pure numpy — these kernels run (a) driver-side to precompute zone cell
covers before broadcast, and (b) inside Arrow pandas UDFs to refine
boundary-cell candidates (BASELINE.json: "ray-casting with
prepared-geometry cell covers").

Conventions
-----------
- A *ring* is an (m, 2) float64 array of ``(lon, lat)`` vertices. Rings
  may be given open or closed (first == last); both are handled.
- A *polygon* is ``[outer_ring, hole_ring, ...]``. Point-in-polygon uses
  the even-odd rule, so holes are just additional rings XORed in.
- Boundary points follow the standard half-open even-odd convention
  (``(yi > y) != (yj > y)`` with strict ``x <`` test): deterministic,
  partition-invariant, and identical between the Spark path and the
  pandas oracle used in tests.
"""

from __future__ import annotations

import numpy as np

from . import cells


def _close_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if ring.ndim != 2 or ring.shape[1] != 2:
        raise ValueError("ring must be (m, 2) of (lon, lat)")
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def points_in_ring(lon, lat, ring) -> np.ndarray:
    """Even-odd ray cast of points against one ring. Returns bool (n,).

    Broadcasts points × edges: fine for Arrow-batch-sized n and
    fixture-sized rings (n·m booleans).
    """
    ring = _close_ring(ring)
    x = np.asarray(lon, dtype=np.float64)[:, None]
    y = np.asarray(lat, dtype=np.float64)[:, None]
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    straddle = (y0 > y) != (y1 > y)
    # Intercept only where straddling (avoid div-by-zero on horizontal edges)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    crossing = straddle & (x < xint)
    return (crossing.sum(axis=1) % 2).astype(bool)


def points_in_polygon(lon, lat, rings) -> np.ndarray:
    """Even-odd over all rings (outer XOR holes). Returns bool (n,)."""
    inside = np.zeros(len(np.atleast_1d(lon)), dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(lon, lat, ring)
    return inside


def _edges(rings) -> np.ndarray:
    """All edges of all rings as (E, 4): x0, y0, x1, y1."""
    segs = []
    for ring in rings:
        r = _close_ring(ring)
        segs.append(np.hstack([r[:-1], r[1:]]))
    return np.vstack(segs)


def polygon_cover(rings, res: int):
    """Prepared-geometry cell cover of a polygon at resolution ``res``.

    Returns ``(interior_cells, boundary_cells)`` int64 arrays:

    - *interior*: cells proven fully inside → PIP accepts by equi-join
      alone, no ray-cast needed;
    - *boundary*: cells the polygon boundary may pass through → PIP
      candidates that an exact ray-cast must refine.

    The classification is conservative in both directions and therefore
    exact end-to-end: a cell is *interior* only if all 4 corners are
    inside AND no edge's bbox overlaps the cell; it is *excluded* only if
    all 4 corners are outside AND no edge's bbox overlaps it (the
    boundary cannot enter a cell without an edge bbox touching it).
    Everything else is *boundary*.
    """
    edges = _edges(rings)
    dlon, dlat = cells.cell_size_deg(res)
    n = 1 << res

    lon_min = max(edges[:, [0, 2]].min(), -180.0)
    lon_max = min(edges[:, [0, 2]].max(), 180.0)
    lat_min = max(edges[:, [1, 3]].min(), -90.0)
    lat_max = min(edges[:, [1, 3]].max(), 90.0)

    ix0 = max(0, int(np.floor((lon_min + 180.0) / dlon)))
    ix1 = min(n - 1, int(np.floor((lon_max + 180.0) / dlon)))
    iy0 = max(0, int(np.floor((lat_min + 90.0) / dlat)))
    iy1 = min(n - 1, int(np.floor((lat_max + 90.0) / dlat)))
    nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
    if nx <= 0 or ny <= 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    # Corner grid: (nx+1) x (ny+1) lattice points; ray-cast each once.
    cx = (np.arange(ix0, ix1 + 2, dtype=np.float64)) * dlon - 180.0
    cy = (np.arange(iy0, iy1 + 2, dtype=np.float64)) * dlat - 90.0
    gx, gy = np.meshgrid(cx, cy, indexing="ij")  # (nx+1, ny+1)
    corner_in = points_in_polygon(gx.ravel(), gy.ravel(), rings).reshape(gx.shape)

    all_in = (
        corner_in[:-1, :-1] & corner_in[1:, :-1]
        & corner_in[:-1, 1:] & corner_in[1:, 1:]
    )  # (nx, ny)
    any_in = (
        corner_in[:-1, :-1] | corner_in[1:, :-1]
        | corner_in[:-1, 1:] | corner_in[1:, 1:]
    )

    # Mark cells whose rect overlaps any edge's bbox (conservative).
    near_edge = np.zeros((nx, ny), dtype=bool)
    ex0 = np.minimum(edges[:, 0], edges[:, 2])
    ex1 = np.maximum(edges[:, 0], edges[:, 2])
    ey0 = np.minimum(edges[:, 1], edges[:, 3])
    ey1 = np.maximum(edges[:, 1], edges[:, 3])
    bx0 = np.clip(np.floor((ex0 + 180.0) / dlon).astype(np.int64) - ix0, 0, nx - 1)
    bx1 = np.clip(np.floor((ex1 + 180.0) / dlon).astype(np.int64) - ix0, 0, nx - 1)
    by0 = np.clip(np.floor((ey0 + 90.0) / dlat).astype(np.int64) - iy0, 0, ny - 1)
    by1 = np.clip(np.floor((ey1 + 90.0) / dlat).astype(np.int64) - iy0, 0, ny - 1)
    for i in range(len(edges)):
        near_edge[bx0[i]:bx1[i] + 1, by0[i]:by1[i] + 1] = True

    interior_mask = all_in & ~near_edge
    boundary_mask = (near_edge | (any_in & ~all_in)) | (all_in & near_edge)

    def to_cells(mask):
        xs, ys = np.nonzero(mask)
        return cells.ixiy_to_cell(xs + ix0, ys + iy0, res)

    return to_cells(interior_mask), to_cells(boundary_mask)


def classify_cells(cell_ids: np.ndarray, rings) -> tuple[np.ndarray, np.ndarray]:
    """Classify arbitrary cells against a polygon: (interior_mask,
    boundary_mask); cells in neither mask are provably outside.

    Same conservative logic as :func:`polygon_cover` (4-corner ray cast
    + edge-bbox overlap), vectorized over a flat cell list so it works
    on mixed/refined levels.
    """
    if len(cell_ids) == 0:
        z = np.zeros(0, dtype=bool)
        return z, z
    edges = _edges(rings)
    lon_min, lat_min, lon_max, lat_max = cells.cell_bounds(cell_ids)

    corners_lon = np.stack([lon_min, lon_max, lon_min, lon_max])  # (4, n)
    corners_lat = np.stack([lat_min, lat_min, lat_max, lat_max])
    inside = points_in_polygon(
        corners_lon.ravel(), corners_lat.ravel(), rings
    ).reshape(4, -1)
    all_in = inside.all(axis=0)
    any_in = inside.any(axis=0)

    ex0 = np.minimum(edges[:, 0], edges[:, 2])[None, :]
    ex1 = np.maximum(edges[:, 0], edges[:, 2])[None, :]
    ey0 = np.minimum(edges[:, 1], edges[:, 3])[None, :]
    ey1 = np.maximum(edges[:, 1], edges[:, 3])[None, :]
    near_edge = (
        (lon_min[:, None] <= ex1)
        & (lon_max[:, None] >= ex0)
        & (lat_min[:, None] <= ey1)
        & (lat_max[:, None] >= ey0)
    ).any(axis=1)

    interior = all_in & ~near_edge
    boundary = near_edge | (any_in & ~all_in)
    return interior, boundary


def polygon_cover_adaptive(
    rings, base_res: int, max_res: int, boundary_budget: int = 2048
):
    """Hierarchical prepared cover: interior cells at MIXED resolutions
    (coarse where the polygon is fat, finer toward the boundary) plus a
    thin boundary band at ``max_res``.

    This is what keeps the exact-refine sliver small: the fraction of
    points needing a ray cast scales with the boundary band's area,
    which shrinks 2× per extra resolution level, while broadcast cover
    size only grows with the perimeter (not the area).

    Returns ``(interior_cells, boundary_cells)`` int64 arrays; interior
    ids carry their own resolution in the id (cells.MAX_RES layout), so
    a single equi-join against per-res point encodings stays exact.
    """
    if not base_res <= max_res:
        raise ValueError("need base_res <= max_res")
    interior0, boundary = polygon_cover(rings, base_res)
    interior_parts = [interior0]
    for _res in range(base_res, max_res):
        if len(boundary) == 0 or 4 * len(boundary) > boundary_budget:
            # budget rule: each zone refines to ITS OWN natural depth —
            # a city-block zone goes deep (its boundary stays tiny), a
            # continent-scale zone stops coarse (its perimeter would
            # blow the broadcast). Boundary band area ≈ perimeter ×
            # cell_height keeps halving until the budget caps it.
            break
        kids = cells.children(boundary).ravel()
        im, bm = classify_cells(kids, rings)
        interior_parts.append(kids[im])
        boundary = kids[bm]
    interior = np.concatenate(interior_parts) if interior_parts else np.empty(0, np.int64)
    return interior.astype(np.int64), boundary.astype(np.int64)


MERCATOR_LAT_MAX = 85.05112878


def lonlat_to_tilef(lon, lat, zoom: int):
    """Continuous Web-Mercator tile coordinates (tx, ty) at ``zoom``.

    Matches o2g_spark.functions.geo.tile_x/tile_y before the floor.
    """
    n = 1 << zoom
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERCATOR_LAT_MAX, MERCATOR_LAT_MAX)
    tx = (lon + 180.0) / 360.0 * n
    ty = (1.0 - np.arcsinh(np.tan(np.radians(lat))) / np.pi) / 2.0 * n
    return tx, ty


def tilef_to_lonlat(tx, ty, zoom: int):
    """Inverse of :func:`lonlat_to_tilef` (continuous coords → lon/lat)."""
    n = 1 << zoom
    lon = np.asarray(tx, dtype=np.float64) / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * np.asarray(ty, dtype=np.float64) / n))))
    return lon, lat


def tile_cover(rings, zoom: int):
    """Prepared cover of a polygon in the Web-Mercator tile grid.

    Returns ``(interior, boundary)`` as int64 arrays of packed tile keys
    ``(zoom << 58) | (x << 29) | y`` (same layout as
    ``o2g_spark.functions.geo.tile_id``).

    Correctness argument mirrors :func:`polygon_cover`: tx depends only
    on lon and ty only on lat, both monotone, so a straight lon/lat edge
    maps to a monotone curve contained in the tile-space bbox of its
    endpoints — a tile the boundary enters always overlaps some edge
    bbox. Corner insidedness is tested exactly in lon/lat space.
    """
    n = 1 << zoom
    edges = _edges(rings)
    ex0, ey0 = lonlat_to_tilef(edges[:, 0], edges[:, 1], zoom)
    ex1, ey1 = lonlat_to_tilef(edges[:, 2], edges[:, 3], zoom)
    bx0f = np.minimum(ex0, ex1)
    bx1f = np.maximum(ex0, ex1)
    by0f = np.minimum(ey0, ey1)
    by1f = np.maximum(ey0, ey1)

    ix0 = max(0, int(np.floor(bx0f.min())))
    ix1 = min(n - 1, int(np.floor(bx1f.max())))
    iy0 = max(0, int(np.floor(by0f.min())))
    iy1 = min(n - 1, int(np.floor(by1f.max())))
    nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
    if nx <= 0 or ny <= 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    cx = np.arange(ix0, ix1 + 2, dtype=np.float64)
    cy = np.arange(iy0, iy1 + 2, dtype=np.float64)
    gx, gy = np.meshgrid(cx, cy, indexing="ij")
    glon, glat = tilef_to_lonlat(gx.ravel(), gy.ravel(), zoom)
    corner_in = points_in_polygon(glon, glat, rings).reshape(gx.shape)

    all_in = (
        corner_in[:-1, :-1] & corner_in[1:, :-1]
        & corner_in[:-1, 1:] & corner_in[1:, 1:]
    )
    any_in = (
        corner_in[:-1, :-1] | corner_in[1:, :-1]
        | corner_in[:-1, 1:] | corner_in[1:, 1:]
    )

    near_edge = np.zeros((nx, ny), dtype=bool)
    bx0 = np.clip(np.floor(bx0f).astype(np.int64) - ix0, 0, nx - 1)
    bx1 = np.clip(np.floor(bx1f).astype(np.int64) - ix0, 0, nx - 1)
    by0 = np.clip(np.floor(by0f).astype(np.int64) - iy0, 0, ny - 1)
    by1 = np.clip(np.floor(by1f).astype(np.int64) - iy0, 0, ny - 1)
    for i in range(len(edges)):
        near_edge[bx0[i]:bx1[i] + 1, by0[i]:by1[i] + 1] = True

    interior_mask = all_in & ~near_edge
    boundary_mask = near_edge | (any_in & ~all_in)

    def to_keys(mask):
        xs, ys = np.nonzero(mask)
        return (
            (np.int64(zoom) << np.int64(58))
            | ((xs + ix0).astype(np.int64) << np.int64(29))
            | (ys + iy0).astype(np.int64)
        )

    return to_keys(interior_mask), to_keys(boundary_mask)


EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in km (vectorized)."""
    p = np.pi / 180.0
    lat1, lon1 = np.asarray(lat1) * p, np.asarray(lon1) * p
    lat2, lon2 = np.asarray(lat2) * p, np.asarray(lon2) * p
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def planar_dist2(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Squared planar degree distance — bit-exact in IEEE across engines.

    Used as the kNN metric in oracle-checked queries: pure +,-,*
    arithmetic reproduces identically in Spark, numpy and DuckDB,
    unlike transcendental-based haversine.
    """
    dlat = np.asarray(lat1, dtype=np.float64) - np.asarray(lat2, dtype=np.float64)
    dlon = np.asarray(lon1, dtype=np.float64) - np.asarray(lon2, dtype=np.float64)
    return dlat * dlat + dlon * dlon
