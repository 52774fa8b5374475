"""Unit tests for ray-cast PIP + polygon covers vs brute force (SURVEY.md §5.2-1)."""

import numpy as np

from o2g_spark.kernels import cells, geometry

rng = np.random.default_rng(7)


def rect(lon0, lat0, lon1, lat1):
    return np.array(
        [[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1], [lon0, lat0]]
    )


def star(cx, cy, r_out, r_in, n=5):
    """Concave star polygon."""
    ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    rad = np.where(np.arange(2 * n) % 2 == 0, r_out, r_in)
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def test_rect_pip():
    lon = rng.uniform(-10, 10, 5000)
    lat = rng.uniform(-10, 10, 5000)
    inside = geometry.points_in_ring(lon, lat, rect(-5, -3, 4, 6))
    expect = (lon > -5) & (lon < 4) & (lat > -3) & (lat < 6)
    # strict inequalities hold a.s. for uniform points
    assert (inside == expect).all()


def test_concave_pip_vs_matplotlib_free_oracle():
    """Star polygon: cross-check even-odd against an independent winding test."""
    poly = star(0, 0, 8, 3)
    lon = rng.uniform(-10, 10, 4000)
    lat = rng.uniform(-10, 10, 4000)
    got = geometry.points_in_ring(lon, lat, poly)
    # independent oracle: angle-sum winding number (slow but different math)
    ring = np.vstack([poly, poly[:1]])
    vx = ring[None, :, 0] - lon[:, None]
    vy = ring[None, :, 1] - lat[:, None]
    ang = np.arctan2(vy, vx)
    d = np.diff(ang, axis=1)
    d = (d + np.pi) % (2 * np.pi) - np.pi
    winding = np.abs(d.sum(axis=1)) > np.pi
    assert (got == winding).mean() > 0.999  # boundary-grazing points may differ


def test_polygon_with_hole():
    outer = rect(-10, -10, 10, 10)
    hole = rect(-3, -3, 3, 3)
    lon = np.array([0.0, 5.0, -20.0, 3.5])
    lat = np.array([0.0, 5.0, 0.0, 0.0])
    got = geometry.points_in_polygon(lon, lat, [outer, hole])
    assert got.tolist() == [False, True, False, True]


def _check_cover_exact(rings, res, n_pts=20000, lo=-20, hi=20):
    """interior ∪ raycast(boundary) must equal brute-force raycast."""
    interior, boundary = geometry.polygon_cover(rings, res)
    interior_s, boundary_s = set(interior.tolist()), set(boundary.tolist())
    assert not interior_s & boundary_s
    lon = rng.uniform(lo, hi, n_pts)
    lat = rng.uniform(lo, hi, n_pts)
    truth = geometry.points_in_polygon(lon, lat, rings)
    cid = cells.encode(lat, lon, res)
    in_interior = np.fromiter((c in interior_s for c in cid.tolist()), bool, n_pts)
    in_boundary = np.fromiter((c in boundary_s for c in cid.tolist()), bool, n_pts)
    # interior-cell points must all truly be inside (soundness)
    assert truth[in_interior].all()
    # points in neither cover must be outside (exclusion soundness)
    assert not truth[~in_interior & ~in_boundary].any()
    # two-phase result == truth
    refined = in_boundary & geometry.points_in_polygon(lon, lat, rings)
    assert ((in_interior | refined) == truth).all()


def test_cover_rect_exact():
    _check_cover_exact([rect(-5.0, -3.0, 7.0, 9.0)], res=7)


def test_cover_concave_exact():
    _check_cover_exact([star(2, 1, 9, 3.5)], res=7)


def test_cover_with_hole_exact():
    _check_cover_exact([rect(-12, -12, 12, 12), rect(-4, -4, 4, 4)], res=7)


def test_cover_cell_aligned_rect_has_interior():
    # A rect exactly on cell boundaries at res 5 (cell = 11.25 x 5.625 deg)
    dlon, dlat = cells.cell_size_deg(5)
    r = rect(-180 + 4 * dlon, -90 + 8 * dlat, -180 + 8 * dlon, -90 + 12 * dlat)
    interior, boundary = geometry.polygon_cover([r], 5)
    assert len(interior) >= 1  # must find proven-interior cells


def test_haversine_sanity():
    # Paris→London ≈ 344 km
    d = geometry.haversine_km(48.8566, 2.3522, 51.5074, -0.1278)
    assert 340 < float(d) < 350
    assert float(geometry.haversine_km(0, 0, 0, 0)) == 0.0
    # one degree of latitude ≈ 111.2 km anywhere
    d1 = geometry.haversine_km(10.0, 30.0, 11.0, 30.0)
    assert abs(float(d1) - 111.19) < 0.1
