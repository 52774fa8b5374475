"""Unit tests for the Morton quadtree cell kernel (SURVEY.md §5.2-1)."""

import duckdb
import numpy as np
import pytest

from o2g_spark.kernels import cells

rng = np.random.default_rng(42)


def rand_latlon(n):
    return rng.uniform(-89.9, 89.9, n), rng.uniform(-179.9, 179.9, n)


def test_encode_decode_roundtrip():
    lat, lon = rand_latlon(10_000)
    for res in (0, 1, 5, 12, 20, cells.MAX_RES):
        cid = cells.encode(lat, lon, res)
        ix, iy, r = cells.cell_to_ixiy(cid)
        assert (r == res).all()
        ix2, iy2 = cells.latlon_to_ixiy(lat, lon, res)
        assert (ix == ix2).all() and (iy == iy2).all()
        # center of the decoded cell re-encodes to the same cell
        clat, clon = cells.cell_center(cid)
        assert (cells.encode(clat, clon, res) == cid).all()


def test_ids_unique_across_resolutions():
    lat, lon = rand_latlon(1000)
    ids = {res: set(cells.encode(lat, lon, res).tolist()) for res in (3, 4, 5)}
    assert not (ids[3] & ids[4]) and not (ids[4] & ids[5])


def test_parent_child_containment():
    lat, lon = rand_latlon(5000)
    for res in (1, 7, 15):
        cid = cells.encode(lat, lon, res)
        par = cells.parent(cid)
        assert (par == cells.encode(lat, lon, res - 1)).all()
        kids = cells.children(par)
        assert ((kids == cid[:, None]).any(axis=1)).all()
        # grandparent via explicit res
        if res >= 2:
            assert (cells.parent(cid, res - 2) == cells.encode(lat, lon, res - 2)).all()


def test_bounds_contain_point():
    lat, lon = rand_latlon(2000)
    cid = cells.encode(lat, lon, 9)
    lon0, lat0, lon1, lat1 = cells.cell_bounds(cid)
    assert (lon0 <= lon).all() and (lon < lon1).all()
    assert (lat0 <= lat).all() and (lat < lat1).all()


def test_edge_clamping():
    # lon=180 / lat=90 must land in the last cell, not overflow
    cid = cells.encode(np.array([90.0, -90.0]), np.array([180.0, -180.0]), 8)
    ix, iy, _ = cells.cell_to_ixiy(cid)
    assert ix.tolist() == [255, 0] and iy.tolist() == [255, 0]


def test_k_ring_completeness():
    c = cells.encode(np.array([10.0]), np.array([20.0]), 10)[0]
    ring2 = cells.k_ring(int(c), 2)
    assert len(ring2) == 25  # interior cell: full 5x5 disk
    assert int(c) in set(ring2.tolist())
    hollow = cells.ring_only(int(c), 2)
    assert len(hollow) == 16  # 5x5 - 3x3
    assert set(hollow.tolist()) == set(ring2.tolist()) - set(cells.k_ring(int(c), 1).tolist())
    # ring cells are exactly those at Chebyshev distance <= 2
    ix0, iy0, _ = cells.cell_to_ixiy(np.asarray([c]))
    ix, iy, _ = cells.cell_to_ixiy(ring2)
    cheb = np.maximum(np.abs(ix - ix0[0]), np.abs(iy - iy0[0]))
    assert (cheb <= 2).all()


def test_k_ring_edge_clamped():
    c = cells.encode(np.array([-90.0]), np.array([-180.0]), 6)[0]  # corner cell
    assert len(cells.k_ring(int(c), 1)) == 4  # 2x2, clamped


def test_sql_replica_matches_numpy():
    """encode_sql must reproduce the numpy kernel bit-for-bit (DuckDB)."""
    lat, lon = rand_latlon(5000)
    for res in (4, 9, 12):
        expected = cells.encode(lat, lon, res)
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lat": lat, "lon": lon}))
        got = con.execute(
            f"SELECT {cells.encode_sql('lat', 'lon', res)} AS cid FROM pts"
        ).fetchnumpy()["cid"]
        assert (got == expected).all()


def test_parent_res_validation():
    c = cells.encode(np.array([0.0]), np.array([0.0]), 5)
    with pytest.raises(ValueError):
        cells.parent(c, 6)
    with pytest.raises(ValueError):
        cells.ixiy_to_cell(np.array([0]), np.array([0]), 31)
