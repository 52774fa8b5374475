"""Hierarchical cell index: Morton (Z-order) quadtree over lon/lat.

S2/H3-style hierarchical cell ids, built from scratch in pure numpy
(no h3/s2 native libs exist in this environment; SURVEY.md §7.1 M2).
The scheme is a quadtree over the equirectangular plane:

- at resolution ``r`` (0..29) the world splits into ``2^r × 2^r`` cells:
  ``ix = floor((lon+180)/360 * 2^r)``, ``iy = floor((lat+90)/180 * 2^r)``
  (clamped to the valid range so lon=180 / lat=90 land in the last cell);
- ``cell_id = (r << 58) | morton(ix, iy)`` — resolution is embedded in the
  id (like H3), so ids from different resolutions never collide and a
  plain int64 column carries the full hierarchy;
- ``parent`` is a 2-bit right shift of the morton part; the 4 ``children``
  append 2 bits. Z-order keys preserve spatial locality, so range
  partitioning / sorting on ``cell_id`` co-locates nearby points
  (this is what makes cell-prefix partitioning meaningful at scale).

All functions are vectorized numpy (array in → array out); they are the
kernels behind the Arrow pandas UDFs in ``o2g_spark.functions.cellfns``.

Design notes for the 100 TB case:
- encode/decode are branch-free integer ops → millions of points per
  second per core inside an Arrow batch;
- k_ring clamps at the grid edge rather than wrapping the antimeridian;
  fixture/bench data avoids lon=±180 (FIXTURES.md). Wrapping would add a
  modulo on ix only.

Reference parity: o2g partitions OSM extracts per region (SURVEY.md
§2.A A13 [o2g-PK]); cell ids are the scalable replacement for "region".
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29  # 2*29 = 58 morton bits + 5 res bits < 63 → positive int64

_M16 = np.uint64(0x0000FFFF0000FFFF)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M2 = np.uint64(0x3333333333333333)
_M1 = np.uint64(0x5555555555555555)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of ``v`` (uint64) to even bit positions."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & _M16
    v = (v | (v << np.uint64(8))) & _M8
    v = (v | (v << np.uint64(4))) & _M4
    v = (v | (v << np.uint64(2))) & _M2
    v = (v | (v << np.uint64(1))) & _M1
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_spread_bits` — gather even bits into low 32."""
    v = v.astype(np.uint64) & _M1
    v = (v | (v >> np.uint64(1))) & _M2
    v = (v | (v >> np.uint64(2))) & _M4
    v = (v | (v >> np.uint64(4))) & _M8
    v = (v | (v >> np.uint64(8))) & _M16
    v = (v | (v >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return v


def latlon_to_ixiy(lat, lon, res: int):
    """Grid coordinates at resolution ``res``. Vectorized; clamps edges."""
    n = np.int64(1) << np.int64(res)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    np.clip(ix, 0, n - 1, out=ix)
    np.clip(iy, 0, n - 1, out=iy)
    return ix, iy


def ixiy_to_cell(ix, iy, res: int) -> np.ndarray:
    """(ix, iy, res) → int64 cell id."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    m = _spread_bits(np.asarray(ix)) | (_spread_bits(np.asarray(iy)) << np.uint64(1))
    return (m | (np.uint64(res) << np.uint64(58))).astype(np.int64)


def encode(lat, lon, res: int) -> np.ndarray:
    """lat/lon arrays → int64 cell ids at resolution ``res``."""
    ix, iy = latlon_to_ixiy(lat, lon, res)
    return ixiy_to_cell(ix, iy, res)


def cell_res(cell) -> np.ndarray:
    """Resolution embedded in a cell id."""
    return (np.asarray(cell, dtype=np.int64) >> np.int64(58)).astype(np.int64)


def cell_to_ixiy(cell):
    """cell id → (ix, iy, res)."""
    c = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    res = (c >> np.uint64(58)).astype(np.int64)
    m = c & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
    ix = _compact_bits(m).astype(np.int64)
    iy = _compact_bits(m >> np.uint64(1)).astype(np.int64)
    return ix, iy, res


def parent(cell, parent_res: int | None = None) -> np.ndarray:
    """Ancestor cell at ``parent_res`` (default: res-1)."""
    c = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    res = (c >> np.uint64(58)).astype(np.int64)
    if parent_res is None:
        tgt = res - 1
    else:
        tgt = np.full_like(res, parent_res)
    if np.any(tgt < 0) or np.any(tgt > res):
        raise ValueError("parent_res must be in [0, res]")
    shift = (np.uint64(2) * (res - tgt).astype(np.uint64))
    m = c & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
    return ((m >> shift) | (tgt.astype(np.uint64) << np.uint64(58))).astype(np.int64)


def children(cell) -> np.ndarray:
    """The 4 child cells at res+1. Input scalar or (n,) → (n, 4)."""
    c = np.atleast_1d(np.asarray(cell, dtype=np.int64)).astype(np.uint64)
    res = (c >> np.uint64(58)).astype(np.int64)
    if np.any(res >= MAX_RES):
        raise ValueError(f"children beyond MAX_RES={MAX_RES}")
    m = c & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
    base = (m << np.uint64(2)) | ((res + 1).astype(np.uint64) << np.uint64(58))
    out = base[:, None] | np.arange(4, dtype=np.uint64)[None, :]
    return out.astype(np.int64)


def cell_bounds(cell):
    """cell id → (lon_min, lat_min, lon_max, lat_max) arrays."""
    ix, iy, res = cell_to_ixiy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    lon_min = ix / n * 360.0 - 180.0
    lat_min = iy / n * 180.0 - 90.0
    return lon_min, lat_min, lon_min + 360.0 / n, lat_min + 180.0 / n


def cell_center(cell):
    """cell id → (lat, lon) of the cell center."""
    lon_min, lat_min, lon_max, lat_max = cell_bounds(cell)
    return (lat_min + lat_max) / 2.0, (lon_min + lon_max) / 2.0


def k_ring(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev grid distance ≤ k of ``cell`` (a disk).

    Clamped at grid edges (no antimeridian wrap — see module docstring).
    """
    ix, iy, res = cell_to_ixiy(np.asarray([cell]))
    ix, iy, res = int(ix[0]), int(iy[0]), int(res[0])
    n = 1 << res
    xs = np.arange(max(0, ix - k), min(n, ix + k + 1), dtype=np.int64)
    ys = np.arange(max(0, iy - k), min(n, iy + k + 1), dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return ixiy_to_cell(gx.ravel(), gy.ravel(), res)


def ring_only(cell: int, k: int) -> np.ndarray:
    """Cells at Chebyshev grid distance exactly k (the hollow ring)."""
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    ix, iy, res = cell_to_ixiy(np.asarray([cell]))
    ix, iy, res = int(ix[0]), int(iy[0]), int(res[0])
    n = 1 << res
    coords = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if max(abs(dx), abs(dy)) != k:
                continue
            x, y = ix + dx, iy + dy
            if 0 <= x < n and 0 <= y < n:
                coords.append((x, y))
    if not coords:
        return np.empty(0, dtype=np.int64)
    arr = np.asarray(coords, dtype=np.int64)
    return ixiy_to_cell(arr[:, 0], arr[:, 1], res)


def cell_size_deg(res: int) -> tuple[float, float]:
    """(dlon, dlat) extent of one cell at ``res`` in degrees."""
    n = float(1 << res)
    return 360.0 / n, 180.0 / n


def morton_sql(ix_expr: str, iy_expr: str, res: int) -> str:
    """ANSI-SQL expression computing the same cell id as :func:`ixiy_to_cell`.

    Used to give DuckDB oracles (driver contract) a bit-exact replica of
    the cell encoding. Valid for res ≤ 15 (signed-64 shift safety with
    huge margin). ``ix_expr``/``iy_expr`` must be integer SQL expressions.
    """

    def spread(e: str) -> str:
        v = f"CAST(({e}) AS BIGINT)"
        v = f"(({v} | ({v} << 16)) & 281470681808895)"        # 0x0000FFFF0000FFFF
        v = f"(({v} | ({v} << 8)) & 71777214294589695)"       # 0x00FF00FF00FF00FF
        v = f"(({v} | ({v} << 4)) & 1085102592571150095)"     # 0x0F0F0F0F0F0F0F0F
        v = f"(({v} | ({v} << 2)) & 3689348814741910323)"     # 0x3333333333333333
        v = f"(({v} | ({v} << 1)) & 6148914691236517205)"     # 0x5555555555555555
        return v

    return (
        f"({spread(ix_expr)} | ({spread(iy_expr)} << 1) "
        f"| CAST({res} AS BIGINT) * 288230376151711744)"  # res << 58
    )


def encode_sql(lat_expr: str, lon_expr: str, res: int) -> str:
    """ANSI-SQL replica of :func:`encode` (floor + clamp + morton)."""
    n = 1 << res
    ix = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon_expr}) + 180.0) / 360.0 * {n}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    iy = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat_expr}) + 90.0) / 180.0 * {n}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    return morton_sql(ix, iy, res)
