"""Cell-index functions for DataFrames.

The primary implementation is **pure Column expressions** (Morton bit
spread via shiftleft/bitwiseAND), so cell encoding runs inside
whole-stage codegen on the JVM — zero Python/Arrow crossings in the hot
path. This strictly dominates the Arrow-UDF variant the spec floats
("vectorized Arrow UDF, never per-row Python", BASELINE.json): batching
is still columnar, but without serialization. The pandas-UDF variant is
kept (``cell_encode_pandas``) for A/B benchmarking and as the template
for kernels that genuinely need numpy.

Bit layout must stay identical to :mod:`o2g_spark.kernels.cells`
(tests assert all three implementations — Column, numpy, DuckDB SQL —
agree bit-for-bit).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import cells

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_col(v: Column) -> Column:
    v = v.cast(T.LongType())
    for shift, mask in _MASKS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def _scaled_floor(v: Column, offset: float, extent: float, res: int) -> Column:
    n = 1 << res
    idx = F.floor((v + F.lit(offset)) / F.lit(extent) * F.lit(n)).cast(T.LongType())
    return F.least(F.greatest(idx, F.lit(0)), F.lit(n - 1))


def grid_ix(lon: Column | str, res: int) -> Column:
    """Grid x index at ``res`` — pure JVM (matches kernels.cells.latlon_to_ixiy)."""
    lon = F.col(lon) if isinstance(lon, str) else lon
    return _scaled_floor(lon, 180.0, 360.0, res)


def grid_iy(lat: Column | str, res: int) -> Column:
    """Grid y index at ``res`` — pure JVM."""
    lat = F.col(lat) if isinstance(lat, str) else lat
    return _scaled_floor(lat, 90.0, 180.0, res)


def cell_from_ixiy(ix: Column, iy: Column, res: int) -> Column:
    """(ix, iy) integer Columns → int64 cell id — pure JVM Morton encode."""
    morton = _spread_col(ix).bitwiseOR(F.shiftleft(_spread_col(iy), 1))
    return morton.bitwiseOR(F.lit(res << 58))


def cell_encode(lat: Column | str, lon: Column | str, res: int) -> Column:
    """lat/lon Columns → int64 cell id at ``res`` — pure JVM expression."""
    if not 0 <= res <= cells.MAX_RES:
        raise ValueError(f"res must be in [0, {cells.MAX_RES}]")
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    ix = _scaled_floor(lon, 180.0, 360.0, res)
    iy = _scaled_floor(lat, 90.0, 180.0, res)
    morton = _spread_col(ix).bitwiseOR(F.shiftleft(_spread_col(iy), 1))
    return morton.bitwiseOR(F.lit(res << 58)).alias(f"cell_r{res}")


def cell_parent(cell: Column | str, child_res: int, parent_res: int) -> Column:
    """Ancestor cell id — pure JVM expression (static resolutions)."""
    if not 0 <= parent_res <= child_res <= cells.MAX_RES:
        raise ValueError("need 0 <= parent_res <= child_res <= MAX_RES")
    cell = F.col(cell) if isinstance(cell, str) else cell
    morton = cell.bitwiseAND(F.lit((1 << 58) - 1))
    shifted = F.shiftrightunsigned(morton, 2 * (child_res - parent_res))
    return shifted.bitwiseOR(F.lit(parent_res << 58))


def cell_encode_pandas(res: int):
    """Arrow pandas-UDF variant of :func:`cell_encode` (bench A/B only)."""

    @F.pandas_udf(T.LongType())
    def _encode(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(cells.encode(lat.to_numpy(), lon.to_numpy(), res))

    return _encode


def k_ring_cells(res: int):
    """Arrow UDF: (lat, lon, k) is static — returns array of ring cells.

    Used by the kNN driver loop: per point, the hollow ring of cells at
    Chebyshev distance exactly ``k``; array column is then exploded and
    equi-joined against the target cell index. numpy-batched.
    """

    def make(k: int):
        @F.pandas_udf(T.ArrayType(T.LongType()))
        def _ring(lat: pd.Series, lon: pd.Series) -> pd.Series:
            import numpy as np

            la = lat.to_numpy()
            lo = lon.to_numpy()
            ix, iy = cells.latlon_to_ixiy(la, lo, res)
            n = 1 << res
            out = []
            if k == 0:
                cid = cells.ixiy_to_cell(ix, iy, res)
                return pd.Series([[int(c)] for c in cid])
            # offsets on the hollow ring at Chebyshev distance k
            offs = [
                (dx, dy)
                for dx in range(-k, k + 1)
                for dy in range(-k, k + 1)
                if max(abs(dx), abs(dy)) == k
            ]
            offs = np.asarray(offs, dtype=np.int64)  # (m, 2)
            gx = ix[:, None] + offs[None, :, 0]
            gy = iy[:, None] + offs[None, :, 1]
            valid = (gx >= 0) & (gx < n) & (gy >= 0) & (gy < n)
            cid = cells.ixiy_to_cell(
                np.clip(gx, 0, n - 1), np.clip(gy, 0, n - 1), res
            )
            for i in range(len(la)):
                out.append([int(c) for c in cid[i][valid[i]]])
            return pd.Series(out)

        return _ring

    return make
