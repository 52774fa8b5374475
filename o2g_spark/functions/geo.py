"""Geo math as pure Column expressions (JVM-side, codegen'd).

Web-Mercator tile assignment (FIXTURES.md A5) and distance metrics.
No UDFs here at all — raster↔vector tile math is closed-form
(BASELINE.json B8: "tile id = pure column math, no UDF needed").
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_RADIUS_KM = 6371.0088
MERCATOR_LAT_MAX = 85.05112878  # Web-Mercator clamp


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def tile_x(lon: Column | str, zoom: int) -> Column:
    """Web-Mercator tile x at ``zoom`` (clamped to the valid range)."""
    n = 1 << zoom
    tx = F.floor((_c(lon) + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast(T.LongType())
    return F.least(F.greatest(tx, F.lit(0)), F.lit(n - 1))


def tile_y(lat: Column | str, zoom: int) -> Column:
    """Web-Mercator tile y at ``zoom``: floor((1 - asinh(tan φ)/π)/2 · 2^z)."""
    n = 1 << zoom
    la = F.least(F.greatest(_c(lat), F.lit(-MERCATOR_LAT_MAX)), F.lit(MERCATOR_LAT_MAX))
    mer = F.asinh(F.tan(F.radians(la)))
    ty = F.floor((F.lit(1.0) - mer / F.lit(math.pi)) / F.lit(2.0) * F.lit(n)).cast(T.LongType())
    return F.least(F.greatest(ty, F.lit(0)), F.lit(n - 1))


def tile_id(lat: Column | str, lon: Column | str, zoom: int) -> Column:
    """Single int64 tile key: (zoom << 58) | (x << 29) | y."""
    return (
        F.shiftleft(tile_x(lon, zoom), 29)
        .bitwiseOR(tile_y(lat, zoom))
        .bitwiseOR(F.lit(zoom << 58))
    )


def planar_dist2(lat1, lon1, lat2, lon2) -> Column:
    """Squared planar degree distance — bit-exact vs numpy/DuckDB.

    The kNN metric for oracle-checked queries: pure +,-,* reproduces
    identically across engines (no transcendentals; see kernels.geometry).
    """
    dlat = _c(lat1) - _c(lat2)
    dlon = _c(lon1) - _c(lon2)
    return dlat * dlat + dlon * dlon


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle km, matching kernels.geometry.haversine_km."""
    la1, lo1, la2, lo2 = (F.radians(_c(c)) for c in (lat1, lon1, lat2, lon2))
    a = (
        F.pow(F.sin((la2 - la1) / 2), 2)
        + F.cos(la1) * F.cos(la2) * F.pow(F.sin((lo2 - lo1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def tile_x_sql(lon_expr: str, zoom: int) -> str:
    """DuckDB replica of :func:`tile_x` for oracles."""
    n = 1 << zoom
    return (
        f"LEAST(GREATEST(CAST(FLOOR((({lon_expr}) + 180.0) / 360.0 * {n}) "
        f"AS BIGINT), 0), {n - 1})"
    )


def tile_y_sql(lat_expr: str, zoom: int) -> str:
    """DuckDB replica of :func:`tile_y` for oracles.

    DuckDB 1.0 has no ASINH — uses ln(x + sqrt(x²+1)). Differs from
    Spark's asinh by ≤1 ulp, which only matters if the Mercator value
    sits within one ulp of a tile boundary (probability ~0 for
    continuous data; fixture coordinates avoid constructed boundaries).
    """
    n = 1 << zoom
    la = f"LEAST(GREATEST(({lat_expr}), {-MERCATOR_LAT_MAX}), {MERCATOR_LAT_MAX})"
    t = f"TAN(RADIANS({la}))"
    mer = f"LN({t} + SQRT({t} * {t} + 1.0))"
    return (
        f"LEAST(GREATEST(CAST(FLOOR((1.0 - {mer} / PI()) "
        f"/ 2.0 * {n}) AS BIGINT), 0), {n - 1})"
    )
