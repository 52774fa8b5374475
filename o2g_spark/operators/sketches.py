"""Distributed cardinality sketches: HyperLogLog distinct counts with
a cross-engine-EXACT register/harmonic formulation.

Why another approx-distinct when Spark has approx_count_distinct?
Spark's HLL++ and DuckDB's approx sketch are different algorithms with
different registers — they can never value-hash against each other, so
the built-in would be a rows-only gate entry. This HLL derives every
register from the shared 60-bit md5 hash (functions/text.py) and keeps
the harmonic mean in SCALED INTEGER space, so both engines compute the
bit-identical sketch AND the bit-identical estimate:

* register  = h & (m-1)            (low p bits)
* rho       = leading-zero count of the remaining 60-p bits, + 1
              — computed as (60-p) - len(bin(rem)) + 1 via each
              engine's bin(); rem == 0 → rho = 60-p+1 (all zeros)
* harmonic  = sum over registers of 2^(K - M_j), K = 60-p+1, as BIGINT
              (each term a power of two ≤ 2^K; with p ≥ 6 the total
              stays < 2^63 — EXACT, no float-sum order dependence;
              a naive float sum of 2^-M_j spans ~2^60 in magnitude and
              rounds differently per aggregation order)
* estimate  = alpha_m · m² · 2^K / harmonic — the entire numerator is
              folded into ONE python-float literal, so the only float
              op is a single IEEE division (correctly rounded in both
              engines), then one final rounding.

No small-range linear-counting correction: it needs ln(), whose last
ulp is not contractual across engines (see CLAUDE.md cross-engine
rules). The raw estimator's bias below ~2.5m is documented instead —
callers sizing sketches for 100-TB-scale distincts are far above it.

Scale shape (the reason to sketch at all): ``groupBy(keys, register)``
partially aggregates map-side, so the shuffle carries AT MOST
m = 2^p rows per group per map task — the corpus row count never
crosses the wire. The final per-group reduce touches ≤ m rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def hll_register(value: Column | str, p: int = 10) -> tuple[Column, Column]:
    """(register, rho) columns for one value under precision ``p``.
    Values hash via their canonical STRING form (cross-engine: Spark's
    long→string rendering matches DuckDB's VARCHAR cast)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    h = X.md5_hash60(_c(value).cast(T.StringType()))
    reg = (h % F.lit(1 << p)).cast(T.IntegerType())
    rem = F.shiftright(h, p)
    width = 60 - p
    rho = (
        F.when(rem == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(rem)))
        .cast(T.IntegerType())
    )
    return reg, rho


def hll_est_expr(n_regs: Column, present: Column, p: int) -> Column:
    """The estimate from (registers hit, scaled-integer harmonic of
    present registers): alpha·m²·2^K / total as ONE float division +
    one rounding — shared by the batch fold and the streaming wrapper
    so every path produces the bit-identical double."""
    m = 1 << p
    k = 60 - p + 1
    numerator = _alpha(m) * m * m * float(1 << k)  # one literal, no float chain
    total = present + (F.lit(m) - n_regs) * F.lit(1 << k)
    return F.round(F.lit(numerator) / total.cast(T.DoubleType()), 3)


def _hll_fold(
    regs: DataFrame, group_cols: list[str], p: int, est_col: str
) -> DataFrame:
    """Fold a (group..., __reg, __rho) table into per-group estimates.
    Two-level aggregation: (group, register) → max rho runs with
    map-side partial agg, so shuffle volume is bounded by 2^p rows per
    group per task regardless of input size; the per-group fold is
    over ≤ 2^p rows."""
    k = 60 - p + 1
    agg = (
        regs.groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("__mx"))
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_regs"),
            # SQL-form shiftleft: the python wrapper only takes a literal
            # bit count, the SQL function takes a column
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - __mx)")
            ).alias("__present"),
        )
    )
    est = hll_est_expr(F.col("n_regs"), F.col("__present"), p)
    return agg.select(*group_cols, F.col("n_regs"), est.alias(est_col))


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
    est_col: str = "hll_est",
) -> DataFrame:
    """Per-group HLL distinct estimate of ``value_col`` (nulls
    ignored). Output: group cols + ``n_regs`` (registers hit, exact
    BIGINT) + ``est_col`` (double, rounded once to 3 dp)."""
    reg, rho = hll_register(value_col, p)
    regs = (
        df.where(_c(value_col).isNotNull())
        .select(*group_cols, reg.alias("__reg"), rho.alias("__rho"))
    )
    return _hll_fold(regs, group_cols, p, est_col)


def hll_window_batch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ts_col: str,
    window_seconds: int,
    p: int = 10,
    est_col: str = "hll_est",
) -> DataFrame:
    """Tumbling-window HLL distinct counts: one estimate per (group…,
    window). The window start rides as epoch SECONDS (``ws_s``,
    BIGINT) — timezone-free, so stream/batch/DuckDB agree bit-for-bit.
    This is the batch twin of
    ``streaming.stateful.hll_window_stream`` (same registers, same
    fold, same estimate expression)."""
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    reg, rho = hll_register(value_col, p)
    ws = (
        F.floor(_epoch_seconds(df, ts_col) / F.lit(window_seconds))
        * F.lit(window_seconds)
    ).cast(T.LongType())
    regs = (
        df.where(_c(value_col).isNotNull())
        .select(
            *group_cols, ws.alias("ws_s"), reg.alias("__reg"), rho.alias("__rho")
        )
    )
    return _hll_fold(regs, [*group_cols, "ws_s"], p, est_col)


def _epoch_seconds(df: DataFrame, ts_col: str) -> Column:
    """Timezone-independent epoch seconds (NTZ-safe, like
    temporal._epoch_us)."""
    from pyspark.sql.types import NumericType, TimestampNTZType

    dt = df.schema[ts_col].dataType
    if isinstance(dt, TimestampNTZType):
        return F.expr(
            f"timestampdiff(SECOND, "
            f"CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), {ts_col})"
        )
    if isinstance(dt, NumericType):
        return F.col(ts_col)
    return F.unix_timestamp(F.col(ts_col))


def hll_window_batch_sql(
    table_sql: str,
    group_cols: list[str],
    value_expr: str,
    ts_col: str,
    window_seconds: int,
    p: int = 10,
    est_col: str = "hll_est",
) -> str:
    """DuckDB twin of :func:`hll_window_batch` (epoch() is
    naive-as-UTC, matching the NTZ timestampdiff)."""
    ws = (
        f"CAST(floor(epoch({ts_col}) / {window_seconds}) "
        f"* {window_seconds} AS BIGINT)"
    )
    inner = (
        f"(SELECT {', '.join(group_cols)}, {ws} AS ws_s, "
        f"{value_expr} AS __v FROM {table_sql})"
    )
    return hll_distinct_sql(inner, [*group_cols, "ws_s"], "__v", p, est_col)


def hll_distinct_sql(
    table_sql: str,
    group_cols: list[str],
    value_expr: str,
    p: int = 10,
    est_col: str = "hll_est",
) -> str:
    """DuckDB twin of :func:`hll_distinct` — same registers, same
    scaled-integer harmonic, same single-division estimate."""
    m = 1 << p
    k = 60 - p + 1
    width = 60 - p
    h = X.md5_hash60_sql(f"CAST({value_expr} AS VARCHAR)")
    gcols = ", ".join(group_cols)
    numerator = repr(_alpha(m) * m * m * float(1 << k))
    return f"""
WITH vals AS (
  SELECT {gcols}, {h} AS h FROM {table_sql} WHERE {value_expr} IS NOT NULL
), regs AS (
  SELECT {gcols},
         CAST(h % {m} AS INTEGER) AS reg,
         MAX(CASE WHEN (h // {m}) = 0 THEN {width + 1}
                  ELSE {width + 1} - length(bin(h // {m})) END) AS mx
  FROM vals GROUP BY {gcols}, reg
), folded AS (
  SELECT {gcols}, COUNT(*) AS n_regs,
         SUM(CAST(1 AS BIGINT) << ({k} - mx)) AS present
  FROM regs GROUP BY {gcols}
)
SELECT {gcols}, CAST(n_regs AS BIGINT) AS n_regs,
       round({numerator} / CAST(present + ({m} - n_regs) * (CAST(1 AS BIGINT) << {k})
             AS DOUBLE), 3) AS {est_col}
FROM folded
"""


def hll_error_bound(p: int) -> float:
    """Expected relative standard error of the raw estimator:
    1.04 / sqrt(2^p). p=10 → ±3.25%, p=14 → ±0.81%."""
    return 1.04 / math.sqrt(1 << p)
