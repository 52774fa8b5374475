"""Distributed sketches: HyperLogLog distinct counts with a
cross-engine-EXACT register/harmonic formulation, and a Count-Min
frequency sketch with an exact no-false-negative heavy-hitter
prefilter (see the count-min section at the bottom).

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


# ------------------------------------------------------------- count-min
# Frequency sketch (Cormode & Muthukrishnan 2005): d independent hash
# rows x w counters; every cell update is +occurrences, a point query
# is min over the d cells — NEVER an underestimate (monotone adds), so
# "CMS estimate >= threshold" is a no-false-negative prefilter for
# heavy hitters, the same shape as membership.bloom_prefilter_anti_join.
# All math is exact integers (counts), so the sketch, the point
# queries, and the heavy-hitter output all value-hash cross-engine;
# and because the prefilter provably never drops a true heavy hitter,
# cms_heavy_hitters' DuckDB oracle is the PLAIN GROUP BY ... HAVING —
# algebraic equivalence, not a twin replay.


_CMS_M31 = 1 << 31
_CMS_P31 = 2147483647  # Mersenne prime


def _cms_affine(d: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs — the textbook pairwise-independent
    affine family (a·x + b) mod p, which is exactly what CMS's
    analysis requires. a odd, both < 2^31 → a·(x % 2^31) + b < 2^62:
    no BIGINT overflow in either engine (CLAUDE.md rule 3 — DuckDB
    raises, Spark silently wraps)."""
    out = []
    for i in range(d):
        a = ((2654435761 * (i + 1) + 40503) % _CMS_M31) | 1
        b = (1315423911 * (i + 1) + 2246822519) % _CMS_M31
        out.append((a, b))
    return out


def _cms_hash(value: Column, seed: str) -> Column:
    """The ONE string-hashing pass per value (rule 3: hash once, then
    cheap affine integer re-hashes for the d rows)."""
    return X.md5_hash60(
        F.concat(F.lit(seed + ":"), value.cast(T.StringType()))
    )


def _cms_hash_sql(value: str, seed: str) -> str:
    return X.md5_hash60_sql(f"concat('{seed}:', CAST({value} AS VARCHAR))")


def _cms_col(h: Column, a: int, b: int, w: int) -> Column:
    # h >= 0 (60-bit) and every operand positive, so % == pmod in both
    # engines
    return ((h % _CMS_M31 * F.lit(a) + F.lit(b)) % _CMS_P31 % F.lit(w)).cast(
        T.LongType()
    )


def _cms_col_sql(h: str, a: int, b: int, w: int) -> str:
    return f"(({h} % {_CMS_M31} * {a} + {b}) % {_CMS_P31} % {w})"


def _cms_cells(h: Column, w: int, d: int) -> Column:
    """Array of d (row, col) cells from the materialized hash column."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cms_col(h, a, b, w).alias("col")
            )
            for i, (a, b) in enumerate(_cms_affine(d))
        ]
    )


def _check_cms(w: int, d: int) -> None:
    if w < 2 or d < 1:
        raise ValueError("count-min needs w >= 2 and d >= 1")


def cms_build(
    df: DataFrame,
    value_col: str,
    w: int = 8192,
    d: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Build the sketch TABLE ``(row, col, c)`` — at most ``d*w`` rows
    regardless of corpus size. One partial-agg groupBy: the shuffle
    carries <= d*w rows per map task, never occurrences. Sketches over
    corpus parts merge via :func:`cms_merge` (cell-wise sum) into
    exactly the whole-corpus sketch (pinned by test). Null values are
    ignored (as in bloom_build)."""
    _check_cms(w, d)
    return (
        df.where(_c(value_col).isNotNull())
        .withColumn("__h", _cms_hash(_c(value_col), seed))
        # materialize pre-explode (rule 1): the md5 runs in the
        # Project (where codegen CSE applies), never in the Generate
        .withColumn("__cells", _cms_cells(F.col("__h"), w, d))
        .select(F.explode("__cells").alias("__cell"))
        .select(F.col("__cell.row").alias("row"), F.col("__cell.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count("*").cast(T.LongType()).alias("c"))
    )


def cms_build_sql(
    table_sql: str, value_col: str, w: int = 8192, d: int = 4, seed: str = "cms"
) -> str:
    """DuckDB twin of :func:`cms_build` (same hash-once draw, same
    affine cells)."""
    _check_cms(w, d)
    branches = " UNION ALL ".join(
        f"SELECT {i} AS row, {_cms_col_sql('h', a, b, w)} AS col FROM hv"
        for i, (a, b) in enumerate(_cms_affine(d))
    )
    return f"""
WITH hv AS (
  SELECT {_cms_hash_sql(value_col, seed)} AS h
  FROM {table_sql} WHERE {value_col} IS NOT NULL
)
SELECT row, col, CAST(count(*) AS BIGINT) AS c
FROM ({branches})
GROUP BY row, col
"""


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with identical (w, d, seed) —
    the distributed-merge property: build per corpus part, merge, and
    the result is bit-identical to building over the union."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(
        F.sum("c").cast(T.LongType()).alias("c")
    )


def cms_query(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    w: int = 8192,
    d: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Point-query the sketch: one ``(value, est)`` row per DISTINCT
    probe value, ``est = min`` over the d cells (missing cell = 0).
    ``est >= true count`` always; equality whenever no heavier value
    collides in every row. The probe side is d rows per distinct
    probe; the sketch side is <= d*w rows — both tiny, AQE broadcasts
    whichever is smaller."""
    _check_cms(w, d)
    probe_cells = (
        probes.where(_c(value_col).isNotNull())
        .select(_c(value_col).alias("value"))
        .distinct()
        .withColumn("__h", _cms_hash(F.col("value"), seed))
        .withColumn("__cells", _cms_cells(F.col("__h"), w, d))
        .select("value", F.explode("__cells").alias("__cell"))
        .select("value", F.col("__cell.row").alias("row"), F.col("__cell.col").alias("col"))
    )
    return (
        probe_cells.join(sketch, ["row", "col"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast(T.LongType()).alias("est"))
    )


def cms_query_sql(
    corpus_sql: str,
    probes_sql: str,
    value_col: str,
    w: int = 8192,
    d: int = 4,
    seed: str = "cms",
) -> str:
    """DuckDB twin of :func:`cms_build` + :func:`cms_query` — rebuilds
    the sketch from the corpus, then replays the min-over-cells."""
    sk = cms_build_sql(f"({corpus_sql})", value_col, w, d, seed)
    probe_branches = " UNION ALL ".join(
        f"SELECT value, {i} AS row, {_cms_col_sql('h', a, b, w)} AS col "
        f"FROM pv"
        for i, (a, b) in enumerate(_cms_affine(d))
    )
    return f"""
WITH sk AS ({sk}),
pv AS (
  SELECT value, {_cms_hash_sql('value', seed)} AS h FROM (
    SELECT DISTINCT {value_col} AS value FROM ({probes_sql})
    WHERE {value_col} IS NOT NULL
  )
),
pc AS ({probe_branches})
SELECT pc.value AS value,
       CAST(min(coalesce(sk.c, 0)) AS BIGINT) AS est
FROM pc LEFT JOIN sk ON sk.row = pc.row AND sk.col = pc.col
GROUP BY pc.value
"""


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    w: int = 8192,
    d: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """EXACT counts ``(value, n)`` of every value occurring at least
    ``threshold`` times — equal to the plain
    ``groupBy(value).count().where(n >= threshold)``, but the exact
    aggregation's shuffle carries ONLY the maybe-heavy sliver:

    * pass 1 builds the d*w-bounded sketch (cached — it feeds d
      broadcast joins);
    * pass 2 re-scans the corpus, looks each row's d cells up via d
      broadcast hash joins (map-side, zero shuffle), and keeps rows
      whose min-cell estimate clears the threshold — no false
      negatives (sketch never under-counts), and false positives are
      killed by the exact count after.

    At high cardinality the plain groupBy's map-side partial agg
    barely combines (each task sees mostly unique values), so its
    shuffle is ~corpus-sized; here it is ~(heavy occurrences +
    collision fp). Sizing: the CMS additive error is ~N/w (each
    cell's TAIL load is N/w occurrences in expectation, N = corpus
    rows), so ``w`` must dwarf ``N/threshold`` — at w ≈ N/threshold
    the tail alone clears the threshold in every cell and the
    prefilter keeps everything (measured in scripts/bench_cms.py's
    first cut). w ≥ ~8·N/threshold keeps the fp sliver thin; a
    too-small w only costs shuffle, never correctness. ``threshold``
    must be positive (a zero threshold keeps everything and the
    prefilter is pure overhead).

    Measured trade (scripts/bench_cms.py, 50M rows / 49.9M distinct /
    50 planted heavies, local[32]): the exact agg's input drops 500×
    (survivor fraction 0.002, output identical), but wall time is
    2.7× the plain groupBy — on ONE host shuffle is RAM-speed and the
    two corpus scans + hashing dominate. Reach for this when the
    shuffle crosses a network (the 100-TB regime) or repeatedly (the
    sketch is reusable via :func:`cms_merge`); on a single box the
    plain aggregation wins and stays the default elsewhere in this
    repo."""
    _check_cms(w, d)
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    from ..session import cache_latest

    sk = cache_latest(
        "sketches.cms_heavy_hitters.sketch",
        cms_build(df, value_col, w, d, seed),
    )
    est_rows = df.where(_c(value_col).isNotNull()).withColumn(
        "__h", _cms_hash(_c(value_col), seed)
    )
    for i, (a, b) in enumerate(_cms_affine(d)):
        row_i = sk.where(F.col("row") == i).select(
            F.col("col").alias(f"__col{i}"), F.col("c").alias(f"__c{i}")
        )
        est_rows = est_rows.withColumn(
            f"__col{i}", _cms_col(F.col("__h"), a, b, w)
        ).join(F.broadcast(row_i), f"__col{i}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"__c{i}"), F.lit(0)) for i in range(d)]
    ) if d > 1 else F.coalesce(F.col("__c0"), F.lit(0))
    return (
        est_rows.where(est >= F.lit(threshold))
        .groupBy(_c(value_col).alias("value"))
        .agg(F.count("*").cast(T.LongType()).alias("n"))
        .where(F.col("n") >= threshold)
    )


def cms_heavy_hitters_sql(
    corpus_sql: str, value_col: str, threshold: int
) -> str:
    """Oracle for :func:`cms_heavy_hitters`: the PLAIN exact
    aggregation — the prefilter provably never changes the result
    (no-false-negative min-cell bound + exact recount), so the oracle
    checks algebraic equivalence rather than replaying the sketch."""
    return f"""
SELECT {value_col} AS value, CAST(count(*) AS BIGINT) AS n
FROM ({corpus_sql})
WHERE {value_col} IS NOT NULL
GROUP BY {value_col}
HAVING count(*) >= {threshold}
"""


# -------------------------------------------------------------- quantiles

# The quantile member of the sketch family (HLL = cardinality, Bloom =
# membership, Count-Min = frequency): a DDSketch-shaped relative-error
# histogram in PURE INTEGER math, so — like the HLL above — both
# engines compute the bit-identical sketch AND bit-identical answers.
#
# Why not percentile_approx / DuckDB's approx_quantile? Different
# algorithms (GK vs t-digest), different internals — a rows-only gate
# entry at best. And why not KLL/GK here? Both are ORDER-DEPENDENT
# (their compactions depend on arrival order), so their output is not
# partitioning-invariant — a retry or repartition changes the answer.
# This sketch is a pure value→bucket histogram: order-insensitive,
# merge = cell-wise sum, deterministic under any partitioning.
#
# Bucketing (value x, BIGINT; sub_bits = B, K = 2^B sub-buckets per
# octave — every step integer-exact in both engines):
#
# * x = 0  → bucket -1 (exact)
# * x > 0  → e = length(bin(x)) - 1          (the msb octave)
#            s = (x - 2^e) >> (e - B)        for e >= B
#                (x - 2^e) << (B - e)        for e <  B
#            id = e*K + s
# * x < 0  → -(id of -x) - 2                 (mirrored; monotone)
#
# Bucket ids are MONOTONE in x, so quantiles walk ids in order. Each
# positive bucket covers [2^e + s*2^(e-B), +2^(e-B)) — relative width
# 2^-B — and the point estimate is the integer midpoint, giving a
# GUARANTEED relative error <= 2^-(B+1) (default B=4: 3.125%), exact
# below 2^B. State: <= 63*K buckets per sign + 1 (B=4: <= 2,017 rows
# per group) regardless of corpus size; the groupBy partially
# aggregates map-side, so the shuffle carries at most that many rows
# per group per task — the corpus never crosses the wire (the same
# scale shape as the HLL fold above).

_Q_PPM = 1_000_000


def _check_qsketch(sub_bits: int) -> None:
    if not 1 <= sub_bits <= 20:
        raise ValueError("sub_bits must be in [1, 20]")


def _q_require_integral(
    df: DataFrame, value_col: Column | str, what: str = "qsketch"
) -> None:
    """Integral input only: double→BIGINT casts TRUNCATE in Spark but
    ROUND in DuckDB, so a silent cast could never value-hash. Shared
    by the quantile sketch and corpus.mix_plan (same policy)."""
    t = df.select(_c(value_col).alias("__v")).schema["__v"].dataType
    if not isinstance(t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        raise TypeError(f"{what} needs an integral value column, got {t}")


def _q_bucket_cols(v: Column, sub_bits: int) -> list[tuple[str, Column]]:
    """Named helper columns ending in __qb — stepwise so bin() runs
    once; all cheap integer/codegen ops."""
    b = sub_bits
    av = F.abs(v)
    av_c = (
        # abs(LONG_MIN) silently stays negative — refuse, don't corrupt
        F.when(
            v == F.lit(-(1 << 63)).cast(T.LongType()),
            F.expr("raise_error('qsketch: -2^63 is out of domain')").cast(
                T.LongType()
            ),
        )
        .otherwise(av.cast(T.LongType()))
    )
    e_c = (
        F.when(F.col("__av") == 0, F.lit(0))
        .otherwise(F.length(F.bin(F.col("__av"))) - 1)
        .cast(T.IntegerType())
    )
    s_c = (
        # shift amounts clamped >= 0: Spark IF is lazy in codegen but
        # the clamp keeps the dead branch well-defined everywhere
        F.expr(
            f"CAST(IF(__e >= {b}, "
            f"shiftright(__av - shiftleft(CAST(1 AS BIGINT), __e),"
            f" greatest(__e - {b}, 0)), "
            f"shiftleft(__av - shiftleft(CAST(1 AS BIGINT), __e),"
            f" greatest({b} - __e, 0))) AS BIGINT)"
        )
    )
    qb_c = (
        F.when(v == 0, F.lit(-1))
        .when(
            v > 0, F.col("__e").cast(T.LongType()) * (1 << b) + F.col("__s")
        )
        .otherwise(
            -(F.col("__e").cast(T.LongType()) * (1 << b) + F.col("__s")) - 2
        )
        .cast(T.LongType())
    )
    return [("__av", av_c), ("__e", e_c), ("__s", s_c), ("__qb", qb_c)]


def _q_bucket_sql(v: str, sub_bits: int) -> str:
    """DuckDB twin of :func:`_q_bucket_cols` as one expression over a
    prepared column ``{v}`` (plus ``{v}_e`` from :func:`_q_e_sql`)."""
    b = sub_bits
    k = 1 << b
    s = (
        f"CASE WHEN {v}_e >= {b} THEN "
        f"(abs({v}) - (CAST(1 AS BIGINT) << {v}_e)) >> greatest({v}_e - {b}, 0) "
        f"ELSE (abs({v}) - (CAST(1 AS BIGINT) << {v}_e)) << greatest({b} - {v}_e, 0) END"
    )
    pos = f"CAST({v}_e AS BIGINT) * {k} + ({s})"
    return (
        f"CASE WHEN {v} = 0 THEN -1 WHEN {v} > 0 THEN {pos} "
        f"ELSE -({pos}) - 2 END"
    )


def _q_e_sql(v: str) -> str:
    return f"CASE WHEN {v} = 0 THEN 0 ELSE length(bin(abs({v}))) - 1 END"


def qsketch_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column | str,
    sub_bits: int = 4,
) -> DataFrame:
    """Build the per-group sketch table ``(group…, __qb, __cnt)`` —
    at most ``2*63*2^sub_bits + 1`` rows per group regardless of input
    size. One partial-agg groupBy; nulls ignored (as in cms_build).
    Sketches over corpus parts merge via :func:`qsketch_merge`
    (cell-wise sum) into exactly the whole-corpus sketch."""
    _check_qsketch(sub_bits)
    _q_require_integral(df, value_col)
    v = _c(value_col).cast(T.LongType())
    rows = df.where(v.isNotNull()).select(*group_cols, v.alias("__v"))
    for name, col in _q_bucket_cols(F.col("__v"), sub_bits):
        rows = rows.withColumn(name, col)
    return rows.groupBy(*group_cols, "__qb").agg(
        F.count("*").cast(T.LongType()).alias("__cnt")
    )


def qsketch_build_sql(
    table_sql: str,
    group_cols: list[str],
    value_expr: str,
    sub_bits: int = 4,
) -> str:
    """DuckDB twin of :func:`qsketch_build` (same integer bucketing)."""
    _check_qsketch(sub_bits)
    gcols = ", ".join(group_cols)
    gpfx = f"{gcols}, " if group_cols else ""
    return f"""
SELECT {gpfx}{_q_bucket_sql('__v', sub_bits)} AS __qb,
       CAST(count(*) AS BIGINT) AS __cnt
FROM (
  SELECT {gpfx}__v, {_q_e_sql('__v')} AS __v_e FROM (
    SELECT {gpfx}{value_expr} AS __v FROM {table_sql}
    WHERE {value_expr} IS NOT NULL
  )
)
GROUP BY {gpfx}__qb
"""


def qsketch_merge(
    group_cols: list[str], *sketches: DataFrame
) -> DataFrame:
    """Cell-wise sum of sketches built with identical sub_bits — build
    per part == merge of per-part builds (pinned by test)."""
    if not sketches:
        raise ValueError("qsketch_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "__qb").agg(
        F.sum("__cnt").cast(T.LongType()).alias("__cnt")
    )


def _q_est_cols(sub_bits: int) -> list[tuple[str, Column]]:
    """Integer-midpoint point estimate for bucket __qb, stepwise."""
    b = sub_bits
    k = 1 << b
    pid_c = (
        F.when(F.col("__qb") >= 0, F.col("__qb"))
        .otherwise(-F.col("__qb") - 2)
    )
    pe_c = F.expr(f"__pid DIV {k}")
    ps_c = F.pmod(F.col("__pid"), F.lit(k))
    pest_c = (
        F.expr(
            f"CAST(IF(__pe >= {b}, "
            # lo + (width-1)//2, width = 2^(pe-b)
            f"shiftleft(CAST(1 AS BIGINT), __pe)"
            f" + __ps * shiftleft(CAST(1 AS BIGINT), greatest(__pe - {b}, 0))"
            f" + (shiftleft(CAST(1 AS BIGINT), greatest(__pe - {b}, 0)) - 1) DIV 2, "
            # e < b: the bucket holds exactly one integer
            f"shiftleft(CAST(1 AS BIGINT), __pe)"
            f" + shiftright(__ps, greatest({b} - __pe, 0))) AS BIGINT)"
        )
    )
    est_c = (
        F.when(F.col("__qb") == -1, F.lit(0).cast(T.LongType()))
        .when(F.col("__qb") >= 0, F.col("__pest"))
        .otherwise(-F.col("__pest"))
    )
    return [
        ("__pid", pid_c), ("__pe", pe_c), ("__ps", ps_c),
        ("__pest", pest_c), ("__est", est_c),
    ]


def _q_est_sql(sub_bits: int) -> str:
    """DuckDB twin of :func:`_q_est_cols` over prepared __pid/__pe/__ps."""
    b = sub_bits
    pest = (
        f"CASE WHEN __pe >= {b} THEN "
        f"(CAST(1 AS BIGINT) << __pe)"
        f" + __ps * (CAST(1 AS BIGINT) << greatest(__pe - {b}, 0))"
        f" + ((CAST(1 AS BIGINT) << greatest(__pe - {b}, 0)) - 1) // 2 "
        f"ELSE (CAST(1 AS BIGINT) << __pe)"
        f" + (__ps >> greatest({b} - __pe, 0)) END"
    )
    return (
        f"CASE WHEN __qb = -1 THEN 0 WHEN __qb >= 0 THEN {pest} "
        f"ELSE -({pest}) END"
    )


def _q_ppm(quantiles: dict[str, float]) -> list[tuple[str, int]]:
    """Quantiles to exact integer ppm — the rank arithmetic then never
    touches a float in either engine."""
    out = []
    for label, q in quantiles.items():
        ppm = round(q * _Q_PPM)
        if not 0 <= ppm <= _Q_PPM:
            raise ValueError(f"quantile {label}={q} outside [0, 1]")
        out.append((label, ppm))
    if not out:
        raise ValueError("need at least one quantile")
    return out


def qsketch_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    quantiles: dict[str, float],
    sub_bits: int = 4,
) -> DataFrame:
    """Per-group nearest-rank quantiles off the sketch: one row per
    group, one BIGINT column per label. Rank for q over n values is
    ``(n-1)*q_ppm DIV 1e6 + 1`` (q=0 → rank 1, q=1 → rank n; exact
    for n < ~9.2e12), answered by the first bucket whose cumulative
    count reaches it — a window cumsum over <= ~2e3 rows per group."""
    from pyspark.sql import Window

    _check_qsketch(sub_bits)
    labels = _q_ppm(quantiles)
    cum = F.sum("__cnt").over(
        Window.partitionBy(*group_cols)
        .orderBy("__qb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.sum("__cnt").over(Window.partitionBy(*group_cols))
    rows = sketch
    for name, col in _q_est_cols(sub_bits):
        rows = rows.withColumn(name, col)
    rows = rows.select(
        *group_cols, "__est", cum.alias("__cum"), tot.alias("__n")
    )
    aggs = []
    for label, ppm in labels:
        r = F.expr(f"(__n - 1) * {ppm} DIV {_Q_PPM} + 1")
        aggs.append(F.min(F.when(F.col("__cum") >= r, F.col("__est"))).alias(label))
    return rows.groupBy(*group_cols).agg(*aggs)


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column | str,
    quantiles: dict[str, float],
    sub_bits: int = 4,
) -> DataFrame:
    """One-shot build + query (the common corpus-stats call: length /
    token-count / latency distributions per group)."""
    return qsketch_quantiles(
        qsketch_build(df, group_cols, value_col, sub_bits),
        group_cols,
        quantiles,
        sub_bits,
    )


def quantile_sketch_sql(
    table_sql: str,
    group_cols: list[str],
    value_expr: str,
    quantiles: dict[str, float],
    sub_bits: int = 4,
) -> str:
    """DuckDB twin of :func:`quantile_sketch` — rebuilds the sketch
    cell-for-cell, replays the cumsum walk and integer rank rule."""
    _check_qsketch(sub_bits)
    labels = _q_ppm(quantiles)
    k = 1 << sub_bits
    sk = qsketch_build_sql(table_sql, group_cols, value_expr, sub_bits)
    gcols = ", ".join(group_cols)
    gpfx = f"{gcols}, " if group_cols else ""
    part = f"PARTITION BY {gcols} " if group_cols else ""
    sels = ", ".join(
        f"CAST(min(CASE WHEN __cum >= (__n - 1) * {ppm} // {_Q_PPM} + 1 "
        f"THEN __est END) AS BIGINT) AS {label}"
        for label, ppm in labels
    )
    return f"""
WITH sk AS ({sk}),
pid AS (
  SELECT {gpfx}__qb, __cnt,
         CASE WHEN __qb >= 0 THEN __qb ELSE -__qb - 2 END AS __pid
  FROM sk
),
prep AS (
  SELECT {gpfx}__qb, __cnt, __pid // {k} AS __pe, __pid % {k} AS __ps
  FROM pid
),
est AS (
  SELECT {gpfx}__cnt, {_q_est_sql(sub_bits)} AS __est,
         SUM(__cnt) OVER ({part}ORDER BY __qb
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __cum,
         SUM(__cnt) OVER ({part}) AS __n
  FROM prep
)
SELECT {gpfx}{sels} FROM est {("GROUP BY " + gcols) if group_cols else ""}
"""


def qsketch_error_bound(sub_bits: int) -> float:
    """Guaranteed max relative error of any point estimate (midpoint
    of a bucket of relative width 2^-sub_bits): 2^-(sub_bits+1).
    Default sub_bits=4 → 3.125%; values below 2^sub_bits are exact."""
    return 0.5 ** (sub_bits + 1)


def qb_of(x: int, sub_bits: int = 4) -> int:
    """Pure-python twin of :func:`_q_bucket_cols` (bucket id of value
    ``x``) — the inverse-direction partner of :func:`qb_value`; used
    by property tests and by callers sizing sketches offline."""
    if x == 0:
        return -1
    if x == -(1 << 63):
        raise ValueError("qsketch: -2^63 is out of domain")
    b = sub_bits
    ax = abs(x)
    e = ax.bit_length() - 1
    s = (ax - (1 << e)) >> (e - b) if e >= b else (ax - (1 << e)) << (b - e)
    pid = e * (1 << b) + s
    return pid if x > 0 else -pid - 2


def qb_value(qb: int, sub_bits: int = 4) -> int:
    """Pure-python twin of :func:`_q_est_cols` (exact integer midpoint
    for bucket ``qb``) — used by the streaming close path and tests;
    trivially bit-identical to the JVM/SQL forms (same integer ops)."""
    if qb == -1:
        return 0
    b = sub_bits
    pid = qb if qb >= 0 else -qb - 2
    e, s = divmod(pid, 1 << b)
    if e >= b:
        lo = (1 << e) + s * (1 << (e - b))
        est = lo + ((1 << (e - b)) - 1) // 2
    else:
        est = (1 << e) + (s >> (b - e))
    return est if qb >= 0 else -est


def q_rank(n: int, ppm: int) -> int:
    """The shared nearest-rank rule: 1-based rank of quantile ppm over
    n values — ``(n-1)*ppm DIV 1e6 + 1`` in every engine and path."""
    return (n - 1) * ppm // _Q_PPM + 1


def qsketch_window_batch(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column | str,
    ts_col: str,
    window_seconds: int,
    quantiles: dict[str, float],
    sub_bits: int = 4,
) -> DataFrame:
    """Per-(group, tumbling-window) quantiles: the batch twin of
    ``streaming.stateful.quantile_window_stream`` (window start as
    epoch seconds ``ws_s``, exactly like hll_window_batch)."""
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    v = _c(value_col)
    ws = (
        F.floor(_epoch_seconds(df, ts_col) / F.lit(window_seconds))
        * F.lit(window_seconds)
    ).cast(T.LongType())
    tmp = df.where(v.isNotNull()).select(
        *group_cols, ws.alias("ws_s"), v.alias("__val")
    )
    return quantile_sketch(
        tmp, [*group_cols, "ws_s"], "__val", quantiles, sub_bits
    )


def qsketch_window_batch_sql(
    table_sql: str,
    group_cols: list[str],
    value_expr: str,
    ts_col: str,
    window_seconds: int,
    quantiles: dict[str, float],
    sub_bits: int = 4,
) -> str:
    """DuckDB twin of :func:`qsketch_window_batch` (epoch() is
    naive-as-UTC, matching the NTZ timestampdiff)."""
    ws = (
        f"CAST(floor(epoch({ts_col}) / {window_seconds}) "
        f"* {window_seconds} AS BIGINT)"
    )
    gcols = ", ".join(group_cols)
    gpfx = f"{gcols}, " if group_cols else ""
    inner = (
        f"(SELECT {gpfx}{ws} AS ws_s, {value_expr} AS __val "
        f"FROM {table_sql} WHERE {value_expr} IS NOT NULL)"
    )
    return quantile_sketch_sql(
        inner, [*group_cols, "ws_s"], "__val", quantiles, sub_bits
    )
