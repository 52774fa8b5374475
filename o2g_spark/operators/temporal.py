"""Temporal joins Spark lacks as primitives: as-of join (latest prior
match per key) and bucketed interval join (point-in-time-range).

Both are implemented as compositions of existing DataFrame ops chosen
for the 100-TB shuffle shape, not as UDFs:

* ``asof_join`` uses the union + ordered-window trick: tag both inputs,
  union them, and carry the latest right-side payload forward with
  ``last(..., ignorenulls=True)`` over a per-key ordered window. ONE
  hash shuffle on the key, zero join fan-out — the naive alternative
  (theta-join on ``r.ts <= l.ts`` + rank) materializes |L|·|R| pairs
  per key before pruning, which is quadratic in the key's history and
  the thing that dies first on a 100-TB event log. The window scans
  each key's timeline once, so cost is O(|L|+|R|) rows per key.
  (DuckDB expresses the same op natively as ASOF JOIN — the oracle
  uses the rank form, which is fine at gate scale.)

* ``interval_join`` buckets time: each interval explodes to the fixed-
  width buckets it covers (array MATERIALIZED before the explode —
  CLAUDE.md rule 1), each point maps to exactly one bucket, and an
  equi-join on the bucket replaces the unbounded range predicate; the
  exact ``start <= t <= end`` check runs as the post-join refine.
  Each (interval, point) pair meets in exactly one bucket — the
  point's — so no dedup pass is needed. Fan-out is bounded by
  ``max_buckets_per_interval`` with a runtime ``raise_error`` guard
  (codegen-side, no extra action): a degenerate month-long interval
  cannot silently explode the build side.

Per-key skew in ``asof_join`` (one user with millions of events) is
the WindowExec caveat of CLAUDE.md rule 12: AQE cannot split a window
partition. For key spaces where one key's history can approach
executor memory, bucket the key with a coarse time prefix upstream and
stitch; for crawl/session-shaped keys (bounded per-entity history)
the single window is the right plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Epoch microseconds, timezone-INDEPENDENT: TIMESTAMP_NTZ columns
    (what parquet scans produce) use naive timestampdiff arithmetic —
    no session-timezone cast, so bucket boundaries cannot shift (or go
    non-monotonic at DST transitions) under a non-UTC driver session."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), {ts_col})"
        )
    return F.unix_micros(F.col(ts_col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_col: str | None = None,
    prefix: str = "r_",
    inclusive: bool = True,
    time_bucket_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (same key); strict < when
    ``inclusive=False``. Right rows tying on ``right_ts`` resolve to
    the greatest ``tie_col`` (required when right timestamps can
    repeat per key — without it the pick is still a single row but
    not contractually which one).

    Output: all left columns + ``prefix + c`` for each requested right
    column (NULL when no prior right row exists).

    Null keys: the window partitions NULL keys together, so a
    null-key left row CAN pick up a null-key right row — "null ==
    null" grouping semantics, unlike a SQL equi-join (which matches
    nothing on NULL). Filter nulls upstream if join semantics are
    required.

    ``time_bucket_seconds`` is the HOT-KEY escape (CLAUDE.md rule 12:
    AQE cannot skew-split a window partition, so one entity with a
    near-executor-memory history stalls the default plan). When set,
    the per-key window is split into (key, time-bucket) partitions —
    each bounded by the key's event rate × the bucket width — plus a
    per-key carry window over BUCKETS (rows = buckets per key, tiny)
    that forwards the last right-side state into buckets whose match
    lies further back. Output is row-identical to the default plan
    (pinned by test); cost is two extra co-partitioned shuffles.
    Requires timestamp or numeric ts columns (bucketing needs
    arithmetic; the default plan only needs ordering).
    """
    for c in right_cols:
        if prefix + c in left.columns:
            raise ValueError(f"output column {prefix + c} collides with left")
    # side 0 sorts before side 1 at equal ts → right rows at the left
    # row's own timestamp are visible (inclusive). For strict <, left
    # sorts first instead and equal-ts right rows fall outside the
    # RANGE frame (they land in a LATER peer group).
    l_side, r_side = (1, 0) if inclusive else (0, 1)
    tie = _c(tie_col) if tie_col is not None else F.lit(0)

    # the right payload travels as ONE struct so the window carry picks
    # whole rows atomically — per-column last(ignorenulls) would mix
    # fields from different right rows when a payload value is NULL
    r_struct = F.struct(*[F.col(c) for c in right_cols])
    r_tagged = right.select(
        F.col(key).alias("__k"),
        _c(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        tie.cast("long").alias("__tie"),
        r_struct.alias("__r"),
    )
    l_tagged = left.select(
        F.col(key).alias("__k"),
        _c(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
    )
    r_tagged = r_tagged.withColumn(
        "__l", F.lit(None).cast(l_tagged.schema["__l"].dataType)
    ).select(*l_tagged.columns)
    u = l_tagged.unionByName(r_tagged)

    if time_bucket_seconds is None:
        # RANGE frame (default with orderBy): a row's frame ends at its
        # full peer group, so equal-sort-key rows see identical state —
        # deterministic regardless of physical tie order.
        w = Window.partitionBy("__k").orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            F.col("__tie").asc_nulls_first(),
        )
        carried = u.select(
            "__side",
            "__l",
            F.last("__r", ignorenulls=True).over(w).alias("__rv"),
        )
        return carried.where(F.col("__side") == l_side).select(
            *[F.col("__l").getField(c).alias(c) for c in left.columns],
            *[F.col("__rv").getField(c).alias(prefix + c) for c in right_cols],
        )

    # ---- skew-split plan: (key, time bucket) windows + bucket carry
    if time_bucket_seconds <= 0:
        raise ValueError("time_bucket_seconds must be positive")
    ts_type = u.schema["__ts"].dataType
    from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType

    if isinstance(ts_type, TimestampNTZType):
        epoch = F.expr(
            "timestampdiff(MICROSECOND, "
            "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), __ts)"
        )
        w_units = time_bucket_seconds * 1_000_000
    elif isinstance(ts_type, TimestampType):
        epoch = F.unix_micros(F.col("__ts"))
        w_units = time_bucket_seconds * 1_000_000
    elif isinstance(ts_type, NumericType):
        epoch = F.col("__ts")
        w_units = time_bucket_seconds
    else:
        raise ValueError(
            "time_bucket_seconds needs a timestamp or numeric ts column"
        )
    u = u.withColumn("__b", F.floor(epoch / F.lit(w_units)))

    # 1) within-bucket pass: same discipline, bounded partitions.
    #    Equal timestamps always share a bucket, so the inclusive /
    #    strict tie ordering is fully decided here; the carry below
    #    only ever crosses strictly-earlier timestamps.
    w1 = Window.partitionBy("__k", "__b").orderBy(
        F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc_nulls_first()
    )
    within = u.select(
        "__k",
        "__b",
        "__side",
        "__l",
        F.last("__r", ignorenulls=True).over(w1).alias("__rv"),
    )

    # 2) per-(key, bucket) last right payload, then a carry window over
    #    the key's BUCKET LIST (rows per partition = buckets per key):
    #    carry-in(b) = last right payload of any earlier bucket.
    bucket_last = (
        u.where(F.col("__side") == r_side)
        .groupBy("__k", "__b")
        .agg(
            F.max_by(
                F.col("__r"),
                F.struct(F.col("__ts").alias("t"), F.col("__tie").alias("tie")),
            ).alias("__bl")
        )
    )
    all_buckets = u.select("__k", "__b").distinct()
    cw = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = all_buckets.join(bucket_last, ["__k", "__b"], "left").select(
        "__k",
        "__b",
        F.last("__bl", ignorenulls=True).over(cw).alias("__carry"),
    )

    # 3) rows whose match is not in their own bucket take the carry-in
    #    (whole-struct coalesce: no cross-row field mixing).
    joined = within.join(carry, ["__k", "__b"])
    final = F.coalesce(F.col("__rv"), F.col("__carry"))
    return joined.where(F.col("__side") == l_side).select(
        *[F.col("__l").getField(c).alias(c) for c in left.columns],
        *[final.getField(c).alias(prefix + c) for c in right_cols],
    )


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    tie_col: str,
    prefix: str = "r_",
    inclusive: bool = True,
) -> str:
    """DuckDB twin in the rank form (theta join + QUALIFY keep-latest).
    Quadratic per key — an oracle, not the scale plan."""
    op = "<=" if inclusive else "<"
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    rsel = ", ".join(f"r.{c} AS {prefix}{c}" for c in right_cols)
    return f"""
SELECT {lsel}, {rsel}
FROM ({left_sql}) l LEFT JOIN ({right_sql}) r
  ON l.{key} = r.{key} AND r.{right_ts} {op} l.{left_ts}
QUALIFY row_number() OVER (
  PARTITION BY l.{key}, l.{left_ts}, {', '.join('l.' + c for c in left_cols)}
  ORDER BY r.{right_ts} DESC NULLS LAST, r.{tie_col} DESC NULLS LAST) = 1
"""


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    keys: list[str] | None = None,
    inclusive_end: bool = True,
    max_buckets_per_interval: int = 1024,
    point_prefix: str = "p_",
) -> DataFrame:
    """Join each point row to every interval row containing its
    timestamp (``start <= t <= end``; end-exclusive when
    ``inclusive_end=False``), optionally per entity: ``keys`` columns
    (present on BOTH inputs under the same names) become part of the
    equi-join, so a point only meets its own entity's intervals — the
    usual shape (events × their user's sessions), and the output-size
    bound: an UNKEYED interval join's output grows as
    |points| · |intervals| · (interval length / time range), which at
    crawl scale is a cross-join in disguise.
    Output: all interval columns + prefixed point columns.

    Scale plan: intervals explode to covered fixed-width buckets
    (bounded fan-out, guarded), points map to one bucket, equi-join on
    (keys…, bucket), exact refine after. Pick ``bucket_seconds`` near
    the typical interval length so most intervals cover 1-2 buckets.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    keys = list(keys or [])
    for k in keys:
        if k not in points.columns or k not in intervals.columns:
            raise ValueError(f"join key {k} must exist on both inputs")
    w_us = bucket_seconds * 1_000_000
    for c in points.columns:
        if point_prefix + c in intervals.columns:
            raise ValueError(f"output column {point_prefix + c} collides with intervals")

    p = points.select(
        *[F.col(c).alias(point_prefix + c) for c in points.columns],
        _epoch_us(points, point_ts).alias("__t_us"),
    ).withColumn("__pbkt", F.floor(F.col("__t_us") / F.lit(w_us)))

    iv = (
        intervals.withColumn("__s_us", _epoch_us(intervals, start_col))
        .withColumn("__e_us", _epoch_us(intervals, end_col))
        .withColumn("__b0", F.floor(F.col("__s_us") / F.lit(w_us)))
        .withColumn("__b1", F.floor(F.col("__e_us") / F.lit(w_us)))
    )
    # runtime fan-out guard, evaluated in codegen (no extra job)
    iv = iv.withColumn(
        "__b1",
        F.when(
            F.col("__b1") - F.col("__b0") >= max_buckets_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_join: interval spans more than "
                        f"{max_buckets_per_interval} buckets of {bucket_seconds}s — "
                        "raise bucket_seconds or max_buckets_per_interval"
                    )
                )
            ).cast("long"),
        ).otherwise(F.col("__b1")),
    )
    # materialize the bucket array BEFORE exploding (CLAUDE.md rule 1)
    iv = iv.withColumn("__bkts", F.sequence(F.col("__b0"), F.col("__b1"))).withColumn(
        "__bkt", F.explode(F.col("__bkts"))
    )

    t = F.col("__t_us")
    refine = (t >= F.col("__s_us")) & (
        (t <= F.col("__e_us")) if inclusive_end else (t < F.col("__e_us"))
    )
    cond = F.col("__bkt") == F.col("__pbkt")
    for k in keys:
        cond = cond & (F.col(k) == F.col(point_prefix + k))
    joined = iv.join(p, cond).where(refine)
    return joined.select(
        *intervals.columns, *[point_prefix + c for c in points.columns]
    )
