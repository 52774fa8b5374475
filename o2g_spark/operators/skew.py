"""Skew handling: salted repartitioning + adaptive cell-resolution split.

BASELINE.json B7 / north_rule: "skew from dense tiles (city-scale hot
cells) is handled by salted repartitioning on cell prefix plus adaptive
cell-resolution splitting, mirroring how o2g partitions OSM extracts by
region" (SURVEY.md §2.A A13 [o2g-PK] — o2g's unit of parallelism is the
per-region extract; a "hot region" file is the skew analogue).

Two mechanisms, composable:

1. :func:`salted_repartition` — spread one hot key across S tasks.
   Used *before* any per-partition Python stage (an Arrow UDF fed a
   50%-of-rows cell would straggle regardless of AQE — SURVEY.md §7.2).
2. :func:`adaptive_cell_split` — data-dependent re-indexing: cells
   whose row count exceeds a threshold are re-encoded at finer
   resolution until every cell is under the bound (or max_res). The
   result is a mixed-resolution cell column — exactly H3's "compact"
   representation in reverse — that downstream joins/partitioning key
   on without further skew work.

Scale notes: the split is ONE map-side-combined histogram over all
candidate resolutions plus a literal selection map — no per-round
rescans of the fact table. The only driver-side data is the
over-threshold cell list, ≤ levels × rows/threshold by definition and
hard-bounded by a limited collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import cellfns


def salt_col(key: Column | str, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from a row-identity column."""
    key = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(key), F.lit(buckets))


def salted_repartition(
    df: DataFrame,
    cell_col: str,
    id_col: str,
    buckets: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (cell, salt(id)) so one hot cell spans ``buckets``
    tasks instead of one. Semantics-neutral: only placement changes."""
    salted = df.withColumn("__salt", salt_col(id_col, buckets))
    if num_partitions:
        out = salted.repartition(num_partitions, F.col(cell_col), F.col("__salt"))
    else:
        out = salted.repartition(F.col(cell_col), F.col("__salt"))
    return out.drop("__salt")


def cell_histogram(df: DataFrame, cell_col: str) -> DataFrame:
    """Per-cell row counts (map-side partial agg; the skew diagnostic)."""
    return df.groupBy(cell_col).agg(F.count("*").alias("n_rows"))


_MAX_HOT_CELLS = 65536
_LITERAL_BUDGET = 4096


def adaptive_cell_split(
    points: DataFrame,
    base_res: int,
    max_res: int,
    threshold: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    out_col: str = "cell_adaptive",
    strategy: str = "auto",
) -> DataFrame:
    """Mixed-resolution cell assignment: each point's cell is the FIRST
    resolution in ``base_res..max_res`` whose (global, exact) occupancy
    is ≤ ``threshold`` — i.e. every output cell holds at most
    ``threshold`` rows unless already at ``max_res``. This is the
    gate twin's window form computed directly.

    ONE histogram pass instead of the former per-resolution
    split-rejoin loop: all candidate encodings project into an array
    (materialized before explode, CLAUDE.md rule 1), one groupBy
    counts every (res, cell) occupancy, and only the OVER-threshold
    cells — at most ``levels × n/threshold`` of them, by definition —
    come back to the driver to build a literal first-not-hot selection
    chain. Measured at 14M rows / res 9→16: 240 s (old loop, and it
    could not finish splitting) → one shuffle + a map (the old loop
    re-scanned and re-joined the fact table once per resolution).

    Deterministic and partition-invariant: counts are exact, never
    sampled. Raises (no silent degradation) if the hot-cell set
    exceeds the overall budget — raise ``threshold`` in that case.

    ``strategy``: how the first-not-hot selection is expressed.
    "literal" bakes the hot cells into per-level ``isin`` chains —
    plan-light up to a few thousand cells, zero extra operators.
    "broadcast" ships them as a LocalRelation and marks each level
    with a broadcast LEFT join — plan size stays O(levels) no matter
    how many cells are hot (tens of thousands of ``isin`` literals
    are a driver/plan-size cost: the r4 plan at 30k cells is ~2 MB of
    expression tree). "auto" picks literal at ≤ 4096 hot cells,
    broadcast beyond. Output is identical either way (pinned by
    test); only the physical plan differs.
    """
    if not base_res <= max_res:
        raise ValueError("need base_res <= max_res")
    if strategy not in ("auto", "literal", "broadcast"):
        raise ValueError("strategy must be auto|literal|broadcast")
    levels = list(range(base_res, max_res + 1))
    cells_arr = F.array(
        *[cellfns.cell_encode(lat_col, lon_col, r) for r in levels]
    )
    df = points.withColumn("__cells", cells_arr)
    hot_rows = (
        df.select(F.explode("__cells").alias("__c"))
        .groupBy("__c")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > F.lit(threshold))
        .select("__c")
        # bound the DRIVER materialization itself, not just the check
        # after it: a pathological threshold (1 on 14M rows) would
        # otherwise collect the whole per-level cell space before the
        # budget comparison ever ran
        .limit(_MAX_HOT_CELLS + 1)
        .collect()
    )
    if len(hot_rows) > _MAX_HOT_CELLS:
        # the limited collect caps what we can count — report the bound,
        # not the (always budget+1) capped length
        raise ValueError(
            f"adaptive_cell_split: more than {_MAX_HOT_CELLS} "
            "over-threshold cells exceed the literal budget; raise "
            "threshold (hot cells are bounded by levels*rows/threshold)"
        )
    if strategy == "auto":
        strategy = "literal" if len(hot_rows) <= _LITERAL_BUDGET else "broadcast"

    if strategy == "literal":
        hot_by_res: dict[int, list[int]] = {}
        for row in hot_rows:
            c = row["__c"]
            hot_by_res.setdefault((c >> 58) & 0x1F, []).append(c)
        # first-not-hot selection, built back-to-front: max_res is the
        # unconditional fallback (its cell is used even if still hot)
        expr = F.element_at("__cells", len(levels))
        for i in range(len(levels) - 2, -1, -1):
            r = levels[i]
            c = F.element_at("__cells", i + 1)
            hot = hot_by_res.get(r)
            expr = c if not hot else F.when(~c.isin(hot), c).otherwise(expr)
        return df.withColumn(out_col, expr).drop("__cells")

    # broadcast: the collected hot set becomes ONE LocalRelation (cell
    # ids carry their resolution in bits 58-62, so a single table
    # serves every level without cross-level collisions); each level
    # below max_res gets a broadcast LEFT join marking its candidate
    # cell hot (match) or cold (null). No shuffle of the fact table,
    # no literals in the expression tree — the plan is O(levels)
    # regardless of |hot|.
    spark = points.sparkSession
    hot_df = spark.createDataFrame(
        [(row["__c"],) for row in hot_rows], "__hot_c long"
    )
    flags = []
    for i in range(len(levels) - 1):  # max_res needs no flag (fallback)
        flag = f"__hot_{i}"
        df = df.join(
            F.broadcast(hot_df.select(F.col("__hot_c").alias(flag))),
            F.element_at("__cells", i + 1) == F.col(flag),
            "left",
        )
        flags.append(flag)
    expr = F.element_at("__cells", len(levels))
    for i in range(len(levels) - 2, -1, -1):
        expr = F.when(
            F.col(flags[i]).isNull(), F.element_at("__cells", i + 1)
        ).otherwise(expr)
    return df.withColumn(out_col, expr).drop("__cells", *flags)
