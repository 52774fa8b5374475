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

Scale notes: each split round is one map-side-combined count plus one
broadcast join of the (tiny) hot-cell set back to the fact table; rounds
are bounded by (max_res - base_res), in practice 2-4. No driver-side
data beyond the hot-cell list ever materializes.
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


def adaptive_cell_split(
    points: DataFrame,
    base_res: int,
    max_res: int,
    threshold: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    out_col: str = "cell_adaptive",
) -> DataFrame:
    """Mixed-resolution cell assignment: every output cell holds at most
    ``threshold`` rows, unless already at ``max_res``.

    Deterministic: the split decision depends only on (data, base_res,
    max_res, threshold), never on partitioning — the per-cell counts are
    exact, not sampled.
    """
    if not base_res <= max_res:
        raise ValueError("need base_res <= max_res")
    df = points.withColumn(out_col, cellfns.cell_encode(lat_col, lon_col, base_res))

    for res in range(base_res, max_res):
        counts = df.groupBy(out_col).agg(F.count("*").alias("__n"))
        # only cells at the *current* round's resolution can still split
        hot = counts.filter(
            (F.col("__n") > threshold)
            & (F.shiftrightunsigned(F.col(out_col), 58) == res)
        ).select(out_col)
        if hot.isEmpty():
            break
        df = df.join(
            F.broadcast(hot.withColumnRenamed(out_col, "__hot")),
            df[out_col] == F.col("__hot"),
            "left",
        ).withColumn(
            out_col,
            F.when(
                F.col("__hot").isNotNull(),
                cellfns.cell_encode(lat_col, lon_col, res + 1),
            ).otherwise(F.col(out_col)),
        ).drop("__hot")
    return df
