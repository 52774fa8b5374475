"""Salting + adaptive cell-resolution split (SURVEY.md §2.B B7, §7.1 M6)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from o2g_spark.functions import cellfns
from o2g_spark.kernels import cells
from o2g_spark.operators import skew


@pytest.fixture(scope="module")
def hot_points(spark):
    """One 'city' cell holding ~50% of rows (FIXTURES.md hot-city shape)."""
    rng = np.random.default_rng(21)
    n = 4000
    hot = rng.random(n) < 0.5
    lat = np.where(hot, 52.52 + rng.uniform(-0.01, 0.01, n), rng.uniform(-30, 60, n))
    lon = np.where(hot, 13.40 + rng.uniform(-0.01, 0.01, n), rng.uniform(-30, 30, n))
    return spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(n), "lat": np.round(lat, 5), "lon": np.round(lon, 5)})
    )


def test_salted_repartition_spreads_hot_cell(hot_points):
    df = hot_points.withColumn("cell", cellfns.cell_encode("lat", "lon", 6))
    out = skew.salted_repartition(df, "cell", "pid", buckets=8, num_partitions=16)
    sizes = out.groupBy(F.spark_partition_id().alias("p")).count().collect()
    largest = max(r["count"] for r in sizes)
    total = sum(r["count"] for r in sizes)
    # unsalted, the hot cell (~50% of rows) would land in ONE partition
    assert largest < 0.25 * total
    assert total == hot_points.count()  # placement-only: no rows gained/lost


def test_adaptive_split_bounds_cell_size(hot_points):
    thresh = 200
    out = skew.adaptive_cell_split(
        hot_points, base_res=6, max_res=12, threshold=thresh
    )
    hist = out.groupBy("cell_adaptive").count().collect()
    over = [r for r in hist if r["count"] > thresh]
    res_of = lambda c: int(np.asarray(cells.cell_res([c]))[0])  # noqa: E731
    for r in over:
        assert res_of(r.cell_adaptive) == 12, "over-threshold cell must be at max_res"
    # total rows preserved
    assert sum(r["count"] for r in hist) == hot_points.count()
    # mixed resolutions present (hot area split finer, cold area kept coarse)
    res_seen = {res_of(r.cell_adaptive) for r in hist}
    assert 6 in res_seen and max(res_seen) > 6


def test_adaptive_split_cells_contain_their_points(hot_points):
    out = skew.adaptive_cell_split(
        hot_points, base_res=5, max_res=9, threshold=300
    ).collect()
    for r in out:
        lon_min, lat_min, lon_max, lat_max = (
            float(v[0]) for v in cells.cell_bounds([r.cell_adaptive])
        )
        assert lon_min <= r.lon <= lon_max and lat_min <= r.lat <= lat_max


def test_adaptive_split_deterministic(hot_points):
    a = skew.adaptive_cell_split(hot_points, 6, 10, 250)
    b = skew.adaptive_cell_split(hot_points.repartition(17), 6, 10, 250)
    assert sorted((r.pid, r.cell_adaptive) for r in a.collect()) == sorted(
        (r.pid, r.cell_adaptive) for r in b.collect()
    )


def test_adaptive_split_broadcast_matches_literal(hot_points):
    """The broadcast-join fallback is a PHYSICAL-plan choice only:
    identical output to the literal isin chain on the same input."""
    lit = skew.adaptive_cell_split(hot_points, 6, 10, 250,
                                   strategy="literal")
    bc = skew.adaptive_cell_split(hot_points, 6, 10, 250,
                                  strategy="broadcast")
    assert sorted((r.pid, r.cell_adaptive) for r in lit.collect()) == sorted(
        (r.pid, r.cell_adaptive) for r in bc.collect()
    )


def test_adaptive_split_30k_hot_cells_bounded_plan(spark):
    """≥30k hot cells (r4 VERDICT #5 shape): auto must route to the
    broadcast form, its plan must stay small (the literal chain at
    this cardinality is megabytes of expression tree), and the output
    must equal the literal form's."""
    rng = np.random.default_rng(5)
    n_sites = 16_000
    lat = np.repeat(rng.uniform(-60, 60, n_sites), 3)   # coincident
    lon = np.repeat(rng.uniform(-150, 150, n_sites), 3)  # triplets
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": np.arange(3 * n_sites),
        "lat": np.round(lat, 6), "lon": np.round(lon, 6),
    })).repartition(8).localCheckpoint()  # freeze: one histogram per call
    # threshold=2 → every occupied cell of a coincident triplet is hot
    # at BOTH levels: ~2×16k ≈ 30k+ hot cells (minus rare collisions)
    auto = skew.adaptive_cell_split(pts, 9, 10, 2)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert len(plan) < 100_000, f"plan blew up: {len(plan)} chars"
    lit = skew.adaptive_cell_split(pts, 9, 10, 2, strategy="literal")
    got_a = sorted((r.pid, r.cell_adaptive) for r in auto.collect())
    got_l = sorted((r.pid, r.cell_adaptive) for r in lit.collect())
    assert got_a == got_l
    # every row of a triplet ends at max_res (coincident rows can never
    # split below the threshold)
    assert all(((c >> 58) & 0x1F) == 10 for _, c in got_a)
