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
