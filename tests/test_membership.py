"""Bloom-filter membership (operators/membership.py): the
no-false-negative contract, the designed fp rate, layout invariance,
and exact anti-join equivalence."""

import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import membership as M


def _keys(spark, n, prefix="k", start=0):
    return spark.range(start, start + n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("u")
    )


def test_bloom_params_shapes():
    m, k = M.bloom_params(1_000_000, 0.01)
    assert m % 62 == 0
    assert 9_000_000 < m < 11_000_000  # ~9.6 bits/key at 1% fp
    assert k in (6, 7, 8)
    with pytest.raises(ValueError):
        M.bloom_params(0)
    with pytest.raises(ValueError):
        M.bloom_params(10, 1.5)
    with pytest.raises(ValueError):
        M.bloom_build(None, "u", m_bits=100)  # not a word multiple


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Every member probes true; non-member fp rate within 3x of the
    designed 1% (binomial slack at 5k probes)."""
    n = 5000
    members = _keys(spark, n)
    m_bits, k = M.bloom_params(n, 0.01)
    bloom = M.bloom_build(members, "u", m_bits, k)
    probed = {
        r["u"]: r["maybe_seen"]
        for r in M.bloom_probe(
            _keys(spark, 2 * n), "u", bloom, m_bits, k
        ).collect()
    }
    assert all(probed[f"k{i}"] for i in range(n))  # no false negatives
    fp = sum(1 for i in range(n, 2 * n) if probed[f"k{i}"]) / n
    assert fp < 0.03, fp


def test_bloom_build_layout_invariant(spark):
    keys = _keys(spark, 2000)
    m_bits, k = M.bloom_params(2000, 0.01)
    a = sorted(tuple(r) for r in M.bloom_build(keys, "u", m_bits, k).collect())
    b = sorted(
        tuple(r)
        for r in M.bloom_build(keys.repartition(13), "u", m_bits, k).collect()
    )
    assert a == b


def test_bloom_prefilter_anti_join_exact(spark):
    """Result must EQUAL the plain anti join — planted overlap, fresh
    rows, and duplicate new rows all preserved."""
    seen = _keys(spark, 3000)
    new = _keys(spark, 2000, start=1500)  # 1500 overlap + 1500 fresh
    new = new.unionAll(_keys(spark, 5, start=1500))  # planted dup rows
    got = sorted(r["u"] for r in
                 M.bloom_prefilter_anti_join(new, seen, "u").collect())
    exp = sorted(
        r["u"]
        for r in new.join(
            seen.withColumnRenamed("u", "v"),
            F.col("u") == F.col("v"),
            "left_anti",
        ).collect()
    )
    assert got == exp
    assert len(got) == 500  # ids 3000..3499


def test_bloom_prefilter_empty_seen_passthrough(spark):
    new = _keys(spark, 10)
    seen = _keys(spark, 0)
    got = M.bloom_prefilter_anti_join(new, seen, "u").count()
    assert got == 10
