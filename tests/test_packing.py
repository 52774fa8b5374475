"""Sequence packing (operators/packing.py): next-fit discipline,
budget/determinism invariants, python reference parity."""

import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import packing as P

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def packed(spark):
    docs = spark.read.parquet(DOCS).select(
        "doc_id", F.col("n_chars").alias("toks")
    )
    return (
        docs,
        P.pack_sequences(docs, "doc_id", "toks", budget=1024, shards=8)
        .collect(),
    )


def _reference_pack(rows, budget, shards):
    """Independent pure-python next-fit over the same sharding."""
    import hashlib

    by_shard = {}
    for did, t in rows:
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16)
        by_shard.setdefault(h % shards, []).append((did, t))
    out = {}
    for shard, lst in by_shard.items():
        b, cur = 0, 0
        for did, t in sorted(lst):
            if cur + t > budget and cur > 0:
                b += 1
                cur = 0
            out[did] = (shard, shard * (1 << 40) + b, cur, t)
            cur += t
    return out


def test_pack_matches_python_reference(spark, packed):
    docs, got = packed
    rows = [(r["doc_id"], r["toks"]) for r in docs.collect()]
    exp = _reference_pack(rows, budget=1024, shards=8)
    assert len(got) == len(rows)  # every doc assigned exactly once
    for r in got:
        assert exp[r["id"]] == (r["shard"], r["bin_id"], r["offset"], r["n_tokens"])


def test_pack_budget_respected(spark, packed):
    _, got = packed
    bins = {}
    for r in got:
        bins.setdefault(r["bin_id"], []).append(r)
    for bid, members in bins.items():
        total = sum(r["n_tokens"] for r in members)
        oversize = any(r["n_tokens"] > 1024 for r in members)
        if oversize:
            assert len(members) == 1  # oversize docs sit alone
        else:
            assert total <= 1024, (bid, total)
    # offsets tile each bin contiguously from 0
    for members in bins.values():
        members.sort(key=lambda r: r["offset"])
        cur = 0
        for r in members:
            assert r["offset"] == cur
            cur += r["n_tokens"]


def test_pack_deterministic_under_repartition(spark):
    docs = spark.read.parquet(DOCS).select(
        "doc_id", F.col("n_chars").alias("toks")
    )
    a = sorted(
        tuple(r)
        for r in P.pack_sequences(docs, "doc_id", "toks", 512, shards=4).collect()
    )
    b = sorted(
        tuple(r)
        for r in P.pack_sequences(
            docs.repartition(11), "doc_id", "toks", 512, shards=4
        ).collect()
    )
    assert a == b


def test_pack_stats_consistent(spark, packed):
    docs, got = packed
    packed_df = P.pack_sequences(docs, "doc_id", "toks", 1024, shards=8)
    s = P.pack_stats(packed_df, 1024).collect()[0]
    n_bins = len({r["bin_id"] for r in got})
    assert s["bins_used"] == n_bins
    assert s["total_tokens"] == sum(r["n_tokens"] for r in got)
    assert s["bins_used"] >= s["bins_lower_bound"]
    assert 0 < s["fill_ratio"] <= 1.0


def test_pack_validation(spark):
    docs = spark.range(3).select(F.col("id"), F.lit(10).alias("t"))
    with pytest.raises(ValueError):
        P.pack_sequences(docs, "id", "t", budget=0)
    with pytest.raises(ValueError):
        P.pack_sequences(docs, "id", "t", budget=10, shards=0)
