"""Benchmark decontamination (operators/decontam.py): planted-overlap
exactness, partition invariance, and the anti-join contract."""

import duckdb
import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import decontam


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with controlled benchmark overlap at n=3 word-grams.

    bench item: "alpha beta gamma delta epsilon" (3 distinct 3-grams).
    d1 copies the full bench text (+ suffix) → 3 matched grams.
    d2 shares exactly one 3-gram ("gamma delta epsilon").
    d3 shares none.
    """
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zork quux flim"),
            (2, "unrelated words gamma delta epsilon more filler"),
            (3, "completely different text with no overlap here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "bid long, text string"
    )
    return docs, bench


def test_planted_counts_exact(planted):
    docs, bench = planted
    rep = decontam.contamination_report(docs, bench, "doc_id", "text", n=3)
    got = {r.doc_id: (r.matched_ngrams, r.doc_ngrams) for r in rep.collect()}
    # d1: 8 words → 6 trigrams, 3 shared; d2: 7 words → 5 trigrams,
    # 1 shared; d3 absent (no overlap)
    assert got == {1: (3, 6), 2: (1, 5)}


def test_decontaminate_anti_join_contract(planted):
    docs, bench = planted
    clean = decontam.decontaminate(docs, bench, "doc_id", "text", n=3)
    assert sorted(r.doc_id for r in clean.collect()) == [3]
    assert clean.columns == docs.columns
    # min_matched=2 keeps the single-gram overlap doc
    loose = decontam.decontaminate(
        docs, bench, "doc_id", "text", n=3, min_matched=2
    )
    assert sorted(r.doc_id for r in loose.collect()) == [2, 3]


def test_broadcast_and_shuffle_paths_identical(planted):
    docs, bench = planted
    a = decontam.contamination_report(
        docs, bench, "doc_id", "text", n=3, broadcast_bench=True
    )
    b = decontam.contamination_report(
        docs, bench, "doc_id", "text", n=3, broadcast_bench=False
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_partition_invariance(planted):
    docs, bench = planted
    base = decontam.contamination_report(docs, bench, "doc_id", "text", n=3)
    rep = decontam.contamination_report(
        docs.repartition(7), bench.repartition(3), "doc_id", "text", n=3
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, rep.collect()))


def test_sql_twin_matches(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = decontam.contamination_report(
        docs.where(F.col("doc_id") % 37 != 0),
        docs.where(F.col("doc_id") % 37 == 0),
        "doc_id", "text", n=4,
    )
    got = sorted(
        (r.doc_id, r.matched_ngrams, r.doc_ngrams, float(r.contamination_ratio))
        for r in rep.collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        (a, b, c, float(d))
        for a, b, c, d in con.sql(
            decontam.contamination_report_sql(
                "SELECT * FROM documents WHERE doc_id % 37 <> 0",
                "SELECT * FROM documents WHERE doc_id % 37 = 0",
                "doc_id", "text", 4,
            )
        ).fetchall()
    )
    assert got == want
