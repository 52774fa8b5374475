"""Boilerplate line removal (operators/boilerplate.py): planted-line
exactness, order preservation, empty-doc handling, thresholds, and
the DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import boilerplate as B


@pytest.fixture(scope="module")
def corpus(spark):
    """4 docs; 'BANNER' in all 4, 'PROMO' in 2, bodies unique.
    d4 is banner-only (strips to empty); d1 repeats BANNER twice
    within one doc (within-doc repeats count once toward df but BOTH
    occurrences strip)."""
    return spark.createDataFrame(
        [
            (1, "BANNER\nbody one\nBANNER\nPROMO"),
            (2, "PROMO\nbody two line a\nbody two line b\nBANNER"),
            (3, "body three\nBANNER"),
            (4, "BANNER"),
        ],
        "doc_id long, text string",
    )


def test_line_stats_document_frequency(corpus):
    stats = {r.line: r.line_df for r in B.line_stats(corpus, "doc_id", "text").collect()}
    assert stats["BANNER"] == 4  # d1's repeat counts once
    assert stats["PROMO"] == 2
    assert stats["body one"] == 1


def test_strip_min_df_order_and_empty(corpus):
    out = {r.doc_id: (r.text, r.n_kept, r.n_removed)
           for r in B.strip_boilerplate(corpus, "doc_id", "text", min_df=3).collect()}
    assert out[1] == ("body one\nPROMO", 2, 2)
    assert out[2] == ("PROMO\nbody two line a\nbody two line b", 3, 1)
    assert out[3] == ("body three", 1, 1)
    assert out[4] == ("", 0, 1)  # all-boilerplate doc kept as empty row


def test_min_frac_matches_min_df(corpus):
    # 0.75 * 4 docs = 3 → identical to min_df=3
    a = sorted(map(tuple, B.strip_boilerplate(corpus, "doc_id", "text", min_df=3).collect()))
    b = sorted(map(tuple, B.strip_boilerplate(corpus, "doc_id", "text", min_frac=0.75).collect()))
    assert a == b


def test_threshold_validation(corpus):
    with pytest.raises(ValueError):
        B.strip_boilerplate(corpus, "doc_id", "text")
    with pytest.raises(ValueError):
        B.strip_boilerplate(corpus, "doc_id", "text", min_df=2, min_frac=0.5)
    with pytest.raises(ValueError):
        B.strip_boilerplate(corpus, "doc_id", "text", min_frac=1.5)


def test_broadcast_off_identical(corpus):
    a = sorted(map(tuple, B.strip_boilerplate(
        corpus, "doc_id", "text", min_df=3).collect()))
    b = sorted(map(tuple, B.strip_boilerplate(
        corpus, "doc_id", "text", min_df=3, broadcast_hot=False).collect()))
    assert a == b


def test_partition_invariance(corpus):
    a = sorted(map(tuple, B.strip_boilerplate(
        corpus, "doc_id", "text", min_df=3).collect()))
    b = sorted(map(tuple, B.strip_boilerplate(
        corpus.repartition(5), "doc_id", "text", min_df=3).collect()))
    assert a == b


def test_sql_twin_matches(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    multi = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("cookie notice accept all"),
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("subscribe to our newsletter")),
            F.lit("nav home about contact"),
        ).alias("text"),
    )
    got = sorted(map(tuple, B.strip_boilerplate(
        multi, "doc_id", "text", min_frac=0.6).collect()))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    dq = """SELECT doc_id, concat_ws(chr(10),
      'cookie notice accept all', text,
      CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter' END,
      'nav home about contact') AS text FROM documents"""
    want = sorted(map(tuple, con.sql(B.strip_boilerplate_sql(
        dq, "doc_id", "text", B.min_frac_df_sql(dq, 0.6))).fetchall()))
    assert got == want
