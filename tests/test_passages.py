"""Passage-level exact-substring dedup (operators/passages.py):
keep-first semantics, span merging, strategy equivalence, short-doc
immunity, within-doc repetition, partition invariance, and the
DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import passages as P

PASSAGE = "the quick brown fox jumps over the lazy dog every single day"


@pytest.fixture(scope="module")
def corpus(spark):
    """d1 is the canonical passage; d2 embeds it mid-doc; d3 is
    clean; d4 is shorter than k; d5 duplicates d1 exactly."""
    return spark.createDataFrame(
        [
            (1, PASSAGE),
            (2, f"intro words here {PASSAGE} and more trailing text"),
            (3, "totally unique document with no shared passages at all in it"),
            (4, "short doc"),
            (5, PASSAGE),
        ],
        "doc_id long, text string",
    )


def test_keep_first_and_rebuild(corpus):
    out = {r.doc_id: (r.text, r.n_tokens, r.n_removed, r.n_spans)
           for r in P.passage_dedup(corpus, "doc_id", "text", k=5).collect()}
    assert out[1] == (PASSAGE, 12, 0, 0)  # first occurrence keeps
    assert out[2] == ("intro words here and more trailing text", 19, 12, 1)
    assert out[3][2] == 0
    assert out[4] == ("short doc", 2, 0, 0)  # < k tokens: immune
    assert out[5] == ("", 12, 12, 1)  # exact dup strips to empty


def test_spans_are_merged_intervals(corpus):
    spans = sorted(map(tuple, P.duplicate_spans(
        corpus, "doc_id", "text", k=5).collect()))
    # d2: the 12 shared tokens sit at positions 3..14; d5: all 12
    assert spans == [(2, 3, 14), (5, 0, 11)]


def test_within_doc_repetition_keeps_first(spark):
    spam = spark.createDataFrame(
        [(1, " ".join(["buy cheap pills online now"] * 6))],
        "doc_id long, text string",
    )
    out = P.passage_dedup(spam, "doc_id", "text", k=5).collect()[0]
    # period-5 text: the 5 rotations each first occur at s=0..4; every
    # window at s>=5 duplicates s-5, so positions 5..29 go and exactly
    # the first period survives
    assert (out.text, out.n_tokens, out.n_removed, out.n_spans) == (
        "buy cheap pills online now", 30, 25, 1)


def test_three_way_duplicate_single_keeper(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} unique prefix {PASSAGE}") for i in (3, 1, 2)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_removed
           for r in P.passage_dedup(docs, "doc_id", "text", k=6).collect()}
    # the shared run starts at 'unique' (position 2): the doc-id token
    # at position 1 breaks the first two windows only
    assert out[1] == 0 and out[2] == 14 and out[3] == 14


def test_join_strategy_identical(corpus):
    a = sorted(map(tuple, P.passage_dedup(
        corpus, "doc_id", "text", k=5).collect()))
    b = sorted(map(tuple, P.passage_dedup(
        corpus, "doc_id", "text", k=5, strategy="join").collect()))
    assert a == b


def test_validation(corpus):
    with pytest.raises(ValueError):
        P.passage_dedup(corpus, "doc_id", "text", k=1)
    with pytest.raises(ValueError):
        P.passage_dedup(corpus, "doc_id", "text", k=5, strategy="bogus")


def test_partition_invariance(corpus):
    a = sorted(map(tuple, P.passage_dedup(
        corpus, "doc_id", "text", k=5).collect()))
    b = sorted(map(tuple, P.passage_dedup(
        corpus.repartition(7), "doc_id", "text", k=5).collect()))
    assert a == b


def test_sql_twin_matches(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.when(F.col("doc_id") % 10 == 0, F.lit(PASSAGE)),
        ).alias("text"),
    )
    got = sorted(map(tuple, P.passage_dedup(
        planted, "doc_id", "text", k=8).collect()))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    dq = f"""SELECT doc_id, concat_ws(' ', text,
      CASE WHEN doc_id % 10 = 0 THEN '{PASSAGE}' END) AS text
    FROM documents"""
    want = sorted(con.sql(P.passage_dedup_sql(
        dq, "doc_id", "text", k=8)).fetchall())
    assert got == want
    # the planted passage must actually fire: every planted doc past
    # the first loses >= its 12 tokens
    removed = {t[0]: t[3] for t in got}
    planted_ids = sorted(i for i in removed if i % 10 == 0)
    assert all(removed[i] >= 12 for i in planted_ids[1:])
