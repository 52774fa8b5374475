"""Distributed BPE (operators/bpe.py): cross-engine exactness of
training and encoding, plus semantic invariants of the merge rules."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import bpe

DOCS = pd.DataFrame(
    {
        "doc_id": range(7),
        "text": [
            "the cat sat on the mat, the cat sat again",
            "banana bandana banana banana",
            "low lower lowest low low slow",
            "aaaaa aaa aa aaaaa",
            "the the the the",
            "",
            "Ümlauts And CAPS are normalized by words()",
        ],
    }
)
K = 6


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS)


@pytest.fixture(scope="module")
def merges(docs_df):
    return bpe.bpe_train(docs_df, "text", K)


def _duck(sql):
    con = duckdb.connect()
    con.register("docs", DOCS)
    out = con.execute(sql).fetchall()
    con.close()
    return out


def test_train_cross_engine_exact(merges):
    duck = _duck(bpe.bpe_train_sql("SELECT * FROM docs", "text", K)
                 + " ORDER BY step")
    assert [(p, c) for _s, p, c in duck] == merges


def test_encode_cross_engine_exact(docs_df, merges):
    got = [
        (r.doc_id, r.n_tokens, r.tok_hash)
        for r in bpe.bpe_encode(docs_df, "doc_id", "text", merges)
        .orderBy("doc_id").collect()
    ]
    duck = _duck(
        "SELECT * FROM ("
        + bpe.bpe_encode_sql("SELECT * FROM docs", "doc_id", "text", K)
        + ") ORDER BY doc_id")
    assert got == duck


def test_first_merge_is_most_frequent_pair(merges):
    """Hand-count: 'a a' occurs 4+2+1+4=11 times weighted (aaaaa:4,
    aaa:2, aa:1 at freq 2 → within-word adjacencies × word freq)."""
    assert merges[0] == ("a a", 11)


def test_merges_compose(merges):
    """A later merge may reference a symbol built by an earlier one
    (e.g. 'lo w' after 'l o') — the hallmark of real BPE."""
    built = {p.replace(" ", "") for p, _ in merges}
    assert any(
        a in built or b in built
        for a, b in (p.split(" ") for p, _ in merges)
        if len(a) > 1 or len(b) > 1
    )


def test_token_count_decreases_with_k(docs_df):
    m2 = bpe.bpe_train(docs_df, "text", 2)
    m6 = bpe.bpe_train(docs_df, "text", 6)
    assert m6[:2] == m2  # prefix property: training is incremental
    t2 = bpe.bpe_encode(docs_df, "doc_id", "text", m2).agg(
        F.sum("n_tokens")).collect()[0][0]
    t6 = bpe.bpe_encode(docs_df, "doc_id", "text", m6).agg(
        F.sum("n_tokens")).collect()[0][0]
    chars = bpe.bpe_encode(docs_df, "doc_id", "text", ["\x00 \x00"]).agg(
        F.sum("n_tokens")).collect()[0][0]  # no-op merge → char count
    assert chars > t2 > t6


def test_encode_handles_unseen_words(spark, merges):
    """Encoding a corpus with words absent from training: replaces
    simply don't fire where pairs don't occur."""
    other = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["zzz qqq the lowest"]}))
    r = bpe.bpe_encode(other, "doc_id", "text", merges).collect()[0]
    # zzz(3) + qqq(3) stay chars; 'the'/'lowest' compress as trained
    assert r.n_tokens < 3 + 3 + 3 + 6
    assert r.n_tokens >= 2 + 3 + 3  # lower bound: zzz,qqq can't merge


def test_empty_corpus_twin_yields_no_merges():
    """On an empty corpus the twin must return zero merge rows (no
    NULL-seq garbage from the replace chain over an empty argmax);
    the Spark side raises loudly instead (next test)."""
    out = _duck(bpe.bpe_train_sql(
        "SELECT * FROM docs WHERE doc_id = 5", "text", 1))
    assert out == []


def test_train_raises_when_exhausted(spark):
    tiny = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["ab"]}))
    with pytest.raises(ValueError, match="exhausted"):
        bpe.bpe_train(tiny, "text", 5)


def test_consecutive_run_semantics(spark):
    """The documented two-pass string-scan convention: 'abab' under
    merge ('a b') becomes [ab, ab]; 'aaaaa' under ('a a') becomes the
    deterministic [aa, a, aa] pairing in BOTH engines."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["abab", "aaaaa"]}))
    r = {x.doc_id: x.n_tokens
         for x in bpe.bpe_encode(df, "doc_id", "text", ["a b"]).collect()}
    assert r[0] == 2  # ab ab
    r2 = {x.doc_id: x.n_tokens
          for x in bpe.bpe_encode(df, "doc_id", "text", ["a a"]).collect()}
    assert r2[1] == 3  # aa a aa
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["abab", "aaaaa"]})
    con = duckdb.connect()
    con.register("docs", pdf)
    duck = con.execute(
        "SELECT len(string_split(trim(replace(replace("
        "' a a a a a ', ' a a ', ' aa '), ' a a ', ' aa ')), ' '))"
    ).fetchone()[0]
    con.close()
    assert duck == 3
