"""Gopher repetition signals (operators/repetition.py): hand-computed
planted values, guards, cap semantics, and the DuckDB twin."""

import duckdb
import pytest

from o2g_spark.operators import repetition as R


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(
        [
            # d1: "spam spam spam eggs" → 4 words (16 chars, 4*4),
            # distinct 2 → dup_word 0.5; bigrams: [spam spam]x2,
            # [spam eggs] → top2 = 2*8/16 = 1.0; dup2 = 2*8/16 = 1.0
            (1, "spam spam spam eggs"),
            # d2: all-unique words, no repetition anywhere
            (2, "alpha beta gamma delta"),
            # d3: two identical lines + one unique (chars 3,3,5)
            (3, "abc\nabc\nhello"),
            # d4: empty text
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_planted_values(planted):
    rep = R.repetition_report(planted, "doc_id", "text", top_ns=(2,), dup_ns=(2,))
    got = {r.doc_id: r.asDict() for r in rep.collect()}
    d1 = got[1]
    assert d1["n_words"] == 4
    assert d1["dup_word_frac"] == 0.5
    assert d1["top2_char_frac"] == 1.0
    assert d1["dup2_char_frac"] == 1.0
    d2 = got[2]
    assert d2["dup_word_frac"] == 0.0
    assert d2["dup2_char_frac"] == 0.0
    # top2 for d2: every bigram occurs once → widest tied gram is
    # "gamma delta" (10 chars) over 19 word chars
    assert d2["top2_char_frac"] == round(10 / 19, 6)
    d3 = got[3]
    assert d3["dup_line_frac"] == round(1 / 3, 6)
    assert d3["dup_line_char_frac"] == round(3 / 11, 6)
    d4 = got[4]
    assert d4["n_words"] == 0
    assert d4["dup_word_frac"] == 0.0
    assert d4["top2_char_frac"] == 0.0
    assert d4["dup2_char_frac"] == 0.0


def test_max_tokens_cap(planted):
    rep = R.repetition_report(
        planted, "doc_id", "text", top_ns=(2,), dup_ns=(2,), max_tokens=3
    )
    got = {r.doc_id: r.asDict() for r in rep.collect()}
    # d1 capped to [spam spam spam]: 3 words, distinct 1 → dup 2/3;
    # bigrams [spam spam]x2 over 12 chars → top2 = 16/12 → clamp only
    # applies to dup*, top may exceed 1 by definition? No: 2*8/12=1.333
    assert got[1]["n_words"] == 3
    assert got[1]["dup_word_frac"] == round(2 / 3, 6)


def test_sql_twin_matches(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = R.repetition_report(docs, "doc_id", "text")
    got = sorted(tuple(r) for r in rep.collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = sorted(
        tuple(r)
        for r in con.sql(
            R.repetition_report_sql("SELECT * FROM documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want
