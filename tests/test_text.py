"""Text-analysis functions + their DuckDB SQL twins (cross-engine exact)."""

import hashlib
import re

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from o2g_spark.functions import text as X

DOCS = pd.DataFrame(
    {
        "doc_id": range(8),
        "text": [
            "The quick brown fox jumps over the lazy dog, and that is that.",
            "Der Hund ist nicht auf der Couch, und das ist gut.",
            "Le chat est dans la maison et les oiseaux chantent.",
            "El perro y los gatos que viven en la casa.",
            "数据 处理 pipeline 中文 text.",
            "",
            "x",
            "Punctuation!!! ??? ;;; everywhere,,, ... :::",
        ],
    }
)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS)


def _duck(expr_sql: str) -> list:
    con = duckdb.connect()
    con.register("docs", DOCS)
    out = con.execute(
        f"SELECT doc_id, {expr_sql} AS v FROM docs ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [v for _, v in out]


def _spark(docs_df, col) -> list:
    rows = docs_df.select("doc_id", col.alias("v")).orderBy("doc_id").collect()
    return [r.v for r in rows]


def test_words_matches_python(docs_df):
    got = _spark(docs_df, X.words("text"))
    exp = [
        [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]
        for t in DOCS["text"]
    ]
    assert got == exp


def test_md5_hash60_cross_engine(docs_df):
    s = _spark(docs_df, X.md5_hash60("text"))
    d = _duck(X.md5_hash60_sql("text"))
    py = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in DOCS["text"]]
    assert s == d == py


def test_token_counts_cross_engine(docs_df):
    assert _spark(docs_df, X.token_count("text")) == _duck(X.token_count_sql("text"))
    assert _spark(docs_df, X.whitespace_token_count("text")) == _duck(
        X.whitespace_token_count_sql("text")
    )


def test_quality_cross_engine(docs_df):
    feats = X.quality_features("text")
    sqls = X.quality_features_sql("text")
    for name in feats:
        s = _spark(docs_df, feats[name])
        d = _duck(sqls[name])
        assert [round(float(x), 6) if x is not None else None for x in s] == [
            round(float(x), 6) if x is not None else None for x in d
        ], name
    assert _spark(docs_df, X.quality_score("text")) == pytest.approx(
        [float(x) for x in _duck(X.quality_score_sql("text"))]
    )


def test_lang_id_cross_engine_and_sane(docs_df):
    s = _spark(docs_df, X.lang_id("text"))
    d = _duck(X.lang_id_sql("text"))
    assert s == d
    assert s[0] == "en" and s[1] == "de" and s[2] == "fr" and s[3] == "es"
    assert s[4] == "zh" and s[5] == "und"


def test_shingles_cross_engine(docs_df):
    s = _spark(docs_df, X.shingles("text", 3))
    d = _duck(X.shingles_sql("text", 3))
    assert [list(x) for x in s] == [list(x) for x in d]
    # too-short text → empty array, not sequence-down garbage
    assert s[6] == []


def test_fingerprint_cross_engine(docs_df):
    s = _spark(docs_df, X.fingerprint("text", 2, mod=4))
    d = _duck(X.fingerprint_sql("text", 2, mod=4))
    assert [list(x) for x in s] == [list(x) for x in d]


def test_real_documents_table(spark, sf_dir):
    """Cross-engine equality on the driver's actual documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = (
        docs.select("doc_id", X.token_count("text").alias("v"), X.lang_id("text").alias("l"))
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    d = con.execute(
        f"SELECT doc_id, {X.token_count_sql('text')} AS v, {X.lang_id_sql('text')} AS l "
        f"FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    con.close()
    assert [(r.doc_id, r.v, r.l) for r in s] == [(a, b, c) for a, b, c in d]
