"""Unicode text normalization (functions/text.py clean_text — the
CCNet/Dolma pre-dedup pass).

Cross-engine exactness is pinned BOTH here (duckdb runs in-process on
the same kitchen-sink strings) and by the gate oracle
(scripts/check_oracles.py clean_text); these tests additionally pin
each pass's semantics and the idempotence contract.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from o2g_spark.functions import text as X

SINK = (
    "“Smart” ‘quotes’, nbsp thin ideo　"
    "zero​width­shy em—dash fig‒ure … end\r\n"
    "line2\t\ttabs   spaces \r legacy\x07bel\x1besc\n\n\n\n"
    "   para   \n  \n\nmixed −minus′prime″dprime   "
)

CASES = [
    SINK,
    "plain ascii stays the same",
    "",
    "   ",
    "\r\n",
    "a…b",
    "\n\n\n\n\n",
    "tab\there",
    " ​ ",
]


def _clean(spark, vals):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(vals)], "i long, t string"
    )
    return {
        r.i: r.c for r in df.select("i", X.clean_text("t").alias("c")).collect()
    }


def test_kitchen_sink_hand_checked(spark):
    got = _clean(spark, [SINK])[0]
    assert got == (
        '"Smart" \'quotes\', nbsp thin ideo zerowidthshy em-dash '
        "fig-ure ... end\nline2 tabs spaces\nlegacybelesc\n\npara\n\n"
        "mixed -minus'prime\"dprime"
    )


def test_ascii_untouched(spark):
    s = "plain ascii, with punctuation! and\nnewlines\n\nkept."
    assert _clean(spark, [s])[0] == s


def test_duckdb_parity_on_every_case(spark):
    got = _clean(spark, CASES)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(CASES)))
    duck = dict(
        con.execute(f"SELECT i, {X.clean_text_sql('t')} FROM t").fetchall()
    )
    assert got == duck


def test_idempotent(spark):
    once = _clean(spark, CASES)
    twice = _clean(spark, [once[i] for i in sorted(once)])
    assert [twice[i] for i in sorted(twice)] == [once[i] for i in sorted(once)]


@pytest.mark.parametrize(
    "raw,want",
    [
        ("a\r\nb\rc", "a\nb\nc"),
        ("a  　b", "a b"),
        ("l​r‌m‍n﻿o­p", "lrmnop"),
        ("‘a’ “b”", "'a' \"b\""),
        ("x–y—z−w", "x-y-z-w"),
        ("wait…", "wait..."),
        ("a\x00\x07\x1b\x7fb", "ab"),
        ("a \t  \t b", "a b"),
        ("a  \n \nb", "a\n\nb"),
        ("a\n\n\n\n\nb", "a\n\nb"),
        ("  \n a \n  ", "a"),
    ],
)
def test_each_pass(spark, raw, want):
    assert _clean(spark, [raw])[0] == want
