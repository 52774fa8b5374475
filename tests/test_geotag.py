"""Geotag extraction (B2) vs generation-time truth + invariants."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from o2g_spark.functions import geotag
from o2g_spark.sources import tables


def _spark_pages(spark, pages_truth):
    pages, truth = pages_truth
    return tables.pages_df(spark, pages), pages, truth


def test_coord_extraction_matches_truth(spark, pages_truth):
    df, pages, truth = _spark_pages(spark, pages_truth)
    got = (
        geotag.extract_coords(df)
        .select("url", "lat", "lon")
        .distinct()  # recrawled urls repeat the same extraction
        .toPandas()
        .sort_values(["url", "lat", "lon"])
        .reset_index(drop=True)
    )
    exp = (
        truth[truth.geo_source == "coord"][["url", "lat", "lon"]]
        .drop_duplicates()
        .sort_values(["url", "lat", "lon"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_place_extraction_matches_truth(spark, pages_truth, gazetteer_pdf):
    df, pages, truth = _spark_pages(spark, pages_truth)
    gaz = tables.gazetteer_df(spark, gazetteer_pdf)
    got = (
        geotag.extract_places(df, gaz)
        .select("url", "mention", "lat", "lon")
        .distinct()
        .toPandas()
        .sort_values(["url", "mention"])
        .reset_index(drop=True)
    )
    exp = (
        truth[truth.geo_source == "place"][["url", "mention", "lat", "lon"]]
        .drop_duplicates()
        .sort_values(["url", "mention"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_geotag_union_row_count(spark, pages_truth, gazetteer_pdf):
    df, pages, truth = _spark_pages(spark, pages_truth)
    gaz = tables.gazetteer_df(spark, gazetteer_pdf)
    tagged = geotag.geotag(df, gaz)
    # every truth extraction appears once per crawl of its url
    crawls = pages.groupby("url").size()
    expected = sum(crawls[u] for u in truth["url"]) if len(truth) else 0
    assert tagged.count() == expected


def test_pandas_udf_variant_agrees(spark, pages_truth):
    df, _, _ = _spark_pages(spark, pages_truth)
    jvm = geotag.extract_coords(df).select("url", "lat", "lon")
    udf = geotag.extract_coords_pandas_udf()
    arrow = (
        df.withColumn("pt", F.explode(udf("text")))
        .select("url", F.col("pt.lat").alias("lat"), F.col("pt.lon").alias("lon"))
    )
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0


def test_text_byte_identical_through_geotag(spark, pages_truth, gazetteer_pdf):
    """BASELINE.json invariant: extraction must not mutate text."""
    df, pages, _ = _spark_pages(spark, pages_truth)
    gaz = tables.gazetteer_df(spark, gazetteer_pdf)
    out = geotag.geotag(df, gaz).select("url", "text").distinct().toPandas()
    src = {r.url: hashlib.sha256(r.text.encode()).hexdigest() for r in pages.itertuples()}
    for r in out.itertuples():
        assert hashlib.sha256(r.text.encode()).hexdigest() == src[r.url]


def test_no_geo_pages_yield_nothing(spark, pages_truth, gazetteer_pdf):
    df, pages, truth = _spark_pages(spark, pages_truth)
    gaz = tables.gazetteer_df(spark, gazetteer_pdf)
    tagged_urls = {
        r.url for r in geotag.geotag(df, gaz).select("url").distinct().collect()
    }
    assert tagged_urls == set(truth["url"])


def test_place_matchers_identical(spark, pages_truth, gazetteer_pdf):
    """All three matchers (alternation regex, trie regex, Aho-Corasick
    pandas UDF) return IDENTICAL rows on the gate corpus."""
    pages_pdf, _ = pages_truth
    pages = tables.pages_df(spark, pages_pdf.head(200))
    gaz = tables.gazetteer_df(spark, gazetteer_pdf)

    def rows(matcher):
        return sorted(
            (r.url, r.mention, r.lat, r.lon)
            for r in geotag.extract_places(pages, gaz, matcher=matcher).collect()
        )

    alt = rows("alternation")
    assert len(alt) > 0
    assert rows("trie") == alt
    assert rows("aho") == alt


def test_trie_regex_longest_match_overlaps(spark):
    """Prefix-nested and overlapping names: longest-at-position wins in
    every matcher, word boundaries respected."""
    import pandas as pd

    gaz_pdf = pd.DataFrame({
        "place": ["York", "New York", "New York City", "Yorkshire"],
        "lat": [53.96, 40.71, 40.70, 53.9],
        "lon": [-1.08, -74.0, -74.01, -1.5],
        "country": ["gb", "us", "us", "gb"],
    })
    gaz = tables.gazetteer_df(spark, gaz_pdf)
    pages_pdf = pd.DataFrame({
        "url": ["u1", "u2", "u3", "u4"],
        "warc_ts": [pd.Timestamp("2024-01-01")] * 4,
        "html": ["<p>x</p>"] * 4,
        "text": [
            "visit New York City soon",   # longest of the nest
            "York and Yorkshire differ",  # two separate matches
            "NewYork has no boundary",    # no \b-valid match
            "in New York, really",        # punctuation boundary
        ],
        "lang": ["en"] * 4,
    })
    pages = tables.pages_df(spark, pages_pdf)
    want = sorted([
        ("u1", "New York City"), ("u2", "York"), ("u2", "Yorkshire"),
        ("u4", "New York"),
    ])
    for matcher in ("alternation", "trie", "aho"):
        got = sorted(
            (r.url, r.mention)
            for r in geotag.extract_places(pages, gaz, matcher=matcher).collect()
        )
        assert got == want, matcher


def test_aho_automaton_unit():
    """Driver-side unit check of the AC matcher against re.findall with
    the longest-first alternation on random-ish texts."""
    import re as _re

    names = ["ab", "abc", "bc", "c", "abcd", "xy", "x"]
    ac = geotag._AhoCorasick(names)
    pat = _re.compile(
        r"\b(" + "|".join(
            _re.escape(p) for p in sorted(names, key=len, reverse=True)
        ) + r")\b"
    )
    texts = [
        "ab abc abcd bc c", "xabc abc.", "x xy xyz", "", "abcde",
        "c ab c", "ab,abc;abcd", "zzz", "abc abc abc", "x.y",
    ]
    for t in texts:
        assert ac.find_all(t) == pat.findall(t), t


def test_aho_nonword_edge_names():
    """Names with non-word edge chars (regression: the AC boundary
    emulation assumed word-char edges and over-matched 'C (D)' where
    \\b does not): boundary = word-ness CHANGE, exactly like re."""
    import re as _re

    names = ["St. John's", "St. John", "A+B", "C (D)", "x|y", "a.b."]
    ac = geotag._AhoCorasick(names)
    alt = _re.compile(
        r"\b(" + "|".join(
            _re.escape(p) for p in sorted(names, key=len, reverse=True)
        ) + r")\b"
    )
    trie = _re.compile(r"\b(" + geotag._trie_regex(names) + r")\b")
    for t in ["go to St. John's place", "A+B and C (D) here",
              "x|y or St. John", "C (D)x", "zC (D) q", "a.b. c", "xa.b.c"]:
        want = alt.findall(t)
        assert ac.find_all(t) == want, t
        assert trie.findall(t) == want, t
