"""Determinism + schema tests for the synthetic sources (FIXTURES.md A6)."""

import hashlib

import pandas as pd

from o2g_spark.sources import synth, tables


def _digest(pdf: pd.DataFrame) -> str:
    return hashlib.sha256(
        pd.util.hash_pandas_object(pdf.astype(str), index=False).values.tobytes()
    ).hexdigest()


def test_pages_deterministic():
    a, ta = synth.gen_pages(500, seed=42)
    b, tb = synth.gen_pages(500, seed=42)
    assert _digest(a) == _digest(b) and _digest(ta) == _digest(tb)
    c, _ = synth.gen_pages(500, seed=43)
    assert _digest(c) != _digest(a)


def test_pages_shape_and_invariants(pages_truth):
    pages, truth = pages_truth
    assert list(pages.columns) == ["url", "warc_ts", "html", "text", "lang"]
    # html embeds text byte-exactly (known inverse for B3)
    for r in pages.head(50).itertuples():
        assert r.html == f"<html><body>{r.text}</body></html>".encode()
    # ~5% recrawled urls
    assert pages["url"].duplicated().sum() == 50
    # truth rows only for urls with a geo signal; every mention in text
    merged = truth.merge(pages.drop_duplicates("url"), on="url")
    assert (merged.apply(lambda r: r["mention"] in r["text"], axis=1)).all()


def test_zone_mix(zones_pdf):
    assert len(zones_pdf) >= 40
    n_holes = (zones_pdf["holes"].apply(len) > 0).sum()
    assert n_holes >= 2
    rings = synth.zone_rings(zones_pdf)
    assert all(len(r[0]) >= 4 for r in rings.values())


def test_spark_roundtrip(spark, pages_truth, zones_pdf, gazetteer_pdf):
    pages, _ = pages_truth
    pdf = tables.pages_df(spark, pages)
    assert pdf.count() == len(pages)
    assert [f.name for f in pdf.schema.fields] == list(pages.columns)
    zdf = tables.zones_df(spark, zones_pdf)
    assert zdf.count() == len(zones_pdf)
    gdf = tables.gazetteer_df(spark, gazetteer_pdf)
    assert gdf.count() == len(gazetteer_pdf)


def test_parity_fixtures(spark):
    stops, routes, pzones = synth.gen_parity()
    # tag filter: every 10th node is not a stop
    n_stops = sum(1 for t in stops["tags"] if t.get("public_transport"))
    assert n_stops == 36
    sdf = tables.stops_df(spark, stops)
    rdf = tables.routes_df(spark, routes)
    assert sdf.count() == 40 and rdf.count() == 3
    # each route has exactly one dangling member ref=999
    import pyspark.sql.functions as F

    dangling = (
        rdf.select(F.explode("members").alias("m"))
        .filter(F.col("m.ref") == 999)
        .count()
    )
    assert dangling == 3


def test_gen_pages_dist_parallelism_invariant(spark):
    """The distributed generator must emit identical rows at any
    partitioning — this underpins the N-vs-4N scaling comparison."""
    from o2g_spark.sources import synth_dist

    a = synth_dist.gen_pages_dist(spark, 2000, partitions=2)
    b = synth_dist.gen_pages_dist(spark, 2000, partitions=16)
    ra = sorted((r.url, r.warc_ts, bytes(r.html), r.text, r.lang) for r in a.collect())
    rb = sorted((r.url, r.warc_ts, bytes(r.html), r.text, r.lang) for r in b.collect())
    assert ra == rb
    # geo mix sanity: most pages carry a coordinate literal
    n_coord = sum(1 for r in ra if "Coordinates:" in r[3])
    assert 0.6 < n_coord / len(ra) < 0.8
