"""Geotag extraction (BASELINE.json B2): text → 0..n (lat, lon) points.

Replaces the reference's OSM stop-node extraction (o2g filters nodes
tagged ``public_transport=stop_position`` etc.; SURVEY.md §2.A A3
[o2g-PK]) with coordinate/place extraction from web-page text.

Two extractors, both set-oriented:

- **coordinate literals** — ``regexp_extract_all`` on the JVM (stays in
  codegen), parsed to doubles with split/cast; one output row per match
  via ``explode``. An Arrow pandas-UDF variant exists for A/B.
- **gazetteer place mentions** — one alternation regex over the (small,
  broadcast) place dictionary, then a broadcast equi-join back to the
  gazetteer for coordinates. At 100 TB the regex scan is embarrassingly
  parallel; the join side is a few thousand rows → always broadcast.

Neither extractor touches the ``text`` column itself — the
byte-identical-text invariant (BASELINE.json input_hint) is preserved
by construction; tests hash text before/after.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# "<lat>, <lon>" with 1-6 decimals, the synthetic corpus emits 4.
COORD_RE = r"(-?\d{1,2}\.\d{1,6}),\s(-?\d{1,3}\.\d{1,6})"

_POINT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("lat", T.DoubleType(), False),
            T.StructField("lon", T.DoubleType(), False),
            T.StructField("mention", T.StringType(), False),
        ]
    )
)


def coord_matches(text: Column | str) -> Column:
    """Array of raw "lat, lon" match strings — pure JVM regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(COORD_RE), 0)


def extract_coords(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages → one row per coordinate literal: + (lat, lon, mention).

    Plan shape: scan → regexp_extract_all → explode → split/cast.
    All JVM-side; rows with no match are dropped (0..n semantics).
    Out-of-range pairs (|lat|>90, |lon|>180) are filtered out.
    """
    # project the match array before exploding (GenerateExec evaluates
    # generator expressions interpreted — keep the regex in a Project)
    m = pages.withColumn("__matches", coord_matches(text_col)).withColumn(
        "mention", F.explode("__matches")
    ).drop("__matches")
    parts = F.split(F.col("mention"), r",\s")
    out = (
        m.withColumn("lat", parts.getItem(0).cast(T.DoubleType()))
        .withColumn("lon", parts.getItem(1).cast(T.DoubleType()))
        .filter(
            (F.abs(F.col("lat")) <= 90.0) & (F.abs(F.col("lon")) <= 180.0)
        )
        .withColumn("geo_source", F.lit("coord"))
    )
    return out


def extract_coords_pandas_udf():
    """Arrow pandas-UDF variant of coordinate extraction (bench A/B).

    Series[str] → Series[array<struct<lat,lon,mention>>] using
    vectorized ``str.extractall`` — the BASELINE-mandated fallback shape
    for extractors Catalyst can't express.
    """
    pat = re.compile(COORD_RE)

    @F.pandas_udf(_POINT_SCHEMA)
    def _extract(text: pd.Series) -> pd.Series:
        matches = text.str.extractall(pat)
        out = [[] for _ in range(len(text))]
        if len(matches):
            for (row_i, _m), (la, lo) in zip(matches.index, matches.values):
                la_f, lo_f = float(la), float(lo)
                if abs(la_f) <= 90.0 and abs(lo_f) <= 180.0:
                    out[row_i].append(
                        {"lat": la_f, "lon": lo_f, "mention": f"{la}, {lo}"}
                    )
        return pd.Series(out)

    return _extract


def extract_places(
    pages: DataFrame, gazetteer: DataFrame, text_col: str = "text"
) -> DataFrame:
    """pages × gazetteer → one row per place mention with its coords.

    The alternation regex over all place names is built driver-side
    (gazetteer is a dimension: ~10³–10⁴ entries) and evaluated on the
    JVM; matches broadcast-join back to the gazetteer. Longest-name
    alternation order makes matching deterministic under overlap.
    """
    places = [r.place for r in gazetteer.select("place").collect()]
    if not places:
        raise ValueError("empty gazetteer")
    alternation = "|".join(
        re.escape(p) for p in sorted(places, key=len, reverse=True)
    )
    pat = f"\\b({alternation})\\b"
    m = pages.withColumn(
        "__matches", F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)
    ).withColumn("mention", F.explode("__matches")).drop("__matches")
    return (
        m.join(F.broadcast(gazetteer), m.mention == gazetteer.place, "inner")
        .drop("place")
        .withColumn("geo_source", F.lit("place"))
    )


def geotag(
    pages: DataFrame, gazetteer: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Full B2: union of coordinate + place extractions.

    Output columns: all page columns + (lat, lon, mention, geo_source).
    A page with both signals yields rows from each; a page with none
    yields nothing.
    """
    coords = extract_coords(pages, text_col)
    places = extract_places(pages, gazetteer, text_col)
    return coords.unionByName(places.select(*coords.columns))
