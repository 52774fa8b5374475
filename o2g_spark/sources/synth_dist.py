"""Distributed deterministic pages generator (bench/scaling input).

Unlike sources.synth (pandas, driver-side, fixture-sized), this builds
the Common-Crawl-shaped `pages` table AT ANY SCALE as pure Column
expressions over ``spark.range(n)`` — generation is embarrassingly
parallel, never collects, and every row is a pure function of its id
(seed folded into the hash), so any two runs/parallelisms produce
identical rows. This is what feeds the N-vs-4N scaling evidence
(BASELINE.json north_rule): the input must be generated the same way
at both cluster sizes.

Skew shape mirrors FIXTURES.md: ~50% of geo-tagged pages cluster in 3
hot-city disks, the rest spread uniformly; ~30% of pages carry no
coordinate at all (geotag must drop them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

HOT_CITIES = [(13.40, 52.52), (2.35, 48.85), (-3.70, 40.42)]
HOT_RADIUS = 0.05
LANGS = ["en", "de", "fr", "es", "zh"]
# center of ONE res-9 grid cell (cell width 0.703° lon × 0.352° lat),
# used by one_hot_frac: a 0.02° disk around it stays strictly inside
# that single cell — the survey's "one city cell holds half the crawl"
# worst-case skew fixture
ONE_HOT_CENTER = (13.7109375, 52.55859375)
ONE_HOT_RADIUS = 0.02


def gen_pages_dist(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None,
    one_hot_frac: float | None = None,
) -> DataFrame:
    """n synthetic pages, columns (url, warc_ts, html, text, lang).

    All JVM expressions (xxhash64-driven pseudo-randomness); ~70% of
    pages embed one "Coordinates: lat, lon" literal in text.

    ``one_hot_frac``: route that fraction of the COORDINATE pages into
    a 0.02° disk inside a single res-9 cell (ONE_HOT_CENTER) — the
    planted worst-case hot-cell fixture for skew benchmarks; the rest
    spread uniformly. Default None keeps the 3-city FIXTURES.md shape.
    """
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n, 1, partitions)
    h = lambda k: F.xxhash64(F.col("id"), F.lit(seed), F.lit(k))  # noqa: E731
    u01 = lambda k: (F.pmod(h(k), F.lit(1_000_000)) / F.lit(1_000_000.0))  # noqa: E731

    kind = F.pmod(h("kind"), F.lit(10))  # 0-6 coord, 7-9 none
    hot = F.pmod(h("hot"), F.lit(2)) == 0  # half of coord pages are hot
    city = F.pmod(h("city"), F.lit(len(HOT_CITIES)))
    hot_lon = F.element_at(
        F.array(*[F.lit(c[0]) for c in HOT_CITIES]), (city + 1).cast("int")
    ) + (u01("jlon") - F.lit(0.5)) * F.lit(2 * HOT_RADIUS)
    hot_lat = F.element_at(
        F.array(*[F.lit(c[1]) for c in HOT_CITIES]), (city + 1).cast("int")
    ) + (u01("jlat") - F.lit(0.5)) * F.lit(2 * HOT_RADIUS)
    uni_lon = u01("ulon") * F.lit(60.0) - F.lit(30.0)
    uni_lat = u01("ulat") * F.lit(90.0) - F.lit(30.0)
    if one_hot_frac is not None:
        in_hot = u01("onehot") < F.lit(one_hot_frac)
        oh_lon = F.lit(ONE_HOT_CENTER[0]) + (
            u01("ohlon") - F.lit(0.5)
        ) * F.lit(2 * ONE_HOT_RADIUS)
        oh_lat = F.lit(ONE_HOT_CENTER[1]) + (
            u01("ohlat") - F.lit(0.5)
        ) * F.lit(2 * ONE_HOT_RADIUS)
        lat = F.round(F.when(in_hot, oh_lat).otherwise(uni_lat), 4)
        lon = F.round(F.when(in_hot, oh_lon).otherwise(uni_lon), 4)
    else:
        lat = F.round(F.when(hot, hot_lat).otherwise(uni_lat), 4)
        lon = F.round(F.when(hot, hot_lon).otherwise(uni_lon), 4)

    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(h("lang"), F.lit(len(LANGS))) + 1).cast("int"),
    )
    coord_sentence = F.format_string(
        " Coordinates: %.4f, %.4f (map).", lat, lon
    )
    text = F.concat(
        F.format_string("Story id %d from site%d.", F.col("id"), F.pmod(h("site"), F.lit(257))),
        F.when(kind <= 6, coord_sentence).otherwise(F.lit(" No geo signal here.")),
        F.lit(" All rights reserved."),
    )
    return df.select(
        F.format_string("https://site%d.example/p%d", F.pmod(h("site"), F.lit(257)), F.col("id")).alias("url"),
        (
            F.lit("2024-01-01 00:00:00").cast(T.TimestampType())
            + F.make_interval(secs=F.pmod(h("ts"), F.lit(365 * 24 * 3600)))
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "UTF-8"
        ).alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
