"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship spatial pipeline on sf0.001.
`queries()` — one entry per implemented operator (SURVEY.md §2.B + the
training-data ops); each callable takes (spark, sf_dir) → DataFrame.
`oracle_sql()` — DuckDB ANSI-SQL twin for EVERY query (same column
names/aliases, bit-identical arithmetic). Iterative / UDF-kernel ops
(adaptive split, simhash, ANN, multimodal, GTFS parity) get twins via
literal deterministic constants — seeded hyperplane matrices, trained
k-means centroids (ivf_train_centroids_local), raw fixture VALUES —
plus pytest oracles (tests/test_*.py).

Derived spatial columns: the driver views carry no lat/lon, so points
derive deterministically from table columns with IEEE-exact arithmetic
reproduced verbatim in the oracles (see _points/_points_sql):
    lon = pmod(c_acctbal, 120.0) - 60.0 + 0.005
    lat = pmod(c_acctbal * 7.0, 110.0) - 55.0 + 0.005
(Spark F.pmod == DuckDB fmod for positive divisors; Spark `%` keeps the
dividend sign and would diverge on negative acctbal.)
The +0.005 shift gives every coordinate a terminal '5' in the third
decimal, so no point can sit exactly on an integer zone edge — PIP
half-open boundary semantics and SQL BETWEEN then agree everywhere.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from o2g_spark.functions import cellfns, geo, geotag, pii
from o2g_spark.functions import text as X
from o2g_spark.kernels import cells as cellk
from o2g_spark.operators import (
    bpe,
    clusters,
    corpus,
    decontam,
    dedup,
    gtfs,
    knn,
    lmfilter,
    media_dedup,
    multimodal,
    packing,
    pip,
    retrieval,
    semdedup as semdedup_op,
    similarity,
    skew,
    sketches,
    temporal,
    tiles,
    video,
)
from o2g_spark.sources import synth, tables
from o2g_spark.streaming import windows as W

# ----------------------------------------------------------- shared helpers

CELL_RES = 12
TILE_ZOOM = 11

# integer-lattice zones for the PIP oracle (lon, lat box: x0 y0 x1 y1)
PIP_ZONES = [
    (0, -50, -40, -30, -20),
    (1, -20, -45, 10, -10),
    (2, -5, -5, 25, 20),
    (3, 20, 10, 50, 40),
    (4, -55, 25, -15, 50),
    (5, 30, -50, 55, -25),
    (6, -10, 30, 15, 52),
    (7, 40, 42, 58, 54),
]


def _pip_rings():
    rings = {}
    for zid, x0, y0, x1, y1 in PIP_ZONES:
        rings[zid] = [
            __import__("numpy").array(
                [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], dtype=float
            )
        ]
    return rings


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _points(df: DataFrame, bal_col: str, id_col: str) -> DataFrame:
    # pmod ↔ DuckDB fmod: both are positive-mod for positive divisors
    # (Spark's `%` keeps the dividend sign and would diverge on the
    # ~9% of negative acctbal values)
    lon = F.pmod(F.col(bal_col), F.lit(120.0)) - F.lit(60.0) + F.lit(0.005)
    lat = F.pmod(F.col(bal_col) * F.lit(7.0), F.lit(110.0)) - F.lit(55.0) + F.lit(0.005)
    return df.select(F.col(id_col), lon.alias("lon"), lat.alias("lat"))


def _points_sql(table: str, bal_col: str, id_col: str) -> str:
    return (
        f"SELECT {id_col}, fmod({bal_col}, 120.0) - 60.0 + 0.005 AS lon, "
        f"fmod({bal_col} * 7.0, 110.0) - 55.0 + 0.005 AS lat FROM {table}"
    )


# ------------------------------------------------------------------ entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derived customer points → cell encode → PIP join
    against zone covers → per-zone × mktsegment rollup (sf0.001)."""
    sf_dir = "/root/testdata/sf0.001"
    cust = _t(spark, sf_dir, "customer")
    pts = _points(cust, "c_acctbal", "c_custkey").join(
        cust.select("c_custkey", "c_mktsegment"), "c_custkey"
    )
    joined = pip.pip_join(pts, _pip_rings(), res=9)
    return (
        joined.groupBy("zone_id", "c_mktsegment")
        .agg(F.count("*").alias("n_points"))
        .orderBy("zone_id", "c_mktsegment")
    )


# ---------------------------------------------------------------- queries

def _q_filter_project(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 45).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
    )


def _q_agg_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.avg("l_discount"), 9).alias("avg_disc"),
        F.count("*").alias("n_rows"),
    )


def _q_join_star(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_total"),
        )
    )


def _q_join_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_orderkey").alias("n_orders"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


def _q_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers_no_orders"))
    )


def _q_window_topk(spark, sf_dir):
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rk").cast(T.IntegerType()).alias("rk"))
    )


def _q_dedup_latest(spark, sf_dir):
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


def _q_setops(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    h1 = o.filter(F.col("o_orderdate") < F.lit("2024-07-01")).select("o_custkey")
    h2 = o.filter(F.col("o_orderdate") >= F.lit("2024-07-01")).select("o_custkey")
    return h1.distinct().exceptAll(h2.distinct()).select(
        F.col("o_custkey").alias("custkey_h1_only")
    )


def _q_rollup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def _q_scalar_fns(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"),
        F.concat(F.col("l_returnflag"), F.lit("-"), F.col("l_linestatus")).alias("flag"),
        F.upper(F.substring(F.col("l_returnflag"), 1, 1)).alias("flag_u"),
        F.abs(F.col("l_discount") - F.lit(0.05)).alias("disc_dev"),
        F.greatest(F.col("l_tax"), F.col("l_discount")).alias("max_rate"),
    )


def _q_json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast(T.LongType()))
        .groupBy("k")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def _q_events_window(spark, sf_dir):
    return W.tumbling_agg(_t(spark, sf_dir, "events"), "1 hour")


def _q_cell_visits(spark, sf_dir):
    """Geofence-dwell visits (B16 custom stateful op, batch twin of
    streaming/stateful.cell_visits_stateful): maximal runs of
    consecutive same-cell events per user. Cell derives from the event
    hour so entities 'dwell' and 'move' deterministically."""
    from o2g_spark.streaming import stateful as SF

    e = _t(spark, sf_dir, "events").withColumn(
        "cell", F.floor(F.hour("ts") / F.lit(6)).cast(T.LongType())
    )
    return SF.cell_visits_batch(e)


def _q_sessionize(spark, sf_dir):
    return W.sessionize(_t(spark, sf_dir, "events"), "30 minutes")


# ------------------------------------------------------------ spatial

def _q_cell_encode(spark, sf_dir):
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey")
    return pts.select(
        "c_custkey",
        cellfns.cell_encode("lat", "lon", CELL_RES).alias("cell_id"),
    )


def _q_cell_rollup(spark, sf_dir):
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey")
    coarse = cellfns.cell_parent(
        cellfns.cell_encode("lat", "lon", CELL_RES), CELL_RES, 5
    )
    return pts.select(coarse.alias("cell_r5")).groupBy("cell_r5").agg(
        F.count("*").alias("n_points")
    )


def _q_pip_join(spark, sf_dir):
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey")
    joined = pip.pip_join(pts, _pip_rings(), res=8)
    return joined.groupBy("zone_id").agg(F.count("*").alias("n_points"))


def _q_pip_rows(spark, sf_dir):
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey")
    return pip.pip_join(pts, _pip_rings(), res=8).select(
        "c_custkey", "zone_id"
    )


def _q_pip_anti(spark, sf_dir):
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey")
    return pip.pip_anti(pts, _pip_rings(), res=8).select("c_custkey")


def _q_tile_assign(spark, sf_dir):
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey")
    return tiles.assign_tiles(pts, TILE_ZOOM).select(
        "c_custkey", "tile_x", "tile_y", "tile_id"
    )


def _q_tile_density(spark, sf_dir):
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey")
    return tiles.tile_density(pts, zoom=7)


def _q_knn(spark, sf_dir):
    q = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey").filter(
        F.col("c_custkey") <= 50
    ).withColumnRenamed("c_custkey", "qid")
    t = _points(_t(spark, sf_dir, "supplier"), "s_acctbal", "s_suppkey").withColumnRenamed(
        "s_suppkey", "tid"
    )
    # tail_brute_cap=0 forces the PURE iterative k-ring path: at gate
    # cardinalities the cost model would otherwise (correctly) answer
    # the whole query with one brute cross join, and the ring
    # machinery — the part that needs the DuckDB hash check — would
    # leave gate coverage. The brute path is separately pinned by the
    # knn pytest oracles.
    return knn.knn_join(q, t, k=3, res=6, tail_brute_cap=0)


def _q_geotag_coords(spark, sf_dir):
    """Coordinate extraction over the documents stream. The synthetic
    corpus contains no coordinate literals (a trivially-0-row pass), so
    every 10th document gains a PLANTED copy whose text appends a
    derived coordinate — the gate then proves real extraction at every
    sf. Planted ids offset by 10^7; derivation/format is IEEE-exact in
    both engines (pmod + %.4f)."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("url"), "text"
    )
    lat = F.pmod(F.col("url") * F.lit(7.0), F.lit(110.0)) - F.lit(55.0) + F.lit(0.005)
    lon = F.pmod(F.col("url").cast(T.DoubleType()), F.lit(120.0)) - F.lit(60.0) + F.lit(0.005)
    planted = docs.filter(F.pmod(F.col("url"), F.lit(10)) == 0).select(
        (F.col("url") + F.lit(10_000_000)).alias("url"),
        F.concat(
            F.col("text"), F.format_string(" Located at %.4f, %.4f.", lat, lon)
        ).alias("text"),
    )
    out = geotag.extract_coords(docs.unionByName(planted), "text")
    return out.select("url", "lat", "lon", "mention")


def _q_geotag_extract(spark, sf_dir):
    """Coordinate extraction with a NON-trivial oracle: build coordinate-
    bearing text from customer rows (3-dp coords → %.4f formats with a
    trailing zero, identically in Java format_string and DuckDB printf),
    then run the real regex extractor over it."""
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey")
    docs = pts.select(
        "c_custkey",
        F.format_string(
            "Customer office at %.4f, %.4f (map).", F.col("lat"), F.col("lon")
        ).alias("text"),
    )
    out = geotag.extract_coords(docs, "text")
    return out.select("c_custkey", "lat", "lon", "mention")


# literal gazetteer for the place-mention oracle: names are pairwise
# non-substrings (the oracle joins on contains()) and digit-free
GAZ_PLACES = [
    ("Springfield", 39.7983, -89.6544),
    ("Rivertown", 41.5012, -72.1034),
    ("Lakewood", 39.7047, -105.0814),
    ("Eastmarch", 51.3021, 9.4912),
    ("Port Solis", -33.4489, -70.6693),
    ("Kirkhaven", 55.9533, -3.1883),
    ("Monteverde", 10.3009, -84.8251),
    ("Ashgrove", -27.4448, 152.9896),
    ("Windmere", 54.3781, -2.9382),
    ("Carroway", 35.2271, -80.8431),
    ("Delmont", 40.4406, -79.5953),
    ("Fairbanks Point", 64.8378, -147.7164),
    ("Quarry Hollow", 43.0731, -89.4012),
]


def _q_geotag_places(spark, sf_dir):
    """Gazetteer place-mention extraction (o2g stop-extraction analogue,
    SURVEY.md §2.A A3) with a NON-trivial oracle: place-bearing text is
    synthesized from customer rows (one known place per row), and the
    gazetteer is a literal reproduced as a VALUES CTE in the SQL twin."""
    cust = _t(spark, sf_dir, "customer")
    names = F.array(*[F.lit(p) for p, _, _ in GAZ_PLACES])
    docs = cust.select(
        "c_custkey",
        F.format_string(
            "Conference venue in %s, agenda to follow.",
            F.element_at(names, (F.pmod(F.col("c_custkey"), F.lit(len(GAZ_PLACES))) + 1).cast("int")),
        ).alias("text"),
    )
    gaz = spark.createDataFrame(GAZ_PLACES, "place string, lat double, lon double")
    out = geotag.extract_places(docs, gaz, "text")
    return out.select("c_custkey", "lat", "lon", "mention")


def _q_haversine(spark, sf_dir):
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey").filter(
        F.col("c_custkey") <= 100
    )
    return pts.select(
        "c_custkey",
        F.round(geo.haversine_km("lat", "lon", F.lit(52.52), F.lit(13.405)), 6).alias(
            "km_to_berlin"
        ),
    )


def _q_adaptive_split(spark, sf_dir):
    pts = _points(_t(spark, sf_dir, "customer"), "c_acctbal", "c_custkey")
    out = skew.adaptive_cell_split(pts, base_res=3, max_res=9, threshold=200)
    return out.groupBy("cell_adaptive").agg(F.count("*").alias("n_rows"))


# ----------------------------------------------------- text / dedup / sim

def _q_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        X.whitespace_token_count("text").alias("n_ws_tokens"),
    )


def _q_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    f = X.quality_features("text")
    return d.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["alpha_ratio"].alias("alpha_ratio"),
        f["punct_ratio"].alias("punct_ratio"),
        f["n_words"].alias("n_words"),
        f["stopword_ratio"].alias("stopword_ratio"),
        X.quality_score("text").alias("quality"),
    )


def _q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", X.lang_id("text").alias("lang_pred"))


def _arr_hash(arr: F.Column) -> F.Column:
    """Cross-engine scalar digest of an integer-array column: md5 of the
    comma-joined decimal strings (DuckDB twin: md5(array_to_string(...))).
    The driver's value-hash checker can't factorize list cells, so gate
    queries project arrays through this instead of returning them raw."""
    return F.md5(F.concat_ws(",", F.transform(arr, lambda v: v.cast("string"))))


def _arr_hash_sql(arr_expr: str) -> str:
    # coalesce: DuckDB array_to_string([]) is NULL, Spark concat_ws is ''
    return (
        f"md5(coalesce(array_to_string(list_transform({arr_expr}, "
        f"v -> CAST(v AS VARCHAR)), ','), ''))"
    )


def _q_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.md5_hash60("text").alias("text_hash"),
        F.size(X.fingerprint("text", 3, 16)).cast(T.LongType()).alias("fp_len"),
        _arr_hash(X.fingerprint("text", 3, 16)).alias("fp_hash"),
    )


def _pii_seeded(spark, sf_dir):
    """documents.text with deterministic PII appended (an email, an IPv4,
    a phone derived from doc_id) so every row exercises all three scrub
    passes — the raw synthetic corpus contains almost no PII."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10."),
            F.pmod(F.col("doc_id"), F.lit(200)).cast("string"),
            F.lit(".0.7 call (555) 123-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        ).alias("text"),
    )


_PII_SEEDED_SQL = (
    "SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.0.7 call (555) 123-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text"
    " FROM documents"
)


def _q_pii_scrub(spark, sf_dir):
    return pii.scrub_pii(_pii_seeded(spark, sf_dir), "doc_id", "text")


_BPE_K = 8


def _q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training (operators/bpe.py): k merges
    learned from the documents corpus via the word-frequency-dict
    formulation. The DuckDB twin unrolls the k data-dependent argmax
    iterations as MATERIALIZED CTEs (the same pattern as pagerank) —
    every merge decision and its weight value-hash exactly."""
    return bpe.bpe_merges_df(
        spark, _t(spark, sf_dir, "documents"), "text", _BPE_K)


def _q_bpe_encode(spark, sf_dir):
    """Train-then-encode on the same corpus: per-doc token counts plus
    an exact integer digest of every word's final segmentation under
    the k learned merges."""
    d = _t(spark, sf_dir, "documents")
    merges = bpe.bpe_train(d, "text", _BPE_K)
    return bpe.bpe_encode(d, "doc_id", "text", merges)


def _q_dedup_exact(spark, sf_dir):
    return dedup.dedup_exact(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _q_jaccard_pairs(spark, sf_dir):
    """df-capped candidate path (the 100-TB default: boilerplate
    shingles shared by millions of pages make the exact inverted-index
    join Σ df² — dedup.jaccard_pairs docstring). The DuckDB twin stays
    the EXACT path: at gate scale every true pair shares at least one
    sub-cap shingle, so the row sets agree and the hash check still
    pins the capped path's output end-to-end. That equivalence is a
    DATA property — assert it (0 dropped shingles) so regenerated or
    larger testdata surfaces as a clear precondition failure, not a
    mystery hash mismatch."""
    docs = _t(spark, sf_dir, "documents")
    dropped = dedup.jaccard_dropped_shingles(docs, "doc_id", "text",
                                             n=3, max_df=200)
    if dropped != 0:
        # explicit raise, not assert: python -O strips asserts and the
        # failure mode would revert to a mystery hash mismatch
        raise RuntimeError(
            f"jaccard gate precondition broken: {dropped} shingles exceed "
            "max_df=200 at gate scale, so the capped Spark path no longer "
            "matches the exact DuckDB twin — regenerate oracle or raise cap"
        )
    return dedup.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.4, max_df=200,
    )


def _q_containment(spark, sf_dir):
    """Asymmetric containment pairs (dedup.containment_pairs): the
    quote/subset detector symmetric Jaccard misses. Same df-capped
    candidate machinery and the same data-property precondition as
    the jaccard gate (0 dropped shingles ⇒ capped Spark path == exact
    DuckDB twin)."""
    docs = _t(spark, sf_dir, "documents")
    dropped = dedup.jaccard_dropped_shingles(docs, "doc_id", "text",
                                             n=3, max_df=200)
    if dropped != 0:
        raise RuntimeError(
            f"containment gate precondition broken: {dropped} shingles "
            "exceed max_df=200 at gate scale — regenerate oracle or raise cap"
        )
    return dedup.containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=200
    )


def _multiline_docs(docs):
    """Documents wrapped in synthetic boilerplate: a universal cookie
    banner + nav footer (df = 1.0) and an even-doc-only subscribe
    prompt (df = 0.5) around the original single-line body —
    deterministic in both engines (concat_ws skips the NULL branch in
    Spark AND DuckDB)."""
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("cookie notice accept all"),
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("subscribe to our newsletter")),
            F.lit("nav home about contact"),
        ).alias("text"),
    )


_MULTILINE_DOCS_SQL = """SELECT doc_id, concat_ws(chr(10),
  'cookie notice accept all', text,
  CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter' END,
  'nav home about contact') AS text FROM documents"""


def _strip_boilerplate_oracle_sql() -> str:
    from o2g_spark.operators import boilerplate

    return boilerplate.strip_boilerplate_sql(
        _MULTILINE_DOCS_SQL, "doc_id", "text",
        boilerplate.min_frac_df_sql(_MULTILINE_DOCS_SQL, 0.6),
    )


def _q_strip_boilerplate(spark, sf_dir):
    """CCNet-style corpus-frequency line removal (operators/
    boilerplate.py) over synthetic boilerplate wrapping. min_frac=0.6
    is scale-portable: the universal banner/footer (df 1.0) strip at
    every SF while the half-corpus subscribe line (df 0.5) survives —
    so even docs keep an embedded newline, exercising order-preserving
    rebuild, not just single-line passthrough."""
    from o2g_spark.operators import boilerplate

    docs = _t(spark, sf_dir, "documents")
    return boilerplate.strip_boilerplate(
        _multiline_docs(docs), "doc_id", "text", min_frac=0.6
    )


def _q_pagerank(spark, sf_dir):
    """Integer-exact PageRank (operators/graph.py) over a synthetic
    link graph derived from events: 50 nodes, src = user_id mod 50,
    dst = an affine event_id hash mod 50 — dense enough that 5 rounds
    differentiate ranks. BIGINT 1/1e12 rank units make the unrolled
    DuckDB CTE twin bit-identical (no float-sum ordering caveats)."""
    from o2g_spark.operators import graph

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("event_id") * 37 + 11) % 50).alias("dst"),
    )
    return graph.pagerank(edges, iterations=5)


def _pagerank_oracle_sql() -> str:
    from o2g_spark.operators import graph

    return graph.pagerank_sql(
        "SELECT user_id % 50 AS src, (event_id * 37 + 11) % 50 AS dst"
        " FROM events",
        iterations=5,
    )


def _q_url_canonical(spark, sf_dir):
    """URL canonicalization (operators/corpus.py url_canonical):
    messy synthetic URLs — uppercase scheme/host, userinfo, default
    port, trailing slash, tracking params, fragments — each feature
    toggled by doc_id residues so every branch of the canonicalizer
    is exercised. concat_ws('') builds them (Spark's concat
    null-propagates; concat_ws skips NULLs in both engines)."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat_ws(
        "",
        F.lit("HTTPS://"),
        F.when(d % 5 == 0, F.lit("user:pw@")),
        F.lit("W"),
        F.pmod(d, F.lit(7)).cast(T.StringType()),
        F.lit("."),
        F.upper("source"),
        F.lit(".ORG"),
        F.when(d % 2 == 0, F.lit(":443")).otherwise(F.lit(":8443")),
        F.lit("/p/"),
        d.cast(T.StringType()),
        F.when(d % 3 == 0, F.lit("/")),
        F.when(d % 4 == 0, F.lit("?utm_source=x&z=9&a=1"))
        .when(d % 4 == 1, F.lit("?gclid=1"))
        .when(d % 4 == 2, F.lit("?b=2&ref=tw&a=1")),
        F.lit("#sec"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        corpus.url_canonical(url).alias("canon_url"),
    )


_GATE_MESSY_URL_SQL = """concat_ws('', 'HTTPS://',
  CASE WHEN doc_id % 5 = 0 THEN 'user:pw@' END,
  'W', CAST(doc_id % 7 AS VARCHAR), '.', upper(source), '.ORG',
  CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':8443' END,
  '/p/', CAST(doc_id AS VARCHAR),
  CASE WHEN doc_id % 3 = 0 THEN '/' END,
  CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&z=9&a=1'
       WHEN doc_id % 4 = 1 THEN '?gclid=1'
       WHEN doc_id % 4 = 2 THEN '?b=2&ref=tw&a=1' END,
  '#sec')"""


def _q_repetition(spark, sf_dir):
    """Gopher repetition signals (operators/repetition.py). Every 3rd
    doc gets a twice-repeated trailing line so the dup-line features
    fire (the synthetic corpus is single-line); word-level dup/top-gram
    features are non-trivial everywhere (the ~30-word vocab repeats)."""
    from o2g_spark.operators import repetition

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("repeat promo line")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("repeat promo line")),
        ).alias("text"),
    )
    return repetition.repetition_report(planted, "doc_id", "text")


def _repetition_oracle_sql() -> str:
    from o2g_spark.operators import repetition

    planted = """SELECT doc_id, concat_ws(chr(10), text,
      CASE WHEN doc_id % 3 = 0 THEN 'repeat promo line' END,
      CASE WHEN doc_id % 3 = 0 THEN 'repeat promo line' END) AS text
    FROM documents"""
    return repetition.repetition_report_sql(planted, "doc_id", "text")


_PASSAGE = "the quick brown fox jumps over the lazy dog every single day"

_PASSAGE_DOCS_SQL = f"""SELECT doc_id, concat_ws(' ', text,
  CASE WHEN doc_id % 10 = 0 THEN '{_PASSAGE}' END) AS text
FROM documents"""


def _q_passage_dedup(spark, sf_dir):
    """Cross-doc passage-level exact-substring dedup (operators/
    passages.py, Lee et al. 2022 semantics): a fixed 12-token passage
    planted on every 10th doc — the globally-first planted doc keeps
    it, every later one loses exactly that span; k=8 also lets the
    ~30-word synthetic vocab produce occasional natural 8-gram
    repeats, exercising the non-planted path identically in both
    engines."""
    from o2g_spark.operators import passages

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.when(F.col("doc_id") % 10 == 0, F.lit(_PASSAGE)),
        ).alias("text"),
    )
    return passages.passage_dedup(planted, "doc_id", "text", k=8)


def _passage_dedup_oracle_sql() -> str:
    from o2g_spark.operators import passages

    return passages.passage_dedup_sql(_PASSAGE_DOCS_SQL, "doc_id", "text", k=8)


def _q_decontam(spark, sf_dir):
    """Benchmark decontamination (operators/decontam.py): GPT-3-style
    n-gram-overlap report of corpus docs sharing shingles with a
    benchmark set. Gate shape: bench = every 37th doc, corpus = the
    rest, n=4 (the synthetic vocab is ~30 words, so 4-grams give a
    non-trivial overlap set — planted near-dups of bench docs surface
    at ~0.98 contamination, chance collisions at ~0.02). Broadcast
    probe side pinned (eval suites are tiny next to the corpus)."""
    docs = _t(spark, sf_dir, "documents")
    return decontam.contamination_report(
        docs.where(F.col("doc_id") % 37 != 0),
        docs.where(F.col("doc_id") % 37 == 0),
        "doc_id", "text", n=4,
    )


# bloom_params(2500, 0.01) — sized for the LARGEST gate SF's member
# count (sf0.1: 2,500 even ids) so the filter is never saturated;
# frozen as literals so the DuckDB twin rebuilds the identical filter
BLOOM_M, BLOOM_K = 23994, 7


def _q_bloom_probe(spark, sf_dir):
    """Bloom membership probe (operators/membership.py): filter built
    over even doc ids, ALL docs probed — (doc_id, maybe_seen). The
    filter's 62-bit words and every probe bit are exact integer math
    off the shared 60-bit hash, so the DuckDB twin rebuilds the same
    filter and re-checks every position (no-false-negative property
    pinned in tests/test_membership.py)."""
    from o2g_spark.operators import membership

    docs = _t(spark, sf_dir, "documents")
    keys = docs.select(F.col("doc_id").cast(T.StringType()).alias("u"), "doc_id")
    seen = keys.where(F.col("doc_id") % 2 == 0).select("u")
    bl = membership.bloom_build(seen, "u", BLOOM_M, BLOOM_K)
    return membership.bloom_probe(keys, "u", bl, BLOOM_M, BLOOM_K).select(
        "doc_id", "maybe_seen"
    )


def _q_bloom_anti(spark, sf_dir):
    """bloom_prefilter_anti_join: EXACT anti-join semantics where the
    bloom pass routes only the maybe-seen sliver to the exact join —
    the crawl-frontier dedup primitive. The oracle is the plain anti
    join (the filter can add work, never drop a row)."""
    from o2g_spark.operators import membership

    docs = _t(spark, sf_dir, "documents")
    new = docs.select(F.col("doc_id").cast(T.StringType()).alias("u"))
    seen = docs.where(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast(T.StringType()).alias("u")
    )
    return membership.bloom_prefilter_anti_join(new, seen, "u", fp_rate=0.01)


def _bloom_probe_oracle_sql() -> str:
    """DuckDB twin of _q_bloom_probe: rebuild the identical filter
    (62-bit words, bit_or fold) and AND together every position's
    bit check per doc."""
    from o2g_spark.operators import membership

    build = membership.bloom_build_sql(
        "(SELECT CAST(doc_id AS VARCHAR) AS u FROM documents "
        "WHERE doc_id % 2 = 0)",
        "u", BLOOM_M, BLOOM_K,
    )
    pos = membership._positions_sql("u", BLOOM_M, BLOOM_K, "bloom")
    checks = " AND ".join(
        f"EXISTS (SELECT 1 FROM bloom b WHERE b.word_idx = {p} // 62 "
        f"AND (b.word & (CAST(1 AS BIGINT) << CAST({p} % 62 AS INTEGER)))"
        f" <> 0)"
        for p in pos
    )
    return f"""
WITH bloom AS ({build}),
keys AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS u FROM documents)
SELECT doc_id, ({checks}) AS maybe_seen FROM keys
"""


def _q_minhash_sig(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sig = dedup.minhash_signature("text", 16)
    return d.select(
        "doc_id",
        F.element_at(sig, 1).alias("sig_0"),
        _arr_hash(sig).alias("sig_hash"),
    )


def _q_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=32, bands=16, threshold=0.4,
    )


def _q_lsh_incremental(spark, sf_dir):
    """Incremental near-dup pairing against the PERSISTED LSH index
    (operators/lsh_index.py): docs with doc_id % 5 != 0 are the indexed
    corpus, the rest arrive as the new batch; output = pairs touching
    ≥1 new doc. The DuckDB twin is the full-corpus minhash_lsh twin
    filtered to the same pair set — equal by per-doc banding
    determinism (the split cannot change any pair's candidacy or
    score; equality also pinned in tests/test_lsh_index.py). The index
    rebuilds force=True under /tmp each call, so the query is
    self-contained and rerunnable."""
    import hashlib
    import tempfile

    from o2g_spark.operators import lsh_index

    docs = _t(spark, sf_dir, "documents")
    base = (
        f"{tempfile.gettempdir()}/o2g_gate_lsh_index_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    )
    lsh_index.lsh_index_build(
        spark, base, docs.filter("doc_id % 5 != 0"),
        num_hashes=32, bands=16, force=True,
    )
    return lsh_index.minhash_lsh_pairs_incremental(
        spark, base, docs.filter("doc_id % 5 = 0"), threshold=0.4
    )


def _q_emb_incremental(spark, sf_dir):
    """Incremental embedding near-dup pairing against the PERSISTED
    embedding index (operators/emb_index.py): the planted-dup union
    (same input as embedding_near_dup) split by vec_id % 5 — the
    non-zero residues are the indexed corpus, the rest arrive as the
    new batch; output = pairs touching ≥1 new vector. The DuckDB twin
    is the full-corpus literal-planes twin filtered to the same pair
    set — equal because hyperplane banding is per-vector deterministic
    (split cannot change candidacy or cosine; also pinned in
    tests/test_emb_index.py). Rebuilds force=True under /tmp so the
    query is self-contained and rerunnable."""
    import hashlib
    import tempfile

    from o2g_spark.operators import emb_index

    vecs = _emb_with_planted(spark, sf_dir)
    base = (
        f"{tempfile.gettempdir()}/o2g_gate_emb_index_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    )
    emb_index.emb_index_build(
        spark, base, vecs.filter("vec_id % 5 != 0"),
        bands=8, bits_per_band=12, seed=42, dim=64, force=True,
    )
    return emb_index.embedding_near_dup_incremental(
        spark, base, vecs.filter("vec_id % 5 = 0"), sim_threshold=0.9
    )


def _q_dup_clusters(spark, sf_dir):
    """Transitive dup-cluster canonicalization (operators/clusters.py):
    minhash-LSH near-dup pairs (same params as the minhash_lsh gate
    query) closed into connected components by the alternating
    large-star/small-star contraction — (doc_id, canon_id) with
    canon_id the component minimum. The DuckDB twin runs the
    recursive-CTE transitive closure over the same pairs SQL."""
    pairs = dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=32, bands=16, threshold=0.4,
    )
    return clusters.dup_clusters(pairs)


def _q_dup_stats(spark, sf_dir):
    """Cluster-size histogram over the dup_clusters labeling with the
    full documents table counted in (unpaired docs = size-1
    clusters): (cluster_size, n_clusters, n_docs, n_droppable) — the
    dedup job's published report; sum(n_droppable) is exactly what
    dedup_canonical would remove."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.4,
    )
    return clusters.dup_stats(
        clusters.dup_clusters(pairs), corpus=docs, id_col="doc_id"
    )


def _q_dedup_keep_best(spark, sf_dir):
    """Quality-policy corpus dedup (operators/clusters.py): per
    near-dup cluster keep the LONGEST-text member (ties → min
    doc_id), plus every unpaired doc — the keep-best twin of
    dedup_canonical's keep-min-id. Returns (doc_id, text_len) of the
    kept set; the DuckDB twin ranks the closure's components with
    ROW_NUMBER over (LENGTH(text) DESC, doc_id)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.4,
    )
    kept = clusters.dedup_keep_best(
        docs.withColumn("__len", F.length("text")),
        pairs, "doc_id", "__len",
    )
    return kept.select("doc_id", F.length("text").alias("text_len"))


# --------------------------------------------- corpus curation family

SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}
STRAT_FRACTIONS = {"en": 0.25, "de": 0.5, "zh": 1.0}


def _q_train_split(spark, sf_dir):
    """Deterministic train/val/test assignment (operators/corpus.py
    hash_split): membership is a pure function of (seed, doc_id) — a
    map-side CASE over the shared 60-bit hash, stable under any
    partitioning/cluster size (unlike randomSplit's per-partition
    RNG). Output: every doc with its split label."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.hash_split(docs, "doc_id", SPLIT_WEIGHTS).select(
        "doc_id", "lang", "split"
    )


def _q_strat_sample(spark, sf_dir):
    """Per-language deterministic downsampling (stratified_sample):
    keep-mask = hash bucket < per-stratum micro-threshold; strata
    absent from the map drop to 0 (fr/es filtered out here). A
    pushdown-friendly filter, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.stratified_sample(
        docs, "doc_id", "lang", STRAT_FRACTIONS
    ).select("doc_id", "lang")


def _q_weighted_sample(spark, sf_dir):
    """Weighted sample without replacement, k=50 (Efraimidis–Spirakis
    A-Res with the RNG replaced by the row hash): priority ln(u)/w,
    distributed top-k (TakeOrderedAndProject — per-partition heaps,
    no global sort). Weight = n_chars, so long docs are
    proportionally likelier."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.weighted_sample_topk(
        docs.select("doc_id", "n_chars"), "doc_id", "n_chars", k=50
    )


def _gate_urls(docs):
    """Deterministic synthetic URLs over documents (the driver tables
    carry no url column): subdomain varies by doc_id mod 7, the
    registered domain by source — 20 distinct domains, reproduced
    verbatim in the oracle."""
    return docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("https://w"),
            F.pmod("doc_id", F.lit(7)).cast(T.StringType()),
            F.lit("."),
            F.col("source"),
            F.lit(".org/p/"),
            F.col("doc_id").cast(T.StringType()),
        ).alias("url"),
    )


_GATE_URL_SQL = (
    "concat('https://w', CAST(doc_id % 7 AS VARCHAR), '.', source, "
    "'.org/p/', CAST(doc_id AS VARCHAR))"
)


def _q_domain_cap(spark, sf_dir):
    """Per-registered-domain diversity cap (operators/corpus.py
    domain_cap): top 5 docs per domain by n_chars (ties → min
    doc_id). Host/domain parse via engine-neutral regex; one domain
    shuffle + a rank window that is itself the hot-host skew bound."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.domain_cap(
        _gate_urls(docs), "url", "n_chars", "doc_id", max_per_domain=5
    ).select("doc_id", "domain", "n_chars")


_MIX_W = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0}
_MIX_TOKENS = 40_000  # src0 budget 20k > its sf0.01 avail → upsampling


def _q_corpus_mix(spark, sf_dir):
    """Training-data mixing, exact-fill strategy (operators/corpus.py
    mix_plan): the weighted domain-rebalance copy plan — src0
    upsamples past one epoch at sf0.01, src2/src3 keep a hash-ordered
    prefix; all budget arithmetic BIGINT-exact, emitted tokens never
    exceed a domain's budget (pinned in tests/test_mixing.py). One
    domain-key shuffle + a cumsum window."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.mix_plan(
        docs, "source", "n_chars", "doc_id", _MIX_W, _MIX_TOKENS
    )


def _q_corpus_mix_bucket(spark, sf_dir):
    """Training-data mixing, skew-proof exact strategy (mix_plan
    strategy='bucket'): the same cumsum decomposed over top-12-hash-
    bit runs so every window task is ~avail/4096-bounded — output
    BIT-IDENTICAL to strategy='window', so the oracle is the window
    twin (algebraic equivalence; measured 11.5× at 50M docs with a
    60%-mass domain — 20.3 vs 233.8 s, scripts/bench_mixing.py)."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.mix_plan(
        docs, "source", "n_chars", "doc_id", _MIX_W, _MIX_TOKENS,
        strategy="bucket",
    )


def _q_corpus_mix_rate(spark, sf_dir):
    """Training-data mixing, narrow rate strategy (mix_plan
    strategy='rate'): the mega-domain escape — partial-epoch
    membership is a pure hash threshold, the corpus scans ONCE with
    zero exchanges (per-domain totals are a bounded <= len(weights)
    driver collect); hits each budget in expectation."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.mix_plan(
        docs, "source", "n_chars", "doc_id", _MIX_W, _MIX_TOKENS,
        strategy="rate",
    )


def _q_doc_chunks(spark, sf_dir):
    """Token-window chunking for training-sequence prep (doc_chunks):
    32-token chunks, 8-token overlap, over every 10th doc; arrays
    materialized before the explode (CLAUDE.md rule 1)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return corpus.doc_chunks(docs, "doc_id", "text", chunk_tokens=32, overlap=8)


def _q_tfidf_topk(spark, sf_dir):
    """Top-3 rarity-weighted terms per doc (tfidf_topk): integer
    score (tf * 1e6) // df — the TF-IDF ranking with idf as an exact
    rational so both engines agree to the bit (ln's last ulp is not
    contractual cross-engine)."""
    return corpus.tfidf_topk(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)


_LM_TRAIN_CUT = 500_000  # hash-bucket micro-threshold: 50% training half

_LM_TRAIN_SQL = (
    "SELECT * FROM documents WHERE "
    + corpus.hash_bucket_micro_sql("doc_id", "lmtrain")
    + f" < {_LM_TRAIN_CUT}"
)


def _lm_train_docs(spark, sf_dir):
    """Deterministic 50% training half (the corpus.py hash-bucket
    machinery) — the gate's 'trusted corpus' stand-in. Pure filter,
    identical membership in both engines."""
    docs = _t(spark, sf_dir, "documents")
    return docs.where(
        corpus.hash_bucket_micro("doc_id", "lmtrain") < _LM_TRAIN_CUT
    )


def _q_lm_train(spark, sf_dir):
    """Add-one bigram LM training (operators/lmfilter.py lm_train):
    the model table itself — bigram/context counts plus the smoothed
    conditional probability in EXACT integer ppm — over the hash
    training half. Two n-gram-keyed partial-agg shuffles; no float
    anywhere in the output."""
    return lmfilter.lm_train(
        _lm_train_docs(spark, sf_dir), "doc_id", "text", min_count=2
    )


def _q_lm_score(spark, sf_dir):
    """Per-doc NLL under the bigram LM (lm_score — the CCNet/KenLM
    perplexity-filter shape): train on the hash half, score EVERY
    doc. Each term is ln of an exact integer; the order-dependent
    sums are rounded ONCE per output column (4 dp) in both engines
    (CLAUDE.md float policy)."""
    docs = _t(spark, sf_dir, "documents")
    return lmfilter.lm_score(
        _lm_train_docs(spark, sf_dir), docs, "doc_id", "text"
    )


_DSIR_BUCKETS = 1024


def _q_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (lmfilter.dsir_logweights; Xie et
    al. 2023): hashed-bigram bag models, target = the English subset,
    raw = the full corpus. Both count tables are hard-bounded at 1024
    hash buckets, so the model side broadcasts at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    return lmfilter.dsir_logweights(
        docs,
        docs.where(F.col("lang") == "en"),
        "doc_id",
        "text",
        buckets=_DSIR_BUCKETS,
    )


# doc_id-seeded mojibake so every clean_text pass fires on every row
# (the pii_scrub convention); identical literals in both engines
_CLEAN_JUNK = (
    "“Q”   ",   # curly quotes + nbsp + space run
    "​z— \r\n",           # zero-width, em-dash, CRLF
    " …\t\t ",                 # ellipsis + tab run
)
_CLEAN_TAIL = " ‘t’ − "  # curly singles + minus + trail


def _q_clean_text(spark, sf_dir):
    """Unicode normalization (functions/text.py clean_text — the
    CCNet/Dolma pre-dedup pass): every doc decorated with
    doc_id-derived mojibake covering all 12 passes, then cleaned.
    Sequential codegen regexp_replace in the Java∩RE2 subset —
    single scan, zero shuffles, idempotent (pinned by test)."""
    docs = _t(spark, sf_dir, "documents")
    junk = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_CLEAN_JUNK[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_CLEAN_JUNK[1]))
        .otherwise(F.lit(_CLEAN_JUNK[2]))
    )
    decorated = F.concat(junk, F.col("text"), F.lit(_CLEAN_TAIL))
    return docs.select(
        "doc_id", X.clean_text(decorated).alias("text_clean")
    )


def _clean_text_oracle_sql() -> str:
    j0, j1, j2 = _CLEAN_JUNK
    # NULL-propagating like Spark's F.concat (DuckDB concat SKIPS null
    # args — a NULL text would otherwise clean to junk+tail, not NULL)
    decorated = (
        f"CASE WHEN text IS NULL THEN NULL ELSE "
        f"concat(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN '{j0}' "
        f"WHEN 1 THEN '{j1}' ELSE '{j2}' END, text, '{_CLEAN_TAIL}') END"
    )
    return (
        f"SELECT doc_id, {X.clean_text_sql(decorated)} AS text_clean "
        "FROM documents"
    )


_BM25_QCUT = 40_000  # ~4% of docs double as retrieval queries


def _bm25_queries(spark, sf_dir):
    """Deterministic query set: the 4-word prefixes of a ~4%
    hash-bucket sample of the corpus (the same corpus.py micro-bucket
    machinery as the LM training half — identical membership in both
    engines)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.where(
        corpus.hash_bucket_micro("doc_id", "bm25q") < _BM25_QCUT
    ).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(X.words("text"), 1, 4), " ").alias("qtext"),
    )


def _q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-5 retrieval (operators/retrieval.py bm25_topk):
    rank every corpus document against each sampled query. The idf is
    ln of EXACT integers (``ln(2N+2) − ln(2df+1)``) and the tf chain
    is a fixed sequence of correctly-rounded IEEE ops in exact
    milli-units, so scores value-hash; ranks tie-break on doc_id."""
    docs = _t(spark, sf_dir, "documents")
    return retrieval.bm25_topk(docs, _bm25_queries(spark, sf_dir), k=5)


_QSK_Q = {"p50": 0.5, "p90": 0.9, "p99": 0.99}


def _q_quantiles(spark, sf_dir):
    """Relative-error quantile sketch (sketches.quantile_sketch): the
    per-language doc-length distribution (p50/p90/p99 of n_chars) off
    the DDSketch-shaped base-2 integer histogram — bucket ids, counts,
    rank rule and midpoint estimates are ALL integer-exact, so the
    DuckDB twin rebuilds the sketch cell-for-cell (guaranteed relative
    error ≤ 2^-5; ≤ ~2e3 sketch rows per group cross the shuffle
    regardless of corpus size)."""
    docs = _t(spark, sf_dir, "documents")
    return sketches.quantile_sketch(docs, ["lang"], "n_chars", _QSK_Q)


_CMS_W, _CMS_D = 64, 4  # deliberately collision-pressured at 150 users


def _q_cms_users(spark, sf_dir):
    """Count-Min point queries (sketches.cms_build + cms_query): the
    per-user event-count estimate for every distinct user, under a
    deliberately small w=64 so collisions are exercised — est ≥ true
    always (pinned in tests/test_cms.py), exact integers only, the
    DuckDB twin rebuilds the sketch cell-for-cell."""
    ev = _t(spark, sf_dir, "events")
    sk = sketches.cms_build(ev, "user_id", w=_CMS_W, d=_CMS_D)
    return sketches.cms_query(sk, ev, "user_id", w=_CMS_W, d=_CMS_D)


def _q_heavy_users(spark, sf_dir):
    """Exact heavy hitters via the CMS no-false-negative prefilter
    (sketches.cms_heavy_hitters): users with ≥70 events, the exact
    shuffle carrying only the maybe-heavy sliver. The oracle is the
    PLAIN GROUP BY/HAVING — the prefilter provably never changes the
    result, so the gate checks algebraic equivalence."""
    ev = _t(spark, sf_dir, "events")
    return sketches.cms_heavy_hitters(
        ev, "user_id", 70, w=_CMS_W, d=_CMS_D
    )


def _q_hll_words(spark, sf_dir):
    """Per-language HLL distinct estimate of (doc_id, word) pairs
    (operators/sketches.py): registers from the shared 60-bit hash,
    harmonic mean in scaled-integer space, ONE float division — the
    sketch AND estimate are bit-identical to the DuckDB twin. p=9
    keeps every sf0.01 stratum above the raw estimator's 2.5·m
    regime floor."""
    docs = _t(spark, sf_dir, "documents")
    # materialize the word array, then explode (CLAUDE.md rule 1)
    exploded = (
        docs.withColumn("__ws", X.words("text"))
        .select("lang", "doc_id", F.explode("__ws").alias("w"))
        .select(
            "lang",
            F.concat(
                F.col("doc_id").cast(T.StringType()), F.lit(":"), F.col("w")
            ).alias("v"),
        )
    )
    return sketches.hll_distinct(exploded, ["lang"], "v", p=9)


def _q_hll_window(spark, sf_dir):
    """Tumbling-window HLL distinct users per event type
    (sketches.hll_window_batch) — the batch twin of
    streaming.stateful.hll_window_stream (bounded 2^p-byte state per
    open window vs dropDuplicates' cardinality-sized state); the
    stream is pinned bit-identical to this twin in
    tests/test_sketches.py. Window start rides as epoch seconds so
    stream, batch, and DuckDB agree without timezone coupling."""
    return sketches.hll_window_batch(
        _t(spark, sf_dir, "events"), ["event_type"], "user_id", "ts",
        window_seconds=6 * 3600, p=9,
    )


_QSKW_Q = {"p50": 0.5, "p90": 0.9, "p99": 0.99}


def _q_quantiles_window(spark, sf_dir):
    """Tumbling-window user-id quantiles per event type
    (sketches.qsketch_window_batch) — the batch twin of
    streaming.stateful.quantile_window_stream (bounded
    bucket-histogram state per open window); the stream is pinned
    bit-identical to this twin in tests/test_qsketch.py. Window start
    rides as epoch seconds, all arithmetic integer-exact."""
    return sketches.qsketch_window_batch(
        _t(spark, sf_dir, "events"), ["event_type"], "user_id", "ts",
        window_seconds=6 * 3600, quantiles=_QSKW_Q,
    )


def _q_asof_join(spark, sf_dir):
    """As-of join (operators/temporal.py): every click event picks up
    the latest prior-or-equal 'view' by the same user — union +
    ordered window (ONE key shuffle, no join fan-out), vs DuckDB's
    rank-form theta join. Ties on ts resolve to max view id."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), "user_id", "ts", "value"
    )
    return temporal.asof_join(
        clicks, views, "user_id", "ts", "ts", ["v_id", "value"], tie_col="v_id"
    )


def _q_asof_skew(spark, sf_dir):
    """The SAME as-of join through the hot-key escape plan
    (time_bucket_seconds: (key, time-bucket) windows + per-key bucket
    carry — the strategy for entities whose history AQE's skew
    handling can't split, since WindowExec partitions are unsplittable).
    Shares asof_join's oracle: the two plans are row-identical by
    contract (also pinned across widths in tests/test_temporal.py)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), "user_id", "ts", "value"
    )
    return temporal.asof_join(
        clicks, views, "user_id", "ts", "ts", ["v_id", "value"],
        tie_col="v_id", time_bucket_seconds=6 * 3600,
    )


def _q_interval_join(spark, sf_dir):
    """Bucketed interval join, KEYED per entity: each user's clicks
    landing inside the 1-hour window after that user's signups.
    Intervals explode to covered hour buckets (materialized array),
    points map to one bucket, equi-join on (user, bucket) + exact
    refine — the scale-safe range join vs DuckDB's native range
    predicate. The key is the output-size bound: an unkeyed interval
    join is a cross-join in disguise at crawl scale."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    pts = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("t")
    )
    return temporal.interval_join(
        pts, iv, "t", "s", "e", bucket_seconds=3600, keys=["user_id"]
    ).select("signup_id", "user_id", "p_click_id")


def _q_pack_sequences(spark, sf_dir):
    """Greedy next-fit sequence packing (operators/packing.py): docs
    shard by the 60-bit hash (one shuffle), each shard packs its
    id-ordered docs into 1024-token bins inside one applyInPandas
    group — the inherently-sequential discipline kept small per task.
    The DuckDB twin replays the identical walk as a recursive CTE
    advancing all shards one doc per iteration. Token counts come
    from n_chars so the twin needs no tokenizer."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("toks")
    )
    return packing.pack_sequences(docs, "doc_id", "toks", budget=1024, shards=8)


def _q_simhash_pairs(spark, sf_dir):
    return dedup.simhash_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


def _q_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return similarity.cosine_topk(emb, q, k=5)


def _q_cosine_topk_q8(spark, sf_dir):
    """cosine_topk over int8-quantized codes (similarity.py): 4×
    smaller vectors on the shuffle/index path; the dot product and
    norms are EXACT integers, so even the cosine float is
    bit-identical cross-engine (mul/div/sqrt are correctly-rounded
    IEEE ops — unlike ln/pow). Recall vs exact cosine pinned in
    tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return similarity.cosine_topk_quantized(emb, q, k=5)


def _q_ann_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return similarity.ann_lsh_topk(emb, q, dim=int(dim), k=5, n_planes=8)


def _q_ann_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return similarity.ann_ivf_topk(emb, q, k=5, n_centroids=16, nprobe=3)


def _emb_with_planted(spark, sf_dir):
    """embeddings ∪ deterministically perturbed copies of vec_id < 200
    at vec_id + 10^6 (cosine ≈ 1): the planted near-dups both the
    banded-pairs query and the streaming-twin query detect. The
    perturbation is exact-rational IEEE arithmetic, so DuckDB twins
    reproduce the input bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast(T.LongType()).alias("vec_id"), "embedding"
    )
    pert = emb.filter(F.col("vec_id") < 200).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x.cast("double")
                + F.pmod(i * F.lit(37) + F.lit(11), F.lit(97)).cast("double")
                / F.lit(97.0) * F.lit(0.0006)
                - F.lit(0.0003)
            ).cast("float"),
        ).alias("embedding"),
    )
    return emb.unionByName(pert)


def _q_embedding_near_dup(spark, sf_dir):
    """Banded-LSH near-dup pairs with PLANTED duplicates: vec_id < 200
    get a deterministically perturbed copy at vec_id + 1_000_000
    (cosine ≈ 1), so the gate proves the operator finds real pairs at
    every sf instead of vacuously returning 0 rows. The perturbation is
    exact-rational IEEE arithmetic (no libm sin — 1-ulp cross-engine
    drift) so the DuckDB twin reproduces the input bit-for-bit; the
    twin embeds the seeded hyperplane matrix as literals, making this a
    full value-hash entry. Recall bound vs brute force additionally
    pinned by tests/test_similarity.py."""
    return similarity.embedding_near_dup_pairs(
        _emb_with_planted(spark, sf_dir), sim_threshold=0.9
    )


def _q_semdedup(spark, sf_dir):
    """SemDeDup (operators/semdedup.py): coarse k-means clusters +
    within-cluster lower-id max-cosine keep rule — the semantic-dedup
    published stage. Input reuses the PLANTED near-dup construction
    (_emb_with_planted: perturbed copies at vec_id + 10⁶, cosine ≈ 1,
    IEEE-exact in both engines) so the drop signal is real at every
    sf (the frozen embeddings have no organic near-dups — max
    within-cluster cosine 0.475). Centroids are trained on the BASE
    embeddings (the serving `centroids=` path), replicated Spark-free
    in the twin via ivf_train_centroids_local."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = similarity.ivf_train_centroids(emb, n_centroids=16)
    return semdedup_op.semdedup(
        _emb_with_planted(spark, sf_dir),
        n_clusters=16,
        threshold=0.9,
        centroids=cent,
    )


def _q_ordered_collect(spark, sf_dir):
    """A5/A9/A11 ordered-collect parity AT THE GATE (was pytest-only):
    lineitem rows act as (route=orderkey, seq=linenumber, stop=partkey)
    relation members; the REAL gtfs.route_stop_lists operator builds the
    member-ordered stop array (sort_array over collect_list of structs),
    digested to a comma-joined scalar for the value-hash checker."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("route_id"),
        F.col("l_linenumber").alias("stop_sequence"),
        F.col("l_partkey").alias("stop_id"),
    )
    out = gtfs.route_stop_lists(li)
    return out.select(
        "route_id",
        F.size("stop_ids").cast(T.LongType()).alias("n_stops"),
        F.concat_ws(
            ",", F.transform("stop_ids", lambda s: s.cast("string"))
        ).alias("stop_list"),
    )


def _planes_values_sql(dim: int, n_planes: int, seed: int = 42) -> str:
    """(p, w) literal rows of the seeded hyperplane matrix — lets the
    DuckDB twins reproduce the numpy LSH bucketing exactly."""
    from o2g_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    return ", ".join(
        f"({p}, CAST(["
        + ", ".join(repr(float(v)) for v in planes[:, p])
        + "] AS DOUBLE[]))"
        for p in range(n_planes)
    )


def _near_dup_oracle_sql() -> str:
    """DuckDB twin of _q_embedding_near_dup: reproduces the perturbed
    union bit-for-bit (exact-rational eps), embeds the seeded
    hyperplane matrix (8 bands × 12 bits, dim 64) as literal rows,
    bands the sign bits identically to lsh_band_keys_udf, and verifies
    cosine with the zipped-unnest sequential fold (same order as
    Spark's F.aggregate, so the 6-dp round compares exactly). Sign
    decisions tolerate the numpy-BLAS vs sequential-sum rounding split:
    a flip needs |dot| ≲ 1e-13, unobserved on the frozen test data."""
    bands, bits, dim = 8, 12, 64
    rows = _planes_values_sql(dim, bands * bits)
    dot = similarity.dot_sql("va", "vb")
    na = similarity.dot_sql("va", "va")
    nb = similarity.dot_sql("vb", "vb")
    return f"""
WITH base AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
  UNION ALL
  SELECT CAST(vec_id AS BIGINT) + 1000000,
         list_transform(embedding, (x, i) ->
           CAST(CAST(x AS DOUBLE)
                + CAST(((i - 1) * 37 + 11) % 97 AS DOUBLE) / 97.0 * 0.0006
                - 0.0003 AS FLOAT))
  FROM embeddings WHERE vec_id < 200
),
planes(p, w) AS (VALUES {rows}),
keys AS (
  SELECT b.vec_id, pl.p // {bits} AS band,
         sum(CASE WHEN list_inner_product(
                    list_transform(b.embedding, v -> CAST(v AS DOUBLE)),
                    pl.w) > 0
             THEN CAST(1 AS BIGINT) << (pl.p % {bits})
             ELSE CAST(0 AS BIGINT) END)
           AS key
  FROM base b CROSS JOIN planes pl
  GROUP BY b.vec_id, pl.p // {bits}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keys a JOIN keys b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
),
vv AS (
  SELECT c.id_a, c.id_b, ea.embedding AS va, eb.embedding AS vb
  FROM cand c
  JOIN base ea ON ea.vec_id = c.id_a
  JOIN base eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b,
       round({dot} / greatest(sqrt({na}) * sqrt({nb}), 1e-300), 6) AS sim
FROM vv
WHERE round({dot} / greatest(sqrt({na}) * sqrt({nb}), 1e-300), 6) >= 0.9
"""


_EMB_PLANTED_SQL = """(
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
  UNION ALL
  SELECT CAST(vec_id AS BIGINT) + 1000000 AS vec_id,
         list_transform(embedding, (x, i) ->
           CAST(CAST(x AS DOUBLE)
                + CAST(((i - 1) * 37 + 11) % 97 AS DOUBLE) / 97.0 * 0.0006
                - 0.0003 AS FLOAT)) AS embedding
  FROM embeddings WHERE vec_id < 200
)"""


def _semdedup_oracle_sql() -> str:
    """DuckDB twin of _q_semdedup: the planted union reproduced
    bit-for-bit (same exact-rational perturbation as the near-dup
    twin), centroids trained Spark-free on the base embeddings
    (ivf_train_centroids_local — bit-identical to the Spark training
    by construction), assignment + within-cluster max-cosine in SQL
    (semdedup_sql). Trains at ORACLE_SF_DIR like ann_ivf."""
    cent = similarity.ivf_train_centroids_local(
        os.path.join(_oracle_sf_dir(), "embeddings.parquet"), n_centroids=16
    )
    return semdedup_op.semdedup_sql(
        f"{_EMB_PLANTED_SQL}", cent, threshold=0.9
    )


def _ann_lsh_oracle_sql() -> str:
    """DuckDB twin of _q_ann_lsh (n_planes=8, multiprobe): the 8-plane
    sign bucket reproduces lsh_bucket_udf; each query probes its own
    bucket plus the 8 Hamming-1 neighbors; true cosine (zipped-unnest
    fold, 6-dp round) ranks candidates with the (sim DESC, vec_id ASC)
    tie-break — identical to the Spark path's window."""
    rows = _planes_values_sql(64, 8)
    dot = similarity.dot_sql("va", "vb")
    na = similarity.dot_sql("va", "va")
    nb = similarity.dot_sql("vb", "vb")
    return f"""
WITH planes(p, w) AS (VALUES {rows}),
keys AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_inner_product(
                    list_transform(e.embedding, v -> CAST(v AS DOUBLE)),
                    pl.w) > 0
             THEN CAST(1 AS BIGINT) << pl.p ELSE CAST(0 AS BIGINT) END)
           AS bkt
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id
),
q AS (
  SELECT k.vec_id AS qid,
         unnest([k.bkt] || list_transform(range(0, 8),
                j -> xor(k.bkt, CAST(1 AS BIGINT) << j))) AS probe
  FROM keys k WHERE k.vec_id < 10
),
cand AS (
  SELECT DISTINCT q.qid, k.vec_id
  FROM q JOIN keys k ON k.bkt = q.probe
),
vv AS (
  SELECT c.qid, c.vec_id, eq.embedding AS va, ec.embedding AS vb
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings ec ON ec.vec_id = c.vec_id
),
scored AS (
  SELECT qid, vec_id,
         round({dot} / greatest(sqrt({na}) * sqrt({nb}), 1e-300), 6) AS sim
  FROM vv
)
SELECT qid, vec_id, sim,
       CAST(row_number() OVER (PARTITION BY qid
            ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS sim_rank
FROM scored QUALIFY sim_rank <= 5
"""


def _oracle_sf_dir() -> str:
    """sf dir the data-dependent oracles train against — resolved at
    oracle_sql() CALL time (not import) so check_oracles.py can repoint
    it per run. Default = the driver's gate sf."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _ann_ivf_oracle_sql() -> str:
    """DuckDB twin of _q_ann_ivf — the k-means quantizer is deterministic
    end-to-end (md5-ranked sample prefix + seeded numpy k-means), so the
    trained centroids are a reproducible CONSTANT of the gate data:
    ivf_train_centroids_local replicates the training Spark-free (duckdb
    read + same hash + same numpy), and the centroids + their numpy
    squared norms are embedded as literal VALUES (the _planes_values_sql
    pattern). Assignment replicates the UDF's d = ||c||² - 2 v·c argmin;
    nearest-centroid ties would break differently (numpy argsort is
    unstable) but need exact float equality — unobserved on frozen data,
    same tolerance class as the LSH sign-flip note. Trains at
    ORACLE_SF_DIR (the driver gates at sf0.01; scripts/check_oracles.py
    re-points it via $SPARK_GRAFT_ORACLE_SF_DIR for other sfs)."""
    cent = similarity.ivf_train_centroids_local(
        os.path.join(_oracle_sf_dir(), "embeddings.parquet"), n_centroids=16
    )
    cn = (cent * cent).sum(axis=1)  # same numpy expression as ivf_assign_udf
    rows = ", ".join(
        f"({j}, CAST(["
        + ", ".join(repr(float(v)) for v in cent[j])
        + f"] AS DOUBLE[]), {float(cn[j])!r})"
        for j in range(len(cent))
    )
    dot = similarity.dot_sql("va", "vb")
    na = similarity.dot_sql("va", "va")
    nb = similarity.dot_sql("vb", "vb")
    return f"""
WITH cent(cid, w, cn) AS (VALUES {rows}),
dist AS (
  SELECT e.vec_id, ct.cid,
         ct.cn - 2.0 * list_inner_product(
           list_transform(e.embedding, v -> CAST(v AS DOUBLE)), ct.w) AS d
  FROM embeddings e CROSS JOIN cent ct
),
cbkt AS (
  SELECT vec_id, cid AS bkt FROM dist
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
),
qprobe AS (
  SELECT vec_id AS qid, cid AS bkt FROM dist WHERE vec_id < 10
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) <= 3
),
cand AS (
  SELECT DISTINCT q.qid, c.vec_id
  FROM qprobe q JOIN cbkt c ON c.bkt = q.bkt
),
vv AS (
  SELECT c.qid, c.vec_id, eq.embedding AS va, ec.embedding AS vb
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings ec ON ec.vec_id = c.vec_id
),
scored AS (
  SELECT qid, vec_id,
         round({dot} / greatest(sqrt({na}) * sqrt({nb}), 1e-300), 6) AS sim
  FROM vv
)
SELECT qid, vec_id, sim,
       CAST(row_number() OVER (PARTITION BY qid
            ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS sim_rank
FROM scored QUALIFY sim_rank <= 5
"""


# --------------------------------------------------- rows-only showcases

def _q_gtfs_resolve(spark, sf_dir):
    stops_pdf, routes_pdf, _ = synth.gen_parity()
    stops = tables.stops_df(spark, stops_pdf)
    routes = tables.routes_df(spark, routes_pdf)
    return gtfs.resolve_members(routes, gtfs.filter_stops(stops))


def _gtfs_resolve_oracle_sql() -> str:
    """DuckDB twin of _q_gtfs_resolve: the deterministic parity fixtures
    are serialized RAW into VALUES CTEs (tag values as columns, ordered
    members with their 0-based position), and the SQL re-implements the
    A3 tag filter, A5 ordered unnest, and A6/A7 inner join that drops
    dangling refs — so the o2g resolution semantics themselves are
    value-hash checked, not just row-counted."""
    stops_pdf, routes_pdf, _ = synth.gen_parity()

    def q(v) -> str:
        return f"'{v}'" if v is not None else "CAST(NULL AS VARCHAR)"

    stop_vals = ", ".join(
        f"({int(r.stop_id)}, {q(r.tags.get('public_transport'))}, "
        f"{q(r.tags.get('highway'))}, {q(r.tags.get('railway'))}, "
        f"{float(r.lat)!r}, {float(r.lon)!r})"
        for r in stops_pdf.itertuples()
    )
    member_vals = ", ".join(
        f"({int(r.route_id)}, '{r.route_type}', {pos}, {int(m['ref'])})"
        for r in routes_pdf.itertuples()
        for pos, m in enumerate(r.members)
    )
    return f"""
WITH stops(stop_id, public_transport, highway, railway, lat, lon)
  AS (VALUES {stop_vals}),
members(route_id, route_type, stop_sequence, ref)
  AS (VALUES {member_vals}),
fs AS (
  SELECT * FROM stops
  WHERE public_transport IN ('stop_position', 'platform')
     OR highway = 'bus_stop'
     OR railway IN ('station', 'halt')
)
SELECT CAST(m.route_id AS BIGINT) AS route_id, m.route_type,
       CAST(m.stop_sequence AS INTEGER) AS stop_sequence,
       CAST(s.stop_id AS BIGINT) AS stop_id,
       CAST(s.lat AS DOUBLE) AS lat, CAST(s.lon AS DOUBLE) AS lon
FROM members m JOIN fs s ON m.ref = s.stop_id
"""


def _q_multimodal_decode(spark, sf_dir):
    """Drives the real mapInPandas decode plumbing, then posexplodes the
    float feature array into scalar rows (the checker can't factorize
    list cells, and float→string formats differ across engines — round
    a DOUBLE instead). Full value-hash oracle: the twin recomputes
    width/height/features from the sha256 of the same payload hex
    serialized into a VALUES CTE."""
    out = multimodal.decode_images(multimodal.synth_media(spark, n=60))
    return out.select(
        "media_id", "width", "height", "n_bytes",
        F.posexplode("feature").alias("slot", "__f"),
    ).select(
        "media_id", "width", "height", "n_bytes", "slot",
        F.round(F.col("__f").cast(T.DoubleType()), 6).alias("feature_val"),
    )


def _q_lineage_digest(spark, sf_dir):
    """B15 under the gate: the checkpoint manifest's per-bucket lineage
    (bucket id, row count, order-insensitive digest) computed by the
    REAL plans.checkpoint.lineage_df machinery in its portable flavor —
    the invariant BASELINE.json names (per-partition lineage rows that
    are identical at any parallelism) becomes driver-checkable instead
    of self-reported. Int/string columns only: portable-digest contract
    (float stringification differs across engines)."""
    from o2g_spark.plans import checkpoint

    src = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    return checkpoint.lineage_df(src, key_col="o_orderkey", n_buckets=32,
                                 portable=True)


def _lineage_oracle_sql() -> str:
    """DuckDB twin of _q_lineage_digest: recomputes the md5-60 row hash
    over the chr(31)-joined stringified columns, the md5-bucketing of
    the key, and the commutative bit_xor rollup."""
    row_h = X.md5_hash60_sql(
        "concat_ws(chr(31), CAST(o_orderkey AS VARCHAR), "
        "CAST(o_custkey AS VARCHAR), o_orderstatus, o_orderpriority)"
    )
    key_h = X.md5_hash60_sql("CAST(o_orderkey AS VARCHAR)")
    return f"""
WITH h AS (
  SELECT {key_h} % 32 AS partition_id, {row_h} AS hh
  FROM orders
)
SELECT partition_id, count(*) AS row_count, bit_xor(hh) AS digest
FROM h GROUP BY partition_id
"""


def _q_html_to_text(spark, sf_dir):
    """B3 under the gate: the byte-identical-text invariant BASELINE.json
    names explicitly (was pytest-golden-only). Drives the REAL
    extract_text operator (bytes-level Arrow UDF) over the deterministic
    html fixtures and digests the extracted text with sha2 — any drift
    in the canonical extraction function flips the value hash."""
    rows = multimodal.synth_html_rows(80)
    df = spark.createDataFrame(
        [(u, h.encode("ascii")) for u, h in rows],
        T.StructType([
            T.StructField("url", T.StringType(), False),
            T.StructField("html", T.BinaryType(), False),
        ]),
    )
    out = multimodal.extract_text(df)
    return out.select(
        "url",
        F.length("text_extracted").cast(T.LongType()).alias("text_len"),
        F.sha2(F.col("text_extracted"), 256).alias("text_sha"),
    )


def _html_to_text_oracle_sql() -> str:
    """DuckDB twin of _q_html_to_text: same (url, html) literals, but the
    extraction re-implemented in SQL (strip tags, collapse ASCII
    whitespace runs to one space, trim) — independent of the Python
    bytes-regex implementation, so the sha256 comparison genuinely pins
    the byte-identity invariant. ASCII-only fixtures make the
    bytes-vs-VARCHAR split immaterial; after the collapse the only edge
    whitespace left is ' ', which plain trim() strips in both engines."""
    vals = ", ".join(
        "('" + u + "', '" + h.replace("'", "''") + "')"
        for u, h in multimodal.synth_html_rows(80)
    )
    return f"""
WITH pages(url, html) AS (VALUES {vals}),
extracted AS (
  SELECT url,
         trim(regexp_replace(regexp_replace(html, '<[^>]*>', '', 'g'),
                             '[ \\t\\r\\n]+', ' ', 'g')) AS t
  FROM pages
)
SELECT url, CAST(length(t) AS BIGINT) AS text_len, sha256(t) AS text_sha
FROM extracted
"""


def _multimodal_oracle_sql() -> str:
    """DuckDB twin of _q_multimodal_decode: same payloads (hex VALUES),
    same sha256-of-hex digest, same byte-slice width/height/feature
    math (sum of 4 digest bytes / 255.0 → float32 → round 6dp)."""
    img = [
        (mid, payload)
        for mid, _url, kind, payload, _meta in multimodal.synth_media_rows(60)
        if kind == "image"
    ]
    vals = ", ".join(f"({mid}, '{p.hex()}')" for mid, p in img)

    def byte(pos_expr: str) -> str:
        # digest byte at 0-based position → int (2 hex chars, 1-based substr)
        return f"CAST(concat('0x', substr(dh, 2 * ({pos_expr}) + 1, 2)) AS INTEGER)"

    bsum = " + ".join(byte(f"4 * s.slot + {b}") for b in range(4))
    return f"""
WITH media(media_id, ph) AS (VALUES {vals}),
base AS (
  SELECT media_id,
         CAST(length(ph) // 2 AS BIGINT) AS n_bytes,
         sha256(ph) AS dh
  FROM media
),
slotted AS (
  SELECT b.media_id, b.n_bytes, b.dh, s.slot, {bsum} AS bsum
  FROM base b CROSS JOIN (SELECT unnest(range(0, 8)) AS slot) s
)
SELECT media_id,
       16 + {byte('0')} % 240 AS width,
       16 + {byte('1')} % 240 AS height,
       n_bytes,
       CAST(slot AS INTEGER) AS slot,
       round(CAST(CAST(bsum / 255.0 AS REAL) AS DOUBLE), 6) AS feature_val
FROM slotted
"""


def _q_near_dup_stream(spark, sf_dir):
    """Batch twin of streaming.stateful.near_dup_candidates_stream (the
    same pattern cell_visits uses for its stateful op): minhash-LSH
    bucket canonicals + (canonical, member, band) candidate pairs over
    the documents table. The streaming path is pinned against this twin
    by tests/test_streaming_stateful.py."""
    from o2g_spark.streaming import stateful

    return stateful.near_dup_candidates_batch(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        ts_col=None, num_hashes=32, bands=16,
    )


def _q_near_dup_emb_stream(spark, sf_dir):
    """Batch twin of streaming.stateful.near_dup_embedding_stream (the
    embedding-modality candidate funnel): hyperplane sign-bit bucket
    canonicals + (canonical, member, band) pairs over the planted-dup
    embedding set. The streaming path is pinned against this twin by
    tests/test_streaming_stateful.py."""
    from o2g_spark.streaming import stateful

    return stateful.near_dup_embedding_batch(
        _emb_with_planted(spark, sf_dir), id_col="vec_id",
        vec_col="embedding", ts_col=None, bands=8, bits_per_band=12,
        dim=64,
    )


def _near_dup_emb_stream_oracle_sql() -> str:
    """DuckDB twin: the same literal-planes banding as the
    embedding_near_dup oracle, then min-id-per-bucket canonicals
    (string order — ids are VARCHAR on both sides)."""
    bands, bits, dim = 8, 12, 64
    rows = _planes_values_sql(dim, bands * bits)
    return f"""
WITH base AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
  UNION ALL
  SELECT CAST(vec_id AS BIGINT) + 1000000,
         list_transform(embedding, (x, i) ->
           CAST(CAST(x AS DOUBLE)
                + CAST(((i - 1) * 37 + 11) % 97 AS DOUBLE) / 97.0 * 0.0006
                - 0.0003 AS FLOAT))
  FROM embeddings WHERE vec_id < 200
),
planes(p, w) AS (VALUES {rows}),
keys AS (
  SELECT b.vec_id, pl.p // {bits} AS band,
         sum(CASE WHEN list_inner_product(
                    list_transform(b.embedding, v -> CAST(v AS DOUBLE)),
                    pl.w) > 0
             THEN CAST(1 AS BIGINT) << (pl.p % {bits})
             ELSE CAST(0 AS BIGINT) END)
           AS key
  FROM base b CROSS JOIN planes pl
  GROUP BY b.vec_id, pl.p // {bits}
),
ranked AS (
  SELECT CAST(band AS INTEGER) AS band,
         CAST(vec_id AS VARCHAR) AS did,
         min(CAST(vec_id AS VARCHAR)) OVER (PARTITION BY band, key)
           AS canon
  FROM keys
)
SELECT canon AS id_a, did AS id_b, band FROM ranked WHERE did <> canon
"""


def _near_dup_stream_oracle_sql() -> str:
    """DuckDB twin: same shingle→minhash→band-key pipeline as the
    minhash_lsh oracle, then min-id-per-bucket canonicals."""
    num_hashes, bands = 32, 16
    rpb = num_hashes // bands
    return f"""
WITH hs AS (
  -- VARCHAR ids: the Spark twin casts ids to string, so the canonical
  -- (min id per bucket) must be chosen by the SAME lexicographic order
  SELECT CAST(doc_id AS VARCHAR) AS id, {X.shingles_sql('text', 3)} AS sh
  FROM documents
),
sig AS (
  SELECT id,
         {dedup.minhash_from_hashes_sql(
             f"list_transform(sh, s -> {X.md5_hash60_sql('s')})", num_hashes)} AS sig
  FROM hs
),
banded AS (
  SELECT id, unnest(range(0, {bands})) AS band,
         unnest(list_transform(range(0, {bands}),
                b -> md5(array_to_string(
                       list_transform(sig[b*{rpb}+1 : b*{rpb}+{rpb}],
                                      v -> CAST(v AS VARCHAR)), ','))))
           AS key
  FROM sig
),
canon AS (
  SELECT id, CAST(band AS INTEGER) AS band,
         min(id) OVER (PARTITION BY band, key) AS id_a
  FROM banded
)
SELECT id_a, id AS id_b, band FROM canon WHERE id != id_a
"""


def _q_bmp_decode(spark, sf_dir):
    """REAL image decode under the gate: decode_images over 24-bit BMP
    fixtures — width/height come from an actual header parse and the
    8-dim feature from actual pixel stats (multimodal.try_decode_bmp /
    _bmp_feature), not a digest stand-in. The DuckDB twin re-decodes
    the SAME payload hex with byte arithmetic (LE header ints, stride
    padding, BGR channel split), so a hash match proves the decode is
    physically true."""
    media = spark.createDataFrame(
        multimodal.synth_decodable_media_rows(), multimodal.MEDIA_SCHEMA
    )
    out = multimodal.decode_images(media)
    return out.select(
        "media_id", "width", "height", "n_bytes",
        F.posexplode("feature").alias("slot", "__f"),
    ).select(
        "media_id", "width", "height", "n_bytes", "slot",
        F.round(F.col("__f").cast(T.DoubleType()), 6).alias("feature_val"),
    )


def _q_wav_decode(spark, sf_dir):
    """REAL audio decode under the gate: audio_features over PCM16 WAV
    fixtures — sample-rate-true duration, exact-int-sum RMS, 13
    channel-0 segment energies. Twin re-decodes the interleaved LE
    int16 stream from the payload hex."""
    media = spark.createDataFrame(
        multimodal.synth_decodable_media_rows(), multimodal.MEDIA_SCHEMA
    )
    out = multimodal.audio_features(media)
    return out.select(
        "media_id", "duration_ms",
        F.round(F.col("rms"), 6).alias("rms"),
        F.posexplode("mfcc").alias("slot", "__m"),
    ).select(
        "media_id", "duration_ms", "rms", "slot",
        F.round(F.col("__m").cast(T.DoubleType()), 6).alias("mfcc_val"),
    )


def _decodable_media_values(kind: str) -> str:
    return ", ".join(
        f"({mid}, '{p.hex()}')"
        for mid, _url, k, p, _m in multimodal.synth_decodable_media_rows()
        if k == kind
    )


def _hexbyte(pos_expr: str) -> str:
    """DuckDB: payload byte at 0-based position → BIGINT (hex col ph)."""
    return (
        f"CAST(CAST(concat('0x', substr(ph, 2 * ({pos_expr}) + 1, 2)) "
        "AS INTEGER) AS BIGINT)"
    )


def _le_sql(off: int, nbytes: int, signed: bool = False) -> str:
    """DuckDB: little-endian integer at fixed byte offset ``off``."""
    v = " + ".join(
        f"{256 ** k} * {_hexbyte(str(off + k))}" for k in range(nbytes)
    )
    if not signed:
        return f"({v})"
    wrap = 256 ** nbytes
    return f"(CASE WHEN ({v}) >= {wrap // 2} THEN ({v}) - {wrap} ELSE ({v}) END)"


def _bmp_decode_oracle_sql() -> str:
    """DuckDB twin of _q_bmp_decode: full BMP re-decode in SQL — header
    ints little-endian, abs/sign of biHeight, 4-byte stride, pixel byte
    at off + y*stride + r with channel c = i%3 in file BGR order (w*3
    is a multiple of 3, so i%(w*3) ≡ i mod 3). Channel sums/maxes are
    exact BIGINTs; each feature divides exactly as the Python decoder
    does (sum/n/255.0), casts through REAL (the float32 schema), and
    rounds once at 6dp."""
    feat = """
           CASE s.slot
             WHEN 0 THEN sumr / n / 255.0
             WHEN 1 THEN sumg / n / 255.0
             WHEN 2 THEN sumb / n / 255.0
             WHEN 3 THEN maxr / 255.0
             WHEN 4 THEN maxg / 255.0
             WHEN 5 THEN maxb / 255.0
             WHEN 6 THEN minall / 255.0
             ELSE (sumr + sumg + sumb) / (n * 3) / 255.0
           END"""
    return f"""
WITH media(media_id, ph) AS (VALUES {_decodable_media_values("image")}),
hdr AS (
  SELECT media_id, ph,
         {_le_sql(10, 4)} AS noff,
         {_le_sql(18, 4, signed=True)} AS w,
         {_le_sql(22, 4, signed=True)} AS h_raw,
         CAST(length(ph) // 2 AS BIGINT) AS n_bytes
  FROM media
),
dims AS (
  SELECT media_id, ph, noff, w, abs(h_raw) AS h, n_bytes,
         ((w * 3 + 3) // 4) * 4 AS stride
  FROM hdr
),
px AS (
  SELECT media_id, ph, noff, w, h, n_bytes, stride,
         unnest(range(0, h * w * 3)) AS i
  FROM dims
),
pixv AS (
  SELECT media_id, w, h, n_bytes, (i % 3) AS c,
         {_hexbyte("noff + (i // (w * 3)) * stride + (i % (w * 3))")} AS v
  FROM px
),
stats AS (
  SELECT media_id, w, h, n_bytes, w * h AS n,
         sum(v) FILTER (c = 2) AS sumr,
         sum(v) FILTER (c = 1) AS sumg,
         sum(v) FILTER (c = 0) AS sumb,
         max(v) FILTER (c = 2) AS maxr,
         max(v) FILTER (c = 1) AS maxg,
         max(v) FILTER (c = 0) AS maxb,
         min(v) AS minall
  FROM pixv
  GROUP BY media_id, w, h, n_bytes
)
SELECT media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       n_bytes,
       CAST(s.slot AS INTEGER) AS slot,
       round(CAST(CAST({feat} AS REAL) AS DOUBLE), 6) AS feature_val
FROM stats CROSS JOIN (SELECT unnest(range(0, 8)) AS slot) s
"""


def _q_png_decode(spark, sf_dir):
    """REAL PNG decode under the gate: decode_images over 8-bit
    truecolor PNG fixtures (multimodal.try_decode_png — chunk walk +
    DEFLATE inflate + filter reversal in pure numpy/zlib). The
    fixtures use the canonical stored-DEFLATE layout with uniform
    None/Sub/Up filters per image, so the DuckDB twin re-derives every
    pixel from the payload hex with byte arithmetic + mod-256
    cumulative-sum windows — a hash match proves the decode (header,
    stored-block framing, filter reversal, pixel stats) is physically
    true. Average/Paeth filters and real zlib streams are pinned by
    pytest round-trips (not SQL-expressible without an inflater)."""
    media = spark.createDataFrame(
        multimodal.synth_png_media_rows(), multimodal.MEDIA_SCHEMA
    )
    out = multimodal.decode_images(media)
    return out.select(
        "media_id", "width", "height", "n_bytes",
        F.posexplode("feature").alias("slot", "__f"),
    ).select(
        "media_id", "width", "height", "n_bytes", "slot",
        F.round(F.col("__f").cast(T.DoubleType()), 6).alias("feature_val"),
    )


def _be_sql(off: int, nbytes: int) -> str:
    """DuckDB: BIG-endian unsigned integer at fixed byte offset (PNG
    header ints are network order, unlike BMP/WAV's little-endian)."""
    return "(" + " + ".join(
        f"{256 ** (nbytes - 1 - k)} * {_hexbyte(str(off + k))}"
        for k in range(nbytes)
    ) + ")"


def _png_decode_oracle_sql() -> str:
    """DuckDB twin of _q_png_decode. Canonical fixture layout: width/
    height big-endian at bytes 16/20, every scanline's filter byte
    equal (byte 48 = row 0's), raw filtered bytes at
    48 + y*(1+3w) + 1 + i. Filter reversal without an inflater:
    None → the raw byte; Sub → mod-256 running sum across the row's
    channel lane (recon[x] = Σ raw deltas, since addition mod 256 is
    associative); Up → mod-256 running sum down the byte column.
    Channel order is R,G,B = i%3 (no BMP-style BGR flip); stats and
    the 8-slot feature mirror _bmp_decode_oracle_sql exactly."""
    feat = """
           CASE s.slot
             WHEN 0 THEN sumr / n / 255.0
             WHEN 1 THEN sumg / n / 255.0
             WHEN 2 THEN sumb / n / 255.0
             WHEN 3 THEN maxr / 255.0
             WHEN 4 THEN maxg / 255.0
             WHEN 5 THEN maxb / 255.0
             WHEN 6 THEN minall / 255.0
             ELSE (sumr + sumg + sumb) / (n * 3) / 255.0
           END"""
    return f"""
WITH media(media_id, ph) AS (VALUES {_png_media_values()}),
hdr AS (
  SELECT media_id, ph,
         {_be_sql(16, 4)} AS w,
         {_be_sql(20, 4)} AS h,
         {_hexbyte("48")} AS f,
         CAST(length(ph) // 2 AS BIGINT) AS n_bytes
  FROM media
),
grid AS (
  SELECT media_id, w, h, n_bytes, f, yy.y, xx.i,
         {_hexbyte("48 + yy.y * (1 + 3 * w) + 1 + xx.i")} AS raw
  FROM hdr,
       LATERAL (SELECT unnest(range(0, h)) AS y) yy,
       LATERAL (SELECT unnest(range(0, 3 * w)) AS i) xx
),
recon AS (
  SELECT media_id, w, h, n_bytes, f, (i % 3) AS c, raw,
         sum(raw) OVER (PARTITION BY media_id, y, i % 3
                        ORDER BY i) % 256 AS sub_v,
         sum(raw) OVER (PARTITION BY media_id, i
                        ORDER BY y) % 256 AS up_v
  FROM grid
),
pixv AS (
  SELECT media_id, w, h, n_bytes, c,
         CASE f WHEN 0 THEN raw WHEN 1 THEN sub_v ELSE up_v END AS v
  FROM recon
),
stats AS (
  SELECT media_id, w, h, n_bytes, w * h AS n,
         sum(v) FILTER (c = 0) AS sumr,
         sum(v) FILTER (c = 1) AS sumg,
         sum(v) FILTER (c = 2) AS sumb,
         max(v) FILTER (c = 0) AS maxr,
         max(v) FILTER (c = 1) AS maxg,
         max(v) FILTER (c = 2) AS maxb,
         min(v) AS minall
  FROM pixv
  GROUP BY media_id, w, h, n_bytes
)
SELECT media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       n_bytes,
       CAST(s.slot AS INTEGER) AS slot,
       round(CAST(CAST({feat} AS REAL) AS DOUBLE), 6) AS feature_val
FROM stats CROSS JOIN (SELECT unnest(range(0, 8)) AS slot) s
"""


def _png_media_values() -> str:
    return ", ".join(
        f"({mid}, '{p.hex()}')"
        for mid, _url, _k, p, _m in multimodal.synth_png_media_rows()
    )


def _q_gif_decode(spark, sf_dir):
    """REAL GIF decode under the gate: decode_images over palette-GIF
    fixtures (multimodal.try_decode_gif — header/descriptor walk +
    a GENERAL variable-width LZW decoder in pure python/numpy). The
    fixtures use the canonical literal-only LZW layout (make_gif: 9-bit
    codes, CLEAR every ≤254 literals, 255-byte sub-blocks), so the
    DuckDB twin re-derives every pixel with integer bit-shifts +
    palette byte lookups from the payload hex — no LZW dictionary
    needed. REAL compressed streams (dictionary hits, width growth,
    KwKwK, the 12-bit table freeze) are pinned by pytest round-trips
    against an independent reference encoder
    (tests/test_multimodal.py)."""
    media = spark.createDataFrame(
        multimodal.synth_gif_media_rows(), multimodal.MEDIA_SCHEMA
    )
    out = multimodal.decode_images(media)
    return out.select(
        "media_id", "width", "height", "n_bytes",
        F.posexplode("feature").alias("slot", "__f"),
    ).select(
        "media_id", "width", "height", "n_bytes", "slot",
        F.round(F.col("__f").cast(T.DoubleType()), 6).alias("feature_val"),
    )


def _gif_media_values() -> str:
    return ", ".join(
        f"({mid}, '{p.hex()}')"
        for mid, _url, _k, p, _m in multimodal.synth_gif_media_rows()
    )


def _gif_decode_oracle_sql() -> str:
    """DuckDB twin of _q_gif_decode. Canonical fixture layout (see
    multimodal.make_gif): image-descriptor width/height little-endian
    at bytes 786/788; palette bytes at 13 + 3*code + channel; LZW data
    byte j at file offset 793 + j + j//255 (255-byte sub-block framing);
    pixel i's 9-bit literal code starts at bit 9*(i + i//254 + 1) (one
    CLEAR before every 254-literal group freezes the code width at 9).
    So: o = bit offset, j = o//8, and the code is
    ((byte(j) | byte(j+1)<<8) >> o%8) & 511 — with the sub-block
    framing applied to EACH data byte index separately (j and j+1 need
    not be adjacent in the file). Stats and the 8-slot feature mirror
    _bmp_decode_oracle_sql exactly (palette order is R,G,B)."""
    b0 = _hexbyte("793 + (o // 8) + ((o // 8) // 255)")
    b1 = _hexbyte("793 + (o // 8 + 1) + ((o // 8 + 1) // 255)")
    feat = """
           CASE s.slot
             WHEN 0 THEN sumr / n / 255.0
             WHEN 1 THEN sumg / n / 255.0
             WHEN 2 THEN sumb / n / 255.0
             WHEN 3 THEN maxr / 255.0
             WHEN 4 THEN maxg / 255.0
             WHEN 5 THEN maxb / 255.0
             WHEN 6 THEN minall / 255.0
             ELSE (sumr + sumg + sumb) / (n * 3) / 255.0
           END"""
    return f"""
WITH media(media_id, ph) AS (VALUES {_gif_media_values()}),
hdr AS (
  SELECT media_id, ph,
         {_le_sql(786, 2)} AS w,
         {_le_sql(788, 2)} AS h,
         CAST(length(ph) // 2 AS BIGINT) AS n_bytes
  FROM media
),
bits AS (
  SELECT media_id, ph, w, h, n_bytes,
         9 * (xx.i + xx.i // 254 + 1) AS o
  FROM hdr, LATERAL (SELECT unnest(range(0, w * h)) AS i) xx
),
codes AS (
  SELECT media_id, ph, w, h, n_bytes,
         (({b0} + 256 * {b1}) >> CAST(o % 8 AS INTEGER)) & 511 AS code
  FROM bits
),
pixv AS (
  SELECT media_id, w, h, n_bytes, cc.c AS c,
         {_hexbyte("13 + 3 * code + cc.c")} AS v
  FROM codes, LATERAL (SELECT unnest(range(0, 3)) AS c) cc
),
stats AS (
  SELECT media_id, w, h, n_bytes, w * h AS n,
         sum(v) FILTER (c = 0) AS sumr,
         sum(v) FILTER (c = 1) AS sumg,
         sum(v) FILTER (c = 2) AS sumb,
         max(v) FILTER (c = 0) AS maxr,
         max(v) FILTER (c = 1) AS maxg,
         max(v) FILTER (c = 2) AS maxb,
         min(v) AS minall
  FROM pixv
  GROUP BY media_id, w, h, n_bytes
)
SELECT media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       n_bytes,
       CAST(s.slot AS INTEGER) AS slot,
       round(CAST(CAST({feat} AS REAL) AS DOUBLE), 6) AS feature_val
FROM stats CROSS JOIN (SELECT unnest(range(0, 8)) AS slot) s
"""


def _wav_decode_oracle_sql() -> str:
    """DuckDB twin of _q_wav_decode: canonical-header PCM16 WAV
    re-decode — channels at 22, rate at 24, data length at 40, samples
    as signed LE int16 from byte 44. RMS over ALL channels from an
    exact sum of squares; 13 channel-0 segment energies with band(j) =
    j*13//n, exactly the Python decoder's integer math."""
    raw = f"({_hexbyte('44 + 2 * k')} + 256 * {_hexbyte('45 + 2 * k')})"
    return f"""
WITH media(media_id, ph) AS (VALUES {_decodable_media_values("audio")}),
hdr AS (
  SELECT media_id, ph,
         {_le_sql(22, 2)} AS ch,
         {_le_sql(24, 4)} AS rate,
         {_le_sql(40, 4)} AS dlen
  FROM media
),
dims AS (
  SELECT media_id, ph, ch, rate, dlen // (2 * ch) AS n FROM hdr
),
vals AS (
  SELECT media_id, ch, rate, n, s.k,
         (CASE WHEN {raw} >= 32768 THEN {raw} - 65536 ELSE {raw} END) AS sv
  FROM dims, LATERAL (SELECT unnest(range(0, n * ch)) AS k) s
),
agg AS (
  SELECT media_id, any_value(ch) AS ch, any_value(rate) AS rate,
         any_value(n) AS n, sum(sv * sv) AS sumsq
  FROM vals GROUP BY media_id
),
seg AS (
  SELECT media_id, ((k // ch) * 13) // n AS band,
         sum(sv * sv) AS segsq, count(*) AS segn
  FROM vals WHERE k % ch = 0
  GROUP BY media_id, band
)
SELECT a.media_id,
       CAST((a.n * 1000) // a.rate AS BIGINT) AS duration_ms,
       round(sqrt(a.sumsq / (a.n * a.ch)) / 32768.0, 6) AS rms,
       CAST(g.band AS INTEGER) AS slot,
       round(CAST(CAST(sqrt(g.segsq / g.segn) / 32768.0 AS REAL)
                  AS DOUBLE), 6) AS mfcc_val
FROM agg a JOIN seg g ON a.media_id = g.media_id
"""


def _q_image_phash(spark, sf_dir):
    """Perceptual image hash under the gate: integer dHash computed
    from REAL raster decodes of BMP fixtures (media_dedup.image_dhash).
    The DuckDB twin re-derives every 64-bit signature from payload hex
    alone — header parse, stride/top-down row order, luma 299R+587G+
    114B, 8×9 block sums, cross-multiplied adjacent-mean comparisons —
    so a hash match proves the perceptual hash is physically computed
    from decoded pixels."""
    media = media_dedup.synth_phash_media(spark)
    return media_dedup.image_dhash(media)


def _q_image_near_dup(spark, sf_dir):
    """Image near-dup pairs: dHash + exact pigeonhole banding over
    chunk combinations (guaranteed recall at hamming ≤ 6). The twin is
    the brute all-pairs bit_count(xor) filter over the SQL-derived
    signatures — equal SETS by the pigeonhole bound, so a value-hash
    match certifies the banding loses nothing."""
    return media_dedup.image_near_dup_pairs(media_dedup.synth_phash_media(spark))


def _q_audio_fp(spark, sf_dir):
    """Audio fingerprint under the gate: int64 frame-energy contour
    over REAL PCM16 WAV decodes (frame=128 samples, matching the
    fixture sizing). Short clips (< 2 frames) fingerprint as NULL —
    the twin reproduces that via its LEFT JOIN."""
    media = media_dedup.synth_afp_media(spark)
    return media_dedup.audio_fingerprint(media, frame_samples=128)


def _q_audio_near_dup(spark, sf_dir):
    """Audio near-dup pairs: energy-contour fingerprint + the same
    exact combination banding as images; brute SQL twin."""
    return media_dedup.audio_near_dup_pairs(
        media_dedup.synth_afp_media(spark), frame_samples=128
    )


def _phash_media_values() -> str:
    return ", ".join(
        f"({mid}, '{p.hex()}')"
        for mid, _u, k, p, _m in media_dedup.synth_phash_media_rows()
        if k == "image"
    )


def _afp_media_values() -> str:
    return ", ".join(
        f"({mid}, '{p.hex()}')"
        for mid, _u, k, p, _m in media_dedup.synth_afp_media_rows()
        if k == "audio"
    )


_BIT_WEIGHTS_SQL = ", ".join(f"({b}, CAST({1 << b} AS HUGEINT))" for b in range(64))

# HUGEINT bit-pack → BIGINT two's-complement wrap (the simhash twin's
# convention): numpy packs uint64 and reinterprets as int64, SQL sums
# HUGEINT weights and subtracts 2^64 above 2^63.
_WRAP_I64 = (
    "CASE WHEN {v} >= CAST(9223372036854775808 AS HUGEINT) "
    "THEN {v} - CAST(18446744073709551616 AS HUGEINT) ELSE {v} END"
)


def _dhash_sig_sql() -> str:
    """Shared CTE chain: BMP payload hex → (media_id, width, height,
    dhash), mirroring media_dedup.dhash_from_rgb bit for bit. Pixel p
    enumerates row-major image coordinates (y = p//w, x = p%w); the
    file row honours biHeight's sign (negative = top-down); luma and
    block sums are exact BIGINTs; the adjacent-mean comparison is the
    same cross-multiplication (no division anywhere)."""
    fr = "(CASE WHEN h_raw < 0 THEN p // w ELSE h - 1 - p // w END)"
    return f"""
media(media_id, ph) AS (VALUES {_phash_media_values()}),
hdr AS (
  SELECT media_id, ph, {_le_sql(10, 4)} AS noff,
         {_le_sql(18, 4, signed=True)} AS w,
         {_le_sql(22, 4, signed=True)} AS h_raw
  FROM media
),
dims AS (
  SELECT media_id, ph, noff, w, abs(h_raw) AS h, h_raw,
         ((w * 3 + 3) // 4) * 4 AS stride
  FROM hdr
),
px AS (
  SELECT media_id, ph, noff, w, h, h_raw, stride,
         unnest(range(0, h * w)) AS p
  FROM dims
),
lum AS (
  SELECT media_id, w, h,
         ((p // w) * 8) // h AS gy,
         ((p % w) * 9) // w AS gx,
         299 * {_hexbyte(f"noff + {fr} * stride + (p % w) * 3 + 2")}
       + 587 * {_hexbyte(f"noff + {fr} * stride + (p % w) * 3 + 1")}
       + 114 * {_hexbyte(f"noff + {fr} * stride + (p % w) * 3")} AS luma
  FROM px
),
blocks AS (
  SELECT media_id, w, h, gy, gx, sum(luma) AS s, count(*) AS n
  FROM lum GROUP BY media_id, w, h, gy, gx
),
bits AS (
  SELECT a.media_id, a.w, a.h, a.gy * 8 + a.gx AS b,
         CASE WHEN a.s * bb.n > bb.s * a.n THEN 1 ELSE 0 END AS bit
  FROM blocks a JOIN blocks bb
    ON a.media_id = bb.media_id AND a.gy = bb.gy AND bb.gx = a.gx + 1
  WHERE a.gx < 8
),
bw(b, wt) AS (VALUES {_BIT_WEIGHTS_SQL}),
sig0 AS (
  SELECT media_id, any_value(w) AS w, any_value(h) AS h,
         sum(CASE WHEN bit = 1 THEN wt ELSE CAST(0 AS HUGEINT) END) AS s0
  FROM bits JOIN bw USING (b) GROUP BY media_id
),
sig AS (
  SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         CAST({_WRAP_I64.format(v="s0")} AS BIGINT) AS dhash
  FROM sig0
)"""


def _image_phash_oracle_sql() -> str:
    return f"WITH {_dhash_sig_sql()}\nSELECT media_id, width, height, dhash FROM sig"


def _image_near_dup_oracle_sql(max_hamming: int = 6) -> str:
    """Brute all-pairs twin (oracle scale): the Spark side's pigeonhole
    combination banding guarantees every pair within hamming ≤
    chunks − band_chunks = 6 shares a band, so the banded set EQUALS
    this filter."""
    return f"""
WITH {_dhash_sig_sql()}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
"""


def _afp_sig_sql(frame_samples: int = 128) -> str:
    """Shared CTE chain: WAV payload hex → (media_id, n_frames,
    fingerprint). Channel-0 samples are the interleaved LE int16s at
    byte 44 + 2·j·ch; frame energies are exact int64 sums of squares;
    bit k compares e[k+1] > e[k] (lead window, first min(64, nfr−1)
    transitions); clips under 2 frames keep a NULL fingerprint through
    the LEFT JOIN."""
    raw = (
        f"({_hexbyte('44 + 2 * (s.j * ch)')}"
        f" + 256 * {_hexbyte('45 + 2 * (s.j * ch)')})"
    )
    return f"""
media(media_id, ph) AS (VALUES {_afp_media_values()}),
hdr AS (
  SELECT media_id, ph, {_le_sql(22, 2)} AS ch, {_le_sql(40, 4)} AS dlen
  FROM media
),
dims AS (
  SELECT media_id, ph, ch,
         (dlen // (2 * ch)) // {frame_samples} AS nfr
  FROM hdr
),
sv AS (
  SELECT media_id, nfr, s.j // {frame_samples} AS k,
         (CASE WHEN {raw} >= 32768 THEN {raw} - 65536 ELSE {raw} END) AS v
  FROM dims, LATERAL (SELECT unnest(range(0, nfr * {frame_samples})) AS j) s
),
en AS (
  SELECT media_id, nfr, k, sum(v * v) AS e
  FROM sv GROUP BY media_id, nfr, k
),
tr AS (
  SELECT media_id, k AS b,
         CASE WHEN lead(e) OVER (PARTITION BY media_id ORDER BY k) > e
              THEN 1 ELSE 0 END AS bit
  FROM en
  QUALIFY k < least(64, nfr - 1)
),
bw(b, wt) AS (VALUES {_BIT_WEIGHTS_SQL}),
sig0 AS (
  SELECT media_id,
         sum(CASE WHEN bit = 1 THEN wt ELSE CAST(0 AS HUGEINT) END) AS s0
  FROM tr JOIN bw USING (b) GROUP BY media_id
),
sig AS (
  SELECT d.media_id, CAST(d.nfr AS BIGINT) AS n_frames,
         CAST(CASE WHEN s0 IS NULL THEN NULL
              ELSE {_WRAP_I64.format(v="s0")} END AS BIGINT) AS fingerprint
  FROM dims d LEFT JOIN sig0 ON sig0.media_id = d.media_id
)"""


def _audio_fp_oracle_sql() -> str:
    return (
        f"WITH {_afp_sig_sql()}\n"
        "SELECT media_id, n_frames, fingerprint FROM sig"
    )


def _audio_near_dup_oracle_sql(max_hamming: int = 6) -> str:
    return f"""
WITH {_afp_sig_sql()}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.media_id < b.media_id
WHERE a.fingerprint IS NOT NULL AND b.fingerprint IS NOT NULL
  AND bit_count(xor(a.fingerprint, b.fingerprint)) <= {max_hamming}
"""


def _q_media_incremental(spark, sf_dir):
    """Incremental media near-dup pairing against the PERSISTED media
    index (operators/media_index.py — the media twin of
    lsh_incremental / emb_incremental): the image fixtures split by
    media_id % 3 (twin ids sit at base+1000 ≡ base+1, so planted
    pairs CROSS the split — the increment exercises new × index, not
    just new × new), non-zero residues indexed, the rest arriving as the
    new batch; output = pairs touching ≥1 new row. The DuckDB twin is
    the full-corpus payload-hex brute twin filtered to the same pair
    set — equal because the dHash is a pure function of the payload
    bytes (splitting cannot change candidacy or hamming; also pinned
    in tests/test_media_index.py). Rebuilds force=True under /tmp so
    the query is self-contained and rerunnable."""
    import hashlib
    import tempfile

    from o2g_spark.operators import media_index

    media = media_dedup.synth_phash_media(spark)
    base = (
        f"{tempfile.gettempdir()}/o2g_gate_media_index_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    )
    media_index.media_index_build(
        spark, base, media.filter("media_id % 3 != 0"), kind="image",
        force=True,
    )
    return media_index.media_near_dup_incremental(
        spark, base, media.filter("media_id % 3 = 0")
    )


def _media_incremental_oracle_sql(max_hamming: int = 6) -> str:
    """DuckDB twin: the full-corpus brute pair set (the image_near_dup
    oracle) restricted to pairs touching ≥1 new (media_id % 5 = 0)
    row."""
    return f"""
WITH {_dhash_sig_sql()}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
  AND (a.media_id % 3 = 0 OR b.media_id % 3 = 0)
"""


def _q_near_dup_media_stream(spark, sf_dir):
    """Batch twin of streaming.stateful.near_dup_media_stream (the
    MEDIA-modality candidate funnel, completing the per-modality
    stream family next to near_dup_stream / near_dup_emb_stream):
    dHash chunk-combination bucket canonicals + (canonical, member,
    band) pairs over the image fixtures. The streaming path is pinned
    against this twin by tests/test_streaming_stateful.py."""
    from o2g_spark.streaming import stateful

    return stateful.near_dup_media_batch(
        media_dedup.synth_phash_media(spark), kind="image", ts_col=None
    )


def _near_dup_media_stream_oracle_sql() -> str:
    """DuckDB twin: the shared payload-hex dHash CTE, then the same
    chunk-combination band keys (per-combo power-of-256 divisors on
    the two's-complement-unwrapped HUGEINT signature) and min-VARCHAR
    -id canonicals per bucket."""
    from itertools import combinations as _combos

    combos = ", ".join(
        f"({i}, CAST({256 ** c1} AS HUGEINT), CAST({256 ** c2} AS HUGEINT))"
        for i, (c1, c2) in enumerate(_combos(range(8), 2))
    )
    return f"""
WITH {_dhash_sig_sql()},
u AS (
  SELECT media_id,
         CASE WHEN dhash < 0
              THEN CAST(dhash AS HUGEINT) + CAST(18446744073709551616 AS HUGEINT)
              ELSE CAST(dhash AS HUGEINT) END AS us
  FROM sig
),
combos(band, d1, d2) AS (VALUES {combos}),
keys AS (
  SELECT CAST(media_id AS VARCHAR) AS did, band,
         CAST((us // d1) % 256 + ((us // d2) % 256) * 256 AS BIGINT) AS key
  FROM u CROSS JOIN combos
),
ranked AS (
  SELECT band, key, did,
         min(did) OVER (PARTITION BY band, key) AS canon
  FROM keys
)
SELECT canon AS id_a, did AS id_b, CAST(band AS INTEGER) AS band
FROM ranked WHERE did != canon
"""


def _q_avi_decode(spark, sf_dir):
    """REAL video decode under the gate: decode_video over raw-DIB AVI
    fixtures — width/height/fps/frame-count from an actual RIFF chunk
    walk (kernels/avi.py). The DuckDB twin re-parses the SAME payload
    hex (LE header ints at the canonical offsets the writer pins), so
    a hash match proves the container parse is physically true."""
    return video.decode_video(video.synth_avi_media(spark))


def _q_video_frame_hash(spark, sf_dir):
    """Per-frame perceptual hashing under the gate: video_frame_dhash
    over the AVI fixtures — every frame physically decoded (bottom-up
    BGR stride unpack) and dHashed. The twin re-derives every frame's
    64-bit signature from payload hex alone: frame f's pixel bytes
    sit at arithmetic offsets of the canonical writer (kernels/
    avi.py docstring), then the same luma/block/cross-multiplication
    pipeline as the image twin."""
    return video.video_frame_dhash(video.synth_avi_media(spark))


def _q_video_near_dup(spark, sf_dir):
    """Video near-dup pairs: frame-dHash-SET jaccard ≥ 0.5 (trim /
    re-order robust by construction). Twin: the same sets from the
    SQL-derived frame hashes, brute set-jaccard at oracle scale."""
    return video.video_near_dup_pairs(video.synth_avi_media(spark), threshold=0.5)


def _avi_media_values() -> str:
    return ", ".join(
        f"({mid}, '{p.hex()}')"
        for mid, _u, _k, p, _m in video.synth_avi_media_rows()
    )


def _avi_hdr_cte() -> str:
    """Header ints at the canonical writer's fixed offsets: width/
    height at 64/68 (avih), total frames at 48, fps = strh rate/scale
    at 132/128."""
    return f"""
media(media_id, ph) AS (VALUES {_avi_media_values()}),
hdr AS (
  SELECT media_id, ph, {_le_sql(64, 4)} AS w, {_le_sql(68, 4)} AS h,
         {_le_sql(48, 4)} AS n, {_le_sql(132, 4)} // {_le_sql(128, 4)} AS fps
  FROM media
)"""


def _avi_vsig_cte() -> str:
    """(media_id, f, dhash) per frame from payload hex: frame f's
    pixel (y, x) bytes at 224 + f·(8 + stride·h) + 8 + (h−1−y)·stride
    + 3x (bottom-up BGR, 4-byte stride — kernels/avi.py's canonical
    layout), then the image twin's exact luma/block/cross-multiply
    dHash pipeline grouped per frame."""
    off = "fb + (h - 1 - p // w) * stride + (p % w) * 3"
    return f"""{_avi_hdr_cte()},
dims AS (
  SELECT media_id, ph, w, h, n, fps, ((w * 3 + 3) // 4) * 4 AS stride
  FROM hdr
),
fr AS (
  SELECT media_id, ph, w, h, stride, unnest(range(0, n)) AS f
  FROM dims
),
px AS (
  SELECT media_id, w, h, f,
         224 + f * (8 + stride * h) + 8 AS fb, stride,
         ph, unnest(range(0, h * w)) AS p
  FROM fr
),
lum AS (
  SELECT media_id, f, w, h,
         ((p // w) * 8) // h AS gy,
         ((p % w) * 9) // w AS gx,
         299 * {_hexbyte(off + " + 2")}
       + 587 * {_hexbyte(off + " + 1")}
       + 114 * {_hexbyte(off)} AS luma
  FROM px
),
blocks AS (
  SELECT media_id, f, gy, gx, sum(luma) AS s, count(*) AS cnt
  FROM lum GROUP BY media_id, f, gy, gx
),
bits AS (
  SELECT a.media_id, a.f, a.gy * 8 + a.gx AS b,
         CASE WHEN a.s * bb.cnt > bb.s * a.cnt THEN 1 ELSE 0 END AS bit
  FROM blocks a JOIN blocks bb
    ON a.media_id = bb.media_id AND a.f = bb.f
   AND a.gy = bb.gy AND bb.gx = a.gx + 1
  WHERE a.gx < 8
),
bw(b, wt) AS (VALUES {_BIT_WEIGHTS_SQL}),
sig0 AS (
  SELECT media_id, f,
         sum(CASE WHEN bit = 1 THEN wt ELSE CAST(0 AS HUGEINT) END) AS s0
  FROM bits JOIN bw USING (b) GROUP BY media_id, f
),
vsig AS (
  SELECT media_id, f,
         CAST({_WRAP_I64.format(v="s0")} AS BIGINT) AS dhash
  FROM sig0
)"""


def _avi_decode_oracle_sql() -> str:
    return f"""
WITH {_avi_hdr_cte()}
SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(fps AS INTEGER) AS fps, CAST(n AS INTEGER) AS n_frames,
       CAST(n * 1000 // fps AS BIGINT) AS duration_ms
FROM hdr
"""


def _video_frame_hash_oracle_sql() -> str:
    return (
        f"WITH {_avi_vsig_cte()}\n"
        "SELECT media_id, CAST(f AS INTEGER) AS frame_idx, dhash FROM vsig"
    )


def _video_near_dup_oracle_sql(threshold: float = 0.5,
                               extra_where: str = "") -> str:
    return f"""
WITH {_avi_vsig_cte()},
sets AS (SELECT DISTINCT media_id, dhash FROM vsig),
sizes AS (SELECT media_id, count(*) AS n FROM sets GROUP BY media_id),
shared AS (
  SELECT a.media_id AS ia, b.media_id AS ib, count(*) AS s
  FROM sets a JOIN sets b ON a.dhash = b.dhash AND a.media_id < b.media_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       round(s / (na.n + nb.n - s), 6) AS jaccard
FROM shared JOIN sizes na ON na.media_id = ia
            JOIN sizes nb ON nb.media_id = ib
WHERE round(s / (na.n + nb.n - s), 6) >= {threshold}{extra_where}
"""


def _q_video_incremental(spark, sf_dir):
    """Incremental video near-dup pairing against the PERSISTED
    frame-hash index (operators/video_index.py — the video member of
    the lsh/emb/media index family): base clips (media_id < 1000)
    indexed, twins + the byte dup (>= 1000) arriving as the new batch
    — every planted pair CROSSES the split except (1000, 2000), which
    exercises new × new. The DuckDB twin is the full-corpus
    payload-hex set-jaccard twin filtered to new-touching pairs —
    equal because frame hashes are pure functions of payload bytes
    (also pinned in tests/test_video_index.py). Rebuilds force=True
    under /tmp so the query is self-contained and rerunnable."""
    import hashlib
    import tempfile

    from o2g_spark.operators import video_index

    media = video.synth_avi_media(spark)
    base = (
        f"{tempfile.gettempdir()}/o2g_gate_video_index_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
    )
    video_index.video_index_build(
        spark, base, media.filter("media_id < 1000"), force=True)
    return video_index.video_near_dup_incremental(
        spark, base, media.filter("media_id >= 1000"),
        threshold=0.5, max_df=None)


def _video_incremental_oracle_sql() -> str:
    return _video_near_dup_oracle_sql(
        0.5, "\n  AND (ia >= 1000 OR ib >= 1000)")


def _q_near_dup_video_stream(spark, sf_dir):
    """Batch twin of streaming.stateful.near_dup_video_stream (the
    VIDEO-modality candidate funnel — frame dHashes as the band keys,
    completing the stream family across all four modalities): per
    frame-hash bucket the min-string-id clip is canonical, every
    other clip sharing that PHYSICAL frame pairs with it, one row per
    shared bucket. The streaming path is pinned against this twin by
    tests/test_streaming_stateful.py."""
    from o2g_spark.streaming import stateful

    return stateful.near_dup_video_batch(
        video.synth_avi_media(spark), ts_col=None
    )


def _near_dup_video_stream_oracle_sql() -> str:
    """DuckDB twin: the shared payload-hex per-frame dHash CTE
    (every frame's signature re-derived from raw AVI bytes), distinct
    frame-hash sets per clip, min-VARCHAR-id canonicals per bucket."""
    return f"""
WITH {_avi_vsig_cte()},
sets AS (
  SELECT DISTINCT CAST(media_id AS VARCHAR) AS did, dhash FROM vsig
),
ranked AS (
  SELECT did, dhash, min(did) OVER (PARTITION BY dhash) AS canon
  FROM sets
)
SELECT canon AS id_a, did AS id_b, CAST(0 AS INTEGER) AS band
FROM ranked WHERE did != canon
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS for the driver's correctness artifact, not for
    # correctness itself: the driver gate checks the FIRST 50 entries
    # (CORRECTNESS_r05.json covered exactly the r4-era front half), so
    # per the r5 verdict (#1) the 55 queries the driver has never
    # checked — sketches, temporal joins, curation, model filters,
    # media/video codecs, the stream twins, the incremental indexes —
    # now lead. Five of the 55 (the simplest hash-split/sampling/regex
    # ops, each twice replica-verified) sit at positions 51-55; the
    # long-stable r1-r4 queries, all with driver-green artifacts from
    # previous rounds, follow. Every query keeps its name, builder and
    # oracle SQL unchanged.
    return {
        # --- driver-window front: never driver-checked before r6 ---
        "dup_stats": _q_dup_stats,
        "dedup_keep_best": _q_dedup_keep_best,
        "emb_incremental": _q_emb_incremental,
        "media_incremental": _q_media_incremental,
        "domain_cap": _q_domain_cap,
        "corpus_mix": _q_corpus_mix,
        "corpus_mix_bucket": _q_corpus_mix_bucket,
        "corpus_mix_rate": _q_corpus_mix_rate,
        "tfidf_topk": _q_tfidf_topk,
        "lm_train": _q_lm_train,
        "lm_score": _q_lm_score,
        "dsir_weights": _q_dsir_weights,
        "bm25_topk": _q_bm25_topk,
        "cms_users": _q_cms_users,
        "quantiles": _q_quantiles,
        "heavy_users": _q_heavy_users,
        "hll_words": _q_hll_words,
        "hll_window": _q_hll_window,
        "quantiles_window": _q_quantiles_window,
        "asof_join": _q_asof_join,
        "asof_skew": _q_asof_skew,
        "interval_join": _q_interval_join,
        "pack_sequences": _q_pack_sequences,
        "simhash_pairs": _q_simhash_pairs,
        "cosine_topk": _q_cosine_topk,
        "cosine_topk_q8": _q_cosine_topk_q8,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "embedding_near_dup": _q_embedding_near_dup,
        "semdedup": _q_semdedup,
        "gtfs_resolve": _q_gtfs_resolve,
        "multimodal_decode": _q_multimodal_decode,
        "html_to_text": _q_html_to_text,
        "lineage_digest": _q_lineage_digest,
        "bmp_decode": _q_bmp_decode,
        "png_decode": _q_png_decode,
        "gif_decode": _q_gif_decode,
        "wav_decode": _q_wav_decode,
        "image_phash": _q_image_phash,
        "image_near_dup": _q_image_near_dup,
        "audio_fp": _q_audio_fp,
        "audio_near_dup": _q_audio_near_dup,
        "near_dup_stream": _q_near_dup_stream,
        "near_dup_emb_stream": _q_near_dup_emb_stream,
        "near_dup_media_stream": _q_near_dup_media_stream,
        "avi_decode": _q_avi_decode,
        "video_frame_hash": _q_video_frame_hash,
        "video_near_dup": _q_video_near_dup,
        "near_dup_video_stream": _q_near_dup_video_stream,
        "video_incremental": _q_video_incremental,
        # --- slots 51-55: the 5 simplest of the never-checked set ---
        "train_split": _q_train_split,
        "strat_sample": _q_strat_sample,
        "weighted_sample": _q_weighted_sample,
        "doc_chunks": _q_doc_chunks,
        "clean_text": _q_clean_text,
        # --- long-stable back half (driver-green in r1-r5 artifacts) ---
        # relational core
        "filter_project": _q_filter_project,
        "agg_summary": _q_agg_summary,
        "join_star": _q_join_star,
        "join_agg": _q_join_agg,
        "anti_join": _q_anti_join,
        "window_topk": _q_window_topk,
        "dedup_latest": _q_dedup_latest,
        "setops": _q_setops,
        "rollup": _q_rollup,
        "scalar_fns": _q_scalar_fns,
        "json_extract": _q_json_extract,
        "events_window": _q_events_window,
        "sessionize": _q_sessionize,
        "cell_visits": _q_cell_visits,
        # spatial kernel
        "cell_encode": _q_cell_encode,
        "cell_rollup": _q_cell_rollup,
        "pip_join": _q_pip_join,
        "pip_rows": _q_pip_rows,
        "pip_anti": _q_pip_anti,
        "tile_assign": _q_tile_assign,
        "tile_density": _q_tile_density,
        "knn": _q_knn,
        "geotag_coords": _q_geotag_coords,
        "geotag_extract": _q_geotag_extract,
        "geotag_places": _q_geotag_places,
        "haversine": _q_haversine,
        "adaptive_split": _q_adaptive_split,
        "ordered_collect": _q_ordered_collect,
        # text / dedup / similarity
        "token_counts": _q_token_counts,
        "quality": _q_quality,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "pii_scrub": _q_pii_scrub,
        "bpe_train": _q_bpe_train,
        "bpe_encode": _q_bpe_encode,
        "dedup_exact": _q_dedup_exact,
        "jaccard_pairs": _q_jaccard_pairs,
        "containment_pairs": _q_containment,
        "decontam": _q_decontam,
        "strip_boilerplate": _q_strip_boilerplate,
        "repetition": _q_repetition,
        "url_canonical": _q_url_canonical,
        "passage_dedup": _q_passage_dedup,
        "pagerank": _q_pagerank,
        "bloom_probe": _q_bloom_probe,
        "bloom_anti": _q_bloom_anti,
        "minhash_sig": _q_minhash_sig,
        "minhash_lsh": _q_minhash_lsh,
        "lsh_incremental": _q_lsh_incremental,
        "dup_clusters": _q_dup_clusters,
    }


# ----------------------------------------------------------------- oracles

def oracle_sql() -> dict[str, str]:
    pts_c = _points_sql("customer", "c_acctbal", "c_custkey")
    pts_s = _points_sql("supplier", "s_acctbal", "s_suppkey")
    zones_values = ", ".join(f"({z}, {x0}, {y0}, {x1}, {y1})" for z, x0, y0, x1, y1 in PIP_ZONES)
    zones_cte = f"zones(zone_id, x0, y0, x1, y1) AS (VALUES {zones_values})"
    pip_core = f"""
WITH pts AS ({pts_c}), {zones_cte}
SELECT c_custkey, CAST(zone_id AS BIGINT) AS zone_id FROM pts JOIN zones
  ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
"""
    qf = X.quality_features_sql("text")
    return {
        "filter_project": """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS revenue
FROM lineitem WHERE l_quantity > 45
""",
        "agg_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_price,
       round(avg(l_discount), 9) AS avg_disc,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "join_star": """
SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 4) AS sum_total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
        "join_agg": """
SELECT o_orderpriority,
       count(DISTINCT o_orderkey) AS n_orders,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
        "anti_join": """
SELECT c_nationkey, count(*) AS n_customers_no_orders
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_nationkey
""",
        "window_topk": """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
FROM orders QUALIFY rk <= 3
""",
        "dedup_latest": """
SELECT user_id, event_id, ts, event_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) = 1
""",
        "setops": """
SELECT o_custkey AS custkey_h1_only FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '2024-07-01'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2024-07-01'
)
""",
        "rollup": """
SELECT n_name, c_mktsegment, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
""",
        "scalar_fns": """
SELECT l_orderkey,
       date_trunc('month', l_shipdate) AS ship_month,
       concat(l_returnflag, '-', l_linestatus) AS flag,
       upper(substr(l_returnflag, 1, 1)) AS flag_u,
       abs(l_discount - 0.05) AS disc_dev,
       greatest(l_tax, l_discount) AS max_rate
FROM lineitem WHERE l_linenumber = 1
""",
        "json_extract": """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1
""",
        "events_window": """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2, 3
""",
        "sessionize": """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_no
""",
        "cell_visits": """
WITH ev AS (
  SELECT user_id, event_id, ts,
         CAST(floor(date_part('hour', ts) / 6) AS BIGINT) AS cell
  FROM events
),
marked AS (
  SELECT user_id, ts, cell, event_id,
         CASE WHEN lag(cell) OVER w IS NULL OR lag(cell) OVER w <> cell
              THEN 1 ELSE 0 END AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, cell,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS vid
  FROM marked
)
SELECT user_id, cell, min(ts) AS enter_ts, max(ts) AS exit_ts,
       count(*) AS n_events
FROM numbered GROUP BY user_id, vid, cell
""",
        "cell_encode": f"""
WITH pts AS ({pts_c})
SELECT c_custkey, {cellk.encode_sql('lat', 'lon', CELL_RES)} AS cell_id FROM pts
""",
        "cell_rollup": f"""
WITH pts AS ({pts_c})
SELECT {cellk.encode_sql('lat', 'lon', 5)} AS cell_r5, count(*) AS n_points
FROM pts GROUP BY 1
""",
        "pip_join": f"""
WITH pts AS ({pts_c}), {zones_cte}
SELECT CAST(zone_id AS BIGINT) AS zone_id, count(*) AS n_points FROM pts JOIN zones
  ON lon > x0 AND lon < x1 AND lat > y0 AND lat < y1
GROUP BY zone_id
""",
        "pip_rows": pip_core,
        "pip_anti": f"""
WITH pts AS ({pts_c}), {zones_cte}
SELECT c_custkey FROM pts
WHERE NOT EXISTS (SELECT 1 FROM zones
  WHERE lon > x0 AND lon < x1 AND lat > y0 AND lat < y1)
""",
        "tile_assign": f"""
WITH pts AS ({pts_c})
SELECT c_custkey,
       {geo.tile_x_sql('lon', TILE_ZOOM)} AS tile_x,
       {geo.tile_y_sql('lat', TILE_ZOOM)} AS tile_y,
       {TILE_ZOOM * (1 << 58)} + ({geo.tile_x_sql('lon', TILE_ZOOM)} * {1 << 29})
         + {geo.tile_y_sql('lat', TILE_ZOOM)} AS tile_id
FROM pts
""",
        "tile_density": f"""
WITH pts AS ({pts_c})
SELECT {geo.tile_x_sql('lon', 7)} AS tile_x,
       {geo.tile_y_sql('lat', 7)} AS tile_y,
       count(*) AS n_points
FROM pts GROUP BY 1, 2
""",
        "knn": f"""
WITH q AS (SELECT * FROM ({pts_c}) WHERE c_custkey <= 50),
     t AS ({pts_s})
SELECT q.c_custkey AS qid, t.s_suppkey AS tid,
       (q.lat - t.lat) * (q.lat - t.lat)
         + (q.lon - t.lon) * (q.lon - t.lon) AS dist2,
       CAST(row_number() OVER (PARTITION BY q.c_custkey ORDER BY
            (q.lat - t.lat) * (q.lat - t.lat)
              + (q.lon - t.lon) * (q.lon - t.lon) ASC,
            t.s_suppkey ASC) AS INTEGER) AS knn_rank
FROM q CROSS JOIN t
QUALIFY knn_rank <= 3
""",
        "geotag_extract": f"""
WITH pts AS ({pts_c}),
txt AS (
  SELECT c_custkey,
         printf('Customer office at %.4f, %.4f (map).', lat, lon) AS text
  FROM pts
),
m AS (
  SELECT c_custkey,
         unnest(regexp_extract_all(text,
           '(-?\\d{{1,2}}\\.\\d{{1,6}}),\\s(-?\\d{{1,3}}\\.\\d{{1,6}})', 0))
           AS mention
  FROM txt
)
SELECT c_custkey,
       CAST(string_split_regex(mention, ',\\s')[1] AS DOUBLE) AS lat,
       CAST(string_split_regex(mention, ',\\s')[2] AS DOUBLE) AS lon,
       mention
FROM m
WHERE abs(CAST(string_split_regex(mention, ',\\s')[1] AS DOUBLE)) <= 90.0
  AND abs(CAST(string_split_regex(mention, ',\\s')[2] AS DOUBLE)) <= 180.0
""",
        "geotag_coords": r"""
WITH docs AS (
  SELECT doc_id AS url, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000,
         text || printf(' Located at %.4f, %.4f.',
                        fmod(doc_id * 7.0, 110.0) - 55.0 + 0.005,
                        fmod(CAST(doc_id AS DOUBLE), 120.0) - 60.0 + 0.005)
  FROM documents WHERE doc_id % 10 = 0
),
m AS (
  SELECT url, text,
         unnest(regexp_extract_all(text,
           '(-?\d{1,2}\.\d{1,6}),\s(-?\d{1,3}\.\d{1,6})', 0)) AS mention
  FROM docs
)
SELECT url,
       CAST(string_split_regex(mention, ',\s')[1] AS DOUBLE) AS lat,
       CAST(string_split_regex(mention, ',\s')[2] AS DOUBLE) AS lon,
       mention
FROM m
WHERE abs(CAST(string_split_regex(mention, ',\s')[1] AS DOUBLE)) <= 90.0
  AND abs(CAST(string_split_regex(mention, ',\s')[2] AS DOUBLE)) <= 180.0
""",
        "geotag_places": f"""
WITH gaz(place, lat, lon) AS (VALUES {", ".join(f"('{p}', CAST({la} AS DOUBLE), CAST({lo} AS DOUBLE))" for p, la, lo in GAZ_PLACES)}),
txt AS (
  SELECT c_custkey,
         'Conference venue in ' ||
         ({"[" + ", ".join(f"'{p}'" for p, _, _ in GAZ_PLACES) + "]"})[(c_custkey % {len(GAZ_PLACES)}) + 1]
         || ', agenda to follow.' AS text
  FROM customer
)
SELECT c_custkey, g.lat AS lat, g.lon AS lon, g.place AS mention
FROM txt JOIN gaz g ON contains(txt.text, g.place)
""",
        "haversine": f"""
WITH pts AS ({pts_c})
SELECT c_custkey,
       round(2.0 * 6371.0088 * asin(sqrt(
         pow(sin((radians(52.52) - radians(lat)) / 2), 2)
         + cos(radians(lat)) * cos(radians(52.52))
           * pow(sin((radians(13.405) - radians(lon)) / 2), 2)
       )), 6) AS km_to_berlin
FROM pts WHERE c_custkey <= 100
""",
        "token_counts": f"""
SELECT doc_id, {X.token_count_sql('text')} AS n_tokens,
       {X.whitespace_token_count_sql('text')} AS n_ws_tokens
FROM documents
""",
        "quality": f"""
SELECT doc_id,
       {qf['n_chars']} AS n_chars,
       {qf['alpha_ratio']} AS alpha_ratio,
       {qf['punct_ratio']} AS punct_ratio,
       {qf['n_words']} AS n_words,
       {qf['stopword_ratio']} AS stopword_ratio,
       {X.quality_score_sql('text')} AS quality
FROM documents
""",
        "lang_id": f"""
SELECT doc_id, {X.lang_id_sql('text')} AS lang_pred FROM documents
""",
        "fingerprint": f"""
SELECT doc_id, {X.md5_hash60_sql('text')} AS text_hash,
       len({X.fingerprint_sql('text', 3, 16)}) AS fp_len,
       {_arr_hash_sql(X.fingerprint_sql('text', 3, 16))} AS fp_hash
FROM documents
""",
        "pii_scrub": pii.scrub_pii_sql(_PII_SEEDED_SQL, "doc_id", "text"),
        "bpe_train": bpe.bpe_train_sql(
            "SELECT * FROM documents", "text", _BPE_K),
        "bpe_encode": bpe.bpe_encode_sql(
            "SELECT * FROM documents", "doc_id", "text", _BPE_K),
        # adaptive split: the iterative hot-cell loop is equivalent to
        # "first resolution whose GLOBAL cell count ≤ threshold" (cells
        # split atomically, so a child's count equals its global count)
        # — which windows express directly
        "adaptive_split": f"""
WITH pts AS ({pts_c}),
enc AS (
  SELECT {', '.join(f"{cellk.encode_sql('lat', 'lon', r)} AS c{r}" for r in range(3, 10))}
  FROM pts
),
cnt AS (
  SELECT *,
         {', '.join(f"count(*) OVER (PARTITION BY c{r}) AS n{r}" for r in range(3, 9))}
  FROM enc
)
SELECT cell_adaptive, count(*) AS n_rows FROM (
  SELECT CASE {' '.join(f"WHEN n{r} <= 200 THEN c{r}" for r in range(3, 9))}
              ELSE c9 END AS cell_adaptive
  FROM cnt
) GROUP BY cell_adaptive
""",
        "ordered_collect": """
SELECT l_orderkey AS route_id, count(*) AS n_stops,
       string_agg(CAST(l_partkey AS VARCHAR), ','
                  ORDER BY l_linenumber, l_partkey) AS stop_list
FROM lineitem GROUP BY l_orderkey
""",
        "dedup_exact": dedup.dedup_exact_sql("documents", "doc_id", "text"),
        "jaccard_pairs": dedup.jaccard_pairs_sql("documents", "doc_id", "text", 3, 0.4),
        "containment_pairs": dedup.containment_pairs_sql(
            "documents", "doc_id", "text", 3, 0.5
        ),
        "decontam": decontam.contamination_report_sql(
            "SELECT * FROM documents WHERE doc_id % 37 <> 0",
            "SELECT * FROM documents WHERE doc_id % 37 = 0",
            "doc_id", "text", 4,
        ),
        "strip_boilerplate": _strip_boilerplate_oracle_sql(),
        "repetition": _repetition_oracle_sql(),
        "url_canonical": (
            f"SELECT doc_id, {_GATE_MESSY_URL_SQL} AS url, "
            f"{corpus.url_canonical_sql(_GATE_MESSY_URL_SQL)} AS canon_url "
            "FROM documents"
        ),
        "passage_dedup": _passage_dedup_oracle_sql(),
        "pagerank": _pagerank_oracle_sql(),
        "bloom_probe": _bloom_probe_oracle_sql(),
        "bloom_anti": """
SELECT CAST(doc_id AS VARCHAR) AS u FROM documents n
WHERE NOT EXISTS (
  SELECT 1 FROM documents d
  WHERE d.doc_id % 3 = 0 AND d.doc_id = n.doc_id)
""",
        "minhash_sig": f"""
SELECT doc_id,
       ({dedup.minhash_signature_sql('text', 16)})[1] AS sig_0,
       {_arr_hash_sql(dedup.minhash_signature_sql('text', 16))} AS sig_hash
FROM documents
""",
        "minhash_lsh": dedup.minhash_lsh_pairs_sql(
            "documents", "doc_id", "text", 32, 16, 0.4
        ),
        # incremental == full-corpus pairs touching >= 1 new doc (the
        # split is banding-invariant; see _q_lsh_incremental)
        "lsh_incremental": (
            "SELECT id_a, id_b, jaccard FROM ("
            + dedup.minhash_lsh_pairs_sql(
                "documents", "doc_id", "text", 32, 16, 0.4)
            + ") WHERE id_a % 5 = 0 OR id_b % 5 = 0"
        ),
        # recursive-CTE transitive closure over the SAME pairs SQL
        # (exact at gate scale; the star contraction is the scale path)
        "dup_clusters": clusters.dup_clusters_sql(
            dedup.minhash_lsh_pairs_sql("documents", "doc_id", "text", 32, 16, 0.4)
        ),
        # keep-best policy over the same closure (longest text wins)
        "dedup_keep_best": (
            "SELECT doc_id, LENGTH(text) AS text_len FROM ("
            + clusters.dedup_keep_best_sql(
                dedup.minhash_lsh_pairs_sql(
                    "documents", "doc_id", "text", 32, 16, 0.4),
                corpus_table="documents",
                id_col="doc_id",
                score_sql="LENGTH(c.text)",
            )
            + ") __kept"
        ),
        # histogram over the same closure, corpus singletons included
        "dup_stats": clusters.dup_stats_sql(
            dedup.minhash_lsh_pairs_sql("documents", "doc_id", "text", 32, 16, 0.4),
            corpus_table="documents",
        ),
        "simhash_pairs": dedup.simhash_pairs_sql("documents", "doc_id", "text", 3),
        "embedding_near_dup": _near_dup_oracle_sql(),
        "semdedup": _semdedup_oracle_sql(),
        # incremental == full-corpus pairs touching >= 1 new vector
        # (banding is per-vector deterministic; see _q_emb_incremental)
        "emb_incremental": (
            "SELECT id_a, id_b, sim FROM ("
            + _near_dup_oracle_sql()
            + ") WHERE id_a % 5 = 0 OR id_b % 5 = 0"
        ),
        "ann_lsh": _ann_lsh_oracle_sql(),
        "ann_ivf": _ann_ivf_oracle_sql(),
        "multimodal_decode": _multimodal_oracle_sql(),
        "html_to_text": _html_to_text_oracle_sql(),
        "lineage_digest": _lineage_oracle_sql(),
        "bmp_decode": _bmp_decode_oracle_sql(),
        "png_decode": _png_decode_oracle_sql(),
        "gif_decode": _gif_decode_oracle_sql(),
        "wav_decode": _wav_decode_oracle_sql(),
        "image_phash": _image_phash_oracle_sql(),
        "image_near_dup": _image_near_dup_oracle_sql(),
        "audio_fp": _audio_fp_oracle_sql(),
        "audio_near_dup": _audio_near_dup_oracle_sql(),
        "near_dup_media_stream": _near_dup_media_stream_oracle_sql(),
        "media_incremental": _media_incremental_oracle_sql(),
        "avi_decode": _avi_decode_oracle_sql(),
        "video_frame_hash": _video_frame_hash_oracle_sql(),
        "video_near_dup": _video_near_dup_oracle_sql(),
        "near_dup_video_stream": _near_dup_video_stream_oracle_sql(),
        "video_incremental": _video_incremental_oracle_sql(),
        "near_dup_stream": _near_dup_stream_oracle_sql(),
        "near_dup_emb_stream": _near_dup_emb_stream_oracle_sql(),
        "gtfs_resolve": _gtfs_resolve_oracle_sql(),
        "cosine_topk_q8": similarity.cosine_topk_quantized_sql(
            "embeddings",
            "SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 10",
            k=5,
        ),
        "cosine_topk": similarity.cosine_topk_sql(
            "embeddings",
            "SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 10",
            k=5,
        ),
        # ---- corpus curation / temporal / sketches
        "train_split": (
            "SELECT doc_id, lang, "
            + corpus.split_assign_sql("doc_id", SPLIT_WEIGHTS)
            + " AS split FROM documents"
        ),
        "strat_sample": (
            "SELECT doc_id, lang FROM documents WHERE "
            + corpus.stratified_keep_sql("doc_id", "lang", STRAT_FRACTIONS)
        ),
        "weighted_sample": corpus.weighted_sample_topk_sql(
            "(SELECT doc_id, n_chars FROM documents)", "doc_id", "n_chars", 50
        ),
        "domain_cap": f"""
WITH u AS (SELECT doc_id, n_chars, {_GATE_URL_SQL} AS url FROM documents),
 d AS (SELECT doc_id, n_chars,
              {corpus.registered_domain_sql('url')} AS domain FROM u)
SELECT doc_id, domain, n_chars FROM d
QUALIFY row_number() OVER (
  PARTITION BY domain ORDER BY n_chars DESC, doc_id ASC) <= 5
""",
        "corpus_mix": corpus.mix_plan_sql(
            "documents", "source", "n_chars", "doc_id", _MIX_W, _MIX_TOKENS
        ),
        "corpus_mix_bucket": corpus.mix_plan_sql(
            "documents", "source", "n_chars", "doc_id", _MIX_W, _MIX_TOKENS,
            strategy="bucket",
        ),
        "corpus_mix_rate": corpus.mix_plan_sql(
            "documents", "source", "n_chars", "doc_id", _MIX_W, _MIX_TOKENS,
            strategy="rate",
        ),
        "doc_chunks": corpus.doc_chunks_sql(
            "(SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0)",
            "doc_id",
            "text",
            chunk_tokens=32,
            overlap=8,
        ),
        "tfidf_topk": corpus.tfidf_topk_sql("documents", "doc_id", "text", k=3),
        "lm_train": lmfilter.lm_train_sql(
            _LM_TRAIN_SQL, "doc_id", "text", min_count=2
        ),
        "lm_score": lmfilter.lm_score_sql(
            _LM_TRAIN_SQL, "SELECT * FROM documents", "doc_id", "text"
        ),
        "dsir_weights": lmfilter.dsir_logweights_sql(
            "SELECT * FROM documents",
            "SELECT * FROM documents WHERE lang = 'en'",
            "doc_id",
            "text",
            buckets=_DSIR_BUCKETS,
        ),
        "bm25_topk": retrieval.bm25_topk_sql(
            "SELECT doc_id, text FROM documents",
            "SELECT doc_id AS query_id, array_to_string(("
            + X.words_sql("text")
            + ")[1:4], ' ') AS qtext FROM documents WHERE "
            + corpus.hash_bucket_micro_sql("doc_id", "bm25q")
            + f" < {_BM25_QCUT}",
            k=5,
        ),
        "clean_text": _clean_text_oracle_sql(),
        "quantiles": sketches.quantile_sketch_sql(
            "documents", ["lang"], "n_chars", _QSK_Q
        ),
        "cms_users": sketches.cms_query_sql(
            "SELECT user_id FROM events",
            "SELECT user_id FROM events",
            "user_id",
            w=_CMS_W,
            d=_CMS_D,
        ),
        "heavy_users": sketches.cms_heavy_hitters_sql(
            "SELECT user_id FROM events", "user_id", 70
        ),
        "hll_words": sketches.hll_distinct_sql(
            "(SELECT lang, concat(CAST(doc_id AS VARCHAR), ':', w) AS v FROM "
            "(SELECT lang, doc_id, unnest("
            + X.words_sql("text")
            + ") AS w FROM documents))",
            ["lang"],
            "v",
            p=9,
        ),
        "hll_window": sketches.hll_window_batch_sql(
            "events", ["event_type"], "user_id", "ts",
            window_seconds=6 * 3600, p=9,
        ),
        "quantiles_window": sketches.qsketch_window_batch_sql(
            "events", ["event_type"], "user_id", "ts",
            window_seconds=6 * 3600, quantiles=_QSKW_Q,
        ),
        # asof_skew runs the identical semantics through the
        # (key, time-bucket) skew-split plan — same oracle
        "asof_skew": temporal.asof_join_sql(
            "SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'",
            "SELECT event_id AS v_id, user_id, ts, value FROM events "
            "WHERE event_type = 'view'",
            "user_id",
            "ts",
            "ts",
            ["event_id", "user_id", "ts"],
            ["v_id", "value"],
            "v_id",
        ),
        "asof_join": temporal.asof_join_sql(
            "SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'",
            "SELECT event_id AS v_id, user_id, ts, value FROM events "
            "WHERE event_type = 'view'",
            "user_id",
            "ts",
            "ts",
            ["event_id", "user_id", "ts"],
            ["v_id", "value"],
            "v_id",
        ),
        "pack_sequences": packing.pack_sequences_sql(
            "(SELECT doc_id, n_chars AS toks FROM documents)",
            "doc_id",
            "toks",
            budget=1024,
            shards=8,
        ),
        "interval_join": """
SELECT i.signup_id, i.user_id, p.click_id AS p_click_id
FROM (SELECT event_id AS signup_id, user_id, ts AS s, ts + INTERVAL 1 HOUR AS e
      FROM events WHERE event_type = 'signup') i
JOIN (SELECT event_id AS click_id, user_id, ts AS t
      FROM events WHERE event_type = 'click') p
  ON p.user_id = i.user_id AND p.t >= i.s AND p.t <= i.e
""",
        # every queries() entry has a value-hash oracle: iterative /
        # Arrow-kernel ops use literal-constant twins (hyperplanes,
        # k-means centroids, raw fixtures) rather than rows-only checks
    }
