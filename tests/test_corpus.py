"""Corpus-curation operators: deterministic splits/samples, domain
caps, chunking, integer TF-IDF (operators/corpus.py)."""

import math

import pytest
from pyspark.sql import functions as F

from o2g_spark.operators import corpus as C

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


# ------------------------------------------------------------ hash split

def test_split_partitions_everything_once(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = C.hash_split(docs, "doc_id", w)
    n = docs.count()
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # total function: no row lost/dup
    assert set(counts) <= set(w)


def test_split_fractions_within_binomial_bound(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = C.hash_split(docs, "doc_id", w)
    n = docs.count()
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    for name, frac in w.items():
        got = counts.get(name, 0) / n
        tol = 4 * math.sqrt(frac * (1 - frac) / n)  # 4 sigma
        assert abs(got - frac) < tol, (name, got, frac, tol)


def test_split_stable_under_repartition(spark, docs):
    """The whole point vs randomSplit: assignment is a row function,
    invariant to physical layout."""
    w = {"train": 0.9, "test": 0.1}
    a = C.hash_split(docs, "doc_id", w).select("doc_id", "split").collect()
    b = (
        C.hash_split(docs.repartition(13, "lang"), "doc_id", w)
        .select("doc_id", "split")
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_split_seed_changes_assignment(spark, docs):
    w = {"a": 0.5, "b": 0.5}
    a = dict(
        (r["doc_id"], r["split"])
        for r in C.hash_split(docs, "doc_id", w, seed="s1").collect()
    )
    b = dict(
        (r["doc_id"], r["split"])
        for r in C.hash_split(docs, "doc_id", w, seed="s2").collect()
    )
    assert any(a[k] != b[k] for k in a)


def test_split_weight_validation():
    with pytest.raises(ValueError):
        C._micro_thresholds({})
    with pytest.raises(ValueError):
        C._micro_thresholds({"a": 0.0})


def test_split_weights_normalized(spark, docs):
    """Unnormalized weights behave like their normalized form."""
    a = C.hash_split(docs, "doc_id", {"x": 3.0, "y": 1.0}).collect()
    b = C.hash_split(docs, "doc_id", {"x": 0.75, "y": 0.25}).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ----------------------------------------------------- stratified sample

def test_stratified_sample_is_subset_and_per_stratum(spark, docs):
    fr = {"en": 0.5, "de": 1.0}
    out = C.stratified_sample(docs, "doc_id", "lang", fr)
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs <= set(fr)  # default 0.0 drops other strata
    n_de = docs.where("lang = 'de'").count()
    assert out.where("lang = 'de'").count() == n_de  # fraction 1.0 keeps all
    # sample is a subset of the input ids
    in_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    out_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert out_ids <= in_ids


def test_stratified_nested_samples(spark, docs):
    """Smaller fraction ⊆ larger fraction under the same seed — the
    hash-threshold property that makes samples refinable."""
    small = {r["doc_id"] for r in
             C.stratified_sample(docs, "doc_id", "lang", {"en": 0.2}).collect()}
    big = {r["doc_id"] for r in
           C.stratified_sample(docs, "doc_id", "lang", {"en": 0.6}).collect()}
    assert small <= big


# ------------------------------------------------- weighted reservoir

def test_weighted_topk_size_and_determinism(spark, docs):
    out1 = C.weighted_sample_topk(docs.select("doc_id", "n_chars"),
                                  "doc_id", "n_chars", k=20)
    out2 = C.weighted_sample_topk(
        docs.select("doc_id", "n_chars").repartition(7),
        "doc_id", "n_chars", k=20)
    r1 = sorted(tuple(r) for r in out1.collect())
    r2 = sorted(tuple(r) for r in out2.collect())
    assert len(r1) == 20
    assert r1 == r2


def test_weighted_topk_bias(spark):
    """Heavier rows must be sampled more often: plant two weight
    classes (10:1) and check the heavy class is over-represented.
    Deterministic given the seed sweep."""
    rows = [(i, 10.0 if i % 10 == 0 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id LONG, w DOUBLE")
    heavy_hits = 0
    total = 0
    for seed in ("s0", "s1", "s2", "s3", "s4"):
        picked = C.weighted_sample_topk(df, "id", "w", k=100, seed=seed)
        hits = picked.where("w = 10.0").count()
        heavy_hits += hits
        total += 100
    # heavy ids are 10% of rows but 10/19 of total weight; A-Res picks
    # them far above 10% — require at least 2x over-representation
    assert heavy_hits / total > 0.2, heavy_hits / total


def test_weighted_topk_rejects_nonpositive_weight(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 0.0)], "id LONG, w DOUBLE")
    with pytest.raises(Exception, match="weights must be > 0"):
        C.weighted_sample_topk(df, "id", "w", k=1).collect()


# ------------------------------------------------------------ domain cap

def test_url_host_and_domain(spark):
    rows = [
        ("https://www.Example.com/a?b", "www.example.com", "example.com"),
        ("http://user:pw@sub.foo.co:8080/x", "sub.foo.co", "foo.co"),
        ("ftp://plain/x", "plain", "plain"),
        ("not a url", "", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], "url STRING")
    got = df.select(
        C.url_host("url").alias("h"), C.registered_domain("url").alias("d")
    ).collect()
    for (u, h, d), r in zip(rows, got):
        assert r["h"] == h, u
        assert r["d"] == d, u


def test_domain_cap_bounds_every_domain(spark, docs):
    urls = docs.select(
        "doc_id", "n_chars",
        F.concat(F.lit("https://w."), F.col("source"), F.lit(".org/"),
                 F.col("doc_id").cast("string")).alias("url"),
    )
    out = C.domain_cap(urls, "url", "n_chars", "doc_id", max_per_domain=2)
    per = out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    assert per and all(r["n"] <= 2 for r in per)
    # kept rows are the top-n_chars rows per domain (ties → min id)
    import collections

    best = collections.defaultdict(list)
    for r in urls.withColumn("d", C.registered_domain("url")).collect():
        best[r["d"]].append((-r["n_chars"], r["doc_id"]))
    expect = set()
    for d, lst in best.items():
        for neg, did in sorted(lst)[:2]:
            expect.add(did)
    got = {r["doc_id"] for r in out.collect()}
    assert got == expect


# ------------------------------------------------------------- chunking

def test_doc_chunks_cover_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "id LONG, text STRING")
    out = C.doc_chunks(df, "id", "text", chunk_tokens=32, overlap=8).collect()
    # stride 24 over 100 tokens → ceil? starts at 0,24,48,72,96 → 5 chunks
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3, 4]
    assert [r["n_tokens"] for r in out] == [32, 32, 32, 28, 4]
    toks = text.split(" ")
    for r in out:
        start = r["chunk_idx"] * 24
        assert r["chunk_text"] == " ".join(toks[start:start + 32])


def test_doc_chunks_empty_and_validation(spark):
    df = spark.createDataFrame([(1, ""), (2, "one two")], "id LONG, text STRING")
    out = C.doc_chunks(df, "id", "text", chunk_tokens=8, overlap=0).collect()
    assert len(out) == 1 and out[0]["id"] == 2  # empty doc → zero chunks
    with pytest.raises(ValueError):
        C.doc_chunks(df, "id", "text", chunk_tokens=8, overlap=8)


# --------------------------------------------------------------- tf-idf

def test_tfidf_topk_ranks_rare_terms_first(spark):
    rows = [
        (1, "common common rare rare rare"),
        (2, "common alpha"),
        (3, "common beta"),
    ]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    out = C.tfidf_topk(df, "id", "text", k=1).collect()
    top = {r["id"]: r["term"] for r in out}
    # 'common' has df=3; doc-unique terms win despite lower tf
    assert top[1] == "rare" and top[2] == "alpha" and top[3] == "beta"
    d1 = {r["term"]: r for r in C.tfidf_topk(df, "id", "text", k=5)
          .where("id = 1").collect()}
    assert d1["rare"]["score_ppm"] == 3 * 1_000_000
    assert d1["common"]["score_ppm"] == 2 * 1_000_000 // 3


# ------------------------------------------------------- url_canonical

URL_CASES = [
    # (input, expected canonical)
    ("HTTPS://User:pw@WWW.Example.COM:443/Path/To/Page/?utm_source=x&b=2&a=1#frag",
     "https://www.example.com/Path/To/Page?a=1&b=2"),
    ("http://example.org:80", "http://example.org/"),
    ("http://example.org:8080/a//b/?gclid=zzz&z=9&z=1",
     "http://example.org:8080/a//b?z=1&z=9"),
    ("https://a.b.c/?utm_campaign=x&utm_medium=y", "https://a.b.c/"),
    ("not a url at all  ", "not a url at all"),  # pass-through, trimmed
    ("ftp://Files.Example.net:21/pub/", "ftp://files.example.net:21/pub"),
    ("https://x.io/p?ref=tw&q=hello%20world&Q=2",
     "https://x.io/p?Q=2&q=hello%20world"),
    ("", ""),
]


def test_url_canonical_planted(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(URL_CASES)], "i LONG, url STRING"
    )
    got = {r.i: r.c for r in df.select(
        "i", C.url_canonical("url").alias("c")).collect()}
    for i, (_, want) in enumerate(URL_CASES):
        assert got[i] == want, (i, got[i], want)


def test_url_canonical_idempotent(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(URL_CASES)], "i LONG, url STRING"
    )
    once = df.select("i", C.url_canonical("url").alias("c"))
    twice = once.select("i", C.url_canonical("c").alias("c2"), "c")
    for r in twice.collect():
        assert r.c2 == r.c, (r.c, r.c2)


def test_url_canonical_sql_twin(spark):
    import duckdb

    con = duckdb.connect()
    con.sql("CREATE TABLE t (i BIGINT, url VARCHAR)")
    for i, (u, _) in enumerate(URL_CASES):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, u])
    want = dict(con.sql(
        f"SELECT i, {C.url_canonical_sql('url')} FROM t").fetchall())
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(URL_CASES)], "i LONG, url STRING"
    )
    got = {r.i: r.c for r in df.select(
        "i", C.url_canonical("url").alias("c")).collect()}
    assert got == want
