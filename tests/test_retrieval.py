"""Okapi BM25 top-k retrieval (o2g_spark/operators/retrieval.py).

Cross-engine exactness is pinned by the gate oracle
(scripts/check_oracles.py bm25_topk); these tests pin SEMANTICS
against a plain-python BM25 reference (float k1/b — the milli-unit
form is the same math, so scores agree at the 4 dp contract), plus
the determinism and bounding contracts: doc_id tie-break, the k
bound, the max_df stopword guard, out-of-corpus queries, wordless
docs excluded from the corpus stats, and partitioning invariance.
"""

import math
import re

import pytest

from o2g_spark.operators import retrieval

K1, B = 1.2, 0.75


def _tok(s):
    return [w for w in re.sub("[^a-z0-9]+", " ", s.lower()).split() if w]


def _ref_bm25(docs, queries, k, max_df=None):
    """Plain-python Okapi BM25, idf = ln((N-df+.5)/(df+.5)+1)."""
    dtok = {i: _tok(t) for i, t in docs}
    dtok = {i: w for i, w in dtok.items() if w}
    n, s = len(dtok), sum(len(w) for w in dtok.values())
    dfs = {}
    for ws in dtok.values():
        for t in set(ws):
            dfs[t] = dfs.get(t, 0) + 1
    out = []
    for qid, qt in queries:
        scores = {}
        for d, ws in dtok.items():
            v = 0.0
            for t in set(_tok(qt)):
                tf = ws.count(t)
                df = dfs.get(t, 0)
                if not tf or (max_df is not None and df > max_df):
                    continue
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
                v += idf * tf * (K1 + 1) / (
                    tf + K1 * (1 - B + B * len(ws) * n / s)
                )
            if v:
                scores[d] = round(v, 4)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(qid, d, i + 1, sc) for i, (d, sc) in enumerate(ranked)]
    return sorted(out)


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cats and dogs and cats"),
    (4, "quantum flux capacitor the"),
    (5, "a cat a cat a cat a cat"),
    (6, "  ?!  "),  # wordless: excluded from N and avgdl
]
QUERIES = [
    (100, "cat sat"),
    (200, "dog"),
    (300, "zzz unseen"),
    (400, "the"),
]


def _run(spark, docs, queries, **kw):
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, qtext string")
    rows = retrieval.bm25_topk(ddf, qdf, **kw).collect()
    return sorted((r.query_id, r.doc_id, r.rank, r.score) for r in rows)


def test_matches_python_reference(spark):
    got = _run(spark, DOCS, QUERIES, k=3)
    ref = _ref_bm25(DOCS, QUERIES, k=3)
    assert [(q, d, r) for q, d, r, _ in got] == [(q, d, r) for q, d, r, _ in ref]
    for (_, _, _, a), (_, _, _, b) in zip(got, ref):
        assert a == pytest.approx(b, abs=2e-4)


def test_tie_breaks_on_doc_id(spark):
    # docs 1 and 2 both contain "the" twice at equal length -> equal
    # score; rank order must be doc_id ascending
    got = _run(spark, DOCS, [(9, "the")], k=10)
    first, second = got[0], got[1]
    assert (first[1], first[2]) == (1, 1)
    assert (second[1], second[2]) == (2, 2)
    assert first[3] == second[3]


def test_k_bounds_output(spark):
    got = _run(spark, DOCS, [(9, "the cat sat")], k=2)
    assert len(got) == 2 and {r for _, _, r, _ in got} == {1, 2}


def test_oov_query_returns_nothing(spark):
    assert _run(spark, DOCS, [(300, "zzz unseen")], k=5) == []


def test_max_df_drops_stopword_terms(spark):
    # "the" is in docs 1, 2, 4 (df=3): with max_df=2 only "cat"
    # scores, so doc 4 (the-only match) disappears and the result
    # equals the reference computed under the same cap
    got = _run(spark, DOCS, [(9, "the cat")], k=10, max_df=2)
    ref = _ref_bm25(DOCS, [(9, "the cat")], k=10, max_df=2)
    assert [(q, d, r) for q, d, r, _ in got] == [(q, d, r) for q, d, r, _ in ref]
    assert all(d != 4 for _, d, _, _ in got)


def test_wordless_docs_excluded_from_stats(spark):
    # removing the wordless doc must not change any score: it is in
    # neither N nor avgdl
    assert _run(spark, DOCS, QUERIES, k=3) == _run(
        spark, [d for d in DOCS if d[0] != 6], QUERIES, k=3
    )


def test_partitioning_invariance(spark):
    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, qtext string")
    a = sorted(
        tuple(r) for r in retrieval.bm25_topk(ddf, qdf, k=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in retrieval.bm25_topk(
            ddf.repartition(7, "text"), qdf.repartition(3), k=3
        ).collect()
    )
    assert a == b


def test_query_tf_ignored(spark):
    # distinct query terms: repeating a term must not change scores
    assert _run(spark, DOCS, [(9, "cat cat cat")], k=5) == _run(
        spark, DOCS, [(9, "cat")], k=5
    )
