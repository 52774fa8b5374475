"""Ranked retrieval over the corpus: Okapi BM25 top-k — the search
primitive a training-data pipeline uses for retrieval-based
decontamination (find the corpus documents closest to each benchmark
item), targeted data selection, and eval-set mining. Complements the
set-overlap ops (operators/decontam.py finds verbatim n-gram leaks;
BM25 ranks by graded lexical relevance) and tfidf_topk
(corpus.tfidf_topk summarizes ONE document's own terms; BM25 scores
documents AGAINST external queries).

Spark-first shape (queries are few, the corpus is not):

* the corpus is folded ONCE into the (doc, term, tf) postings shape —
  one partial-agg shuffle over distinct pairs, never raw occurrences —
  and cached via session.cache_latest (it feeds the df-count and the
  scoring branch; Spark has no common-subplan reuse, and this is the
  compact table, not the text);
* every query-side table is broadcast: the distinct query terms
  (restricting the corpus to matching postings — the corpus never
  shuffles on anything query-sized), the per-term document
  frequencies (bounded at |query vocabulary| rows), and the 1-row
  (N, total-token) stats;
* the per-(query, doc) score is one map-side-combinable aggregation,
  and the final top-k is a per-query row_number window whose
  partition size is bounded by Σ df(query terms) — ``max_df`` is the
  stopword guard that keeps a query containing "the" from claiming
  the whole corpus as candidates (the jaccard df-cap analogue:
  dropped terms are the uninformative ones, lowest idf by
  construction).

Cross-engine float policy (CLAUDE.md): the Robertson +1 idf
``ln((N - df + .5)/(df + .5) + 1)`` is algebraically
``ln(2N + 2) - ln(2df + 1)`` — every ``ln`` argument an EXACT
integer. ``k1``/``b`` are taken in exact milli-units so the tf
component is a fixed chain of correctly-rounded IEEE ops on exact
integers (bigint ``/`` is double division in BOTH engines), hence
bit-identical; only the order-dependent per-query-doc SUM and the
``ln`` ulp are engine-sensitive, and both are rounded ONCE (4 dp).

Reference parity: hiposfer/o2g has no retrieval stage (SURVEY.md
§2.A); this is driver-brief training-data-pipeline family, alongside
operators/decontam.py and corpus.tfidf_topk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..session import cache_latest


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


# ------------------------------------------------------------- postings

def doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The postings fold: one row per (doc, term) with the doc's token
    length ``dl`` carried and the term frequency ``tf`` — wordless
    documents are excluded (they can never match, and BM25's avgdl is
    defined over indexed documents). The word array is materialized
    before the explode (CLAUDE.md rule 1)."""
    return (
        df.select(F.col(id_col), X.words(_c(text_col)).alias("__ws"))
        .withColumn("__dl", F.size("__ws"))
        .where(F.col("__dl") >= 1)
        .select(F.col(id_col), F.col("__dl"), F.explode("__ws").alias("term"))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").alias("tf"))
    )


def _doc_terms_sql(table_sql: str, id_col: str, text_col: str) -> str:
    toks = X.words_sql(text_col)
    return f"""
  SELECT {id_col}, __dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT {id_col}, len(ws) AS __dl, unnest(ws) AS term
    FROM (SELECT {id_col}, {toks} AS ws FROM {table_sql})
    WHERE len(ws) >= 1
  )
  GROUP BY {id_col}, __dl, term"""


# --------------------------------------------------------------- scoring

def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    max_df: int | None = None,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25
    (``k1 = k1_milli/1000``, ``b = b_milli/1000`` — exact milli-units,
    defaults the standard 1.2/0.75). Output
    ``(query_id, doc_id, rank, score)``, rank 1-based by
    (score desc, doc_id asc) — deterministic ties — and score rounded
    once to 4 dp. Query term frequency is ignored (distinct query
    terms — the standard short-query form); a query whose every term
    is out-of-corpus (or df-capped) returns no rows.

    ``max_df`` drops query terms contained in more than that many
    documents from scoring entirely — the bound on the per-query
    candidate set (see module docstring). Plan shape: one corpus
    postings shuffle + one (query, doc) partial agg + one per-query
    window; everything query-derived is broadcast."""
    dt = cache_latest(
        "retrieval.bm25_topk.doc_terms", doc_terms(docs, id_col, text_col)
    )
    stats = dt.agg(
        F.countDistinct(id_col).cast("long").alias("__N"),
        F.sum("tf").cast("long").alias("__S"),
    )
    qt = (
        queries.select(F.col(qid_col), X.words(_c(qtext_col)).alias("__qw"))
        .select(F.col(qid_col), F.explode("__qw").alias("term"))
        .distinct()
    )
    terms = qt.select("term").distinct()
    matched = dt.join(F.broadcast(terms), "term")
    dfq = matched.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    if max_df is not None:
        dfq = dfq.where(F.col("df") <= max_df)

    # fixed chain of correctly-rounded IEEE ops on exact integers —
    # mirror bm25_topk_sql operation-for-operation (module docstring)
    idf = F.log(F.lit(2) * F.col("__N") + F.lit(2)) - F.log(
        F.lit(2) * F.col("df") + F.lit(1)
    )
    tfc = (F.col("tf") * F.lit(k1_milli + 1000)) / (
        F.col("tf") * F.lit(1000)
        + F.lit(k1_milli)
        * (
            F.lit(1000 - b_milli)
            + (F.lit(b_milli) * F.col("__dl") * F.col("__N")) / F.col("__S")
        )
        / F.lit(1000)
    )
    scores = (
        matched.join(F.broadcast(dfq), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__t", idf * tfc)
        .groupBy(qid_col, id_col)
        .agg(F.round(F.sum("__t"), 4).alias("score"))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "rank", "score")
    )


def bm25_topk_sql(
    docs_sql: str,
    queries_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
    max_df: int | None = None,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical operation order
    per term (see module float policy)."""
    dt = _doc_terms_sql(f"({docs_sql})", id_col, text_col)
    qtoks = X.words_sql(qtext_col)
    having = f"HAVING count(*) <= {max_df}" if max_df is not None else ""
    return f"""
WITH dt AS ({dt}),
stats AS (
  SELECT CAST(count(DISTINCT {id_col}) AS BIGINT) AS N,
         CAST(sum(tf) AS BIGINT) AS S
  FROM dt
),
qt AS (
  SELECT DISTINCT {qid_col}, term
  FROM (SELECT {qid_col}, unnest({qtoks}) AS term FROM ({queries_sql}))
),
dfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM dt
  WHERE term IN (SELECT term FROM qt)
  GROUP BY term
  {having}
),
scored AS (
  SELECT q.{qid_col}, d.{id_col},
         (ln(2 * s.N + 2) - ln(2 * f.df + 1))
         * ((d.tf * {k1_milli + 1000})
            / (d.tf * 1000
               + {k1_milli}
                 * (({1000 - b_milli}) + ({b_milli} * d.__dl * s.N) / s.S)
                 / 1000)) AS t
  FROM dt d
  JOIN dfq f USING (term)
  JOIN qt q USING (term)
  CROSS JOIN stats s
),
scores AS (
  SELECT {qid_col}, {id_col}, round(sum(t), 4) AS score
  FROM scored GROUP BY {qid_col}, {id_col}
)
SELECT {qid_col}, {id_col}, rank, score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {qid_col} ORDER BY score DESC, {id_col} ASC
  ) AS rank
  FROM scores
)
WHERE rank <= {k}
"""
