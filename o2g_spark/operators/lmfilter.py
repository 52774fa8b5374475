"""Model-based quality filtering for training-data curation: a
distributed word-bigram language model (train + per-document NLL
scoring, the CCNet/KenLM perplexity-filter shape) and DSIR-style
hashed-n-gram importance weights (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling").

Both published pipeline stages rank web documents by how much they
look like a trusted corpus; both are re-expressed here as pure
DataFrame plans (counts = groupBy, model lookup = equi-join, score =
one aggregation) with bit-identical DuckDB twins:

* **lm_train / lm_score** — add-one-smoothed bigram LM. Training is
  two shuffles (bigram counts, context counts) whose build sides are
  one row per DISTINCT n-gram — the stopword-bigram skew axis is
  bounded by construction, occurrences never cross the wire twice
  (map-side partial aggregation). Scoring folds each document's
  bigram multiset once, left-joins the count tables (AQE broadcasts
  a small model; a 100-TB corpus against a billion-row model is a
  plain shuffle join on the bigram key), and aggregates
  ``m · (ln(c_ctx + V) − ln(c_pair + 1))`` per document.
* **dsir_logweights** — features are 60-bit-md5-hashed bigrams in
  ``buckets`` buckets, so BOTH feature-count tables are bounded at
  ``buckets`` rows and broadcast at any corpus size; the importance
  weight is the classic smoothed log-ratio
  ``Σ m_f·(ln(c_t(f)+1) − ln(c_r(f)+1)) − n·(ln(N_t+B) − ln(N_r+B))``.

Float policy (CLAUDE.md): every per-token term is ``ln`` of an EXACT
integer (count + smoothing constant), computed raw and summed in
double; the order-dependent sum is rounded ONCE per output column
(4 dp) in both engines — never round-then-combine. Probabilities
reported by ``lm_train`` stay in exact integer ppm (``(c+1)·1e6 DIV
(c_ctx+V)``) so the model table itself hashes bit-identically with
no float in sight.

Out-of-vocabulary handling needs no explicit ``<unk>`` mapping: an
unseen bigram left-joins to ``c_pair = 0`` and an unseen context to
``c_ctx = 0``, which IS the add-one unknown probability
``1 / (0 + V)`` — the lookup is total by construction.

Reference parity: hiposfer/o2g has no LM stage (SURVEY.md §2.A); this
module belongs to the driver-brief "training-data pipeline" family,
alongside operators/corpus.py and functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X

BOS = "<s>"  # words() output is lowercase alnum — '<s>' cannot collide

_MICRO = 1_000_000


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


# -------------------------------------------------------- bigram events

def bigram_events(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per bigram EVENT: (id, w1, w2) where w1 is the previous
    word (:data:`BOS` for the first), w2 the current — exactly
    ``n_words`` events per document, zero for wordless docs.

    Narrow op: tokenize → shifted-pair array → explode. The pair array
    is MATERIALIZED via withColumn before the explode (CLAUDE.md rule
    1 — GenerateExec evaluates its child interpreted, per emitted
    row), and the pair is carried as one ``'w1 w2'`` string through
    the Generate, split after (words contain no spaces by
    construction)."""
    out = (
        df.select(F.col(id_col), X.words(_c(text_col)).alias("__ws"))
        .withColumn("__n", F.size("__ws"))
        .where(F.col("__n") >= 1)
        .withColumn(
            "__prev",
            F.concat(
                F.array(F.lit(BOS)), F.slice("__ws", F.lit(1), F.col("__n") - 1)
            ),
        )
        .withColumn(
            "__pairs",
            F.zip_with(
                "__prev", "__ws", lambda a, b: F.concat(a, F.lit(" "), b)
            ),
        )
        .select(F.col(id_col), F.explode("__pairs").alias("__bg"))
        .select(
            F.col(id_col),
            F.substring_index("__bg", " ", 1).alias("w1"),
            F.substring_index("__bg", " ", -1).alias("w2"),
        )
    )
    return out


def bigram_events_sql(table_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`bigram_events` (1-based list indexing;
    ``range`` is end-exclusive so ``range(1, len+1)`` enumerates token
    positions and is empty for wordless docs)."""
    toks = X.words_sql(text_col)
    return f"""
  SELECT {id_col},
         CASE WHEN i = 1 THEN '{BOS}' ELSE t[i - 1] END AS w1,
         t[i] AS w2
  FROM (
    SELECT {id_col}, t, unnest(range(1, len(t) + 1)) AS i
    FROM (SELECT {id_col}, {toks} AS t FROM {table_sql})
  )"""


# ------------------------------------------------------------- training

def lm_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 1,
    include_vocab: bool = False,
) -> DataFrame:
    """Train the add-one bigram model; returns the model TABLE:
    ``(w1, w2, c_pair, c_ctx, p_ppm)`` for every bigram type with
    ``c_pair >= min_count``, where ``p_ppm = ((c_pair+1) * 1e6) DIV
    (c_ctx + V)`` is the smoothed conditional probability in exact
    integer ppm and ``V`` = distinct-next-word vocabulary + 1 (the
    unk slot).

    ``min_count`` prunes the emitted table only — counts and V are
    computed from the FULL corpus first, so pruning never changes the
    surviving rows' probabilities. ``include_vocab=True`` adds the
    (constant) ``v`` column so the table is SELF-CONTAINED for
    persistence: :func:`lm_score_from_model` can score against the
    snapshot alone — the train-once serving path through the
    checkpoint layer (same lifecycle as the BPE merges and the IVF
    centroids).

    Scale shape: two partial-agg shuffles over n-gram keys (never raw
    occurrences), one vocab-sized distinct, a broadcast of the 1-row V
    scalar, and a join whose build side is one row per distinct
    context word."""
    ev = bigram_events(df, id_col, text_col)
    pair = ev.groupBy("w1", "w2").agg(F.count("*").alias("c_pair"))
    ctx = ev.groupBy("w1").agg(F.count("*").alias("c_ctx"))
    vocab = ev.agg((F.countDistinct("w2") + F.lit(1)).alias("__V"))
    out = (
        pair.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "p_ppm",
            F.expr(f"((c_pair + 1) * CAST({_MICRO} AS BIGINT)) DIV (c_ctx + __V)"),
        )
        .where(F.col("c_pair") >= min_count)
        .select(
            "w1",
            "w2",
            F.col("c_pair").cast(T.LongType()).alias("c_pair"),
            F.col("c_ctx").cast(T.LongType()).alias("c_ctx"),
            F.col("p_ppm").cast(T.LongType()).alias("p_ppm"),
            *([F.col("__V").cast(T.LongType()).alias("v")]
              if include_vocab else []),
        )
    )
    return out


def lm_train_sql(
    train_sql: str, id_col: str, text_col: str, min_count: int = 1
) -> str:
    ev = bigram_events_sql(f"({train_sql})", id_col, text_col)
    return f"""
WITH ev AS ({ev}),
pair AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair FROM ev GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_ctx FROM ev GROUP BY w1),
vocab AS (SELECT CAST(count(DISTINCT w2) + 1 AS BIGINT) AS V FROM ev)
SELECT pair.w1 AS w1, w2, c_pair, c_ctx,
       ((c_pair + 1) * CAST({_MICRO} AS BIGINT)) // (c_ctx + V) AS p_ppm
FROM pair JOIN ctx ON pair.w1 = ctx.w1 CROSS JOIN vocab
WHERE c_pair >= {min_count}
"""


# -------------------------------------------------------------- scoring

def lm_score(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Score every document of ``score_df`` (≥1 word) under the
    add-one bigram LM trained on ``train_df``: output
    ``(id, n_events, nll, nll_per_tok)`` where ``nll = Σ events
    ln((c_ctx + V) / (c_pair + 1))`` — the document's negative log
    likelihood, the quantity CCNet thresholds (perplexity is
    ``exp(nll_per_tok)``, monotone in it). Both float columns are
    raw double sums rounded ONCE to 4 dp; every ln argument is an
    exact integer, so the engines agree (see module docstring).

    Unseen bigrams/contexts coalesce to count 0 = the smoothed unk
    path; no vocabulary mapping join is needed. Scale shape: one
    per-doc bigram fold (map-side combinable groupBy), two left
    joins against n-gram-keyed count tables (AQE broadcast when the
    model is small), one per-doc aggregation."""
    train_ev = bigram_events(train_df, id_col, text_col)
    pair = train_ev.groupBy("w1", "w2").agg(F.count("*").alias("c_pair"))
    ctx = train_ev.groupBy("w1").agg(F.count("*").alias("c_ctx"))
    vocab = train_ev.agg((F.countDistinct("w2") + F.lit(1)).alias("__V"))
    return _score_against(pair, ctx, vocab, score_df, id_col, text_col)


def lm_score_from_model(
    model_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Score against a PERSISTED model table — the train-once serving
    path: pass an ``lm_train(..., min_count=1, include_vocab=True)``
    snapshot (read back through the checkpoint layer) and get the
    exact :func:`lm_score` output without re-tokenizing the training
    corpus.

    The model MUST be unpruned (``min_count=1``): a pruned bigram
    would fall back to the unseen path and a context whose every
    pair was pruned would lose its ``c_ctx``, silently shifting
    scores relative to fresh training (pinned by test)."""
    pair = model_df.select("w1", "w2", "c_pair")
    ctx = model_df.select("w1", "c_ctx").dropDuplicates(["w1"])
    vocab = model_df.agg(
        F.coalesce(F.max("v"), F.lit(1)).cast(T.LongType()).alias("__V")
    )
    return _score_against(pair, ctx, vocab, score_df, id_col, text_col)


def _score_against(
    pair: DataFrame,
    ctx: DataFrame,
    vocab: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Shared scoring tail: per-doc bigram fold → count-table lookups
    → one aggregation (see :func:`lm_score` for the plan shape)."""
    ev = bigram_events(score_df, id_col, text_col)
    doc_bg = ev.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("m"))

    scored = (
        doc_bg.join(pair, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn("c_pair", F.coalesce("c_pair", F.lit(0)))
        .withColumn("c_ctx", F.coalesce("c_ctx", F.lit(0)))
        .withColumn(
            "__nll",
            F.col("m")
            * (F.log(F.col("c_ctx") + F.col("__V")) - F.log(F.col("c_pair") + 1)),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("m").cast(T.LongType()).alias("n_events"),
            F.round(F.sum("__nll"), 4).alias("nll"),
            F.round(F.sum("__nll") / F.sum("m"), 4).alias("nll_per_tok"),
        )
    )


def lm_score_sql(
    train_sql: str, score_sql: str, id_col: str, text_col: str
) -> str:
    ev_s = bigram_events_sql(f"({score_sql})", id_col, text_col)
    ev_t = bigram_events_sql(f"({train_sql})", id_col, text_col)
    return f"""
WITH ev_t AS ({ev_t}),
pair AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair FROM ev_t GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_ctx FROM ev_t GROUP BY w1),
vocab AS (SELECT CAST(count(DISTINCT w2) + 1 AS BIGINT) AS V FROM ev_t),
ev_s AS ({ev_s}),
doc_bg AS (
  SELECT {id_col}, w1, w2, CAST(count(*) AS BIGINT) AS m
  FROM ev_s GROUP BY {id_col}, w1, w2
),
scored AS (
  SELECT d.{id_col}, d.m,
         d.m * (ln(coalesce(c.c_ctx, 0) + v.V) - ln(coalesce(p.c_pair, 0) + 1))
           AS nll_term
  FROM doc_bg d
  LEFT JOIN pair p ON p.w1 = d.w1 AND p.w2 = d.w2
  LEFT JOIN ctx c ON c.w1 = d.w1
  CROSS JOIN vocab v
)
SELECT {id_col}, CAST(sum(m) AS BIGINT) AS n_events,
       round(sum(nll_term), 4) AS nll,
       round(sum(nll_term) / sum(m), 4) AS nll_per_tok
FROM scored GROUP BY {id_col}
"""


# ------------------------------------------------- DSIR importance weights

def _feature(w1: Column, w2: Column, buckets: int, seed: str) -> Column:
    tagged = F.concat(F.lit(seed + ":"), w1, F.lit(" "), w2)
    return F.pmod(X.md5_hash60(tagged), F.lit(buckets)).cast(T.LongType())


def _feature_sql(w1: str, w2: str, buckets: int, seed: str) -> str:
    h = X.md5_hash60_sql(f"concat('{seed}:', {w1}, ' ', {w2})")
    return f"({h} % {buckets})"


def dsir_logweights(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 8192,
    seed: str = "dsir",
) -> DataFrame:
    """DSIR importance log-weights: how much more likely each raw
    document is under the TARGET (trusted) hashed-bigram unigram-bag
    model than under the RAW pool's own — documents resampled with
    probability ∝ ``exp(logw)`` approximate the target distribution
    (Xie et al. 2023). Output: ``(id, n_feats, logw)``, logw rounded
    once to 4 dp, one row per raw doc with ≥1 word.

    Features are md5-hashed bigrams into ``buckets`` buckets, so both
    model tables are hard-bounded at ``buckets`` rows — they broadcast
    at ANY corpus size, and the only O(corpus) shuffles are the two
    feature-count partial aggs and the per-doc fold. The doc's own
    events are included in the raw pool counts (the estimator is over
    the full pool, standard DSIR)."""
    raw_ev = bigram_events(raw_df, id_col, text_col)
    tgt_ev = bigram_events(target_df, id_col, text_col)
    f_raw = raw_ev.select(
        F.col(id_col), _feature(F.col("w1"), F.col("w2"), buckets, seed).alias("f")
    )
    f_tgt = tgt_ev.select(
        _feature(F.col("w1"), F.col("w2"), buckets, seed).alias("f")
    )

    c_raw = f_raw.groupBy("f").agg(F.count("*").alias("c_r"))
    c_tgt = f_tgt.groupBy("f").agg(F.count("*").alias("c_t"))
    totals = (
        f_raw.agg(F.count("*").alias("__Nr"))
        .crossJoin(f_tgt.agg(F.count("*").alias("__Nt")))
    )

    doc_f = f_raw.groupBy(id_col, "f").agg(F.count("*").alias("m"))
    scored = (
        doc_f.join(F.broadcast(c_tgt), "f", "left")
        .join(F.broadcast(c_raw), "f", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn("c_t", F.coalesce("c_t", F.lit(0)))
        .withColumn("c_r", F.coalesce("c_r", F.lit(0)))
        .withColumn(
            "__lw",
            F.col("m") * (F.log(F.col("c_t") + 1) - F.log(F.col("c_r") + 1)),
        )
        .withColumn(
            "__norm",
            F.col("m")
            * (
                F.log(F.col("__Nt") + F.lit(buckets))
                - F.log(F.col("__Nr") + F.lit(buckets))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("m").cast(T.LongType()).alias("n_feats"),
            F.round(F.sum("__lw") - F.sum("__norm"), 4).alias("logw"),
        )
    )


def dsir_logweights_sql(
    raw_sql: str,
    target_sql: str,
    id_col: str,
    text_col: str,
    buckets: int = 8192,
    seed: str = "dsir",
) -> str:
    ev_r = bigram_events_sql(f"({raw_sql})", id_col, text_col)
    ev_t = bigram_events_sql(f"({target_sql})", id_col, text_col)
    feat = _feature_sql("w1", "w2", buckets, seed)
    return f"""
WITH fr AS (SELECT {id_col}, {feat} AS f FROM ({ev_r})),
ft AS (SELECT {feat} AS f FROM ({ev_t})),
c_raw AS (SELECT f, CAST(count(*) AS BIGINT) AS c_r FROM fr GROUP BY f),
c_tgt AS (SELECT f, CAST(count(*) AS BIGINT) AS c_t FROM ft GROUP BY f),
totals AS (
  SELECT (SELECT count(*) FROM fr) AS Nr, (SELECT count(*) FROM ft) AS Nt
),
doc_f AS (
  SELECT {id_col}, f, CAST(count(*) AS BIGINT) AS m FROM fr GROUP BY {id_col}, f
),
scored AS (
  SELECT d.{id_col}, d.m,
         d.m * (ln(coalesce(t.c_t, 0) + 1) - ln(coalesce(r.c_r, 0) + 1)) AS lw,
         d.m * (ln(x.Nt + {buckets}) - ln(x.Nr + {buckets})) AS nrm
  FROM doc_f d
  LEFT JOIN c_tgt t ON t.f = d.f
  LEFT JOIN c_raw r ON r.f = d.f
  CROSS JOIN totals x
)
SELECT {id_col}, CAST(sum(m) AS BIGINT) AS n_feats,
       round(sum(lw) - sum(nrm), 4) AS logw
FROM scored GROUP BY {id_col}
"""
