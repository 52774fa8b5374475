"""Cross-document passage-level exact-substring dedup (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"):
remove every duplicated run of ``k`` or more tokens from the corpus,
keeping exactly the globally-first occurrence.

The reference algorithm builds a single-machine suffix array; the
distributed re-expression is token-window fingerprinting — the same
semantics for runs >= k tokens (a duplicated run of length L >= k is
covered by its L-k+1 duplicated k-windows; runs < k are invisible, as
in the paper where k is the match threshold):

1. tokenize (whitespace split, case-preserving — reconstruction joins
   with single spaces, so the operator expects extracted/normalized
   text, e.g. html_to_text output);
2. hash each token ONCE (60-bit md5 — CLAUDE.md rule 3), then
   fingerprint every k-token window with TWO independent linear forms
   over disjoint 30-bit projections of the token hashes. Weights are
   fixed odd constants sized so a window's k products SUM within
   BIGINT with no modular reduction — the identical integer result in
   Spark and DuckDB (DuckDB 1.0's list_reduce is batch-composition
   buggy, see repetition.py, so the twin must not need a fold with
   carries; a plain weighted SUM list_sum's safely). Joint key is
   ~2 x 56 effective bits: at 10^13 windows (100 TB) the expected
   number of false window collisions is ~1e-7.
3. one wide exchange on the window key: rank occurrences by
   (doc, start); every occurrence after the first is a duplicate;
4. duplicated window starts -> covered token positions -> merged
   spans per doc (gaps-and-islands), so the rebuild HOF is
   O(tokens x spans), not O(tokens x marked windows) — a fully
   duplicated spam doc collapses to ONE span;
5. rebuild each doc by filtering its token array against its (few)
   spans. Docs with no duplicated window pass through the same
   single-space rejoin (whitespace-normalized output for every row).

Exactness vs the suffix-array reference (r5 verdict #4, measured in
scripts/bench_passage_exact.py): the token-REMOVAL set of the window
form equals ExactSubstr's exactly — a token sits in a duplicated
>= k-token substring with an earlier occurrence iff some k-window
covering it has an earlier occurrence (any such substring contains a
covering k-window that recurs inside the earlier occurrence; the
window itself IS such a substring). Divergence is therefore confined
to (a) joint fingerprint collisions (quantified above: ~1e-7 expected
at 100 TB) and (b) whitespace vs BPE tokenization. Planted adversarial
layouts (shifted windows, overlapping near-boundary dups, staggered
triples, periodic within-doc repeats, kept-copy partial trims) compare
byte-for-byte equal to a true-sequence brute reference for BOTH
strategies — table in BENCH/BASELINE.md. Choosing k: k IS the match
threshold (the paper uses 50); runs shorter than k are invisible and
smaller k removes strictly more, so set k to the shortest duplication
worth deleting — window count (cost) stays ~tokens regardless, and the
collision margin E[collisions] ≈ W²/2¹¹² leaves ~2^26 headroom at
W = 10¹³ windows.

Scale shape: the only full-corpus exchanges are the rule-8 boundary
repartition (materializes the per-token hash array out of HOF-lambda
reach of CollapseProject) and the window-key shuffle (~40 B/token —
inherent to distributed exact-substring dedup; the suffix array it
replaces is single-node by construction). The span join back to docs
carries only affected docs' spans. ``strategy="window"`` ranks with
ONE exchange via row_number; a window key duplicated millions of
times (universal license boilerplate) lands in one WindowExec
partition AQE cannot split (CLAUDE.md rule 12), so
``strategy="join"`` keeps a map-side-combinable groupBy(min,count) +
join escape whose skew AQE can handle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X

_MOD30 = 1 << 30  # disjoint 30-bit halves of the 60-bit token hash


def _weight_bits(k: int) -> int:
    """Widest weight width w with k * 2**(w+30) < 2**62: the window
    sum then fits BIGINT in both engines with a bit to spare."""
    return 62 - 30 - max(1, math.ceil(math.log2(k + 1)))


def _weights(k: int, mult: int, add: int) -> list[int]:
    bits = _weight_bits(k)
    return [((mult * (j + 1) + add) % (1 << bits)) | 1 for j in range(k)]


def _weights_a(k: int) -> list[int]:
    return _weights(k, 2654435761, 40503)


def _weights_b(k: int) -> list[int]:
    return _weights(k, 2246822519, 97)


def _tokens(text_col) -> F.Column:
    """Whitespace tokens, case/punctuation preserved (unlike
    functions.text.words, which lowercases — this array must
    reconstruct the document)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def _tokens_sql(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array({text}, '\\s+'), x -> x <> '')"
    )


def _linear_form(hs_slice, weights: list[int], high: bool) -> F.Column:
    """Sum_j w_j * proj(hash_j) — proj = low or high 30 bits. All
    operands bounded so the running sum never leaves BIGINT."""
    warr = F.array(*[F.lit(w) for w in weights])

    def term(x, a):
        v = F.shiftright(x, 30) if high else x % F.lit(_MOD30)
        return a.cast(T.LongType()) * v

    return F.aggregate(
        F.zip_with(hs_slice, warr, term),
        F.lit(0).cast(T.LongType()),
        lambda acc, t: acc + t,
    )


def _occurrences(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, __s, __h1, __h2) — one row per k-token window."""
    hashed = docs.select(
        F.col(id_col),
        F.transform(_tokens(text_col), X.md5_hash60).alias("__hs"),
    ).withColumn("__n", F.size("__hs").cast(T.LongType()))
    # rule-8 boundary: without it CollapseProject inlines the md5
    # transform into the window-hash lambdas below and re-derives the
    # whole hash array per element
    par = docs.sparkSession.sparkContext.defaultParallelism
    hashed = hashed.repartition(par, id_col)

    starts = F.when(
        F.col("__n") >= k, F.sequence(F.lit(0).cast(T.LongType()), F.col("__n") - k)
    ).otherwise(F.array().cast(T.ArrayType(T.LongType())))
    wa, wb = _weights_a(k), _weights_b(k)
    wins = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("s"),
            _linear_form(F.slice("__hs", s + 1, k), wa, high=False).alias("h1"),
            _linear_form(F.slice("__hs", s + 1, k), wb, high=True).alias("h2"),
        ),
    )
    return (
        hashed.withColumn("__wins", wins)
        .select(id_col, F.explode("__wins").alias("__w"))
        .select(
            id_col,
            F.col("__w.s").alias("__s"),
            F.col("__w.h1").alias("__h1"),
            F.col("__w.h2").alias("__h2"),
        )
    )


def _marked(occ: DataFrame, id_col: str, strategy: str) -> DataFrame:
    """Window starts that are NOT the globally-first occurrence of
    their window content, ordered by (id, start)."""
    if strategy == "window":
        w = Window.partitionBy("__h1", "__h2").orderBy(id_col, "__s")
        return (
            occ.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") > 1)
            .select(id_col, "__s")
        )
    if strategy == "join":
        grp = (
            occ.groupBy("__h1", "__h2")
            .agg(
                F.count(F.lit(1)).alias("__c"),
                F.min(F.struct(F.col(id_col), F.col("__s"))).alias("__m"),
            )
            .where(F.col("__c") > 1)
            .select("__h1", "__h2", "__m")
        )
        return (
            occ.join(grp, ["__h1", "__h2"])
            .where(
                ~(
                    (F.col(id_col) == F.col(f"__m.{id_col}"))
                    & (F.col("__s") == F.col("__m.__s"))
                )
            )
            .select(id_col, "__s")
        )
    raise ValueError(f"strategy must be 'window' or 'join', got {strategy!r}")


def duplicate_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    strategy: str = "window",
) -> DataFrame:
    """Merged duplicated-token spans per doc: ``(id, lo, hi)`` with
    0-based inclusive token positions — the observability report (and
    the removal set :func:`passage_dedup` applies)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    occ = _occurrences(docs, id_col, text_col, k)
    marked = _marked(occ, id_col, strategy)
    pos = (
        marked.withColumn(
            "__ps", F.sequence(F.col("__s"), F.col("__s") + (k - 1))
        )
        .select(id_col, F.explode("__ps").alias("__p"))
        .distinct()
    )
    w = Window.partitionBy(id_col).orderBy("__p")
    return (
        pos.withColumn("__g", F.col("__p") - F.row_number().over(w))
        .groupBy(id_col, "__g")
        .agg(F.min("__p").alias("lo"), F.max("__p").alias("hi"))
        .select(id_col, "lo", "hi")
    )


def passage_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    strategy: str = "window",
) -> DataFrame:
    """Remove every duplicated >=k-token passage, keeping the
    occurrence that is first by ``(id, start)`` globally. Output one
    row per input doc: ``(id, text, n_tokens, n_removed, n_spans)`` —
    text rebuilt from surviving tokens joined with single spaces
    (whitespace-normalized for EVERY row, touched or not, so the
    transform is uniform), ``n_tokens`` the pre-removal token count.

    Docs shorter than ``k`` tokens emit no windows and are never
    deduplicated. A doc whose every token is covered rebuilds to ''.
    """
    spans = duplicate_spans(docs, id_col, text_col, k, strategy)
    spans_arr = spans.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("lo", "hi"))).alias("__spans")
    )
    base = docs.select(id_col, _tokens(text_col).alias("__toks"))
    joined = base.join(spans_arr, id_col, "left")
    sp = F.col("__spans")
    zero = F.lit(0).cast(T.LongType())
    kept = F.when(sp.isNull(), F.col("__toks")).otherwise(
        F.filter(
            "__toks",
            lambda x, i: ~F.exists(
                sp, lambda t: (i >= t["lo"]) & (i <= t["hi"])
            ),
        )
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias(text_col),
        F.size("__toks").cast(T.LongType()).alias("n_tokens"),
        F.coalesce(
            F.aggregate(sp, zero, lambda acc, t: acc + t["hi"] - t["lo"] + 1),
            zero,
        ).alias("n_removed"),
        F.when(sp.isNull(), zero)
        .otherwise(F.size(sp).cast(T.LongType()))
        .alias("n_spans"),
    )


# ------------------------------------------------------------ DuckDB twins


def _occ_sql(docs_query: str, id_col: str, text_col: str, k: int) -> str:
    wa = "[" + ", ".join(str(w) for w in _weights_a(k)) + "]"
    wb = "[" + ", ".join(str(w) for w in _weights_b(k)) + "]"
    h = X.md5_hash60_sql("t")
    return f"""
SELECT {id_col}, s AS __s,
  CAST(list_sum(list_transform(range(1, {k + 1}),
    j -> ({wa})[j] * (__hs[CAST(s + j AS INT)] % {_MOD30}))) AS BIGINT) AS __h1,
  CAST(list_sum(list_transform(range(1, {k + 1}),
    j -> ({wb})[j] * (__hs[CAST(s + j AS INT)] >> 30))) AS BIGINT) AS __h2
FROM (
  SELECT {id_col}, __hs,
         unnest(range(0, greatest(len(__hs) - {k} + 1, 0))) AS s
  FROM (SELECT {id_col},
               list_transform({_tokens_sql(text_col)}, t -> {h}) AS __hs
        FROM ({docs_query}))
)
"""


def duplicate_spans_sql(
    docs_query: str, id_col: str, text_col: str, k: int = 50
) -> str:
    """DuckDB twin of :func:`duplicate_spans` (row_number ranking ==
    both Spark strategies; DuckDB list indexing is 1-based)."""
    return f"""
WITH occ AS ({_occ_sql(docs_query, id_col, text_col, k)}),
marked AS (
  SELECT {id_col}, __s FROM (
    SELECT {id_col}, __s,
           row_number() OVER (PARTITION BY __h1, __h2
                              ORDER BY {id_col}, __s) AS rn
    FROM occ) WHERE rn > 1
),
pos AS (
  SELECT DISTINCT {id_col}, __s + off AS __p
  FROM (SELECT {id_col}, __s, unnest(range(0, {k})) AS off FROM marked)
),
isl AS (
  SELECT {id_col}, __p,
         __p - row_number() OVER (PARTITION BY {id_col} ORDER BY __p) AS g
  FROM pos
)
SELECT {id_col}, CAST(min(__p) AS BIGINT) AS lo, CAST(max(__p) AS BIGINT) AS hi
FROM isl GROUP BY {id_col}, g
"""


def passage_dedup_sql(
    docs_query: str, id_col: str, text_col: str, k: int = 50
) -> str:
    """DuckDB twin of :func:`passage_dedup`. The rebuild list_filter
    index is 1-based (Spark's is 0-based) — hence the i-1."""
    spans = duplicate_spans_sql(docs_query, id_col, text_col, k)
    return f"""
WITH spans AS ({spans}),
spans_arr AS (
  SELECT {id_col}, list_sort(list({{'lo': lo, 'hi': hi}})) AS sp
  FROM spans GROUP BY {id_col}
),
base AS (
  SELECT {id_col}, {_tokens_sql(text_col)} AS __toks FROM ({docs_query})
)
SELECT b.{id_col},
  coalesce(CASE WHEN a.sp IS NULL THEN array_to_string(b.__toks, ' ')
       ELSE array_to_string(list_filter(b.__toks, (x, i) ->
            len(list_filter(a.sp,
                t -> i - 1 >= t.lo AND i - 1 <= t.hi)) = 0), ' ')
  END, '') AS {text_col},
  CAST(len(b.__toks) AS BIGINT) AS n_tokens,
  CAST(coalesce(list_sum(list_transform(a.sp, t -> t.hi - t.lo + 1)), 0)
       AS BIGINT) AS n_removed,
  CAST(coalesce(len(a.sp), 0) AS BIGINT) AS n_spans
FROM base b LEFT JOIN spans_arr a USING ({id_col})
"""
