"""Gopher-style repetition quality signals (Rae et al. 2021, app. A):
duplicate-word/line fractions, top-n-gram character coverage, and
duplicate-n-gram character coverage — the standard filters a training
pipeline applies before dedup to drop degenerate pages (keyword stuff,
nav spam, template echo).

Everything is per-document HOF column math — no shuffle, no Python;
cost is O(grams log grams) per doc (sort + one run-length fold; see
:func:`_run_fold`), bounded by ``max_tokens`` (the Gopher filters
themselves only need the head of a document). The
report PROJECTS the token/gram arrays first and places a shuffle
boundary before the feature projection: CollapseProject would
otherwise inline each gram array into every consuming HOF lambda and
re-evaluate it per element (CLAUDE.md rule 8 — measured elsewhere at
bands× per row).

Definitions (fractions rounded once at 6dp; every count is exact
integer math, so the DuckDB twin is value-hash exact):

- ``dup_word_frac``   = 1 − distinct(words)/words (0 when empty)
- ``dup_line_frac``   = 1 − distinct(lines)/lines
- ``dup_line_char_frac`` = chars in line occurrences beyond the first
  / total line chars  (= (Σlen − Σlen over distinct)/Σlen)
- ``top{n}_char_frac`` = count(most frequent n-gram) × chars(gram)
  / total word chars (ties: the tied gram with the widest coverage)
- ``dup{n}_char_frac`` = Σ over n-grams occurring >1 of count×chars
  / total word chars, clamped at 1.0 (overlapping occurrences can
  exceed the total — the clamp is the documented approximation; exact
  overlap accounting needs positional interval math nobody's filter
  thresholds are sensitive to)

chars(gram) counts the gram's word characters only (separator spaces
excluded), total word chars likewise — so the ratio is insensitive to
whitespace normalization.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X

TOP_NS = (2, 3, 4)
DUP_NS = (5, 8, 10)


def _grams(w, n: int):
    """Ordered (non-distinct) word n-grams; empty when too short
    (sequence(0,k) counts DOWN for k<0 — CLAUDE.md)."""
    g = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return F.when(F.size(w) < n, F.array().cast(T.ArrayType(T.StringType()))).otherwise(g)


def _grams_sql(w: str, n: int) -> str:
    return (
        f"list_transform(range(1, greatest(len({w}) - {n} + 1, 0) + 1), "
        f"i -> array_to_string(({w})[i:i+{n - 1}], ' '))"
    )


def repetition_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
    max_tokens: int = 2000,
    sep: str = "\n",
) -> DataFrame:
    """Per-doc repetition signals: ``(id, n_words, dup_word_frac,
    dup_line_frac, dup_line_char_frac, top{n}_char_frac…,
    dup{n}_char_frac…)``. ``n_words`` is the CAPPED count the gram
    features saw (honest about the max_tokens bound, not the raw
    length — pair with token_counts for that)."""
    arrays = df.select(
        id_col,
        F.slice(X.words(text_col), 1, max_tokens).alias("__w"),
        F.split(F.col(text_col), re.escape(sep)).alias("__lines"),
    )
    for n in sorted(set(top_ns) | set(dup_ns)):
        arrays = arrays.withColumn(f"__g{n}", _grams(F.col("__w"), n))
    # shuffle boundary: without it CollapseProject merges this projection
    # into the feature projection and each __g{n} reference inside a HOF
    # lambda re-derives the gram array per element (rule 8)
    par = df.sparkSession.sparkContext.defaultParallelism
    arrays = arrays.repartition(par, id_col)

    w = F.col("__w")
    lines = F.col("__lines")
    nw = F.size(w).cast(T.LongType())
    wchars = F.aggregate(
        w, F.lit(0).cast(T.LongType()), lambda acc, x: acc + F.length(x)
    )
    lchars = F.aggregate(
        lines, F.lit(0).cast(T.LongType()), lambda acc, x: acc + F.length(x)
    )
    dchars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast(T.LongType()),
        lambda acc, x: acc + F.length(x),
    )

    def frac(num, den):
        return F.round(num / F.greatest(den, F.lit(1)), 6)

    cols = [
        F.col(id_col),
        nw.alias("n_words"),
        F.when(nw == 0, F.lit(0.0))
        .otherwise(frac(nw - F.size(F.array_distinct(w)), nw))
        .alias("dup_word_frac"),
        frac(F.size(lines) - F.size(F.array_distinct(lines)), F.size(lines)).alias(
            "dup_line_frac"
        ),
        F.when(lchars == 0, F.lit(0.0))
        .otherwise(frac(lchars - dchars, lchars))
        .alias("dup_line_char_frac"),
    ]
    folds = {n: _run_fold(F.col(f"__g{n}"), n)
             for n in sorted(set(top_ns) | set(dup_ns))}
    for n in top_ns:
        cols.append(
            F.when(F.size(F.col(f"__g{n}")) == 0, F.lit(0.0))
            .otherwise(frac(folds[n]["best_cov"], wchars))
            .alias(f"top{n}_char_frac")
        )
    for n in dup_ns:
        cols.append(
            F.when(F.size(F.col(f"__g{n}")) == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.least(
                        folds[n]["dup"] / F.greatest(wchars, F.lit(1)),
                        F.lit(1.0),
                    ),
                    6,
                )
            )
            .alias(f"dup{n}_char_frac")
        )
    return arrays.select(*cols)


def _run_fold(g, n: int):
    """One O(len log len) pass computing BOTH gram statistics: sort
    the gram array (equal grams become adjacent runs), append an
    impossible sentinel gram (''), and fold run lengths:

    - ``best_cov`` — count × chars of the most frequent gram (ties →
      widest coverage), i.e. the top-n-gram numerator
    - ``dup``     — Σ over grams occurring >1 of count × chars, the
      dup-n-gram numerator

    (The first implementation counted each distinct gram with a
    nested filter — O(distinct × grams) string comparisons per doc,
    measured unusable past ~100-word docs at millions of rows.)

    chars(gram) = length − (n−1) separator spaces. The empty zero
    accumulator finalizes harmlessly (run 0 never beats or ties into
    coverage, never adds dup chars)."""
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast(T.LongType()).alias("run"),
        F.lit(0).cast(T.LongType()).alias("best_c"),
        F.lit(0).cast(T.LongType()).alias("best_cov"),
        F.lit(0).cast(T.LongType()).alias("dup"),
    )

    def merge(acc, x):
        charlen = F.length(acc["prev"]) - F.lit(n - 1)
        cand = acc["run"] * charlen
        return F.when(
            x == acc["prev"],
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["best_c"].alias("best_c"),
                acc["best_cov"].alias("best_cov"),
                acc["dup"].alias("dup"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast(T.LongType()).alias("run"),
                F.greatest(acc["best_c"], acc["run"]).alias("best_c"),
                F.when(acc["run"] > acc["best_c"], cand)
                .when(
                    acc["run"] == acc["best_c"],
                    F.greatest(acc["best_cov"], cand),
                )
                .otherwise(acc["best_cov"])
                .alias("best_cov"),
                (
                    acc["dup"]
                    + F.when(acc["run"] > 1, cand).otherwise(F.lit(0))
                ).alias("dup"),
            )
        )

    walk = F.concat(F.array_sort(g), F.array(F.lit("")))
    return F.aggregate(walk, zero, merge)


def repetition_report_sql(
    docs_query: str,
    id_col: str,
    text_col: str,
    top_ns: tuple[int, ...] = TOP_NS,
    dup_ns: tuple[int, ...] = DUP_NS,
    max_tokens: int = 2000,
    sep_sql: str = "chr(10)",
) -> str:
    """DuckDB twin of :func:`repetition_report` (1-based list slicing;
    nested lambdas capture like Spark's).

    The twin keeps the O(distinct × grams) per-doc nested-filter
    formulation on purpose — it only ever runs at oracle scale (≤ a
    few thousand short docs), and the sort+fold the Spark side uses
    is NOT safely expressible here: DuckDB 1.0's ``list_reduce``
    returns batch-composition-dependent results (the same doc folds
    to different values inside a 500-row scan vs filtered to a single
    row — verified against a pure-Python ground truth; the filtered /
    single-row answer is the correct one). Do not rewrite this twin
    with list_reduce."""
    ns = sorted(set(top_ns) | set(dup_ns))
    gcols = ",\n       ".join(f"{_grams_sql('__w', n)} AS __g{n}" for n in ns)
    arrays = f"""
SELECT {id_col},
       ({X.words_sql(text_col)})[1:{max_tokens}] AS __w,
       string_split({text_col}, {sep_sql}) AS __lines,
       {gcols}
FROM ({docs_query})
"""
    wchars = "list_sum(list_transform(__w, x -> CAST(length(x) AS BIGINT)))"
    lchars = "list_sum(list_transform(__lines, x -> CAST(length(x) AS BIGINT)))"
    dchars = (
        "list_sum(list_transform(list_distinct(__lines), "
        "x -> CAST(length(x) AS BIGINT)))"
    )
    exprs = [
        id_col,
        "CAST(len(__w) AS BIGINT) AS n_words",
        (
            "CASE WHEN len(__w) = 0 THEN 0.0 ELSE round((len(__w) - "
            "len(list_distinct(__w))) / greatest(len(__w), 1), 6) END "
            "AS dup_word_frac"
        ),
        (
            "round((len(__lines) - len(list_distinct(__lines))) / "
            "greatest(len(__lines), 1), 6) AS dup_line_frac"
        ),
        (
            f"CASE WHEN coalesce({lchars}, 0) = 0 THEN 0.0 ELSE "
            f"round(({lchars} - {dchars}) / greatest({lchars}, 1), 6) END "
            "AS dup_line_char_frac"
        ),
    ]
    for n in top_ns:
        g = f"__g{n}"
        cnt = f"len(list_filter({g}, x -> x = d))"
        mc = f"list_max(list_transform(list_distinct({g}), d -> {cnt}))"
        cover = (
            f"list_max(list_transform(list_filter(list_distinct({g}), "
            f"d -> {cnt} = ({mc})), d -> CAST(length(d) - {n - 1} AS BIGINT)"
            f")) * ({mc})"
        )
        exprs.append(
            f"CASE WHEN len({g}) = 0 THEN 0.0 ELSE "
            f"round(({cover}) / greatest({wchars}, 1), 6) END "
            f"AS top{n}_char_frac"
        )
    for n in dup_ns:
        g = f"__g{n}"
        cnt = f"len(list_filter({g}, x -> x = d))"
        dup_cover = (
            f"coalesce(list_sum(list_transform(list_distinct({g}), "
            f"d -> CAST(CASE WHEN {cnt} > 1 THEN {cnt} * (length(d) - {n - 1}) "
            f"ELSE 0 END AS BIGINT))), 0)"
        )
        exprs.append(
            f"CASE WHEN len({g}) = 0 THEN 0.0 ELSE "
            f"round(least(({dup_cover}) / greatest({wchars}, 1), 1.0), 6) END "
            f"AS dup{n}_char_frac"
        )
    sel = ",\n       ".join(exprs)
    return f"WITH arrays AS ({arrays})\nSELECT {sel}\nFROM arrays"
