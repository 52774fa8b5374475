"""Distributed byte-pair-encoding: tokenizer TRAINING and encoding as
DataFrame ops (the op a training pipeline runs to learn its vocab from
the corpus it just curated — Sennrich et al. 2016 semantics in the
scalable word-frequency-dict formulation).

Scale design (the part that matters at 100 TB):

- Training never iterates over the corpus. The corpus is scanned ONCE
  into a (word, freq) table — the classic BPE dictionary trick — and
  every merge iteration runs on DISTINCT words only (a vocabulary,
  ~millions of rows at web scale, not trillions). The per-iteration
  shuffle is the pair-count groupBy, bounded by distinct (pair) keys;
  the argmax is one tiny sorted-limit job; the merge application is a
  map-only string column op.
- Encoding is one pass: explode words → a chain of 2·k codegen
  ``replace`` calls (no Python, no join, handles unseen words) →
  per-doc re-aggregate. One shuffle each side of a map stage.

Segmentation state is a space-delimited symbol STRING (`` h e l l o ``
with sentinel spaces at both ends), because merge application is then
ONE built-in ``replace(' a b ', ' ab ')`` whose non-overlapping
left-to-right scan is bit-identical in Spark (Java) and DuckDB — the
whole operator twins exactly, data-dependent argmaxes included.
Each merge applies the replace TWICE: one pass skips every second
pair of a consecutive run (the shared delimiter space is consumed by
the match), two passes resolve any run. The resulting segmentation is
deterministic and engine-identical; on odd self-runs (``aaaaa`` with
merge ``a a``) it keeps a different (still maximal) pairing than the
list-greedy convention — a documented tie convention, not an error.
Ties in pair counts break on the pair string ascending, so training
is fully deterministic.

Words come from :func:`o2g_spark.functions.text.words` (lowercase
alnum), so symbols never contain spaces and the delimiter is safe; an
end-of-word sentinel is deliberately not used (merges cannot cross
word boundaries by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X

__all__ = ["word_freqs", "bpe_train", "bpe_merges_df", "bpe_encode",
           "bpe_train_sql", "bpe_encode_sql"]


def word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — the ONE corpus scan of training."""
    w = docs.select(F.col(text_col).alias("__t"))
    w = w.withColumn("__ws", X.words("__t"))  # materialize before explode
    return (
        w.select(F.explode("__ws").alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    )


def _seq_init(col):
    # " h e l l o " — sentinel spaces keep every symbol space-flanked
    return F.concat(F.lit(" "), F.regexp_replace(col, "(.)", "$1 "))


def _pairs(seq):
    # the symbol array is LET-BOUND so split+trim runs once per row:
    # handing the raw split expression to zip_with evaluates it 4×
    # (each slice evaluates the array plus its size argument)
    def _build(a: F.Column) -> F.Column:
        n = F.size(a)
        return F.zip_with(
            F.slice(a, 1, n - 1), F.slice(a, 2, n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )

    return F.transform(F.array(F.split(F.trim(seq), " ")), _build)[0]


def _apply_merge(seq, pair: str):
    pat = F.lit(f" {pair} ")
    rep = F.lit(" " + pair.replace(" ", "") + " ")
    return F.replace(F.replace(seq, pat, rep), pat, rep)


def bpe_train(docs: DataFrame, text_col: str,
              n_merges: int) -> list[tuple[str, int]]:
    """Learn ``n_merges`` merges; returns [(pair "a b", weight), ...]
    in merge order. Driver-side loop of small jobs over the cached
    (word, freq) dictionary — the corpus is scanned once."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    base = word_freqs(docs, text_col).withColumn(
        "seq", _seq_init(F.col("word"))).persist()
    seqs = base
    try:
        merges: list[tuple[str, int]] = []
        for _ in range(n_merges):
            top = (
                # rule 1: materialize the computed pair array BEFORE
                # the explode (GenerateExec evaluates generator args
                # interpreted, without subexpression elimination)
                seqs.withColumn("__p", _pairs(F.col("seq")))
                .select("freq", F.explode("__p").alias("pr"))
                .groupBy("pr").agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pr"))
                .first()
            )
            if top is None:
                raise ValueError(
                    "corpus exhausted: no adjacent pairs left before "
                    f"reaching {n_merges} merges — lower n_merges")
            merges.append((top.pr, int(top.cnt)))
            seqs = seqs.withColumn(
                "seq", _apply_merge(F.col("seq"), top.pr))
            if len(merges) % 24 == 0:
                # bound the replace-chain depth: without this, merge k
                # re-executes all 2(k-1) prior replaces per iteration
                # (O(k² · vocab) total) and the nested expression
                # eventually overflows codegen — same localCheckpoint
                # pattern as graph.pagerank
                seqs = seqs.localCheckpoint(eager=True)
        return merges
    finally:
        base.unpersist()  # the persisted root — not the derived chain


def bpe_merges_df(spark, docs: DataFrame, text_col: str,
                  n_merges: int) -> DataFrame:
    """Gate/report shape: (step, pair, weight)."""
    merges = bpe_train(docs, text_col, n_merges)
    return spark.createDataFrame(
        [(i + 1, p, c) for i, (p, c) in enumerate(merges)],
        "step INT, pair STRING, weight BIGINT",
    )


def bpe_encode(docs: DataFrame, id_col: str, text_col: str,
               merges: list[tuple[str, int]] | list[str]) -> DataFrame:
    """(id, n_tokens, tok_hash) — encode every doc with the learned
    merges. One explode → codegen replace chain → one re-aggregate;
    handles words unseen at training time (the replaces just don't
    fire). ``tok_hash`` is an order-independent exact integer digest:
    sum over words of (60-bit md5 of the word's final segmentation
    mod 1e9)."""
    pairs = [m[0] if isinstance(m, tuple) else m for m in merges]
    w = docs.select(id_col, F.col(text_col).alias("__t"))
    w = w.withColumn("__ws", X.words("__t"))
    w = w.select(id_col, F.explode("__ws").alias("word"))
    seq = _seq_init(F.col("word"))
    for p in pairs:
        seq = _apply_merge(seq, p)
    w = w.select(
        id_col,
        F.size(F.split(F.trim(seq), " ")).cast("long").alias("__n"),
        F.pmod(X.md5_hash60(F.trim(seq)), F.lit(1_000_000_000))
        .alias("__h"),
    )
    return w.groupBy(id_col).agg(
        F.sum("__n").alias("n_tokens"),
        F.sum("__h").alias("tok_hash"),
    )


# ------------------------------------------------------------ DuckDB twins


def _seq_init_sql(col: str) -> str:
    return f"' ' || regexp_replace({col}, '(.)', '\\1 ', 'g')"


def _pairs_sql(seq: str) -> str:
    return (
        f"list_transform(range(1, len(string_split(trim({seq}), ' '))), "
        f"i -> string_split(trim({seq}), ' ')[i] || ' ' || "
        f"string_split(trim({seq}), ' ')[i + 1])"
    )


def _train_ctes(docs_query: str, text_col: str, n_merges: int) -> str:
    """Shared unrolled CTE chain: words → s0 → (p_i, m_i, s_i)*."""
    parts = [
        f"""words AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({X.words_sql(text_col)}) AS w
        FROM ({docs_query}))
  GROUP BY w
),
s0 AS MATERIALIZED (SELECT word, freq, {_seq_init_sql('word')} AS seq FROM words)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"s{i - 1}"
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT pr, sum(freq) AS cnt
  FROM (SELECT freq, unnest({_pairs_sql('seq')}) AS pr FROM {prev})
  GROUP BY pr
),
m{i} AS MATERIALIZED (SELECT pr, cnt FROM p{i} ORDER BY cnt DESC, pr LIMIT 1),
s{i} AS MATERIALIZED (
  SELECT word, freq,
         replace(replace(seq,
             (SELECT ' ' || pr || ' ' FROM m{i}),
             (SELECT ' ' || replace(pr, ' ', '') || ' ' FROM m{i})),
             (SELECT ' ' || pr || ' ' FROM m{i}),
             (SELECT ' ' || replace(pr, ' ', '') || ' ' FROM m{i})) AS seq
  FROM {prev}
)""")
    return ",\n".join(parts)


def bpe_train_sql(docs_query: str, text_col: str, n_merges: int) -> str:
    """DuckDB twin of :func:`bpe_merges_df` — the data-dependent
    argmax chain unrolled (same pattern as the pagerank twin)."""
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS step, pr AS pair, "
        f"CAST(cnt AS BIGINT) AS weight FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"WITH {_train_ctes(docs_query, text_col, n_merges)}\n{selects}"


def bpe_encode_sql(docs_query: str, id_col: str, text_col: str,
                   n_merges: int) -> str:
    """DuckDB twin of train-then-:func:`bpe_encode` on the SAME corpus:
    the final segmentation state s_k IS word → seq, so encoding joins
    each doc's words to it (equivalent to re-applying the replace
    chain, since every corpus word is in the dictionary)."""
    return f"""WITH {_train_ctes(docs_query, text_col, n_merges)},
docwords AS (
  SELECT {id_col} AS __id, unnest({X.words_sql(text_col)}) AS word
  FROM ({docs_query})
)
SELECT d.__id AS {id_col},
       CAST(sum(len(string_split(trim(s.seq), ' '))) AS BIGINT)
         AS n_tokens,
       CAST(sum({X.md5_hash60_sql("trim(s.seq)")} % 1000000000)
         AS BIGINT) AS tok_hash
FROM docwords d JOIN s{n_merges} s ON d.word = s.word
GROUP BY d.__id
"""
