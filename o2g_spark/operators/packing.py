"""Sequence packing: assign documents to fixed-token-budget training
bins (the "pack short docs into one context window" prep step).

The next-fit discipline is inherently sequential — bin state depends
on every prior decision — so it cannot be a window/prefix-sum (a
reset-on-threshold cumsum has no closed form). The scale design makes
the sequential part SMALL instead of avoiding it:

* docs shard deterministically by the shared 60-bit hash
  (``pmod(md5_hash60(id), shards)``) — ONE hash shuffle;
* each shard packs independently inside one ``applyInPandas`` group —
  the only Python in the op, O(rows/shard) per group with a plain
  loop over an Arrow-delivered batch;
* bin ids are globally unique without coordination:
  ``shard * 2^40 + local_bin``.

Pick ``shards`` ≈ a few × total cores so groups stay
executor-memory-sized (a shard's rows materialize as one pandas frame
— the applyInPandas contract) and the ~1-2 ms/group harness cost
(CLAUDE.md rule 9) stays invisible. Sharding costs packing density:
bins never mix docs across shards, so expect up to ``shards`` tails
of slack versus one global stream; the density check lives in
``pack_stats``.

Determinism contract: assignment is a pure function of
(ids, token counts, budget, shards) — docs order by id within the
shard, so the same corpus packs identically on any cluster/layout.
This is what makes the op checkpoint/resume-safe and gives it an
exact DuckDB twin (``pack_sequences_sql`` walks the same discipline
with a recursive CTE, one step per row per shard, all shards
advancing in parallel per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X

_BIN_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    shards: int = 64,
) -> DataFrame:
    """Greedy next-fit packing of docs into token bins of ``budget``.

    A doc opens a new bin when it does not fit the current one; a doc
    larger than the budget occupies a bin alone (flagged via
    ``offset = 0`` + ``n_tokens > budget`` — callers chunk oversize
    docs first via doc_chunks if that is not acceptable).

    ``id_col`` must be UNIQUE: it is both the within-shard packing
    order and the tiebreak, so duplicate ids would make the assignment
    depend on physical row order.

    Output: (id, shard, bin_id, offset, n_tokens) — one row per doc;
    ``offset`` is the doc's token start inside its bin.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if shards <= 0:
        raise ValueError("shards must be positive")

    # string ids (urls) keep their type; everything else rides as long
    id_type = df.schema[id_col].dataType
    id_is_str = isinstance(id_type, T.StringType)
    out_id_type = T.StringType() if id_is_str else T.LongType()
    out_schema = T.StructType(
        [
            T.StructField("id", out_id_type),
            T.StructField("shard", T.IntegerType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("offset", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        bins, offs = [], []
        b, cur = 0, 0
        for t in pdf["n_tokens"].tolist():
            t = int(t)
            if cur + t > budget and cur > 0:
                b += 1
                cur = 0
            bins.append(shard * _BIN_STRIDE + b)
            offs.append(cur)
            cur += t
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "shard": pdf["shard"],
                "bin_id": pd.Series(bins, dtype="int64"),
                "offset": pd.Series(offs, dtype="int64"),
                "n_tokens": pdf["n_tokens"],
            }
        )

    prepared = df.select(
        F.col(id_col).cast(out_id_type).alias("id"),
        F.pmod(X.md5_hash60(F.col(id_col).cast(T.StringType())), F.lit(shards))
        .cast(T.IntegerType())
        .alias("shard"),
        F.col(tokens_col).cast(T.LongType()).alias("n_tokens"),
    )
    return prepared.groupBy("shard").applyInPandas(_pack, out_schema)


def pack_sequences_sql(
    table_sql: str, id_col: str, tokens_expr: str, budget: int, shards: int = 64
) -> str:
    """DuckDB twin: recursive CTE advancing every shard one doc per
    iteration (depth = max rows per shard, not total rows)."""
    h = X.md5_hash60_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
WITH RECURSIVE base AS (
  SELECT CAST({id_col} AS BIGINT) AS id,
         CAST({h} % {shards} AS INTEGER) AS shard,
         CAST({tokens_expr} AS BIGINT) AS n_tokens,
         row_number() OVER (
           PARTITION BY CAST({h} % {shards} AS INTEGER)
           ORDER BY CAST({id_col} AS BIGINT)) AS rn
  FROM {table_sql}
), walk AS (
  SELECT id, shard, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_local,
         CAST(0 AS BIGINT) AS "offset",
         n_tokens AS cur
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.id, b.shard, b.n_tokens, b.rn,
         CASE WHEN w.cur + b.n_tokens > {budget} AND w.cur > 0
              THEN w.bin_local + 1 ELSE w.bin_local END,
         CASE WHEN w.cur + b.n_tokens > {budget} AND w.cur > 0
              THEN CAST(0 AS BIGINT) ELSE w.cur END,
         CASE WHEN w.cur + b.n_tokens > {budget} AND w.cur > 0
              THEN b.n_tokens ELSE w.cur + b.n_tokens END
  FROM walk w JOIN base b ON b.shard = w.shard AND b.rn = w.rn + 1
)
SELECT id, shard,
       CAST(shard AS BIGINT) * {_BIN_STRIDE} + bin_local AS bin_id,
       "offset", n_tokens
FROM walk
"""


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Packing density report: bins used, token fill, and the
    lower-bound comparison ceil(total_tokens / budget) — the slack a
    user trades for shard parallelism."""
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"), F.count("*").alias("docs")
    )
    return per_bin.agg(
        F.count("*").alias("bins_used"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.ceil(F.sum("bin_tokens") / F.lit(budget)).alias("bins_lower_bound"),
        F.round(
            F.sum("bin_tokens") / (F.count("*") * F.lit(float(budget))), 6
        ).alias("fill_ratio"),
        F.max("bin_tokens").alias("max_bin_tokens"),
        F.round(F.avg("docs"), 6).alias("avg_docs_per_bin"),
    )
