"""Distributed Bloom-filter membership: the crawl-frontier primitive
("have we seen this url?") as DataFrame algebra, with EXACT integer
bit math so the filter itself has a bit-identical DuckDB twin.

Shape: the filter is a TABLE of (word_idx, word) rows — 62 bits per
word (not 64: bit 63 is the BIGINT sign and DuckDB raises on a 1<<63
overflow while Spark wraps silently; bit 62 is skipped too so the
twin never touches the sign). Build = per-key k hashed bit positions
(the shared 60-bit md5 hash family, functions/text.py) → groupBy word
→ bit_or, a map-side-combinable aggregate whose shuffle is bounded by
the FILTER size, not the key count. Probe = explode each key's k
positions → equi-join on word_idx → a key is "maybe seen" iff ALL k
bits are set.

Why a table and not a broadcast blob: at crawl scale the filter is
big (1B urls × 10 bits ≈ 1.2 GB) — as rows it partitions, joins, and
checkpoints like any other table, and AQE broadcasts it only when it
actually fits.

``bloom_prefilter_anti_join`` is the production composition: result
is EXACTLY ``new ANTI JOIN seen`` (no false drops — bloom "no" is
definite), but only the maybe-seen sliver (true dups + the fp rate)
pays the exact join. At a 1% fp rate on a mostly-new crawl batch the
exact join's probe side shrinks ~100×; the oracle is the plain anti
join, so correctness never rests on the filter.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X

_WORD_BITS = 62  # stay clear of the BIGINT sign bit in BOTH engines


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _positions(key: Column, m_bits: int, k: int, seed: str) -> Column:
    """Array of k bit positions in [0, m_bits) for one key — each an
    independent 60-bit md5 draw (h_i = H(seed:i:key) % m)."""
    return F.array(
        *[
            F.pmod(
                X.md5_hash60(
                    F.concat(F.lit(f"{seed}:{i}:"), key.cast(T.StringType()))
                ),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    )


def _positions_sql(key: str, m_bits: int, k: int, seed: str) -> list[str]:
    return [
        f"({X.md5_hash60_sql(f'''concat('{seed}:{i}:', CAST({key} AS VARCHAR))''')} % {m_bits})"
        for i in range(k)
    ]


def bloom_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_keys`` at ``fp_rate`` — the standard
    m = -n·ln(p)/ln(2)², k = m/n·ln(2) formulas, m rounded up to a
    whole 62-bit word."""
    if n_keys <= 0:
        raise ValueError("n_keys must be positive")
    if not 0 < fp_rate < 1:
        raise ValueError("fp_rate must be in (0, 1)")
    m = int(math.ceil(-n_keys * math.log(fp_rate) / (math.log(2) ** 2)))
    m = ((m + _WORD_BITS - 1) // _WORD_BITS) * _WORD_BITS
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = 7,
    seed: str = "bloom",
) -> DataFrame:
    """Build the filter table (word_idx, word) from a key column.
    bit_or is commutative + map-side combinable: the shuffle carries
    at most m/62 rows per task regardless of key count, and the
    result is layout-independent (exact, value-hashable)."""
    if m_bits <= 0 or m_bits % _WORD_BITS != 0:
        raise ValueError(f"m_bits must be a positive multiple of {_WORD_BITS}")
    pos = _positions(_c(key_col), m_bits, k, seed)
    bits = (
        df.where(_c(key_col).isNotNull())
        .withColumn("__pos_arr", pos)
        .select(F.explode("__pos_arr").alias("__pos"))
        .select(
            (F.col("__pos") / F.lit(_WORD_BITS)).cast(T.LongType()).alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {_WORD_BITS} AS INT))"
            ).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(__bit)").alias("word"))
    )
    return bits


def bloom_build_sql(
    table_sql: str, key_col: str, m_bits: int, k: int = 7, seed: str = "bloom"
) -> str:
    """DuckDB twin of :func:`bloom_build` (same positions, same 62-bit
    words, same bit_or fold)."""
    pos = _positions_sql(key_col, m_bits, k, seed)
    branches = " UNION ALL ".join(
        f"SELECT {p} AS pos FROM {table_sql} WHERE {key_col} IS NOT NULL"
        for p in pos
    )
    return f"""
SELECT CAST(pos // {_WORD_BITS} AS BIGINT) AS word_idx,
       bit_or(CAST(1 AS BIGINT) << CAST(pos % {_WORD_BITS} AS INTEGER)) AS word
FROM ({branches})
GROUP BY 1
"""


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int = 7,
    seed: str = "bloom",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Attach ``out_col``: true iff ALL k of the key's bits are set in
    the filter (possible false positives at the designed rate; a
    false result is DEFINITE absence). One explode (k rows per key,
    materialized first — CLAUDE.md rule 1) + one equi-join on
    word_idx + one all-k count-back."""
    pos = _positions(_c(key_col), m_bits, k, seed)
    keyed = df.withColumn("__rid", F.monotonically_increasing_id())
    probes = (
        keyed.withColumn("__pos_arr", pos)
        .select("__rid", F.explode("__pos_arr").alias("__pos"))
        .select(
            "__rid",
            (F.col("__pos") / F.lit(_WORD_BITS)).cast(T.LongType()).alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(__pos % {_WORD_BITS} AS INT))"
            ).alias("__bit"),
        )
    )
    hits = (
        probes.join(bloom, "word_idx", "left")
        .withColumn(
            "__hit",
            F.when(
                F.col("word").isNotNull()
                & (F.expr("word & __bit") == F.col("__bit")),
                1,
            ).otherwise(0),
        )
        .groupBy("__rid")
        .agg((F.sum("__hit") == k).alias(out_col))
    )
    return keyed.join(hits, "__rid").drop("__rid")


def bloom_prefilter_anti_join(
    new: DataFrame,
    seen: DataFrame,
    key_col: str,
    fp_rate: float = 0.01,
    n_seen: int | None = None,
    seed: str = "bloom",
) -> DataFrame:
    """``new ANTI JOIN seen`` with a Bloom pre-pass: rows whose probe
    says "definitely unseen" skip the exact join entirely; only the
    maybe-seen sliver (true dups + ~fp_rate of the batch) joins
    against the seen-key table. Output EXACTLY equals the plain anti
    join — the filter can only send extra rows to the exact side,
    never drop one (no-false-negative property of bloom "no").

    ``n_seen`` sizes the filter (one count job when omitted — pass
    the known corpus size from a checkpoint manifest at scale)."""
    if n_seen is None:
        n_seen = seen.count()
    if n_seen == 0:
        return new
    m_bits, k = bloom_params(n_seen, fp_rate)
    bloom = bloom_build(seen, key_col, m_bits, k, seed)
    probed = bloom_probe(new, key_col, bloom, m_bits, k, seed)
    definitely_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen")
    survivors = maybe.join(
        seen.select(_c(key_col).alias("__seen_k")),
        maybe[key_col] == F.col("__seen_k"),
        "left_anti",
    )
    return definitely_new.unionByName(survivors)
