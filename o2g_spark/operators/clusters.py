"""Dup-cluster canonicalization: connected components over a pair list.

Near-dup pair generation (``jaccard_pairs`` / ``minhash_lsh_pairs`` /
``embedding_near_dup_pairs`` — SURVEY.md §2 LLM-pipeline family) emits
EDGES; actually deduplicating a corpus needs the transitive closure —
A~B and B~C put A,B,C in ONE cluster with one kept representative even
though (A,C) was never emitted. This module closes that gap with the
alternating large-star / small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14 — a public
algorithm), which converges in O(log n) rounds independent of
component DIAMETER, where plain min-label propagation needs
O(diameter) rounds and a 100 TB crawl's worst chain (mirror-of-mirror
boilerplate) can be thousands of hops long.

Spark shape per round: two groupBy-min shuffles keyed by node id, one
digest aggregate for the convergence check, and a ``localCheckpoint``
to truncate the iterative lineage (without it the plan doubles per
round and round 15+ spends longer optimizing than executing). Skew is
the algorithm's own concern and the reason large-star exists: a hub
node (one page near-dup to millions) only ever emits edges toward its
neighborhood MINIMUM, so hub groups shrink geometrically instead of
re-shuffling the hub's full adjacency every round.

At convergence the edge set IS the answer: every non-root node holds
exactly one edge to its component's minimum id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _edge_digest(e: DataFrame) -> tuple[int, int]:
    """Order-insensitive fingerprint of an edge set — one aggregate
    job, one driver row. Equal digests across a round = fixpoint (the
    star operators never produce colliding rewrites of distinct sets
    within max_iter's reach; count is part of the digest)."""
    r = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("x"),
    ).first()
    return int(r["n"]), int(r["x"])


def _large_star(e: DataFrame, min_strategy: str = "window") -> DataFrame:
    """Connect every neighbor v > u to min(Γ(u) ∪ {u}). Keeps every
    node reachable from its component min while cutting long chains:
    strictly-larger neighbors re-attach below u.

    Output is NOT deduplicated — the loop always feeds it straight
    into ``_small_star``, whose orientation dedup handles it; a
    dedup shuffle here was measured pure overhead.

    ``min_strategy``: "window" (default) computes the neighborhood
    min with a single partition-by-u window — one shuffle, no join;
    measured 1.7× faster end-to-end than "join" at 2.5M edges
    (identical labels, identical round count). "join" (groupBy-min +
    sort-merge join back) keeps the hot-group rows in a joinable
    shuffle partition that AQE's skew-join can SPLIT — the safer
    plan if one node's degree approaches a whole executor's memory.
    Hub groups only survive ~one round either way (large-star is the
    contraction that shrinks them geometrically), so window is the
    right default; flip per-call when a pathological hub is known.
    """
    b = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if min_strategy == "window":
        withm = b.withColumn(
            "m", F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
        )
    elif min_strategy == "join":
        m = (
            b.groupBy("u").agg(F.min("v").alias("__mn"))
            .select("u", F.least("__mn", "u").alias("m"))
        )
        withm = b.join(m, "u")
    else:
        raise ValueError(f"unknown min_strategy: {min_strategy!r}")
    return (
        withm.where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame, min_strategy: str = "window") -> DataFrame:
    """Orient each edge high→low, then point every low neighbor (and
    the high node itself) at the group's minimum.

    Same ``min_strategy`` trade as ``_large_star``. The window path
    emits both edge kinds in ONE pass: every row yields (v, m), and
    the group's unique v == m row additionally yields (u, m) — the
    array is materialized via ``withColumn`` BEFORE explode
    (CLAUDE.md rule 1: generator expressions evaluate interpreted).
    """
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).dropDuplicates(["u", "v"])
    if min_strategy == "window":
        d2 = d.withColumn("m", F.min("v").over(Window.partitionBy("u")))
        pair = F.struct(F.col("v").alias("a"), F.col("m").alias("b"))
        self_pair = F.struct(F.col("u").alias("a"), F.col("m").alias("b"))
        d3 = d2.withColumn(
            "__es",
            F.when(F.col("v") == F.col("m"), F.array(pair, self_pair))
            .otherwise(F.array(pair)),
        )
        out = d3.select(F.explode("__es").alias("e")).select(
            F.col("e.a").alias("u"), F.col("e.b").alias("v")
        )
    elif min_strategy == "join":
        m = d.groupBy("u").agg(F.min("v").alias("m"))
        out = d.join(m, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(m.select(F.col("u"), F.col("m").alias("v")))
    else:
        raise ValueError(f"unknown min_strategy: {min_strategy!r}")
    return (
        out.where(F.col("u") != F.col("v")).dropDuplicates(["u", "v"])
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
    min_strategy: str = "window",
) -> DataFrame:
    """(doc_id, canon_id) for every id in ``pairs``: canon_id is the
    MINIMUM id of the node's connected component (roots map to
    themselves). ``pairs`` is any near-dup pair output — orientation
    and extra columns (scores) are ignored.

    ``min_strategy``: see ``_large_star`` — "window" (default,
    measured 1.7× faster) vs "join" (AQE-skew-splittable).

    max_iter bounds the alternation; convergence is O(log n) rounds so
    the default 25 covers corpora far beyond 2^25 docs — hitting it
    means a logic bug, not a big input, and raises rather than
    returning a partially-contracted (wrong) clustering.

    ``stats``: pass a dict to receive {"rounds": <alternations run>}
    — measurement hook for the O(log n)-vs-diameter evidence
    (scripts/bench_clusters.py); no effect on the result.
    """
    e = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint()
    )
    nodes = (
        e.select("u").unionByName(e.select(F.col("v").alias("u")))
        .distinct().localCheckpoint()
    )
    prev = _edge_digest(e)
    for it in range(max_iter):
        # localCheckpoint per round: truncates the doubling lineage
        # AND materializes the round exactly once (digest + next round
        # both read it; without it each reads recompute the chain)
        e = _small_star(
            _large_star(e, min_strategy), min_strategy
        ).localCheckpoint()
        cur = _edge_digest(e)
        if cur == prev:
            if stats is not None:
                stats["rounds"] = it + 1
            break
        prev = cur
    else:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds — "
            "O(log n) theory says this is a bug, not a large input"
        )
    # fixpoint edge set = (node → component min) for every non-root
    return (
        nodes.join(e, "u", "left")
        .select(
            F.col("u").alias("doc_id"),
            F.coalesce("v", "u").alias("canon_id"),
        )
    )


def dup_clusters_incremental(
    labels: DataFrame,
    new_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Fold newly-arrived pairs into an existing (doc_id, canon_id)
    labeling WITHOUT revisiting the old pair set — the rolling-crawl
    companion to ``minhash_lsh_pairs_incremental`` /
    ``embedding_near_dup_incremental``, whose outputs feed straight in.

    Correctness rests on a spanning-structure invariant: the committed
    labels ARE a star edge set (node → component min) connecting
    exactly the old components, and connected components are invariant
    under swapping one spanning structure for another — so
    CC(stars ∪ new_pairs) == CC(old_pairs ∪ new_pairs). Work is
    O(|labels| + |new_pairs|) per round instead of O(all pairs ever).

    Canon ids are MONOTONE under increments: a component's canon is
    its min id over a growing set, so a doc's canon_id can change only
    when clusters merge, and only ever downward — a stable choice for
    downstream keep/drop decisions."""
    star = labels.where(F.col("doc_id") != F.col("canon_id")).select(
        F.col("doc_id").alias("id_a"), F.col("canon_id").alias("id_b")
    )
    e = star.unionByName(
        new_pairs.select(F.col(id_a).alias("id_a"), F.col(id_b).alias("id_b"))
    )
    lab = dup_clusters(e, "id_a", "id_b", max_iter)
    # singleton roots (self-labeled, untouched by any new pair) have
    # no edge in e — carry them through unchanged
    singles = labels.join(lab, "doc_id", "left_anti").select(
        "doc_id", "canon_id"
    )
    return lab.unionByName(singles)


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """The corpus-level dedup step: keep ONE representative (the
    min-id member) per near-dup cluster and every unpaired row.
    Implemented as an anti join against the non-canonical ids — the
    label side is |paired docs| rows (≪ corpus for real dup rates),
    so AQE broadcasts it; the corpus is never shuffled."""
    drop = (
        dup_clusters(pairs, id_a, id_b, max_iter)
        .where(F.col("doc_id") != F.col("canon_id"))
        .select(F.col("doc_id").alias("__drop_id"))
    )
    return df.join(
        drop, F.col(id_col) == F.col("__drop_id"), "left_anti"
    )


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame | None,
    id_col: str,
    order_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    labels: DataFrame | None = None,
) -> DataFrame:
    """``dedup_canonical`` with a QUALITY keep policy: per near-dup
    cluster keep the member with the highest ``order_col`` (ties
    broken by ascending id — fully deterministic), plus every
    unpaired row. This is what a training-data pipeline actually
    wants — keep the longest / highest-quality duplicate, not the
    lexicographically-smallest id.

    Scale shape mirrors ``dedup_canonical``: the ranking window runs
    over PAIRED rows only (|paired| ≪ corpus at real dup rates), and
    the corpus pays one anti join against the drop set — it is never
    shuffled or ranked itself.

    Pass ``labels`` (a committed (doc_id, canon_id) table, e.g. the
    pipeline's dedup_clusters snapshot) to reuse an existing
    clustering instead of re-contracting ``pairs``."""
    if labels is None and pairs is None:
        raise ValueError("one of pairs or labels is required")
    lab = labels if labels is not None else dup_clusters(pairs, id_a, id_b, max_iter)
    paired = df.select(
        F.col(id_col).alias("__id"), F.col(order_col).alias("__ord")
    ).join(lab, F.col("__id") == F.col("doc_id"), "inner")
    w = Window.partitionBy("canon_id").orderBy(
        F.desc("__ord"), F.asc("__id")
    )
    drop = (
        paired.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .select(F.col("__id").alias("__drop_id"))
    )
    return df.join(
        drop, F.col(id_col) == F.col("__drop_id"), "left_anti"
    )


def dedup_keep_best_sql(
    pairs_sql: str,
    corpus_table: str,
    id_col: str,
    score_sql: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> str:
    """DuckDB twin of ``dedup_keep_best``: recursive-CTE closure →
    rank paired rows per component by (score DESC, id ASC) → keep
    rank 1 plus every unpaired row. ``score_sql`` is an expression
    over ``corpus_table``'s columns (e.g. ``LENGTH(text)``)."""
    lab = dup_clusters_sql(pairs_sql, id_a, id_b)
    return f"""
WITH __paired AS (
  SELECT c.{id_col} AS __id, {score_sql} AS __ord, l.canon_id
  FROM {corpus_table} c JOIN ({lab}) l ON c.{id_col} = l.doc_id
),
__drop AS (
  SELECT __id FROM (
    SELECT __id, ROW_NUMBER() OVER (
      PARTITION BY canon_id ORDER BY __ord DESC, __id ASC
    ) AS __rn FROM __paired
  ) WHERE __rn > 1
)
SELECT * FROM {corpus_table}
WHERE {id_col} NOT IN (SELECT __id FROM __drop)
"""


def dup_stats(
    labels: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """The report every corpus-dedup job publishes: cluster-size
    histogram over a (doc_id, canon_id) labeling — one row per
    cluster size with ``n_clusters``, ``n_docs`` (docs living in
    clusters of that size) and ``n_droppable`` (docs a
    keep-one-per-cluster policy removes). Pass ``corpus`` to count
    docs that never appeared in any pair as size-1 clusters, making
    the histogram total the corpus and ``sum(n_droppable)`` the
    exact row count ``dedup_canonical`` would remove.

    Scale shape: one shuffle keyed by canon_id (groups = cluster
    sizes, bounded by the biggest dup cluster), then an aggregation
    over |distinct sizes| rows — nothing O(corpus) leaves the first
    aggregate."""
    full = labels.select("doc_id", "canon_id")
    if corpus is not None:
        singles = (
            corpus.select(F.col(id_col).alias("doc_id"))
            .join(labels.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.col("doc_id").alias("canon_id"))
        )
        full = full.unionByName(singles)
    sizes = full.groupBy("canon_id").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias(
                "n_droppable"
            ),
        )
    )


def dup_stats_sql(
    pairs_sql: str,
    corpus_table: str | None = None,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> str:
    """DuckDB twin of ``dup_stats`` over ``dup_clusters_sql``'s
    closure (labels as a parenthesized subquery — DuckDB allows a
    WITH RECURSIVE inside a derived table)."""
    lab = dup_clusters_sql(pairs_sql, id_a, id_b)
    if corpus_table is None:
        full = f"SELECT doc_id, canon_id FROM ({lab}) __lab"
    else:
        full = f"""
SELECT doc_id, canon_id FROM ({lab}) __lab
UNION ALL
SELECT c.{id_col} AS doc_id, c.{id_col} AS canon_id
FROM {corpus_table} c
WHERE c.{id_col} NOT IN (SELECT doc_id FROM ({lab}) __lab2)
"""
    return f"""
WITH __sz AS (
  SELECT canon_id, COUNT(*) AS cluster_size FROM ({full}) __full
  GROUP BY canon_id
)
SELECT cluster_size, COUNT(*) AS n_clusters,
       cluster_size * COUNT(*) AS n_docs,
       (cluster_size - 1) * COUNT(*) AS n_droppable
FROM __sz GROUP BY cluster_size
"""


def dup_clusters_sql(
    pairs_sql: str, id_a: str = "id_a", id_b: str = "id_b"
) -> str:
    """DuckDB twin: transitive closure by recursive CTE, then min per
    source node. Exact on gate-scale components (closure is O(n·m) —
    the oracle is for CORRECTNESS at sf0.01, the star contraction is
    the scale path)."""
    return f"""
WITH RECURSIVE __pr AS ({pairs_sql}),
__e(u, v) AS (
  SELECT {id_a}, {id_b} FROM __pr UNION SELECT {id_b}, {id_a} FROM __pr
),
__reach(a, b) AS (
  SELECT u, v FROM __e
  UNION
  SELECT r.a, e.v FROM __reach r JOIN __e e ON r.b = e.u
  WHERE e.v <> r.a
)
SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon_id
FROM __reach GROUP BY a
"""
