"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023): cluster the corpus with a coarse k-means
quantizer, then inside each cluster drop every document whose cosine
similarity to an EARLIER-kept document exceeds a threshold. Unlike
the near-identical banded LSH funnel (operators/similarity.py
embedding_near_dup), the clustered scope catches *semantic*
duplicates at much lower thresholds (paraphrases, templated
re-writes) — the published result is 2× data-efficiency at equal
quality on web corpora.

Spark-first shape — the quadratic stage is CONFINED by construction:

* cluster assignment reuses the IVF coarse quantizer
  (similarity.ivf_train_centroids + ivf_assign_udf — one Arrow
  matmul per batch, deterministic seeded training, literal-centroid
  SQL twin for the gate);
* the within-cluster comparison is a self-equi-join ON THE CLUSTER
  KEY with ``a.id > b.id`` — total work is Σ|cluster|²/2, controlled
  by ``n_clusters`` (at 100 TB you size n_clusters ≈ corpus/50k like
  the paper; the join shuffles each side once on the cluster id);
* the keep rule is "survivor = no lower-id doc within ``threshold``"
  — the paper's keep-one-per-dup-group rule made deterministic and
  join-expressible (max cosine to any lower id, then one filter).
  Transitive chains collapse to the LOWEST id of the chain's
  pairwise-linked prefix, matching dedup.pair-based semantics
  elsewhere in this repo (operators/clusters.py canonicalizes the
  same way).

The hot-cluster axis (one near-singleton centroid claiming the whole
corpus) is guarded, not assumed: ``max_cluster_rows`` raises with the
offending cluster id via a broadcast-joined size check evaluated
codegen-side — no silent O(n²) degradation (CLAUDE.md rule 7: bound
TOTAL work, fail loudly).

Float policy: cosine is the shared zip-with/unnest fold (identical
order both engines), rounded ONCE to 6 dp; the threshold compares the
ROUNDED value so the decision is bit-identical cross-engine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .similarity import (
    dot_fixed, dot_sql, ivf_assign_udf, ivf_train_centroids, norm,
)


def semdedup(
    emb: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.97,
    seed: int = 42,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
    max_cluster_rows: int = 200_000,
) -> DataFrame:
    """Per-document SemDeDup verdicts: ``(id, cluster, max_sim, keep)``
    — ``max_sim`` is the highest 6-dp cosine to any LOWER-id document
    in the same cluster (−1.0 for the cluster's first doc), ``keep``
    is ``max_sim < threshold``. One row per input row; downstream
    dedup filters ``keep``.

    ``centroids`` skips training (serving path — train once via
    :func:`..operators.similarity.ivf_train_centroids` or the
    persisted ann_index lifecycle and reuse)."""
    cent = centroids if centroids is not None else ivf_train_centroids(
        emb, n_clusters, seed=seed, train_sample=train_sample,
        id_col=id_col, vec_col=vec_col,
    )
    assign = ivf_assign_udf(cent, nprobe=1)
    base = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.element_at(assign(F.col(vec_col)), 1).alias("cluster"),
    )

    # fail-loud hot-cluster guard: a broadcast join of the (≤ n_clusters
    # rows) size table + a codegen-side raise folded into the CONSUMED
    # cluster column — a standalone guard column would be dead code and
    # Catalyst column pruning would silently drop the raise
    sizes = base.groupBy("cluster").agg(F.count("*").alias("__csz"))
    guarded = (
        base.join(F.broadcast(sizes), "cluster")
        .withColumn(
            "cluster",
            F.when(
                F.col("__csz") > max_cluster_rows,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "semdedup: cluster exceeds max_cluster_rows="
                            f"{max_cluster_rows} (raise n_clusters): cluster "
                        ),
                        F.col("cluster").cast(T.StringType()),
                    )
                ).cast(T.IntegerType()),
            ).otherwise(F.col("cluster")),
        )
        .drop("__csz")
    )

    # norms are computed ONCE per row BELOW the join's shuffle
    # boundary (the exchange materializes them), not per pair — same
    # IEEE value as computing sqrt(fold) pair-side, |cluster|× cheaper;
    # the trained centroid matrix fixes the dim → unrolled codegen
    # dot/norm chains (size-guarded, bit-identical)
    dim = int(cent.shape[1])
    a = guarded.select("cluster", F.col("__id").alias("__ida"),
                       F.col("__v").alias("__va"),
                       norm(F.col("__v")).alias("__na"))
    b = guarded.select("cluster", F.col("__id").alias("__idb"),
                       F.col("__v").alias("__vb"),
                       norm(F.col("__v")).alias("__nb"))
    sim = F.round(
        dot_fixed(F.col("__va"), F.col("__vb"), dim)
        / F.greatest(F.col("__na") * F.col("__nb"), F.lit(1e-300)),
        6,
    )
    pairs = (
        a.join(b, "cluster")
        .where(F.col("__ida") > F.col("__idb"))
        .withColumn("__sim", sim)
        .groupBy("__ida")
        .agg(F.max("__sim").alias("__max_sim"))
    )
    return (
        guarded.join(pairs, guarded["__id"] == pairs["__ida"], "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("cluster").cast(T.IntegerType()).alias("cluster"),
            F.coalesce("__max_sim", F.lit(-1.0)).alias("max_sim"),
            # 0/1 int, not boolean: engine-neutral in every value hasher
            (F.coalesce("__max_sim", F.lit(-1.0)) < F.lit(threshold))
            .cast(T.IntegerType())
            .alias("keep"),
        )
    )


def semdedup_sql(
    emb_table: str,
    centroids: np.ndarray,
    threshold: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`semdedup` over the SAME trained centroids
    (pass :func:`..operators.similarity.ivf_train_centroids_local`'s
    output — bit-identical to the Spark training by construction).
    Assignment replicates the UDF's ``||c||² − 2 v·c`` argmin;
    nearest-centroid ties would break differently (numpy argsort is
    unstable) but need exact float equality — unobserved on frozen
    data, the ann_ivf tolerance class."""
    cn = (centroids * centroids).sum(axis=1)
    rows = ", ".join(
        f"({j}, CAST(["
        + ", ".join(repr(float(v)) for v in centroids[j])
        + f"] AS DOUBLE[]), {float(cn[j])!r})"
        for j in range(len(centroids))
    )
    d = dot_sql("va", "vb")
    na = dot_sql("va", "va")
    nb = dot_sql("vb", "vb")
    return f"""
WITH cent(cid, w, cn) AS (VALUES {rows}),
assigned AS (
  SELECT e.{id_col} AS id, e.{vec_col} AS v, ct.cid AS cluster
  FROM {emb_table} e CROSS JOIN cent ct
  QUALIFY row_number() OVER (
    PARTITION BY e.{id_col}
    ORDER BY ct.cn - 2.0 * list_inner_product(
      list_transform(e.{vec_col}, x -> CAST(x AS DOUBLE)), ct.w), ct.cid) = 1
),
pairs AS (
  SELECT a.id AS ida,
         round({d} / greatest(sqrt({na}) * sqrt({nb}), 1e-300), 6) AS sim
  FROM (SELECT id, cluster, v AS va FROM assigned) a
  JOIN (SELECT id AS idb, cluster, v AS vb FROM assigned) b
    ON a.cluster = b.cluster AND a.id > b.idb
),
agg AS (SELECT ida, max(sim) AS max_sim FROM pairs GROUP BY ida)
SELECT s.id AS {id_col}, CAST(s.cluster AS INTEGER) AS cluster,
       coalesce(g.max_sim, -1.0) AS max_sim,
       CAST(coalesce(g.max_sim, -1.0) < {threshold!r} AS INTEGER) AS keep
FROM assigned s LEFT JOIN agg g ON g.ida = s.id
"""
