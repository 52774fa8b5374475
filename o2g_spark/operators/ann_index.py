"""Persisted IVF ANN index lifecycle (r4 VERDICT #2).

:func:`ann_ivf_topk <.similarity.ann_ivf_topk>` retrains its coarse
quantizer on every call — deterministic (hence gate-checkable) but the
wrong serving shape: the r4 recall bench showed training is the flat
cost floor at small ``nprobe``. This module trains ONCE and persists
through the checkpoint/snapshot layer (:class:`..plans.checkpoint.
CheckpointManager` — atomic commit, resume, retire/time-travel):

- ``ivf_centroids`` stage — the trained quantizer as rows
  ``(centroid_id, centroid)``: tiny, but snapshotted so serving,
  resume, and audits all read the same bytes, and retraining retires
  the old quantizer into the snapshot history instead of overwriting.
- ``ivf_corpus`` stage — the corpus with its nearest-centroid bucket,
  hive-partitioned BY BUCKET: a probe of ``nprobe`` buckets scans only
  those directories (directory-level pruning at the source, the part
  of IVF that matters at 100 TB — the index IS the data layout).

Results are IDENTICAL to the per-call path by construction: the same
``ivf_train_centroids`` bytes feed the same
``ivf_topk_from_bucketed`` tail (pinned by test).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager
from . import _delta_index as D
from .similarity import (
    ivf_assign_udf,
    ivf_topk_from_bucketed,
    ivf_train_centroids,
)

CENTROID_STAGE = "ivf_centroids"
CORPUS_STAGE = "ivf_corpus"


def ivf_index_build(
    spark: SparkSession,
    base_dir: str,
    corpus: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    train_sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    force: bool = False,
) -> np.ndarray:
    """Train (or resume) the IVF index at ``base_dir``; returns the
    centroids. Idempotent: a committed index is NOT retrained —
    ``force=True`` retrains and retires the old snapshots into the
    checkpoint history (createOrReplace semantics).

    Crash-consistency: the corpus stage is built from the centroid
    STAGE's committed bytes (not the freshly trained array), and its
    manifest records WHICH quantizer snapshot it was built from —
    stamped atomically with the corpus commit. A crash between a
    force-retrain's centroid commit and the corpus rebuild therefore
    leaves a DETECTABLE mismatch: the next build force-rebuilds the
    corpus, and serving refuses the index instead of silently probing
    an old layout with a new quantizer.
    """
    ckpt = CheckpointManager(spark, base_dir)

    def build_centroids() -> DataFrame:
        cent = ivf_train_centroids(
            corpus, n_centroids, seed=seed, train_sample=train_sample,
            id_col=id_col, vec_col=vec_col,
        )
        rows = [(i, row.tolist()) for i, row in enumerate(cent)]
        return spark.createDataFrame(
            rows, "centroid_id int, centroid array<double>"
        )

    ckpt.run_stage(CENTROID_STAGE, build_centroids,
                   key_col="centroid_id", force=force)
    cent_snap = ckpt.manifest(CENTROID_STAGE)["snapshot_id"]
    cent = ivf_load_centroids(spark, base_dir)

    def build_corpus() -> DataFrame:
        assign = ivf_assign_udf(cent, nprobe=1)
        return corpus.select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).alias("__cv"),
            F.element_at(assign(F.col(vec_col)), 1).alias("__bkt"),
        )

    # rebuild the corpus when it is missing OR stamped with a different
    # quantizer snapshot (interrupted force-retrain recovery)
    corpus_m = ckpt.manifest(CORPUS_STAGE)
    corpus_stale = bool(
        corpus_m and corpus_m.get("centroid_snapshot") != cent_snap
    )
    # a (re)build replaces the corpus: hide any append deltas
    # atomically with the base commit, then GC them
    ckpt.run_stage(
        CORPUS_STAGE, build_corpus, key_col="__cid",
        force=force or corpus_stale, partition_by="__bkt",
        manifest_extra={"centroid_snapshot": cent_snap}
        | D.reset_extra(ckpt, CORPUS_STAGE),
    )
    D.gc_hidden(ckpt, CORPUS_STAGE)
    return cent


def ivf_index_append(
    spark: SparkSession,
    base_dir: str,
    new_corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Grow the indexed corpus WITHOUT retraining: assign the new
    vectors with the COMMITTED quantizer and commit them as an LSM
    DELTA of the corpus stage (see :mod:`._delta_index`) — O(batch)
    work and one atomic commit, never an O(corpus) rewrite. Each delta
    is hive-partitioned by bucket like the base, so serving's
    bucket-directory pruning applies to every delta too; deltas are
    stamped with the quantizer snapshot so the consistency check keeps
    holding per delta. Serving after an append is bit-identical to a
    fresh assignment of the full corpus under the same centroids
    (per-vector deterministic; pinned by test).

    Idempotent: the delta carries the batch's id-set digest, so
    re-appending an already-appended batch (production rerun after a
    crash) is a no-op rather than a row duplication. The quantizer is
    deliberately NOT retrained here: bucket balance drifts only as far
    as the data distribution does, and a deliberate retrain is
    ``ivf_index_build(force=True)``. :func:`ivf_index_compact` folds
    deltas into the base when the caller chooses to pay O(corpus)."""
    ckpt = CheckpointManager(spark, base_dir)
    _check_index_consistency(ckpt, base_dir)
    cent = ivf_load_centroids(spark, base_dir)
    cent_snap = ckpt.manifest(CENTROID_STAGE)["snapshot_id"]
    assign = ivf_assign_udf(cent, nprobe=1)
    new_rows = new_corpus.select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).alias("__cv"),
        F.element_at(assign(F.col(vec_col)), 1).alias("__bkt"),
    )
    D.commit_delta(
        ckpt, CORPUS_STAGE, lambda: new_rows, key_col="__cid",
        digest=D.batch_digest(new_corpus, id_col), partition_by="__bkt",
        manifest_extra={"centroid_snapshot": cent_snap},
    )


def ivf_index_compact(spark: SparkSession, base_dir: str) -> int:
    """Fold all append deltas into the base corpus snapshot (the one
    O(corpus) operation — run on YOUR schedule) and GC them; the
    pre-compaction base retires into snapshot history. Serving output
    is unchanged by construction. Returns the number of deltas
    folded."""
    ckpt = CheckpointManager(spark, base_dir)
    _check_index_consistency(ckpt, base_dir)
    cent_snap = ckpt.manifest(CENTROID_STAGE)["snapshot_id"]
    return D.compact(ckpt, CORPUS_STAGE, key_col="__cid",
                     partition_by="__bkt",
                     manifest_extra={"centroid_snapshot": cent_snap})


def _check_index_consistency(ckpt: CheckpointManager, base_dir: str) -> None:
    """Raise unless the committed corpus snapshot was built from the
    committed quantizer snapshot (see :func:`ivf_index_build`)."""
    cent_m = ckpt.manifest(CENTROID_STAGE)
    corp_m = ckpt.manifest(CORPUS_STAGE)
    if not (cent_m and cent_m.get("committed")):
        # reachable when the caller passed centroids= (skipping
        # ivf_load_centroids' own check) over a partially wiped index
        raise FileNotFoundError(
            f"no committed IVF quantizer at {base_dir!r}: run "
            "ivf_index_build"
        )
    if not (corp_m and corp_m.get("committed")):
        raise FileNotFoundError(
            f"no committed IVF corpus at {base_dir!r}: run ivf_index_build"
        )
    stamped = [("corpus", corp_m)] + [
        (name, ckpt.manifest(name))
        for name in D.live_delta_stages(ckpt, CORPUS_STAGE)
    ]
    for label, mm in stamped:
        if mm.get("centroid_snapshot") != cent_m["snapshot_id"]:
            raise RuntimeError(
                f"inconsistent IVF index at {base_dir!r}: {label} "
                f"snapshot {mm.get('snapshot_id')} was built from "
                f"quantizer {mm.get('centroid_snapshot')!r} but the "
                f"committed quantizer is {cent_m['snapshot_id']!r} "
                "(interrupted retrain?) — rerun ivf_index_build to "
                "rebuild the corpus"
            )


def ivf_load_centroids(spark: SparkSession, base_dir: str) -> np.ndarray:
    """Committed quantizer at ``base_dir`` as a ``(n_centroids, dim)``
    array. Raises if the index was never built (or its centroid stage
    never committed) — serving must not silently retrain."""
    ckpt = CheckpointManager(spark, base_dir)
    if not ckpt.is_committed(CENTROID_STAGE):
        raise FileNotFoundError(
            f"no committed IVF index at {base_dir!r}: run ivf_index_build "
            f"first (stage {CENTROID_STAGE!r} has no committed snapshot)"
        )
    rows = ckpt.read_snapshot(CENTROID_STAGE).collect()  # ≤ n_centroids
    rows.sort(key=lambda r: r["centroid_id"])
    return np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])


def ann_ivf_topk_indexed(
    spark: SparkSession,
    base_dir: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "qid",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Serve top-k from a persisted index: no training, and the corpus
    scan is PRUNED to the union of probed buckets (a bounded
    ``≤ n_centroids``-element driver-side set → an ``isin`` literal
    partition filter on the hive-partitioned snapshot, so Spark lists
    and reads only the probed bucket directories; Spark's own dynamic
    partition pruning does NOT fire on this broadcast-join shape —
    measured — so the explicit literal filter is load-bearing). Output
    schema and values match ``ann_ivf_topk(..., centroids=<same
    quantizer>)`` exactly (pinned by test).

    ``centroids``: pass the array from a prior :func:`ivf_load_centroids`
    to skip the per-call quantizer read — a serving loop loads once.
    Caller owns consistency with ``base_dir``'s corpus snapshot."""
    cent = centroids if centroids is not None \
        else ivf_load_centroids(spark, base_dir)
    ckpt = CheckpointManager(spark, base_dir)
    _check_index_consistency(ckpt, base_dir)
    bucketed = D.read_with_deltas(ckpt, CORPUS_STAGE)

    # union of probed buckets across this query batch — bounded by
    # n_centroids (small by construction), never by |queries|
    q_assign = ivf_assign_udf(cent, nprobe=nprobe)
    probed = sorted(
        r["__bkt"]
        for r in queries.select(
            F.explode(q_assign(F.col(vec_col))).alias("__bkt")
        ).distinct().collect()
    )
    pruned = bucketed.filter(F.col("__bkt").isin(probed))
    return ivf_topk_from_bucketed(
        pruned, queries, cent, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, query_id=query_id,
    )
