"""Persisted IVF ANN index lifecycle (r4 VERDICT #2): train once,
persist through the checkpoint layer, serve with identical results and
bucket-directory pruning."""

import os

import numpy as np
import pytest

from o2g_spark.operators import ann_index, similarity as sim
from o2g_spark.plans.checkpoint import CheckpointManager

from test_similarity import _emb


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(_emb())


def _queries(emb):
    return emb.filter(emb.vec_id.isin([0, 3, 50, 77])).select(
        emb.vec_id.alias("qid"), "embedding"
    )


def test_indexed_serving_matches_fresh_training(spark, emb, tmp_path):
    """The whole point: reused centroids + the persisted bucket layout
    give BIT-identical results to per-call training."""
    base = str(tmp_path / "ivf")
    cent = ann_index.ivf_index_build(spark, base, emb, n_centroids=8)
    fresh = sorted(
        (r.qid, r.vec_id, r.sim, r.sim_rank)
        for r in sim.ann_ivf_topk(
            emb, _queries(emb), k=5, n_centroids=8, nprobe=2
        ).collect()
    )
    # reuse path A: centroids= short-circuits training
    reused = sorted(
        (r.qid, r.vec_id, r.sim, r.sim_rank)
        for r in sim.ann_ivf_topk(
            emb, _queries(emb), k=5, n_centroids=8, nprobe=2,
            centroids=ann_index.ivf_load_centroids(spark, base),
        ).collect()
    )
    # reuse path B: full serving path over the persisted snapshot
    served = sorted(
        (r.qid, r.vec_id, r.sim, r.sim_rank)
        for r in ann_index.ann_ivf_topk_indexed(
            spark, base, _queries(emb), k=5, nprobe=2
        ).collect()
    )
    assert fresh == reused == served
    assert len(fresh) > 0
    # and the persisted quantizer IS the trained one, byte for byte
    np.testing.assert_array_equal(
        cent, sim.ivf_train_centroids(emb, 8)
    )


def test_build_is_idempotent_and_force_retires(spark, emb, tmp_path):
    base = str(tmp_path / "ivf")
    c1 = ann_index.ivf_index_build(spark, base, emb, n_centroids=8)
    ckpt = CheckpointManager(spark, base)
    snap1 = ckpt.manifest(ann_index.CENTROID_STAGE)["snapshot_id"]
    corp1 = ckpt.manifest(ann_index.CORPUS_STAGE)["snapshot_id"]
    # second build: resumes the committed snapshots, no retrain
    c2 = ann_index.ivf_index_build(spark, base, emb, n_centroids=8)
    np.testing.assert_array_equal(c1, c2)
    assert ckpt.manifest(ann_index.CENTROID_STAGE)["snapshot_id"] == snap1
    assert ckpt.manifest(ann_index.CORPUS_STAGE)["snapshot_id"] == corp1
    # force: retrains (same deterministic bytes) under NEW snapshot ids,
    # retiring the old ones into the history
    c3 = ann_index.ivf_index_build(spark, base, emb, n_centroids=8,
                                   force=True)
    np.testing.assert_array_equal(c1, c3)
    assert ckpt.manifest(ann_index.CENTROID_STAGE)["snapshot_id"] != snap1
    # history now holds the retired quantizer alongside the current one
    assert len(ckpt.snapshots(ann_index.CENTROID_STAGE)) == 2


def test_load_missing_index_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no committed IVF index"):
        ann_index.ivf_load_centroids(spark, str(tmp_path / "nope"))


def test_interrupted_retrain_detected_and_healed(spark, emb, tmp_path):
    """Crash window between a force-retrain's centroid commit and the
    corpus rebuild: the corpus manifest's quantizer stamp no longer
    matches, so serving must REFUSE (not silently probe the old layout
    with the new quantizer) and the next build must heal by rebuilding
    the corpus."""
    base = str(tmp_path / "ivf")
    ann_index.ivf_index_build(spark, base, emb, n_centroids=8)
    served_before = sorted(
        (r.qid, r.vec_id, r.sim, r.sim_rank)
        for r in ann_index.ann_ivf_topk_indexed(
            spark, base, _queries(emb), k=5, nprobe=2).collect()
    )
    # simulate the crash: force-retrain ONLY the centroid stage
    ckpt = CheckpointManager(spark, base)

    def rebuild_centroids():
        cent = sim.ivf_train_centroids(emb, 8)
        return spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(cent)],
            "centroid_id int, centroid array<double>",
        )

    ckpt.run_stage(ann_index.CENTROID_STAGE, rebuild_centroids,
                   key_col="centroid_id", force=True)
    with pytest.raises(RuntimeError, match="inconsistent IVF index"):
        ann_index.ann_ivf_topk_indexed(spark, base, _queries(emb),
                                       k=5, nprobe=2).collect()
    # heal: build detects the stale stamp and rebuilds the corpus
    ann_index.ivf_index_build(spark, base, emb, n_centroids=8)
    served_after = sorted(
        (r.qid, r.vec_id, r.sim, r.sim_rank)
        for r in ann_index.ann_ivf_topk_indexed(
            spark, base, _queries(emb), k=5, nprobe=2).collect()
    )
    assert served_after == served_before  # deterministic retrain


def test_corpus_snapshot_is_bucket_partitioned_and_pruned(
    spark, emb, tmp_path
):
    """The index is the LAYOUT: the corpus snapshot must be hive-
    partitioned by bucket, and the serving scan must carry a partition
    filter on the probed buckets (directory pruning — at 100 TB the
    probe reads nprobe/n_centroids of the data, not all of it)."""
    base = str(tmp_path / "ivf")
    ann_index.ivf_index_build(spark, base, emb, n_centroids=8)
    data_dir = os.path.join(base, ann_index.CORPUS_STAGE, "data")
    parts = sorted(d for d in os.listdir(data_dir) if d.startswith("__bkt="))
    assert len(parts) > 1  # actually partitioned by bucket
    plan = ann_index.ann_ivf_topk_indexed(
        spark, base, _queries(emb), k=5, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    # the corpus FileScan must carry the probed-bucket literal set as a
    # PARTITION filter (directory pruning), not a mere data filter
    import re

    m = re.search(r"PartitionFilters: \[__bkt#\d+ IN \(([\d,]+)\)", plan)
    assert m, plan
    probed = m.group(1).split(",")
    assert 0 < len(probed) < len(parts)  # a strict subset of directories


def test_append_grows_corpus_without_retraining(spark, emb, tmp_path):
    """ivf_index_append: new vectors are assigned with the COMMITTED
    quantizer and folded into the bucket-partitioned corpus — serving
    then matches a fresh full-corpus assignment under the SAME
    centroids bit-for-bit, a re-append of the same batch is a no-op,
    and the quantizer snapshot never moves."""
    base = str(tmp_path / "ivf")
    old = emb.filter("vec_id % 4 != 0")
    new = emb.filter("vec_id % 4 = 0")
    cent = ann_index.ivf_index_build(spark, base, old, n_centroids=8)
    ckpt = CheckpointManager(spark, base)
    cent_snap = ckpt.manifest(ann_index.CENTROID_STAGE)["snapshot_id"]

    ann_index.ivf_index_append(spark, base, new)
    served = sorted(
        (r.qid, r.vec_id, r.sim, r.sim_rank)
        for r in ann_index.ann_ivf_topk_indexed(
            spark, base, _queries(emb), k=5, nprobe=2).collect()
    )
    expected = sorted(
        (r.qid, r.vec_id, r.sim, r.sim_rank)
        for r in sim.ann_ivf_topk(
            emb, _queries(emb), k=5, nprobe=2, centroids=cent).collect()
    )
    from o2g_spark.operators import _delta_index as D

    assert served == expected and len(served) > 0
    # the append is an LSM delta: base snapshot untouched, logical
    # rows = base + delta, quantizer snapshot never moves
    assert D.total_row_count(ckpt, ann_index.CORPUS_STAGE) == emb.count()
    assert ckpt.manifest(ann_index.CENTROID_STAGE)["snapshot_id"] == cent_snap
    assert len(D.live_delta_stages(ckpt, ann_index.CORPUS_STAGE)) == 1

    # crash-rerun shape: re-appending the same batch changes nothing
    ann_index.ivf_index_append(spark, base, new)
    assert len(D.live_delta_stages(ckpt, ann_index.CORPUS_STAGE)) == 1
    served2 = sorted(
        (r.qid, r.vec_id, r.sim, r.sim_rank)
        for r in ann_index.ann_ivf_topk_indexed(
            spark, base, _queries(emb), k=5, nprobe=2).collect()
    )
    assert served2 == served

    # compaction folds the delta into a new base (old one retired into
    # history) and serving output is unchanged
    assert ann_index.ivf_index_compact(spark, base) == 1
    assert D.live_delta_stages(ckpt, ann_index.CORPUS_STAGE) == []
    assert len(ckpt.snapshots(ann_index.CORPUS_STAGE)) == 2
    served3 = sorted(
        (r.qid, r.vec_id, r.sim, r.sim_rank)
        for r in ann_index.ann_ivf_topk_indexed(
            spark, base, _queries(emb), k=5, nprobe=2).collect()
    )
    assert served3 == served


def test_append_to_missing_index_raises(spark, emb, tmp_path):
    with pytest.raises(FileNotFoundError):
        ann_index.ivf_index_append(
            spark, str(tmp_path / "nope"), emb.limit(4))
