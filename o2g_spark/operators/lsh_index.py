"""Persisted minhash-LSH index + incremental near-dup pairing.

The batch periodic-crawl shape: ``minhash_lsh_pairs`` re-bands and
re-pairs the WHOLE corpus every run — O(corpus) work per increment.
At 100 TB the corpus is an index you maintain, not an input you
re-read: this module persists each document's band keys and shingle
set once through the checkpoint layer (:class:`..plans.checkpoint.
CheckpointManager` — atomic commit, resume, retire/time-travel), and
pairs a NEW batch against it with work proportional to the batch:

    candidates = new × index (band-key join)  ∪  new × new (self-join)
    verify     = exact n-gram Jaccard (new shingles fresh, old from
                 the index — no re-shingling of the corpus)

Output pairs are EXACTLY ``minhash_lsh_pairs(old ∪ new)`` restricted
to pairs touching ≥1 new doc (pinned by test and by the driver-gate
SQL twin): banding is per-doc deterministic, so splitting the corpus
cannot change any pair's candidacy or score. (old, old) pairs are the
previous increments' output — never recomputed.

Band-key formula is IDENTICAL to ``minhash_lsh_pairs`` /
``streaming.stateful._banded_docs`` (same signature family, same
per-band md5-of-slice key) — the manifests record (num_hashes, bands,
shingle_n) and the pairing call validates them, so an index built
under one banding can never silently pair under another.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..plans.checkpoint import CheckpointManager
from . import _delta_index as D
from .dedup import minhash_from_hashes

BANDS_STAGE = "lsh_bands"
SHINGLES_STAGE = "lsh_shingles"


def _banded_rows(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int, bands: int, shingle_n: int,
) -> tuple[DataFrame, DataFrame]:
    """(banded, shingles): banded = one (did, band, key) row per
    (doc, band); shingles = (did, sh array). Same banding expressions
    as minhash_lsh_pairs — project-then-explode (CLAUDE.md rule 1) and
    a repartition boundary so the shingle+md5 pass evaluates once."""
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rpb = num_hashes // bands
    par = df.sparkSession.sparkContext.defaultParallelism
    sig = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col).alias("did"),
            X.shingles(text_col, shingle_n).alias("sh"),
        )
        .withColumn("__sig", minhash_signature_from_shingles("sh", num_hashes))
    )
    # __sig is LET-BOUND (transform over a 1-element array) so the
    # banding stays one-signature-pass even if CollapseProject merges
    # these projections and inlines the signature expression: as the
    # outer transform's INPUT it evaluates once per row, whereas a bare
    # F.col("__sig") reference inside the band lambda would re-derive
    # the whole shingle+md5+minhash pass per BAND after inlining.
    def _bands_of(s: F.Column) -> F.Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.md5(
                    F.concat_ws(",", F.transform(
                        F.slice(s, b * rpb + 1, rpb),
                        lambda v: v.cast("string"),
                    ))
                ).alias("key"),
            ),
        )

    band_arr = F.transform(F.array(F.col("__sig")), _bands_of)[0]
    banded = (
        sig.select("did", band_arr.alias("__bands"))
        .withColumn("__b", F.explode("__bands"))
        .select("did", F.col("__b.band").alias("band"),
                F.col("__b.key").alias("key"))
    )
    return banded, sig.select("did", "sh")


def minhash_signature_from_shingles(sh_col: str, num_hashes: int):
    """Minhash signature Column from an ALREADY-shingled array column —
    the same hash-once pipeline as dedup.minhash_signature (one md5
    pass + affine integer re-hashes) without re-running the shingler."""
    return minhash_from_hashes(
        F.transform(F.col(sh_col), X.md5_hash60), num_hashes
    )


def lsh_index_build(
    spark: SparkSession,
    base_dir: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    force: bool = False,
) -> None:
    """Build (or resume) the persisted LSH index at ``base_dir``:
    band keys hive-partitioned BY BAND (the incremental join's probe
    key prefix) and shingle sets for verification. Idempotent;
    ``force=True`` retires the old snapshots (createOrReplace)."""
    ckpt = CheckpointManager(spark, base_dir)
    params = {"num_hashes": num_hashes, "bands": bands,
              "shingle_n": shingle_n, "id_col": id_col}

    def build_bands() -> DataFrame:
        banded, _ = _banded_rows(
            docs, id_col, text_col, num_hashes, bands, shingle_n)
        return banded

    def build_shingles() -> DataFrame:
        _, sh = _banded_rows(
            docs, id_col, text_col, num_hashes, bands, shingle_n)
        return sh

    # a forced rebuild replaces the corpus, so any existing deltas
    # describe dead data: hide them atomically with the base commit
    # (compacted_through) and GC the directories after
    ckpt.run_stage(BANDS_STAGE, build_bands, key_col="did", force=force,
                   partition_by="band",
                   manifest_extra=params | D.reset_extra(ckpt, BANDS_STAGE))
    ckpt.run_stage(SHINGLES_STAGE, build_shingles, key_col="did",
                   force=force,
                   manifest_extra=params | D.reset_extra(ckpt, SHINGLES_STAGE))
    D.gc_hidden(ckpt, BANDS_STAGE)
    D.gc_hidden(ckpt, SHINGLES_STAGE)


def _index_params(ckpt: CheckpointManager, base_dir: str) -> dict:
    m = ckpt.manifest(BANDS_STAGE)
    ms = ckpt.manifest(SHINGLES_STAGE)
    if not (m and m.get("committed") and ms and ms.get("committed")):
        raise FileNotFoundError(
            f"no committed LSH index at {base_dir!r}: run lsh_index_build"
        )
    manifests = [("bands", m), ("shingles", ms)] + [
        (name, ckpt.manifest(name))
        for stage in (BANDS_STAGE, SHINGLES_STAGE)
        for name in D.live_delta_stages(ckpt, stage)
    ]
    for k in ("num_hashes", "bands", "shingle_n"):
        vals = {label: mm.get(k) for label, mm in manifests}
        if len(set(vals.values())) > 1:
            raise RuntimeError(
                f"inconsistent LSH index at {base_dir!r}: {k} differs "
                f"across stages/deltas {vals} (interrupted rebuild?) — "
                "rerun lsh_index_build"
            )
    D.check_delta_lockstep(ckpt, [BANDS_STAGE, SHINGLES_STAGE], base_dir)
    return m


def minhash_lsh_pairs_incremental(
    spark: SparkSession,
    base_dir: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs touching ≥1 NEW doc, against the persisted index:
    (new × index) ∪ (new × new) candidates, exact-Jaccard verified.
    Output schema identical to ``minhash_lsh_pairs`` — (id_a, id_b,
    jaccard ≥ threshold), id_a < id_b. Banding params come from the
    index manifests (caller cannot mismatch them). New doc ids must
    not collide with indexed ids (re-crawled urls go through
    dedup_keep_latest first)."""
    ckpt = CheckpointManager(spark, base_dir)
    params = _index_params(ckpt, base_dir)
    num_hashes, bands = params["num_hashes"], params["bands"]
    shingle_n = params["shingle_n"]

    new_banded, new_sh = _banded_rows(
        new_docs, id_col, text_col, num_hashes, bands, shingle_n)
    new_banded = new_banded.localCheckpoint()  # banding pass runs once
    new_sh = new_sh.localCheckpoint()
    idx_banded = D.read_with_deltas(ckpt, BANDS_STAGE)
    idx_sh = D.read_with_deltas(ckpt, SHINGLES_STAGE)

    # new × index: the index side is the big one — join on (band, key)
    # with the NEW side broadcast when small (AQE decides; both sides
    # carry only 8+16-byte keys plus the id). new × new: plain LSH
    # self-join over the batch.
    nvi = (
        new_banded.alias("n")
        .join(idx_banded.alias("i"),
              (F.col("n.band") == F.col("i.band"))
              & (F.col("n.key") == F.col("i.key"))
              & (F.col("n.did") != F.col("i.did")))
        .select(
            F.least("n.did", "i.did").alias("id_a"),
            F.greatest("n.did", "i.did").alias("id_b"),
        )
    )
    a, b = new_banded.alias("a"), new_banded.alias("b")
    nvn = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.did") < F.col("b.did")))
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
    )
    pairs = nvi.unionByName(nvn).dropDuplicates(["id_a", "id_b"])

    # verification shingles: old docs from the index, new fresh — a
    # doc id resolves from exactly one side (ids disjoint by contract)
    sh_all = idx_sh.unionByName(new_sh)
    sha = sh_all.select(F.col("did").alias("id_a"), F.col("sh").alias("__sha"))
    shb = sh_all.select(F.col("did").alias("id_b"), F.col("sh").alias("__shb"))
    cand = pairs.join(sha, "id_a").join(shb, "id_b")
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    union = F.size(F.col("__sha")) + F.size(F.col("__shb")) - inter
    return (
        cand.withColumn(
            "jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def lsh_index_merge(
    spark: SparkSession,
    base_dir: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold a paired batch INTO the index (the post-increment step) as
    an LSM DELTA — O(batch) work and two atomic commits, never an
    O(corpus) rewrite (see :mod:`._delta_index`). Readers see base ∪
    deltas; :func:`lsh_index_compact` folds them down when the caller
    chooses to pay O(corpus) once. Banding params come from the
    existing manifests, so a merge can never change them. Idempotent:
    each delta carries the batch's id-set digest, so re-merging an
    already-merged batch (a production rerun after a crash) re-finds
    the existing delta instead of duplicating rows — and a crash
    BETWEEN the two per-stage commits is detected at pairing time and
    healed by rerunning the merge."""
    ckpt = CheckpointManager(spark, base_dir)
    params = _index_params(ckpt, base_dir)
    new_banded, new_sh = _banded_rows(
        new_docs, id_col, text_col, params["num_hashes"], params["bands"],
        params["shingle_n"])
    digest = D.batch_digest(new_docs, id_col)
    extra = {k: params[k] for k in
             ("num_hashes", "bands", "shingle_n", "id_col")}
    D.commit_delta(ckpt, BANDS_STAGE, lambda: new_banded, key_col="did",
                   digest=digest, partition_by="band", manifest_extra=extra)
    D.commit_delta(ckpt, SHINGLES_STAGE, lambda: new_sh, key_col="did",
                   digest=digest, manifest_extra=extra)


def lsh_index_compact(spark: SparkSession, base_dir: str) -> int:
    """Fold all live deltas into the base snapshots (the one O(corpus)
    operation — run it on YOUR schedule, e.g. when deltas approach the
    base's size) and GC them. The pre-compaction base retires into the
    snapshot history. Returns the number of deltas folded per stage.
    Output of every reader is unchanged by construction (pinned by
    test)."""
    ckpt = CheckpointManager(spark, base_dir)
    params = _index_params(ckpt, base_dir)
    extra = {k: params[k] for k in
             ("num_hashes", "bands", "shingle_n", "id_col")}
    n = D.compact(ckpt, BANDS_STAGE, key_col="did", partition_by="band",
                  manifest_extra=extra)
    D.compact(ckpt, SHINGLES_STAGE, key_col="did", manifest_extra=extra)
    return n
