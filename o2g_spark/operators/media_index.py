"""Persisted perceptual-media index + incremental near-dup pairing.

The media twin of :mod:`.lsh_index` (text) and :mod:`.emb_index`
(embeddings): ``media_dedup.hamming_pairs`` re-decodes and re-pairs
the WHOLE corpus every run — and for media the re-decode is the
dominant cost (BENCH §media near-dup: the signature pass IS the
payload decode). This module persists each row's 64-bit perceptual
signature once through the checkpoint layer — payload bytes are
touched exactly once per media row, EVER — and pairs a NEW batch
against it with work proportional to the batch:

    candidates = new × index (band-key join)  ∪  new × new (self-join)
    verify     = exact bit_count(xor) ≤ max_hamming (new signatures
                 fresh, old from the index — no re-decode)

Output pairs are EXACTLY ``hamming_pairs(old ∪ new)`` restricted to
pairs touching ≥1 new row (pinned by test and the driver-gate SQL
twin): the signature is a pure function of the payload bytes
(dhash_from_rgb / audio_fp_from_samples) and band keys are pure
shifts of the signature, so splitting the corpus cannot change any
pair's candidacy or hamming. The ``max_bucket`` hot-bucket cap is
computed over the UNION of index and new band rows, so the
excluded-bucket set also matches the full run exactly.

One index per MODALITY (``kind`` is an index parameter like the
embedding index's ``dim``): image dHashes and audio fingerprints
share the int64 space, and a mixed index would pair across
modalities on accidental band collisions.

Storage: ``media_bands`` (did, band, key) hive-partitioned BY BAND —
the incremental join's probe prefix, pruning index reads to the
band/bucket partitions the new batch actually touches — plus
``media_sigs`` (did, sig) for verification, 16 bytes a row. Merges
are O(batch) LSM deltas (:mod:`._delta_index`), compaction an
explicit O(corpus) fold — the same lifecycle the text and embedding
indexes use, with the same crash-idempotence (batch-digest dedupe,
lockstep check across stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import CODEC_REV
from ..plans.checkpoint import CheckpointManager
from . import _delta_index as D
from .media_dedup import _banded, media_signature_udf

BANDS_STAGE = "media_bands"
SIGS_STAGE = "media_sigs"

_PARAM_KEYS = ("kind", "chunks", "band_chunks", "frame_samples", "id_col")


def _check_codec_rev(m: dict, base_dir: str, rebuild: str) -> None:
    """A payload undecodable at build time has NO signature row; if a
    newer decode envelope can decode it, a re-crawled byte-identical
    copy would silently miss its indexed twin. Refuse the stale index."""
    rev = m.get("codec_rev")
    if rev != CODEC_REV:
        raise RuntimeError(
            f"index at {base_dir!r} was built under media decode "
            f"envelope rev {rev}; this build is rev {CODEC_REV} — "
            f"payloads undecodable then may decode now, so incremental "
            f"pairing would no longer equal the full run. Rerun "
            f"{rebuild}(force=True)"
        )


def _sig_rows(
    df: DataFrame, kind: str, id_col: str, payload_col: str,
    frame_samples: int,
) -> DataFrame:
    """(did, sig) — one decoded signature per media row of ``kind``;
    undecodable / sub-grid / sub-2-frame rows band to nothing. The
    decode UDF evaluates behind a repartition boundary so the one
    expensive pass runs once per row (CLAUDE.md rule 8)."""
    sig_udf = media_signature_udf(kind, frame_samples)
    src = df.filter(F.col("kind") == kind) if "kind" in df.columns else df
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        src.repartition(par, id_col)
        .select(
            F.col(id_col).alias("did"),
            sig_udf(F.col(payload_col)).alias("sig"),
        )
        .filter(F.col("sig").isNotNull())
    )


def _band_rows(sigs: DataFrame, chunks: int, band_chunks: int) -> DataFrame:
    """(did, band, key) — the operator's own band keys
    (media_dedup._banded) over a (did, sig) frame."""
    s = sigs.select(F.col("did").alias("__id"), F.col("sig").alias("__sig"))
    return _banded(s, chunks, band_chunks).select(
        F.col("__id").alias("did"),
        F.col("__b.idx").alias("band"),
        F.col("__b.val").alias("key"),
    )


def media_index_build(
    spark: SparkSession,
    base_dir: str,
    media: DataFrame,
    kind: str = "image",
    id_col: str = "media_id",
    payload_col: str = "payload",
    chunks: int = 8,
    band_chunks: int = 2,
    frame_samples: int = 256,
    force: bool = False,
) -> None:
    """Build (or resume) the persisted media index at ``base_dir``:
    band keys hive-partitioned by band plus the signature table.
    Idempotent; ``force=True`` retires the old snapshots."""
    ckpt = CheckpointManager(spark, base_dir)
    params = {"kind": kind, "chunks": chunks, "band_chunks": band_chunks,
              "frame_samples": frame_samples, "id_col": id_col,
              "codec_rev": CODEC_REV}

    def build_sigs() -> DataFrame:
        return _sig_rows(media, kind, id_col, payload_col, frame_samples)

    ckpt.run_stage(SIGS_STAGE, build_sigs, key_col="did", force=force,
                   manifest_extra=params | D.reset_extra(ckpt, SIGS_STAGE))

    def build_bands() -> DataFrame:
        return _band_rows(
            ckpt.read_snapshot(SIGS_STAGE), chunks, band_chunks)

    # bands derive from the COMMITTED signature snapshot — the decode
    # runs once even across the two stage builds
    ckpt.run_stage(BANDS_STAGE, build_bands, key_col="did", force=force,
                   partition_by="band",
                   manifest_extra=params | D.reset_extra(ckpt, BANDS_STAGE))
    D.gc_hidden(ckpt, SIGS_STAGE)
    D.gc_hidden(ckpt, BANDS_STAGE)


def _index_params(ckpt: CheckpointManager, base_dir: str) -> dict:
    m = ckpt.manifest(BANDS_STAGE)
    ms = ckpt.manifest(SIGS_STAGE)
    if not (m and m.get("committed") and ms and ms.get("committed")):
        raise FileNotFoundError(
            f"no committed media index at {base_dir!r}: run "
            "media_index_build"
        )
    manifests = [("bands", m), ("sigs", ms)] + [
        (name, ckpt.manifest(name))
        for stage in (BANDS_STAGE, SIGS_STAGE)
        for name in D.live_delta_stages(ckpt, stage)
    ]
    for k in _PARAM_KEYS:
        vals = {label: mm.get(k) for label, mm in manifests}
        if len(set(vals.values())) > 1:
            raise RuntimeError(
                f"inconsistent media index at {base_dir!r}: {k} differs "
                f"across stages/deltas {vals} (interrupted rebuild?) — "
                "rerun media_index_build"
            )
    _check_codec_rev(m, base_dir, "media_index_build")
    D.check_delta_lockstep(ckpt, [BANDS_STAGE, SIGS_STAGE], base_dir)
    return m


def media_near_dup_incremental(
    spark: SparkSession,
    base_dir: str,
    new_media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int | None = None,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Near-dup pairs touching ≥1 NEW media row, against the persisted
    index: (new × index) ∪ (new × new) candidates, exact
    bit_count(xor) verified. Output schema identical to
    ``media_dedup.hamming_pairs`` — (id_a, id_b, hamming ≤
    max_hamming), id_a < id_b. Banding/decode params come from the
    index manifests (caller cannot mismatch them); ``max_hamming``
    defaults to the pigeonhole recall bound chunks − band_chunks.
    New ids must not collide with indexed ids (re-crawled urls go
    through dedup_keep_latest first)."""
    ckpt = CheckpointManager(spark, base_dir)
    params = _index_params(ckpt, base_dir)
    chunks, band_chunks = params["chunks"], params["band_chunks"]
    if max_hamming is None:
        max_hamming = chunks - band_chunks
    if max_hamming > chunks - band_chunks:
        raise ValueError(
            "pigeonhole recall needs max_hamming <= chunks - band_chunks"
        )
    new_sigs = _sig_rows(
        new_media, params["kind"], id_col, payload_col,
        params["frame_samples"],
    ).localCheckpoint()  # the decode runs once
    new_banded = _band_rows(new_sigs, chunks, band_chunks)
    idx_banded = D.read_with_deltas(ckpt, BANDS_STAGE)
    idx_sigs = D.read_with_deltas(ckpt, SIGS_STAGE)

    if max_bucket is not None:
        # hot list over the UNION — same drop set as the full-corpus
        # run; at most n/max_bucket buckets, always broadcastable
        hot = (
            idx_banded.unionByName(new_banded)
            .groupBy("band", "key")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_bucket)
            .select("band", "key")
        )
        new_banded = new_banded.join(
            F.broadcast(hot), ["band", "key"], "left_anti")
        idx_banded = idx_banded.join(
            F.broadcast(hot), ["band", "key"], "left_anti")

    # new × index: join on (band, key) — the band-partitioned index
    # side prunes to the partitions the new batch touches; AQE
    # broadcasts the new side when small. new × new: self-join.
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

    # verification signatures: old from the index, new fresh — an id
    # resolves from exactly one side (ids disjoint by contract)
    s_all = idx_sigs.unionByName(new_sigs)
    sa = s_all.select(F.col("did").alias("id_a"), F.col("sig").alias("__sa"))
    sb = s_all.select(F.col("did").alias("id_b"), F.col("sig").alias("__sb"))
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def media_index_merge(
    spark: SparkSession,
    base_dir: str,
    new_media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> None:
    """Fold a paired batch INTO the index (the post-increment step) as
    an LSM DELTA — O(batch) work, never an O(corpus) rewrite. Params
    come from the existing manifests, so a merge can never change
    them. Idempotent: each delta carries the batch's id-set digest, so
    re-merging an already-merged batch re-finds the existing delta
    instead of duplicating rows."""
    ckpt = CheckpointManager(spark, base_dir)
    params = _index_params(ckpt, base_dir)
    new_sigs = _sig_rows(
        new_media, params["kind"], id_col, payload_col,
        params["frame_samples"],
    ).localCheckpoint()
    digest = D.batch_digest(new_sigs, "did")
    extra = {k: params[k] for k in _PARAM_KEYS} | {"codec_rev": CODEC_REV}
    D.commit_delta(ckpt, SIGS_STAGE, lambda: new_sigs, key_col="did",
                   digest=digest, manifest_extra=extra)
    D.commit_delta(
        ckpt, BANDS_STAGE,
        lambda: _band_rows(new_sigs, params["chunks"], params["band_chunks"]),
        key_col="did", digest=digest, partition_by="band",
        manifest_extra=extra,
    )


def media_index_compact(spark: SparkSession, base_dir: str) -> int:
    """Fold all live deltas into the base snapshots (the one O(corpus)
    operation — run on YOUR schedule) and GC them. Returns the number
    of deltas folded per stage. Reader output is unchanged by
    construction (pinned by test)."""
    ckpt = CheckpointManager(spark, base_dir)
    params = _index_params(ckpt, base_dir)
    extra = {k: params[k] for k in _PARAM_KEYS} | {"codec_rev": CODEC_REV}
    n = D.compact(ckpt, SIGS_STAGE, key_col="did", manifest_extra=extra)
    D.compact(ckpt, BANDS_STAGE, key_col="did", partition_by="band",
              manifest_extra=extra)
    return n
