"""Checkpoint sink + per-partition lineage + resume (BASELINE.json B15).

North rule: "every stage checkpoints to Iceberg with per-partition
lineage rows (partition id, cell range, row count, digest) so a killed
job resumes from the last committed snapshot". No Iceberg jar exists in
this environment (SURVEY.md §8), so the layer reproduces the property
that matters — **atomic, all-or-nothing snapshot commits with readable
metadata** — on plain parquet:

- stage data is written to ``<base>/<stage>/data.tmp-<token>`` and
  atomically ``rename()``d to ``<base>/<stage>/data`` (POSIX rename is
  atomic within a filesystem; on HDFS/S3 the same role is played by the
  Iceberg/commit-protocol swap — the call site is isolated in
  ``_commit`` so swapping in ``df.writeTo(...).createOrReplace()`` is a
  one-function change);
- the manifest (``manifest.json``) is written *after* the data rename,
  also via temp+rename. Its presence is the committed marker: a crash
  at any point leaves either the previous snapshot or a committed new
  one, never a partial-visible state;
- lineage rows are computed from the data as re-read from the committed
  files (digests attest the bytes on disk, not the pre-write plan);
- snapshots are VERSIONED: a forced rebuild retires the current
  snapshot into ``snapshots/<id>/`` where it remains readable
  (``read_snapshot`` = Iceberg ``VERSION AS OF`` time travel;
  ``snapshots`` = the snapshot log; ``expire_snapshots`` = retention).

Lineage buckets are **deterministic in row content** (hash of a key
column, or the cell range), never ``spark_partition_id()`` — the same
input yields the same lineage at any parallelism, which is what makes
digest comparison across local[8]/local[32] runs meaningful (SURVEY.md
§7.2 exactness-under-parallelism).

Reference parity: o2g's sink is a GTFS zip written once at the end
(SURVEY.md §2.A A12 [o2g-PK]); the graft upgrades this to per-stage
resumable snapshots.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def lineage_rows(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 32,
    cell_col: str | None = None,
) -> list[dict]:
    """Per-bucket lineage: bucket id, row count, order-insensitive digest,
    and the covered cell range (if a cell column exists).

    digest = bit_xor of xxhash64 over the canonical JSON row encoding —
    commutative, so identical data in any partition order or task
    placement digests identically.
    """
    canon = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).alias("partition_id")
    aggs = [
        F.count("*").alias("row_count"),
        F.expr("bit_xor(__h)").alias("digest"),
    ]
    if cell_col is not None:
        aggs += [
            F.min(cell_col).alias("cell_range_start"),
            F.max(cell_col).alias("cell_range_end"),
        ]
    rows = (
        df.withColumn("__h", canon)
        .groupBy(bucket)
        .agg(*aggs)
        .orderBy("partition_id")
        .collect()
    )
    return [r.asDict() for r in rows]


class CheckpointManager:
    """Stage runner with snapshot commit + resume.

    >>> ckpt = CheckpointManager(spark, "/tmp/warehouse/run1")
    >>> pts = ckpt.run_stage("geotag", lambda: geotag(pages, gaz),
    ...                      key_col="url", cell_col="cell_r7")

    If ``<base>/geotag/manifest.json`` already exists, ``build_fn`` is
    never invoked — the committed snapshot is read back instead (the
    resume path). Stale uncommitted temp data is discarded.
    """

    def __init__(self, spark: SparkSession, base_dir: str, n_buckets: int = 32):
        self.spark = spark
        self.base_dir = base_dir
        self.n_buckets = n_buckets
        os.makedirs(base_dir, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def manifest(self, stage: str) -> dict | None:
        path = os.path.join(self._stage_dir(stage), "manifest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_committed(self, stage: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("committed"))

    # ---------------------------------------------- snapshot history

    def snapshots(self, stage: str) -> list[dict]:
        """All committed snapshots of a stage, oldest first, current
        last — the Iceberg snapshot-log analogue. Each entry is the
        manifest dict (with its ``snapshot_id``)."""
        sdir = self._stage_dir(stage)
        hist_dir = os.path.join(sdir, "snapshots")
        out: list[dict] = []
        if os.path.isdir(hist_dir):
            for name in sorted(os.listdir(hist_dir)):
                mp = os.path.join(hist_dir, name, "manifest.json")
                if os.path.exists(mp):
                    with open(mp) as f:
                        out.append(json.load(f))
        cur = self.manifest(stage)
        if cur and cur.get("committed"):
            out.append(cur)
        return out

    def read_snapshot(self, stage: str, snapshot_id: str | None = None) -> DataFrame:
        """Time travel: read a stage AS OF a snapshot id (default: the
        current snapshot). Retired snapshots stay readable until
        :meth:`expire_snapshots` removes them — the Iceberg
        ``VERSION AS OF`` analogue."""
        sdir = self._stage_dir(stage)
        cur = self.manifest(stage)
        if snapshot_id is None or (cur and cur.get("snapshot_id") == snapshot_id):
            if not (cur and cur.get("committed")):
                raise FileNotFoundError(f"stage {stage!r} has no committed snapshot")
            return self.spark.read.parquet(os.path.join(sdir, "data"))
        hist = os.path.join(sdir, "snapshots", snapshot_id, "data")
        if not os.path.isdir(hist):
            raise FileNotFoundError(
                f"stage {stage!r} has no snapshot {snapshot_id!r}; "
                f"known: {[m['snapshot_id'] for m in self.snapshots(stage)]}"
            )
        return self.spark.read.parquet(hist)

    def expire_snapshots(self, stage: str, keep: int = 1) -> int:
        """Drop all but the newest ``keep`` RETIRED snapshots (the
        current one is never touched). Returns the number removed."""
        sdir = os.path.join(self._stage_dir(stage), "snapshots")
        if not os.path.isdir(sdir):
            return 0
        names = sorted(os.listdir(sdir))
        victims = names[: max(0, len(names) - keep)]
        for name in victims:
            shutil.rmtree(os.path.join(sdir, name))
        return len(victims)

    def _retire_current(self, stage: str) -> None:
        """Move the current snapshot into snapshots/<id>/ before a new
        commit. Two renames — a crash between them degrades to a
        rebuild on resume (stage looks uncommitted), never to
        partial-visible data; the retired snapshot is preserved."""
        m = self.manifest(stage)
        if not (m and m.get("committed")):
            return
        sdir = self._stage_dir(stage)
        dst = os.path.join(sdir, "snapshots", str(m["snapshot_id"]))
        os.makedirs(dst, exist_ok=True)
        # manifest first: once it moves, is_committed() is False and a
        # crashed run resumes by rebuilding instead of trusting `data`
        os.rename(os.path.join(sdir, "manifest.json"), os.path.join(dst, "manifest.json"))
        os.rename(os.path.join(sdir, "data"), os.path.join(dst, "data"))

    def run_stage(
        self,
        stage: str,
        build_fn: Callable[[], DataFrame],
        key_col: str,
        cell_col: str | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Run (or resume) a stage. ``force=True`` rebuilds even when a
        committed snapshot exists: the old snapshot is RETIRED into the
        history (still readable via :meth:`read_snapshot`) and the new
        one becomes current — Iceberg's createOrReplace semantics."""
        sdir = self._stage_dir(stage)
        data_dir = os.path.join(sdir, "data")
        if self.is_committed(stage):
            if not force:
                return self.spark.read.parquet(data_dir)
            self._retire_current(stage)

        # discard any uncommitted leftovers from a killed run,
        # preserving retired snapshot history
        if os.path.exists(sdir):
            for name in os.listdir(sdir):
                if name != "snapshots":
                    p = os.path.join(sdir, name)
                    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        os.makedirs(sdir, exist_ok=True)

        token = uuid.uuid4().hex[:12]
        tmp_data = os.path.join(sdir, f"data.tmp-{token}")
        build_fn().write.mode("overwrite").parquet(tmp_data)
        os.rename(tmp_data, data_dir)  # atomic snapshot swap

        committed = self.spark.read.parquet(data_dir)
        lineage = lineage_rows(committed, key_col, self.n_buckets, cell_col)
        manifest = {
            "stage": stage,
            "snapshot_id": token,
            "committed": True,
            "row_count": int(sum(r["row_count"] for r in lineage)),
            "n_buckets": self.n_buckets,
            "key_col": key_col,
            "cell_col": cell_col,
            "schema": committed.schema.jsonValue(),
            "lineage": lineage,
        }
        tmp_manifest = os.path.join(sdir, f"manifest.tmp-{token}")
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.rename(tmp_manifest, os.path.join(sdir, "manifest.json"))
        return committed
