"""Shared LSM-style delta machinery for the persisted index family.

The first-cut ``*_index_merge`` re-committed the WHOLE index as
old ∪ new — an O(corpus) rewrite per crawl batch, which quietly
defeats the O(batch) purpose of the incremental indexes at 100 TB.
This module gives every index stage the LSM shape instead:

- a **base** snapshot (the stage itself, committed by the build), plus
- **delta** stages (``<stage>.d00001``, ``.d00002``, …) — each an
  ordinary committed checkpoint stage holding ONE batch, so a merge is
  O(batch) work and an atomic commit;
- readers see base ∪ live deltas (``read_with_deltas``);
- an explicit **compaction** folds base + deltas into a new base
  (createOrReplace — the old base retires into snapshot history) and
  garbage-collects the folded deltas. Compaction is the only O(corpus)
  operation, and the caller chooses when to pay it.

Crash safety builds on the checkpoint layer's committed-marker
semantics plus two conventions:

- **idempotent merges**: each delta's manifest carries a
  ``batch_digest`` (count + order-insensitive xxhash of the batch
  ids). ``commit_delta`` refuses to commit a second live delta with
  the same digest for the same stage, so the production shape "crash
  after commit, rerun the identical command" re-finds the existing
  delta instead of double-merging the batch.
- **monotonic numbering across compactions**: the base manifest's
  ``compacted_through`` ordinal marks the highest delta folded in;
  readers skip deltas at or below it, which makes the
  commit-base-then-GC-deltas sequence safe at every crash point (a
  surviving folded delta is invisible, and GC is re-run on the next
  compaction). New deltas number from
  ``max(compacted_through, existing) + 1``.

Multi-stage indexes (bands + payload) commit one delta PER stage per
merge, tagged with the same ``batch_digest``; a crash between the two
commits is detected by comparing the stages' digest sets
(:func:`check_delta_lockstep`) and healed by rerunning the merge (the
digest check skips the stage that already has the batch).
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointManager

_DELTA_RE = re.compile(r"\.d(\d{5})$")


def batch_digest(df: DataFrame, id_col: str) -> str:
    """Order-insensitive fingerprint of a batch's id set: row count +
    bit_xor of per-id xxhash64. One cheap aggregate job, driver-bounded
    at one row — the price of idempotent merges."""
    r = df.agg(
        F.count("*").alias("n"),
        F.expr(f"bit_xor(xxhash64({id_col}))").alias("x"),
    ).first()
    return f"{r['n']}:{r['x']}"


def _delta_entries(ckpt: CheckpointManager, stage: str) -> list[tuple[int, str]]:
    """(ordinal, stage_name) of every delta DIRECTORY of ``stage``,
    sorted — committed or not (numbering must see in-flight attempts so
    a resumed run_stage reuses its own directory)."""
    out = []
    prefix = f"{stage}.d"
    if os.path.isdir(ckpt.base_dir):
        for name in os.listdir(ckpt.base_dir):
            if name.startswith(prefix):
                m = _DELTA_RE.search(name)
                if m:
                    out.append((int(m.group(1)), name))
    return sorted(out)


def live_delta_stages(ckpt: CheckpointManager, stage: str) -> list[str]:
    """COMMITTED deltas above the base's ``compacted_through`` mark,
    oldest first — the set a reader unions with the base."""
    base_m = ckpt.manifest(stage) or {}
    thru = int(base_m.get("compacted_through", 0))
    return [
        name
        for num, name in _delta_entries(ckpt, stage)
        if num > thru and ckpt.is_committed(name)
    ]


def live_delta_digests(ckpt: CheckpointManager, stage: str) -> list[str]:
    return [
        (ckpt.manifest(name) or {}).get("batch_digest")
        for name in live_delta_stages(ckpt, stage)
    ]


def all_batch_digests(ckpt: CheckpointManager, stage: str) -> list[str]:
    """Every batch the stage's logical content covers: digests FOLDED
    into the base by compactions plus the live deltas'. This — not the
    live set alone — is what multi-stage lockstep compares, so a crash
    between two stages' compactions (content equal, layout different)
    is not a false inconsistency."""
    folded = (ckpt.manifest(stage) or {}).get("folded_digests", [])
    return sorted([d or "" for d in folded]
                  + [d or "" for d in live_delta_digests(ckpt, stage)])


def reset_extra(ckpt: CheckpointManager, stage: str) -> dict:
    """manifest_extra keys for a FORCED base rebuild: hide every
    existing delta (they describe the replaced corpus) and clear the
    folded-batch log. Pass to run_stage(force=True), then
    :func:`gc_hidden`."""
    top = max([0] + [num for num, _ in _delta_entries(ckpt, stage)])
    return {"compacted_through": top, "folded_digests": []}


def gc_hidden(ckpt: CheckpointManager, stage: str) -> None:
    """Remove delta directories at or below the base's
    ``compacted_through`` mark — they are invisible to readers already,
    so this is pure garbage collection and safe to re-run."""
    thru = int((ckpt.manifest(stage) or {}).get("compacted_through", 0))
    for num, name in _delta_entries(ckpt, stage):
        if num <= thru:
            shutil.rmtree(os.path.join(ckpt.base_dir, name),
                          ignore_errors=True)


def read_with_deltas(ckpt: CheckpointManager, stage: str) -> DataFrame:
    """base ∪ live deltas — the current logical content of the stage."""
    df = ckpt.read_snapshot(stage)
    for name in live_delta_stages(ckpt, stage):
        df = df.unionByName(ckpt.read_snapshot(name))
    return df


def total_row_count(ckpt: CheckpointManager, stage: str) -> int:
    """Logical row count (base + live deltas) from manifests only —
    no Spark job."""
    n = (ckpt.manifest(stage) or {}).get("row_count", 0)
    for name in live_delta_stages(ckpt, stage):
        n += (ckpt.manifest(name) or {}).get("row_count", 0)
    return int(n)


def commit_delta(
    ckpt: CheckpointManager,
    stage: str,
    build_fn: Callable[[], DataFrame],
    key_col: str,
    digest: str,
    partition_by: str | None = None,
    manifest_extra: dict | None = None,
) -> str | None:
    """Commit ONE batch as the next delta of ``stage`` — O(batch).
    Returns the delta stage name, or None when the stage already
    covers ``digest`` (live delta OR folded by a compaction — the
    idempotent-rerun path)."""
    if digest in all_batch_digests(ckpt, stage):
        return None
    entries = _delta_entries(ckpt, stage)
    thru = int((ckpt.manifest(stage) or {}).get("compacted_through", 0))
    # reuse the top UNcommitted directory if it exists (a crashed
    # attempt); otherwise take the next ordinal
    if entries and not ckpt.is_committed(entries[-1][1]) \
            and entries[-1][0] > thru:
        name = entries[-1][1]
    else:
        top = max([thru] + [num for num, _ in entries])
        name = f"{stage}.d{top + 1:05d}"
    extra = dict(manifest_extra or {})
    extra["batch_digest"] = digest
    ckpt.run_stage(name, build_fn, key_col=key_col,
                   partition_by=partition_by, manifest_extra=extra)
    return name


def check_delta_lockstep(
    ckpt: CheckpointManager, stages: list[str], base_dir: str
) -> None:
    """Raise unless every stage of a multi-stage index has the SAME
    multiset of live-delta batch digests (a crash between a merge's
    per-stage commits leaves them different — rerunning the merge
    heals it, because commit_delta skips the stage that already has
    the batch)."""
    sets = {s: all_batch_digests(ckpt, s) for s in stages}
    vals = list(sets.values())
    if any(v != vals[0] for v in vals[1:]):
        raise RuntimeError(
            f"inconsistent index at {base_dir!r}: stages {stages} cover "
            f"mismatched batch sets {sets} (interrupted merge?) — rerun "
            "the merge with the same batch to heal"
        )


def compact(
    ckpt: CheckpointManager,
    stage: str,
    key_col: str,
    partition_by: str | None = None,
    manifest_extra: dict | None = None,
) -> int:
    """Fold base + live deltas into a new base snapshot (the one
    O(corpus) operation, paid when the CALLER chooses) and GC the
    folded deltas. The old base retires into snapshot history; the new
    base's ``compacted_through`` makes any delta that survives a crash
    between commit and GC invisible to readers. Returns the number of
    deltas folded. No-op (0) when there are no live deltas — but GC of
    already-folded leftovers still runs."""
    base_m = ckpt.manifest(stage) or {}
    thru = int(base_m.get("compacted_through", 0))
    live = live_delta_stages(ckpt, stage)
    if live:
        new_thru = max(num for num, name in _delta_entries(ckpt, stage)
                       if name in live)
        # stream, don't materialize: run_stage(force=True) retires the
        # current base FIRST, but retired snapshots stay readable by
        # id — so the build reads the old base from history and the
        # (still-live) delta dirs, never holding the corpus in memory
        old_id = base_m["snapshot_id"]

        def build() -> DataFrame:
            df = ckpt.read_snapshot(stage, old_id)
            for name in live:
                df = df.unionByName(ckpt.read_snapshot(name))
            return df

        extra = dict(manifest_extra or {})
        extra["compacted_through"] = new_thru
        # carry the folded-batch log forward so multi-stage lockstep
        # keeps comparing TOTAL batch coverage across compactions
        extra["folded_digests"] = sorted(
            [d or "" for d in base_m.get("folded_digests", [])]
            + [d or "" for d in live_delta_digests(ckpt, stage)]
        )
        ckpt.run_stage(stage, build, key_col=key_col, force=True,
                       partition_by=partition_by, manifest_extra=extra)
        thru = new_thru
    # GC every delta at or below the (possibly new) compaction mark —
    # idempotent, also sweeps leftovers from a crashed earlier compact
    for num, name in _delta_entries(ckpt, stage):
        if num <= thru:
            shutil.rmtree(os.path.join(ckpt.base_dir, name),
                          ignore_errors=True)
    return len(live)
