"""Filesystem helpers for bench/demo scratch directories.

The harness scripts (stream_resume_demo, bench_stream_recall) rebuild
their ``--out`` directory from scratch on every run. A bare
``shutil.rmtree(args.out)`` would silently destroy whatever path the
user pointed ``--out`` at — so scratch resets go through
:func:`reset_scratch_dir`, which only deletes directories it (or a
prior run) created, recognized by a marker file.
"""

from __future__ import annotations

import os
import shutil

SCRATCH_MARKER = ".o2g_spark_scratch"


def reset_scratch_dir(path: str, force: bool = False) -> str:
    """Delete-and-recreate ``path`` as an owned scratch directory.

    Safe against pointing a bench script's ``--out`` at a real
    directory: an EXISTING non-empty ``path`` is only removed when it
    carries the marker file a previous :func:`reset_scratch_dir` call
    left (i.e. it was created as scratch), or when ``force`` is True.
    Empty or absent paths are always fair game. Returns ``path``.
    """
    if os.path.isdir(path):
        entries = os.listdir(path)
        owned = SCRATCH_MARKER in entries
        if entries and not owned and not force:
            raise SystemExit(
                f"refusing to delete pre-existing non-empty directory "
                f"{path!r}: it was not created by a previous run (no "
                f"{SCRATCH_MARKER} marker). Pass --force to override."
            )
        shutil.rmtree(path)
    elif os.path.exists(path):
        if not force:
            raise SystemExit(
                f"refusing to delete {path!r}: exists but is not a "
                f"directory. Pass --force to override."
            )
        os.remove(path)
    os.makedirs(path)
    with open(os.path.join(path, SCRATCH_MARKER), "w") as fh:
        fh.write("scratch directory owned by o2g_spark bench/demo scripts\n")
    return path
