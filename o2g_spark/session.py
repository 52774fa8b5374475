"""SparkSession factory tuned for this engine.

One place for the settings that matter for correctness (UTC timestamps —
DuckDB oracle comparison) and for scale (AQE, Arrow batching, shuffle
partitions sized to cores instead of the 200 default).
"""

from __future__ import annotations

import os
import tempfile
import threading
import zipfile

from pyspark.sql import SparkSession


def build_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the ``o2g_spark`` package for ``spark-submit --py-files``.

    The north rule runs the engine via ``--py-files`` on a multi-executor
    cluster; locally :func:`get_spark` ships the same zip via
    ``addPyFile`` so Python workers can import the package regardless of
    the caller's cwd/sys.path (exactly what a real cluster requires).
    """
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    if out_path is None:
        out_path = os.path.join(tempfile.gettempdir(), "o2g_spark_pyfiles.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(
                    "o2g_spark", os.path.relpath(full, pkg_root)
                )
                zf.write(full, rel)
    return out_path


def get_spark(
    app_name: str = "o2g_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. ``shuffle_partitions`` defaults to 2× the local
    parallelism — small enough to avoid tiny-task overhead locally,
    honest about what a real cluster would set (≈2–3× total cores).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        cores = os.cpu_count() or 8
        shuffle_partitions = 2 * (cores if n == "*" else max(1, int(n)))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate clones the generator expression into
        # a pre-explode Filter — for our explodes the generator is an
        # expensive regex/encode array and explode drops empties anyway,
        # so the inferred filter just re-evaluates it per row (seen in
        # the geotag plan: regexp_extract_all computed twice)
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # local mode = ONE JVM hosting all executor threads: size the
        # heap for the whole "cluster", not a driver (8g across 32
        # threads = 256 MB/task → OOM at the 20M-page kNN stage)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        # deterministic float formatting between runs
        .config("spark.sql.legacy.respectNullabilityInTextDatasetConversion", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Ship the package to Python workers (--py-files equivalent); without
    # this, pandas UDFs fail to unpickle when the caller's cwd isn't the
    # repo root — on a real cluster this is mandatory, not optional.
    spark.sparkContext.addPyFile(build_pyfiles_zip())
    return spark


# ------------------------------------------------- bounded operator caches

_live_caches: dict = {}
_caches_lock = threading.Lock()
_ALL = object()  # clear_caches sentinel: every session's entries


def _sid(session) -> tuple | None:
    # (applicationId, id(session)): applicationId alone is shared by
    # every SparkSession spawned via newSession() on one context, so it
    # cannot isolate per-session caches; the Python wrapper identity
    # disambiguates (stable for the session's lifetime — the registry
    # entry itself keeps the session object alive via df.sparkSession,
    # so the id can't be recycled while the key is live).
    try:
        return (session.sparkContext.applicationId, id(session))
    except Exception:
        return None


def _session_key(df, key: str) -> tuple:
    # key per (session, operator): two sessions sharing an operator name
    # must not unpersist each other's caches, and a stopped session's
    # entries must not pin frames forever under a live session's key
    return (_sid(df.sparkSession), key)


def cache_latest(key: str, df):
    """persist() with a bounded lifetime: each call under the same
    (session, key) unpersists the PREVIOUS call's cache before caching
    the new frame.

    Why: Spark's CacheManager never releases a persisted plan when the
    caller drops the DataFrame (unlike localCheckpoint blocks, which
    the ContextCleaner GCs — but checkpoint stores row-format blocks
    and measured 2-3× slower than the compressed columnar cache for
    the shingle/signature tables this serves). Keeping exactly the
    most recent cache per operator bounds storage in long-lived
    sessions; a caller still holding an older result just recomputes
    lazily on its next action.

    The registry is keyed by ((application id, session identity),
    operator name) — sessions created via ``newSession()`` share one
    application id, so the session wrapper identity is part of the key
    to keep the documented per-session isolation true — and the
    pop/persist pair runs under a lock, so concurrent pipelines in one
    process (or two sessions sharing operator names) never unpersist
    each other's caches. Call :func:`clear_caches` at job teardown to
    release everything the session still pins.

    ORDER MATTERS: the previous cache is unpersisted BEFORE the new
    frame persists. Spark's CacheManager registers cache entries by
    LOGICAL PLAN — when the new call has the identical plan (re-running
    the same query, the bench's exact shape), persist-then-unpersist
    would re-register the same entry and immediately evict it, leaving
    the new frame silently uncached (measured: minhash_lsh 1.9 s →
    21 s and climbing across bench iterations).
    """
    skey = _session_key(df, key)
    # one critical section for pop→unpersist→persist→insert: splitting
    # it lets two same-key racers both pop-empty and both persist, and
    # the loser's frame leaks outside the registry forever. unpersist/
    # persist are driver-side metadata calls (non-blocking), so holding
    # the lock across them is cheap.
    with _caches_lock:
        prev = _live_caches.pop(skey, None)
        if prev is not None:
            try:
                prev.unpersist()
            except Exception:
                pass  # session of the old frame may already be stopped
        df = df.persist()
        _live_caches[skey] = df
    return df


def clear_caches(spark: SparkSession | None = None) -> int:
    """Unpersist every registry entry (or only the given session's) —
    the explicit teardown hook for long-lived processes. Returns the
    number of caches released. A session whose id can no longer be read
    (already stopped) clears nothing — NOT everything: other live
    sessions' caches must survive its teardown."""
    if spark is None:
        sid = _ALL
    else:
        sid = _sid(spark)
        if sid is None:
            return 0  # stopped/broken session: nothing identifiable
    with _caches_lock:
        victims = [
            k for k in _live_caches if sid is _ALL or k[0] == sid
        ]
        frames = [_live_caches.pop(k) for k in victims]
    for f in frames:
        try:
            f.unpersist()
        except Exception:
            pass
    return len(frames)
