"""cache_latest registry: session-keyed, locked, clearable."""

from pyspark import StorageLevel

from o2g_spark import session as S


def _is_cached(df) -> bool:
    return df.storageLevel != StorageLevel.NONE


def test_cache_latest_evicts_only_same_key(spark):
    a1 = S.cache_latest("op.a", spark.range(10))
    b1 = S.cache_latest("op.b", spark.range(20))
    a1.count(), b1.count()
    assert _is_cached(a1) and _is_cached(b1)
    a2 = S.cache_latest("op.a", spark.range(30))
    a2.count()
    assert not _is_cached(a1)          # previous same-key cache released
    assert _is_cached(b1) and _is_cached(a2)  # other key untouched


def test_cache_latest_concurrent_keys_dont_clobber(spark):
    """Interleaved pipelines under DIFFERENT keys never unpersist each
    other even when racing from threads."""
    import threading

    frames = {}

    def run(key):
        f = S.cache_latest(key, spark.range(50))
        f.count()
        frames[key] = f

    ts = [threading.Thread(target=run, args=(f"op.t{i}",)) for i in range(6)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert all(_is_cached(f) for f in frames.values())
    S.clear_caches(spark)


def test_cache_latest_same_plan_recache_stays_cached(spark):
    """Re-running an IDENTICAL query through cache_latest (the bench
    shape) must leave the new frame cached: Spark's CacheManager keys
    entries by logical plan, so unpersisting the previous frame AFTER
    persisting an identical-plan one evicts both (the r3 regression:
    minhash_lsh recomputed its signature every scan, 1.9s → 21s)."""
    for _ in range(3):
        f = S.cache_latest("op.same", spark.range(40))
        f.count()
        assert _is_cached(f)
    S.clear_caches(spark)


def test_clear_caches_releases_everything(spark):
    f1 = S.cache_latest("op.c1", spark.range(5))
    f2 = S.cache_latest("op.c2", spark.range(6))
    f1.count(), f2.count()
    n = S.clear_caches(spark)
    assert n >= 2
    assert not _is_cached(f1) and not _is_cached(f2)
    assert S.clear_caches(spark) == 0


def test_cache_latest_isolates_newsession(spark):
    """Sessions sharing one SparkContext (newSession) share an
    applicationId — the registry key must still tell them apart so one
    session's cache_latest never evicts the other's (ADVICE r3 #3)."""
    s2 = spark.newSession()
    # distinct plans: the JVM CacheManager is PLAN-keyed per context,
    # so identical plans share one storage entry regardless of session
    # — the registry can only isolate what the JVM keeps separate
    a1 = S.cache_latest("op.shared", spark.range(10))
    a1.count()
    a2 = S.cache_latest("op.shared", s2.range(11))
    a2.count()
    assert _is_cached(a1) and _is_cached(a2)
    # clear_caches scoping is per session too
    assert S.clear_caches(s2) == 1
    assert _is_cached(a1) and not _is_cached(a2)
    S.clear_caches(spark)
