"""plans/session_cache.py unit behavior: per-(session, key) reuse and
dead-session eviction — the machinery q42/q87/q90/q110/q111 (MinHash
pairs/clusters) and q175/q185 (ordered sets) share prework through."""

from __future__ import annotations

from tp_integ_data_pipeline_spark.plans import session_cache as sc


def test_reuse_and_key_separation(spark):
    calls = []

    def build(tag):
        def _b():
            calls.append(tag)
            return spark.range(1)

        return _b

    sc._CACHES.pop("t_cache", None)
    a1 = sc.session_cached(spark, "t_cache", ("k1",), build("k1"))
    a2 = sc.session_cached(spark, "t_cache", ("k1",), build("k1"))
    b1 = sc.session_cached(spark, "t_cache", ("k2",), build("k2"))
    assert a1 is a2  # second call is a hit, no rebuild
    assert b1 is not a1  # different key -> different relation
    assert calls == ["k1", "k2"]


def test_dead_session_eviction(spark):
    sc._CACHES.pop("t_evict", None)
    cache = sc._CACHES.setdefault("t_evict", {})
    cache[("dead-app-id", "k")] = spark.range(1)  # a stale session's entry
    sc.session_cached(spark, "t_evict", ("k",), lambda: spark.range(2))
    app = spark.sparkContext.applicationId
    assert list(cache) == [(app, "k")]  # stale entry evicted on insert


def test_dead_session_eviction_sweeps_all_cache_names(spark):
    """r8 ADVICE regression: inserting under ONE cache name must evict
    dead-session entries under EVERY cache name, or checkpointed
    relations keyed elsewhere pin memory for the process lifetime."""
    app = spark.sparkContext.applicationId
    sc._CACHES.pop("t_sweep_a", None)
    sc._CACHES.pop("t_sweep_b", None)
    other = sc._CACHES.setdefault("t_sweep_b", {})
    other[("dead-app-id", "k")] = spark.range(1)
    other[(app, "live")] = spark.range(1)
    sc.session_cached(spark, "t_sweep_a", ("k",), lambda: spark.range(2))
    # dead entry under the OTHER name is gone; the live session's stays
    assert list(other) == [(app, "live")]
