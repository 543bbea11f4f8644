"""The session index cache: bounded LRU with unpersist-on-evict.

As-of queries key per-snapshot sidecars by seq, so a long
multi-snapshot session would otherwise accumulate persisted frames
without bound (VERDICT r9 hygiene item). Eviction drops STORAGE
only — results never change, the frame just recomputes."""

from nucliadb_spark import cache


def test_cache_lru_bounded_and_eviction_unpersists(spark, monkeypatch):
    cache.clear()
    monkeypatch.setattr(cache, "MAX_ENTRIES", 3)

    frames = {}
    for i in range(5):
        frames[i] = cache.cached_df(
            "sf", f"entry{i}", lambda i=i: spark.range(i, i + 10)
        )

    assert len(cache._CACHE) == 3
    held = {k[2] for k in cache._CACHE}
    assert held == {"entry2", "entry3", "entry4"}
    # evicted frames lost their storage, survivors kept it
    assert not frames[0].storageLevel.useMemory
    assert not frames[1].storageLevel.useMemory
    assert frames[4].storageLevel.useMemory
    # an evicted frame still computes correctly (plan recomputes)
    assert frames[0].count() == 10

    # a HIT refreshes recency: touch entry2, insert a new one, and
    # entry3 (now the oldest untouched) is the eviction victim
    cache.cached_df("sf", "entry2", lambda: spark.range(2, 12))
    cache.cached_df("sf", "entry5", lambda: spark.range(5, 15))
    held = {k[2] for k in cache._CACHE}
    assert held == {"entry2", "entry4", "entry5"}

    # a hit returns the SAME persisted frame, not a rebuild
    again = cache.cached_df("sf", "entry5", lambda: spark.range(99))
    assert again.count() == 10

    cache.clear()
    assert not cache._CACHE
