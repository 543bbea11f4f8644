"""Session-scoped index cache.

A search engine doesn't re-tokenize its corpus per query: tantivy
serves from built segments (SURVEY §2.1 S3). The batch analog is a
cached/persisted derived table per (corpus, index) pair. Queries go
through `cached_df`, so the first query of a session builds and
persists (MEMORY_AND_DISK — spills cleanly), and every later query
reuses the materialized index. On a real cluster these would be
parquet tables written by `bm25.build_index` / `ann.build_ivf` and
read back with bucketing; the in-session cache gives the same
plan shape without filesystem management in the test harness.

Correctness is unaffected: the cache stores exactly the DataFrame the
builder returns, keyed by (sf_dir, name).

The cache is a bounded LRU: as-of queries key per-snapshot sidecars
by seq (``asof{seq}_text_post`` …), so a long multi-snapshot session
would otherwise accumulate persisted frames without bound. Eviction
unpersists the least-recently-used entry — dropping storage only;
any plan still holding the frame recomputes it lazily, so eviction
can never change results. Hot shared sidecars (the live text index,
centroids) are touched every request and stay resident.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# Sizing (revised in the r14 optimization round): the old 128-entry
# bound THRASHED on the full bench sweep — the registry now tours
# dozens of snapshots (~9 sidecars per (corpus, seq)) plus the live
# indexes, so entries built by a query's warm-up were evicted before
# its timed run and the per-snapshot postings re-tokenized the corpus
# inside the serving path (r14 baseline profile: find_hybrid_as_of
# spent ~22 s of summed executor run re-building evicted sidecars).
# 512 holds every sidecar the whole 275-query registry creates in one
# session with headroom; entries are index-sized (MBs at bench scale,
# and on a cluster the big ones are parquet artifacts the cache only
# fronts), so the bound is about handle bookkeeping, not memory
# safety. Still env-tunable for small-heap deployments.
MAX_ENTRIES = int(os.environ.get("NUCLIADB_SPARK_CACHE_MAX", "512"))

_CACHE: OrderedDict[tuple[str, str, str], DataFrame] = OrderedDict()

# observability: evictions in a session with a right-sized bound
# should be ~0; a growing count is the thrash signal the r14 profile
# caught (scripts/r14_profile.py prints it after a sweep)
EVICTIONS = 0


def cached_names(spark, sf_dir: str) -> list[str]:
    """Names currently cached for this (application, sf_dir) —
    lets builders CHAIN from existing sidecars (e.g. the as-of text
    index advances the nearest cached earlier snapshot instead of
    building from scratch). Read-only; does not touch LRU order."""
    app = spark.sparkContext.applicationId
    return [n for (a, s, n) in _CACHE if a == app and s == sf_dir]


def cached_df(
    sf_dir: str,
    name: str,
    builder: Callable[[], DataFrame],
    spark=None,
) -> DataFrame:
    # with the session in hand the hit path never invokes the
    # builder: chained as-of builders construct (and would persist)
    # a PRIOR snapshot's whole plan, so building on a hit could
    # re-insert an evicted prior entry and evict a hot sidecar for
    # a frame that is never computed or used
    if spark is not None:
        key = (spark.sparkContext.applicationId, sf_dir, name)
        hit = _CACHE.get(key)
        if hit is not None:
            _CACHE.move_to_end(key)
            return hit
    df = builder()
    # key on the Spark application: a restarted/different session must
    # rebuild, not serve DataFrames of a dead context
    app = df.sparkSession.sparkContext.applicationId
    key = (app, sf_dir, name)
    cached = _CACHE.get(key)
    if cached is None:
        cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        _CACHE[key] = cached
        while len(_CACHE) > MAX_ENTRIES:
            global EVICTIONS
            EVICTIONS += 1
            _, evicted = _CACHE.popitem(last=False)
            try:
                evicted.unpersist()
            except Exception:
                pass  # dead context — storage is already gone
    else:
        _CACHE.move_to_end(key)
    return cached


def clear() -> None:
    for df in _CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHE.clear()


_SCALARS: dict[tuple[str, str, str], object] = {}


def cached_scalar(df: DataFrame, sf_dir: str, name: str, compute: Callable[[], object]):
    """Session-scoped scalar sidecar (e.g. the corpus doc count used
    by the prefilter All/None fast path) — an index-build statistic,
    not per-query work."""
    app = df.sparkSession.sparkContext.applicationId
    key = (app, sf_dir, name)
    if key not in _SCALARS:
        _SCALARS[key] = compute()
    return _SCALARS[key]
