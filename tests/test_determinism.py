"""Repeated executions must return identical rows — the driver hashes
results, so any nondeterminism (tie-breaks, cache interactions,
partition ordering) would flap the correctness gate."""

import pytest

from nucliadb_spark import registry

CHECK = [
    "find_hybrid",
    "bm25_keyword",
    "knn_cosine",
    "dedup_minhash_lsh",
    "catalog_facets",
    "graph_two_hop",
    "stream_windowed_counts",
]


@pytest.mark.parametrize("name", CHECK)
def test_repeat_runs_identical(spark, sf_dir, name):
    q = registry.queries()[name]
    a = [tuple(r) for r in q(spark, sf_dir).collect()]
    b = [tuple(r) for r in q(spark, sf_dir).collect()]
    assert a == b
