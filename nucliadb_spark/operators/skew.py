"""Skewed-key join salting (100 TB hardening; SCALE.md).

Hot keys are real in this workload: graph hub entities (a node with
millions of edges makes the two-hop self-join quadratic on one
shuffle partition), hot facet labels, degenerate LSH band buckets.
First-line defense is AQE skew-join splitting (enabled in
session.py), which handles sort-merge-join skew transparently.
Salting is the explicit fallback for shapes AQE doesn't cover —
e.g. when the skewed side must stay hash-partitioned for a later
stage, or the join is the build side of a shuffled-hash join.

`salted_join` splits each hot key into `n_salt` sub-keys: the large
side gets a deterministic salt derived from its non-key columns (no
randomness — results must replay identically for the oracle), the
small side is replicated n_salt times. Join cardinality and values
are unchanged; the hot key's rows now land on n_salt partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's keys salted n_salt ways.

    The salt is xxhash64 over ALL of the large side's columns — rows
    of the same hot key spread uniformly, and reruns are
    deterministic. The small side is exploded n_salt× (cost: n_salt ×
    |small| shuffle rows — use only when small is too big to
    broadcast but far smaller than the skewed side).
    """
    lcols = large.columns
    l = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(n_salt))
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(s, [*on, "_salt"], how).drop("_salt")
