"""Materialized bucketed index tables — the on-disk layout the
session cache (cache.py) stands in for during tests, made real.

SCALE.md's storage section claims the serving indexes persist as
bucketed parquet tables: postings bucketed by `term` (a query's
`term IN (...)` probe prunes buckets — the batch analog of an
inverted index's posting-list seek, tantivy's per-term list access,
nidx/nidx_text) and rid-keyed sidecars (doc-stats, paragraphs)
bucketed by `rid` so hydration/score joins co-locate WITHOUT a
shuffle. This module writes those tables and is covered by plan
tests (tests/test_bucketed_index.py) that pin both properties:
`SelectedBucketsCount: k out of n` on the term probe, and no
Exchange on the rid-bucket join.

At 100 TB the same DDL runs once per segment-build cycle; the
serving cluster reads the tables with
spark.sql.sources.bucketing.enabled (default true), so every query
inherits the co-location for free — no session cache required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
) -> None:
    """Persist df as an EXTERNAL bucketed+sorted parquet table.
    Sorting within buckets by the bucket key gives sort-merge joins
    their order for free (no per-task sort at read when both sides
    are bucketed+sorted the same way)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def write_text_index_tables(
    spark: SparkSession,
    post: DataFrame,
    stats: DataFrame,
    base_path: str,
    n_buckets: int = 16,
    prefix: str = "idx",
) -> tuple[str, str, str]:
    """The text index's serving layout: postings twice (term-bucketed
    for the query probe, rid-bucketed for score/hydration joins) and
    doc-stats rid-bucketed to co-locate with the latter. Returns the
    three table names."""
    t_term = f"{prefix}_postings_by_term"
    t_rid = f"{prefix}_postings_by_rid"
    t_stats = f"{prefix}_docstats"
    write_bucketed(post, t_term, "term", n_buckets, f"{base_path}/{t_term}")
    write_bucketed(post, t_rid, "rid", n_buckets, f"{base_path}/{t_rid}")
    write_bucketed(stats, t_stats, "rid", n_buckets, f"{base_path}/{t_stats}")
    return t_term, t_rid, t_stats


def write_ivf_index(assigned: DataFrame, path: str) -> None:
    """Persist the IVF cell assignment PARTITIONED BY cell — the
    layout ann.build_ivf's docstring promises: an nprobe query's
    `cell IN (...)` probe becomes partition pruning (the scan reads
    nprobe/k_cells of the files — what HNSW's graph walk does for
    the reference, nidx/nidx_vector/src/searcher.rs:300-312).
    Covered by a plan test asserting the PartitionFilters prune."""
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def drop_tables(spark: SparkSession, *tables: str) -> None:
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
