"""S4 compaction: the log-merge planner ports the reference's
scheduling semantics — test cases transliterated from
nidx/src/scheduler/log_merge.rs:118-260 — and the executor rewrites
parquet segment files per plan."""

import pytest
from pyspark.sql import functions as F

from nucliadb_spark.operators.compaction import (
    LogMergeSettings,
    compact_table,
    plan_merges,
    plan_table_merges,
)


def test_forced_merge():
    s = LogMergeSettings(
        min_number_of_segments=3,
        top_bucket_max_records=1000,
        bottom_bucket_threshold=5,
        bucket_size_log=1.0,
    )
    assert plan_merges(s, [(1, 50, False), (2, 50, False)]) == []
    assert len(plan_merges(s, [(1, 50, False), (2, 50, True)])) == 1
    # oversized segments merge only when forced (deletion purge)
    assert plan_merges(s, [(1, 2000, False)]) == []
    assert plan_merges(s, [(1, 2000, True)]) == [[1]]


def test_not_enough_segments():
    s = LogMergeSettings(min_number_of_segments=3)
    assert plan_merges(s, [(1, 50, False), (2, 50, False)]) == []


def test_same_size_segments_single_job():
    s = LogMergeSettings(min_number_of_segments=3)
    jobs = plan_merges(s, [(1, 50, False), (2, 50, False), (3, 50, False)])
    assert len(jobs) == 1 and len(jobs[0]) == 3


def test_all_buckets():
    s = LogMergeSettings(
        min_number_of_segments=2,
        top_bucket_max_records=1000,
        bottom_bucket_threshold=50,
        bucket_size_log=1.0,
    )
    jobs = plan_merges(
        s,
        [
            (7, 1001, False),  # too big, not forced -> dropped
            (3, 1000, False),  # marks the top bucket
            (12, 501, False),
            (13, 500, False),  # opens bucket top-1
            (11, 249, False),  # top-2
            (9, 125, False),
            (5, 124, False),  # bottom+1
            (4, 63, False),
            (6, 62, False),  # bottom bucket starts
            (10, 51, False),
            (1, 50, False),
            (2, 10, False),
            (8, 20, False),
        ],
    )
    assert len(jobs) == 4
    assert jobs[0] == [3, 12]
    assert jobs[1] == [11, 9]
    assert jobs[2] == [5, 4]
    # 13 (500 records) sits alone in its bucket -> below min, not merged
    assert jobs[3] == [6, 10, 1, 2, 8]


def test_job_split_respects_top_bucket_ceiling():
    s = LogMergeSettings(
        min_number_of_segments=2,
        top_bucket_max_records=1000,
        bottom_bucket_threshold=50,
        bucket_size_log=1.0,
    )
    jobs = plan_merges(s, [(i, 600, False) for i in range(6)])
    # 600+600 > 1000 -> jobs of two segments each
    assert jobs == [[0, 1], [2, 3], [4, 5]]


def test_compact_table_applies_plan(spark, tmp_path):
    src = str(tmp_path / "segments")
    # 6 segment files of ~equal size -> one merge job (min 4)
    df = spark.range(600).select(
        F.col("id").alias("rid"), (F.col("id") % 7).alias("v")
    )
    df.repartition(6).write.parquet(src)
    out = str(tmp_path / "compacted")
    plan = compact_table(
        spark,
        src,
        out,
        LogMergeSettings(
            min_number_of_segments=4,
            top_bucket_max_records=10_000,
            bottom_bucket_threshold=10,
        ),
    )
    assert len(plan) == 1 and len(plan[0]) == 6
    before = sorted(map(tuple, spark.read.parquet(src).collect()))
    after = sorted(map(tuple, spark.read.parquet(out + "/merge-0000").collect()))
    assert before == after
    # merged output is a single file
    import os

    files = [
        f
        for f in os.listdir(out + "/merge-0000")
        if f.endswith(".parquet")
    ]
    assert len(files) == 1


def test_plan_table_merges_reads_footers_only(spark, tmp_path):
    src = str(tmp_path / "t")
    spark.range(100).write.parquet(src)
    plan = plan_table_merges(src, LogMergeSettings(min_number_of_segments=2))
    # tiny equal files land in one bottom bucket
    assert len(plan) == 1


def test_merge_plan_oracle_random():
    """The recursive-CTE DuckDB oracle for segment_merge_plan must
    replicate plan_merges exactly on arbitrary segment distributions
    (multiple buckets, oversized skips, dropped singleton buckets)."""
    import random

    import duckdb

    from nucliadb_spark.plans.queries_dataops import _MERGE_PLAN_SQL

    sql = _MERGE_PLAN_SQL.replace(
        "SELECT source, COUNT(*)::BIGINT AS cnt FROM documents GROUP BY source",
        "SELECT source, cnt FROM seg_sizes",
    )
    rng = random.Random(7)
    for _ in range(50):
        n = rng.randint(1, 30)
        sizes = [
            (f"s{i:02d}", rng.choice([1, 3, 5, 12, 25, 26, 30, 59, 60, 61, 100]))
            for i in range(n)
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE seg_sizes(source VARCHAR, cnt BIGINT)")
        con.executemany("INSERT INTO seg_sizes VALUES (?,?)", sizes)
        got = sorted(con.execute(sql).fetchall())
        ordered = sorted(sizes, key=lambda s: (-s[1], s[0]))
        jobs = plan_merges(
            LogMergeSettings(2, 60, 4), [(s, c, False) for s, c in ordered]
        )
        want = sorted((j, s) for j, job in enumerate(jobs) for s in job)
        assert got == want, sizes
