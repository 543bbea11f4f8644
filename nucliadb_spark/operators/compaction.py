"""Segment merge / compaction policy (SURVEY §2.1 S4).

The reference schedules tantivy-segment merges with a log-merge
policy (ref: nidx/src/scheduler/log_merge.rs:59-135): segments are
grouped into log2-sized buckets below the largest mergeable segment;
a bucket merges when it holds >= min_number_of_segments (or a segment
is force-flagged to purge deletions), and jobs are split so no merge
output exceeds top_bucket_max_records.

Batch-first: a "segment" is a parquet file of an engine table; the
planner reads per-file row counts from parquet footers (metadata
only, no data scan) and the executor rewrites each planned group as
one file — the lakehouse OPTIMIZE/compaction shape. Planning is
driver-side (it is a scheduler, like the reference's), execution is
Spark jobs over only the files being merged.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass


@dataclass
class LogMergeSettings:
    """Defaults mirror nidx/src/settings.rs:228-255."""

    min_number_of_segments: int = 4
    top_bucket_max_records: int = 10_000_000
    bottom_bucket_threshold: int = 10_000
    bucket_size_log: float = 1.0


def plan_merges(
    settings: LogMergeSettings,
    segments: list[tuple[object, int, bool]],
) -> list[list[object]]:
    """(segment_id, records, force_merge) -> merge jobs (lists of ids).

    Semantics of log_merge.rs:59-135: oversized segments merge alone
    only when forced; buckets open at each log2 step of
    ``bucket_size_log`` below the largest segment seen (sizes clamped
    up to ``bottom_bucket_threshold`` so tiny segments share one
    bottom bucket); a bucket emits jobs when it has enough segments
    or any is forced, splitting whenever accumulated records exceed
    the top-bucket ceiling.
    """
    buckets: list[list[tuple[object, int, bool]]] = []
    current: list[tuple[object, int, bool]] = []
    current_max_log = math.inf
    jobs: list[list[object]] = []

    for seg_id, records, force in segments:
        if records > settings.top_bucket_max_records:
            if force:
                jobs.append([seg_id])
            continue
        size_log = math.log2(max(records, settings.bottom_bucket_threshold))
        if size_log <= current_max_log - settings.bucket_size_log:
            buckets.append(current)
            current = []
            current_max_log = size_log
        current.append((seg_id, records, force))
    buckets.append(current)

    for bucket in buckets:
        if len(bucket) < settings.min_number_of_segments and not any(
            f for _, _, f in bucket
        ):
            continue
        acc_records = 0
        to_merge: list[object] = []
        forced = False
        for seg_id, records, force in bucket:
            forced |= force
            acc_records += records
            to_merge.append(seg_id)
            if acc_records > settings.top_bucket_max_records:
                if len(to_merge) >= settings.min_number_of_segments or forced:
                    jobs.append(to_merge)
                forced = False
                acc_records = 0
                to_merge = []
        if to_merge and (len(to_merge) >= settings.min_number_of_segments or forced):
            jobs.append(to_merge)
    return jobs


def segment_stats(table_path: str) -> list[tuple[str, int]]:
    """Per-parquet-file row counts from footers only (no data scan),
    largest first — the traversal order plan_merges expects."""
    import pyarrow.parquet as pq

    stats = []
    for name in os.listdir(table_path):
        if name.endswith(".parquet"):
            full = os.path.join(table_path, name)
            stats.append((name, pq.ParquetFile(full).metadata.num_rows))
    return sorted(stats, key=lambda s: (-s[1], s[0]))


def plan_table_merges(
    table_path: str, settings: LogMergeSettings | None = None
) -> list[list[str]]:
    settings = settings or LogMergeSettings()
    segs = [(name, rows, False) for name, rows in segment_stats(table_path)]
    return plan_merges(settings, segs)


def compact_table(
    spark,
    table_path: str,
    out_path: str,
    settings: LogMergeSettings | None = None,
) -> list[list[str]]:
    """Apply the merge plan: each job's files rewrite as ONE file;
    unplanned files copy through unchanged. Returns the plan."""
    import shutil

    plan = plan_table_merges(table_path, settings)
    os.makedirs(out_path, exist_ok=True)
    merged = {name for job in plan for name in job}
    for i, job in enumerate(plan):
        files = [os.path.join(table_path, n) for n in job]
        df = spark.read.parquet(*files)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_path, f"merge-{i:04d}")
        )
    for name, _ in segment_stats(table_path):
        if name not in merged:
            shutil.copy(
                os.path.join(table_path, name), os.path.join(out_path, name)
            )
    return plan
