"""Deletion-list purge plan (ingest.purge_deletions_plan — the
reference's purge_deletions pass, nidx/src/scheduler/purge_tasks.rs:
47-63): a deletion entry may be physically dropped only when BOTH
bounds pass — its seq is at or below every live segment's seq (a
deletion masks only OLDER segments; merged segments are recreated at
the merge job's seq = last_indexed, nidx/src/worker.rs:194), and at
or below the oldest in-flight seq (an unindexed older message would
build a segment the deletion must still mask).

The graded fixture (purge_deletions_plan over the CDC content log)
merges its whole inventory, so the binding bound there is the pending
window; these tests pin the OTHER direction on crafted logs — a
bucket that does NOT merge holds the purge cut down, and executing
the merge UNLOCKS the purge.

Bucket arithmetic used below (policy: seg_bucket=10, min_segments=4,
bottom=4): an 8-distinct-token upsert text gives a two-upsert segment
records=16 → bucket 4; a deletion-only segment has records=0 →
greatest(0, 4) → bucket 2 — so upsert and delete segments never share
a bucket and each test controls which buckets merge.
"""

from __future__ import annotations

from nucliadb_spark.streaming import ingest

SCHEMA = "rid long, seq long, op string, text string"

KW = dict(seg_bucket=10, min_segments=4, top_max=10_000, bottom=4)

T1 = "alpha beta gamma delta epsilon zeta eta theta"
T2 = "iota kappa lambda mu nu xi omicron pi"
T3 = "rho sigma tau upsilon phi chi psi omega"
T4 = "one two three four five six seven eight"


def _plan(spark, rows, last_indexed=100, pending=(90, 95)):
    log = spark.createDataFrame(rows, SCHEMA)
    return {
        r["segment_id"]: (r["purge_cut"], r["n_deletions"], r["n_purgeable"])
        for r in ingest.purge_deletions_plan(
            log, last_indexed, *pending, **KW
        ).collect()
    }


def test_kept_segments_hold_the_cut_down(spark):
    """The deletion-targeted segments merge (a pending deletion makes
    their upserts dead — the FORCED trigger), but one clean segment
    (rid 5, its own bucket, nothing superseded) keeps its original
    seq — and that kept segment holds the purge cut below every
    deletion, so nothing purges."""
    rows = [
        (1, 0, "upsert", T1),
        (2, 5, "upsert", T2),
        (3, 12, "upsert", T3),
        (4, 19, "upsert", T4),
        (5, 25, "upsert", T1),  # clean: records 8 → its own bucket
        (1, 30, "delete", None),
        (3, 35, "delete", None),
    ]
    out = _plan(spark, rows)
    assert out == {3: (25, 2, 0)}  # cut = the kept segment's max seq


def test_merge_unlocks_purge(spark):
    """Superseding rid 1 in the second segment forces the upsert
    bucket to merge (dead row), recreating those segments at
    last_indexed — the cut rises to the kept delete-segment's own max
    seq and both deletion entries purge. Compaction UNLOCKS the
    deletion purge, exactly the interaction purge_deletions encodes."""
    rows = [
        (1, 0, "upsert", T1),
        (2, 5, "upsert", T2),
        (1, 12, "upsert", T3),
        (4, 19, "upsert", T4),
        (1, 30, "delete", None),
        (4, 35, "delete", None),
    ]
    out = _plan(spark, rows)
    assert out == {3: (35, 2, 2)}


def test_pending_bound_bites(spark):
    """Same merged inventory, but the oldest in-flight seq sits
    between the two deletions: the later one must be retained even
    though every live segment is past it."""
    rows = [
        (1, 0, "upsert", T1),
        (2, 5, "upsert", T2),
        (1, 12, "upsert", T3),
        (4, 19, "upsert", T4),
        (1, 30, "delete", None),
        (4, 35, "delete", None),
    ]
    out = _plan(spark, rows, pending=(32, 33))
    assert out == {3: (32, 2, 1)}


def test_straggler_window_is_excluded_from_inventory(spark):
    """Ops inside the in-flight window are NOT indexed yet: they
    appear in no segment, no deletion count (rid 2's in-flight delete
    is absent from the report), and no cut math — while the indexed
    deletion still purges once everything it masks has merged."""
    rows = [
        (1, 0, "upsert", T1),
        (2, 5, "upsert", T2),
        (1, 12, "upsert", T3),
        (2, 91, "delete", None),  # in flight — excluded everywhere
        (1, 30, "delete", None),
    ]
    out = _plan(spark, rows)
    assert out == {3: (30, 1, 1)}


def test_graded_fixture_binding_bound_is_pending(spark, sf_dir):
    """On the CDC content log every segment lands in the shared
    bottom bucket at nidx's default 10k threshold, so the whole
    inventory merges and the cut is the pending window's start —
    pinning the docstring's claim about the graded fixture."""
    from nucliadb_spark.plans.queries_dataops import (
        _PURGE_LAST_INDEXED,
        _PURGE_PENDING,
    )
    from nucliadb_spark.sources import tpch

    log = ingest.cdc_log(tpch.fields(spark, sf_dir))
    out = ingest.purge_deletions_plan(
        log, _PURGE_LAST_INDEXED, *_PURGE_PENDING
    )
    cuts = {r["purge_cut"] for r in out.collect()}
    assert cuts == {_PURGE_PENDING[0]}
