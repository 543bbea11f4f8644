"""Plan-level proof of the SCALE.md storage claims: the persisted
bucketed index tables give (a) bucket PRUNING on a term probe — the
inverted-index seek — and (b) a co-located rid join with NO
Exchange. These are properties of the physical plan, so the tests
assert on the plan text, not just results."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nucliadb_spark.operators import bm25, warehouse
from nucliadb_spark.sources import tpch

N_BUCKETS = 8


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    post = bm25.postings(tpch.fields(spark, sf_dir))
    stats = post.groupBy("rid").agg(F.sum("tf").alias("dl"))
    base = tempfile.mkdtemp(prefix="bucketed_idx_")
    names = warehouse.write_text_index_tables(
        spark, post, stats, base, n_buckets=N_BUCKETS, prefix="t_bidx"
    )
    yield names
    warehouse.drop_tables(spark, *names)
    shutil.rmtree(base, ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_scan_conf(spark):
    """Pin the configs a bucketed SERVING cluster runs with: keep
    bucketed scans on even when a query doesn't need the
    distribution (autoBucketedScan would silently fall back to a
    plain scan and lose bucket pruning), and take broadcast off the
    table — at 100 TB neither index side broadcasts, and the claim
    under test is the shuffle-free sort-merge join."""
    keep = {
        "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in keep.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_term_probe_prunes_buckets(spark, tables, bucketed_scan_conf):
    t_term, _, _ = tables
    probe = spark.table(t_term).filter(F.col("term").isin("merge", "stream"))
    plan = _plan(probe)
    assert "SelectedBucketsCount" in plan, plan[:2000]
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan[:2000]
    k, n = int(m.group(1)), int(m.group(2))
    assert n == N_BUCKETS and 0 < k < n
    # pruning must not change results
    want = (
        spark.table(t_term)
        .filter("term = 'merge' OR term = 'stream'")
        .count()
    )
    assert probe.count() == want


def test_rid_join_is_shuffle_free(spark, tables, bucketed_scan_conf):
    _, t_rid, t_stats = tables
    joined = spark.table(t_rid).join(spark.table(t_stats), "rid")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan[:3000]
    assert "SortMergeJoin" in plan, plan[:3000]
    # and it still joins correctly
    n_post = spark.table(t_rid).count()
    assert joined.count() == n_post


def test_unbucketed_join_would_shuffle(spark, sf_dir, tables, bucketed_scan_conf):
    """Control: the same join off the raw (unbucketed) frames DOES
    carry an Exchange — the bucket layout is what removes it."""
    post = bm25.postings(tpch.fields(spark, sf_dir))
    stats = post.groupBy("rid").agg(F.sum("tf").alias("dl"))
    plan = _plan(post.join(stats, "rid"))
    assert "Exchange" in plan


def test_ivf_partitioned_layout_prunes_cells(spark, sf_dir):
    """The persisted IVF index (partitioned by cell) turns the
    nprobe probe into partition pruning: the scan's
    PartitionFilters carry the cell predicate, and serving from the
    read-back layout equals serving from the in-memory
    assignment."""
    from nucliadb_spark.operators import ann

    vectors = tpch.vectors(spark, sf_dir)
    assigned, centroids = ann.build_ivf(vectors, k_cells=8)
    base = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        warehouse.write_ivf_index(assigned, f"{base}/cells")
        ondisk = spark.read.parquet(f"{base}/cells")

        probe = ondisk.filter(F.col("cell").isin(2, 5))
        plan = _plan(probe)
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "cell" in m.group(1), plan[:2000]

        qvec = (
            tpch.table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == 5)
            .select(F.col("embedding").alias("qvec"))
        )
        got = ann.ivf_serve(
            ondisk, centroids, qvec, k=5, nprobe=2, cell_col="cell"
        ).collect()
        want = ann.ivf_serve(
            assigned, centroids, qvec, k=5, nprobe=2, cell_col="cell"
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
    finally:
        shutil.rmtree(base, ignore_errors=True)
