"""Scan-efficiency contracts: when the engine tables are materialized
(the deployment shape — parquet written by the ingest jobs), the
filter DSL's predicates reach the parquet scan (PushedFilters) and
projections prune columns (ReadSchema). On the synthetic adapter the
columns are computed on the fly, so this is asserted on a
materialized copy."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from nucliadb_spark.operators import filters as fx
from nucliadb_spark.sources import tpch


@pytest.fixture(scope="module")
def stored_resources(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stored") / "resources")
    tpch.resources(spark, sf_dir).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_date_and_status_predicates_push_to_scan(stored_resources):
    expr = fx.And(
        [
            fx.DateRange("created", since="1995-06-01 00:00:00"),
            fx.FieldEquals("status", "PROCESSED"),
            fx.NotHidden(),
        ]
    )
    plan = _plan(stored_resources.filter(expr.to_column()).select("rid"))
    assert "GreaterThanOrEqual(created" in plan
    assert "EqualTo(status,PROCESSED)" in plan
    # hidden=false pushes as a boolean filter too
    assert "hidden" in plan.split("PushedFilters")[1].splitlines()[0]


def test_projection_prunes_columns(stored_resources):
    plan = _plan(stored_resources.select("rid", "title"))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "rid" in read_schema and "title" in read_schema
    assert "labels" not in read_schema and "security_groups" not in read_schema


def test_facet_filter_prunes_to_needed_columns(stored_resources):
    # array-exists predicates can't push into parquet, but the scan
    # must still read only (labels, rid) for this query
    plan = _plan(
        stored_resources.filter(fx.Facet("/l/type/economy").to_column()).select("rid")
    )
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "labels" in read_schema
    assert "title" not in read_schema and "slug" not in read_schema


# --- kbid tenant pruning (the single most important scan reduction at
# 100 TB: every query is kbid-scoped, so the engine tables are written
# PARTITIONED BY kbid and a query reads only its tenant's files;
# ref: nidx scopes every search to a shard of one KB,
# nidx/src/searcher/shard_search.rs:94-105) ---------------------------------


@pytest.fixture(scope="module")
def multi_kb_vectors(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kbs") / "vectors")
    base = tpch.vectors(spark, sf_dir)
    three = (
        base.withColumn("kbid", F.lit("kb0"))
        .unionByName(base.withColumn("kbid", F.lit("kb1")))
        .unionByName(base.withColumn("kbid", F.lit("kb2")))
    )
    three.write.mode("overwrite").partitionBy("kbid").parquet(path)
    return path


def _scan_metrics(df) -> list[dict]:
    """Execute and read each FileSourceScan's metrics (numFiles,
    numPartitions, ...) from the executed plan."""
    df.collect()

    scans: dict[int, dict] = {}

    def walk(p):
        name = p.getClass().getSimpleName()
        if "FileSourceScan" in name:
            m = {}
            it = p.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
            scans[p.id()] = m  # dedup re-visits by plan node id
        ch = p.children().iterator()
        while ch.hasNext():
            walk(ch.next())
        if name == "AdaptiveSparkPlanExec":
            walk(p.executedPlan())
        if name.endswith("QueryStageExec"):  # AQE stage wrappers
            walk(p.plan())
        if name == "ReusedExchangeExec":
            walk(p.child())
        it = p.subqueries().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return list(scans.values())


def test_kbid_filter_prunes_partitions(spark, multi_kb_vectors):
    df = spark.read.parquet(multi_kb_vectors).filter(F.col("kbid") == "kb1")
    plan = _plan(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "kbid" in pf and "kb1" in pf, pf
    # the executed scan must read 1 of the 3 tenant partitions
    [m] = _scan_metrics(df)
    assert m["numPartitions"] == 1, m
    [total] = _scan_metrics(spark.read.parquet(multi_kb_vectors))
    assert total["numPartitions"] == 3, total
    assert m["numFiles"] < total["numFiles"], (m, total)


def test_kbid_scoped_knn_reads_one_tenant(spark, sf_dir, multi_kb_vectors):
    from nucliadb_spark.operators import knn

    e = tpch.table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    tenant = spark.read.parquet(multi_kb_vectors).filter(F.col("kbid") == "kb0")
    out = knn.exact_knn(tenant, q, k=5)
    plan = _plan(out)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "kb0" in pf
    partitioned = [m for m in _scan_metrics(out) if "numPartitions" in m]
    assert partitioned and all(m["numPartitions"] == 1 for m in partitioned), partitioned
    assert out.count() == 5


def test_hidden_segment_pruning(spark, sf_dir, tmp_path_factory):
    """The reference skips whole segments tagged hidden
    (nidx/nidx_vector/src/searcher.rs:270-277, tag extraction
    query_planner.rs:359-362). Batch analog: the vectors table is
    PARTITIONED by the hidden flag, so the default hidden=false search
    reads only the visible partition — partition pruning does the
    segment skip."""
    path = str(tmp_path_factory.mktemp("hidden") / "vectors")
    base = tpch.vectors(spark, sf_dir)
    both = base.withColumn("hidden", F.col("rid") % 7 == 0)
    both.write.mode("overwrite").partitionBy("hidden").parquet(path)

    df = spark.read.parquet(path).filter(F.col("hidden") == False)  # noqa: E712
    plan = _plan(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "hidden" in pf, pf
    [m] = _scan_metrics(df)
    assert m["numPartitions"] == 1, m
    [total] = _scan_metrics(spark.read.parquet(path))
    assert total["numPartitions"] == 2, total
