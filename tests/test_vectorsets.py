"""Vectorset lifecycle (ref: writer/api/v1/vectorsets.py:41-96):
backfill completes a partially-covered vectorset, embedding only the
missing rids."""

from pyspark.sql import functions as F

from nucliadb_spark.operators import vectorsets
from nucliadb_spark.sources import tpch


def test_backfill_completes_and_flags(spark, sf_dir):
    flds = tpch.fields(spark, sf_dir).select("rid", "text")
    partial = vectorsets.partial_vectorset(flds)
    out = vectorsets.backfill_vectorset(flds, partial).cache()
    assert out.count() == flds.count()
    # exactly the uncovered rids are flagged
    flagged = {r.rid for r in out.filter("backfilled").collect()}
    assert flagged == {r.rid for r in flds.filter(F.col("rid") % 3 == 1).collect()}
    # the completed set is uniform: backfilled vectors equal what the
    # model produces for that text
    from nucliadb_spark.functions import models

    expect = flds.select("rid", models.stub_embedding(F.col("text")).alias("v"))
    joined = out.join(expect, "rid")
    assert joined.filter(F.col("vector") != F.col("v")).count() == 0


def test_backfill_embeds_only_missing(spark, sf_dir):
    """The embed UDF must sit under the anti-join (cost ∝ missing
    rows): the optimized plan's python-UDF evaluation reads from a
    LeftAnti join, never the full fields scan."""
    flds = tpch.fields(spark, sf_dir).select("rid", "text")
    out = vectorsets.backfill_vectorset(flds, vectorsets.partial_vectorset(flds))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in plan
