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
