"""Property-based equivalence of the filter-expression compiler:
random boolean trees over Facet/DateRange/FieldEquals/Keyword/
NotHidden must select the identical row set in Spark and DuckDB
(SURVEY §7.2 — property-test the shared spine against the oracle).
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nucliadb_spark.operators import filters as fx
from nucliadb_spark.sources import tpch

FACETS = [
    "/l/type/economy",
    "/l/brand/Brand#13",
    "/n/s/PROCESSED",
    "/n/s/PENDING",
    "/n/i/text/plain",
    "/l/type",
    "/l/nope",
]
DATES = ["1995-03-01 00:00:00", "1995-09-15 12:00:00", "1996-02-01 00:00:00"]
STATUSES = ["PROCESSED", "PENDING", "ERROR"]
SOURCES = ["WEB", "DESKTOP", "API"]

leaf = st.one_of(
    st.sampled_from(FACETS).map(fx.Facet),
    st.tuples(st.sampled_from(DATES), st.sampled_from([True, False])).map(
        lambda t: fx.DateRange("created", since=t[0] if t[1] else None,
                               until=None if t[1] else t[0])
    ),
    st.sampled_from(STATUSES).map(lambda s: fx.FieldEquals("status", s)),
    st.sampled_from(SOURCES).map(lambda s: fx.FieldEquals("origin_source", s)),
    st.just(fx.NotHidden()),
)

expr = st.recursive(
    leaf,
    lambda children: st.one_of(
        st.lists(children, min_size=2, max_size=3).map(fx.And),
        st.lists(children, min_size=2, max_size=3).map(fx.Or),
        children.map(fx.Not),
    ),
    max_leaves=6,
)


@pytest.fixture(scope="module")
def harness(spark, sf_dir):
    res = tpch.resources(spark, sf_dir).cache()
    res.count()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{sf_dir}/part.parquet')"
    )
    con.execute(f"CREATE TABLE resources AS {tpch.SQL_RESOURCES}")
    return res, con


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e=expr)
def test_filter_tree_equivalence(harness, e):
    res, con = harness
    spark_ids = {r.rid for r in res.filter(e.to_column()).select("rid").collect()}
    duck_ids = {
        row[0]
        for row in con.execute(
            f"SELECT rid FROM resources WHERE {e.to_sql()}"
        ).fetchall()
    }
    assert spark_ids == duck_ids, e.to_sql()
