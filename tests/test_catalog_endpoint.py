"""Composite catalog endpoint: results page + facets + total +
next_page (k+1 trick) in one call — ref pg.py:117-172."""

from nucliadb_spark.operators import catalog as cat
from nucliadb_spark.operators import filters as fx
from nucliadb_spark.sources import tpch


def test_catalog_endpoint_shape(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    out = cat.catalog_endpoint(
        r,
        query="widget",
        faceted=["/l/type", "/n/s"],
        filters=fx.NotHidden(),
        page_number=0,
        page_size=5,
    )
    assert len(out["results"]) == 5
    assert out["total"] > 5
    assert out["next_page"] is True
    facet_rows = out["facets"].collect()
    assert {row.root for row in facet_rows} == {"/l/type", "/n/s"}


def test_catalog_endpoint_last_page(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    total = cat.catalog_endpoint(r, query="widget", page_size=5)["total"]
    last = total // 5  # first page index with < 5 remaining (or empty)
    out = cat.catalog_endpoint(r, query="widget", page_number=last, page_size=5)
    assert len(out["results"]) == total - last * 5
    assert out["next_page"] is False


def test_catalog_endpoint_page_offsets_consistent(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    p0 = cat.catalog_endpoint(r, query="widget", page_number=0, page_size=3)
    p1 = cat.catalog_endpoint(r, query="widget", page_number=1, page_size=3)
    ids0 = [row.rid for row in p0["results"]]
    ids1 = [row.rid for row in p1["results"]]
    assert not (set(ids0) & set(ids1))
    # pages concatenate to the top-6 slice
    both = cat.catalog_endpoint(r, query="widget", page_number=0, page_size=6)
    assert ids0 + ids1 == [row.rid for row in both["results"]]
