"""On-disk term-bucketed text index (S3 serving shape).

The postings table persists hash-partitioned by `tb = crc32(term) %
64`; a query maps its terms to buckets driver-side, so the scan reads
only |query-term-buckets| directories — the parquet analog of
tantivy's term-dictionary seek (ref: nidx/nidx_text/src/reader.rs
do_search over built segments). Asserts both the pruning (partition
filters in the plan, fewer files touched) and value-parity with the
in-memory index path.
"""

import contextlib
import io
import zlib

import pytest
from pyspark.sql import functions as F

from nucliadb_spark.operators import bm25
from nucliadb_spark.sources import tpch

QUERY = "spark join window"


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("textindex"))
    bm25.build_index(tpch.fields(spark, sf_dir), path)
    return path


def test_term_bucket_twins_agree(spark):
    terms = ["spark", "join", "window", "zeta", "ñandú"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r.term: r.tb
        for r in df.withColumn("tb", bm25.term_bucket("term")).collect()
    }
    for t in terms:
        assert got[t] == zlib.crc32(t.encode("utf-8")) % bm25.TERM_BUCKETS


def test_served_results_match_inmemory(spark, sf_dir, index_path):
    post, stats, _ = bm25.read_index(spark, index_path)
    served = bm25.bm25_search(None, QUERY, top_k=20, post=post, stats=stats)
    inmem = bm25.bm25_search(tpch.fields(spark, sf_dir), QUERY, top_k=20)
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in inmem.collect()
    ]


def test_scan_prunes_to_query_term_buckets(spark, index_path):
    post, stats, _ = bm25.read_index(spark, index_path)
    served = bm25.bm25_search(None, QUERY, top_k=20, post=post, stats=stats)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "tb" in plan.split("PartitionFilters")[1].splitlines()[0]

    # the pruned scan touches only the query terms' bucket dirs
    want = {bm25.term_bucket_py(t) for t in QUERY.split()}
    touched = (
        post.filter(F.col("tb").isin(sorted(want)))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    total = post.select(F.input_file_name().alias("f")).distinct().count()
    assert 0 < len(touched) < total
    assert all(any(f"tb={b}/" in r.f for b in want) for r in touched)
