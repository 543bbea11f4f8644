"""Streaming index maintenance: availableNow drain over the documents
table must produce the identical text index a batch build produces
(the reference's at-least-once + seq-guard contract, S1)."""

import tempfile

from pyspark.sql import functions as F

from nucliadb_spark.operators import bm25
from nucliadb_spark.sources import tpch
from nucliadb_spark.streaming import ingest


def test_incremental_ingest_matches_batch(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        ingest.incremental_index_ingest(
            spark,
            docs_path=f"{sf_dir}/documents.parquet",
            index_path=f"{tmp}/index",
            checkpoint_path=f"{tmp}/ckpt",
        )
        streamed = spark.read.parquet(f"{tmp}/index/postings")
        fields = tpch.fields(spark, sf_dir)
        batch = bm25.postings(fields)
        assert streamed.count() == batch.count()
        # value-level: anti-joins empty in both directions
        assert streamed.exceptAll(batch).count() == 0
        assert batch.exceptAll(streamed).count() == 0


def test_stateful_stream_sessionization_matches_batch(spark, sf_dir):
    """applyInPandasWithState full drain == batch window sessionize."""
    streamed = ingest.sessionize_stream(spark, sf_dir)
    batch = ingest.sessionize(tpch.table(spark, sf_dir, "events"))
    s = [tuple(r) for r in streamed.collect()]
    b = [tuple(r) for r in batch.collect()]
    assert s == b


def test_sessionization_gap_rule(spark, sf_dir):
    sessions = ingest.sessionize(tpch.table(spark, sf_dir, "events"))
    row = sessions.agg(
        F.sum("n_events").alias("n"), F.count("*").alias("s")
    ).collect()[0]
    total_events = tpch.table(spark, sf_dir, "events").count()
    assert row.n == total_events  # every event lands in exactly one session
    assert row.s >= 1


def test_facet_counters_stream_equals_batch(spark, sf_dir):
    """The maintained facet counter sidecar must agree with the batch
    faceted aggregation over the live-resolved corpus — per root,
    facet for facet, count for count (stream == batch for the catalog
    plane). The relabel wave must be visible: '/l/type/relabeled'
    carries every live rid%7 resource, and no deleted resource counts
    anywhere."""
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import catalog as cat
    from nucliadb_spark.plans.queries_streaming import (
        _FACET_ROOTS,
        cdc_catalog_facets_served,
    )
    from nucliadb_spark.sources import tpch
    from nucliadb_spark.streaming import ingest

    served = {
        (r.root, r.facet): r.count_
        for r in cdc_catalog_facets_served(spark, sf_dir).collect()
    }
    live = (
        ingest.cdc_label_log(tpch.resources(spark, sf_dir))
        .groupBy("rid")
        .agg(F.max_by(F.struct("op", "labels"), "seq").alias("last"))
        .filter(F.col("last.op") == "upsert")
        .select("rid", F.col("last.labels").alias("labels"))
    )
    batch = {
        (r.root, r.facet): r.count_
        for r in cat.faceted_search(live, roots=_FACET_ROOTS).collect()
    }
    assert served == batch
    relabeled = served.get(("/l/type", "/l/type/relabeled"))
    n_expect = live.filter(
        F.array_contains("labels", "/l/type/relabeled")
    ).count()
    assert relabeled == n_expect and n_expect > 0
