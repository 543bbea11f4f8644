"""Unit tests: planner rules (T7/O3/O6/R3/F8), vector dedup (V4/U3),
vectorset routing (V8), batch scan (S5), advanced parser (T5)."""

import pytest
from pyspark.sql import functions as F

from nucliadb_spark.operators import advanced, exporter, knn
from nucliadb_spark.operators import filters as fx
from nucliadb_spark.plans import planner
from nucliadb_spark.sources import tpch


def test_exact_match_detection():
    assert planner.should_disable_vector_search("")
    assert planner.should_disable_vector_search('  "exact phrase"  ')
    assert not planner.should_disable_vector_search('find "this" too')
    assert not planner.should_disable_vector_search("normal query")


def test_sort_rules():
    assert planner.default_sort("hello") == ("score", False)
    assert planner.default_sort("") == ("created", False)
    assert planner.default_sort("x", endpoint="catalog") == ("created", False)


def test_window_algebra():
    # rank_fusion.window = min(max(requested, top_k), 500)
    assert planner.fusion_window(20, 10) == 20
    assert planner.fusion_window(5, 10) == 10
    assert planner.fusion_window(900, 10) == 500
    # reranker window = min(2*top_k, 200)
    assert planner.reranker_window(10) == 20
    assert planner.reranker_window(150) == 200


def test_single_source_skip():
    assert not planner.fusion_needed({"keyword": 5, "semantic": 0})
    assert planner.fusion_needed({"keyword": 5, "semantic": 1})


def test_old_filters_translation():
    legacy = planner.LegacyFilters(
        filters=["/l/type/economy", ["/n/s/PROCESSED", "/n/s/PENDING"]],
        keyword_filters=["spark"],
        range_creation_start="1995-01-01 00:00:00",
    )
    expr = planner.translate_old_filters(legacy)
    sql = expr.to_sql()
    assert "l/type/economy" in sql and " OR " in sql and "created >=" in sql
    assert planner.translate_old_filters(planner.LegacyFilters()) is None


def test_vector_dedup(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0]), (3, [3.0, 4.0])],
        "rid long, vector array<float>",
    )
    out = knn.dedup_vectors(df).orderBy("rid").collect()
    assert [r.rid for r in out] == [1, 3]  # min id survives


def test_vectorset_routing(spark, sf_dir):
    vs = {"default": "embeddings"}
    df = knn.pick_vectorset(spark, sf_dir, vs, "default", expect_dim=64)
    assert df.count() > 0
    with pytest.raises(KeyError):
        knn.pick_vectorset(spark, sf_dir, vs, "missing", 64)
    with pytest.raises(ValueError):
        knn.pick_vectorset(spark, sf_dir, vs, "default", expect_dim=128)


def test_scan_batches(spark, sf_dir):
    docs = tpch.table(spark, sf_dir, "documents")
    total = docs.count()
    batches = list(exporter.scan_batches(docs.select("doc_id"), batch_size=64))
    assert sum(len(b) for b in batches) == total
    assert all(len(b) <= 64 for b in batches)


def test_advanced_parser_units():
    e = advanced.parse_advanced('+a -b "c d" e f')
    sql = e.to_sql()
    assert sql.count("list_contains") >= 4 and "NOT" in sql and "c d" in sql
    with pytest.raises(ValueError):
        advanced.parse_advanced("   ")
    # lone operators degrade to should-terms, not crashes
    assert isinstance(advanced.parse_advanced("x"), fx.Keyword)


def test_advanced_parser_fielded_units():
    # field-scoped term lands on the named column as a hard predicate
    e = advanced.parse_advanced("language:en")
    assert isinstance(e, fx.Keyword) and e.column == "language"
    # signs compose with field scoping
    e = advanced.parse_advanced("-source:src3 x")
    assert "NOT" in e.to_sql() and "source" in e.to_sql()
    # inclusive numeric range
    r = advanced.parse_advanced("n_chars:[500 TO 900]")
    assert isinstance(r, advanced.TermRange)
    assert "CAST(n_chars AS DOUBLE) >= 500.0" in r.to_sql()
    assert "<= 900.0" in r.to_sql()
    # exclusive + open-ended bounds
    r = advanced.parse_advanced("n_chars:{500 TO *}")
    sql = r.to_sql()
    assert "> 500.0" in sql and "<=" not in sql
    # date-typed bounds compare as timestamps
    r = advanced.parse_advanced("created:[2024-01-05 TO 2024-03-01]")
    assert "TIMESTAMP '2024-01-05'" in r.to_sql()
    # field-scoped phrase
    p = advanced.parse_advanced('title:"a b"')
    assert isinstance(p, advanced.Phrase) and p.column == "title"
    # a bare range with no field is skipped leniently, not fatal
    e = advanced.parse_advanced("[1 TO 2] x")
    assert isinstance(e, fx.Keyword)


def test_rabitq_rerank_budget():
    # ref: nidx_vector/src/vector_types/rabitq.rs:30-36 — 100·k cap 2000
    assert knn.rabitq_rerank_budget(10) == 1000
    assert knn.rabitq_rerank_budget(50) == 2000
    assert knn.rabitq_rerank_budget(1) == 100


def test_semantic_min_score_default():
    from nucliadb_spark.plans.planner import semantic_min_score

    assert semantic_min_score(None) == 0.7  # parsers/common.py:38 fallback
    assert semantic_min_score(0.25) == 0.25  # model-supplied wins
    assert semantic_min_score(0.0) == 0.0  # explicit zero is NOT "missing"


def test_prefilter_mode_fast_paths():
    from nucliadb_spark.plans.planner import prefilter_mode

    assert prefilter_mode(0, 500) == "none"
    assert prefilter_mode(500, 500) == "all"
    assert prefilter_mode(501, 500) == "all"  # defensive clamp
    assert prefilter_mode(1, 500) == "some"


def test_find_empty_prefilter_returns_empty(spark, sf_dir):
    """PrefilterResult::None semantics: a prefilter matching nothing
    yields an empty result with the find() output schema.

    r14 optimization: the old implementation COUNTED the filtered
    corpus on every prefiltered request to short-circuit this case
    into a local empty relation — a blocking extra scan per request
    to optimize a degenerate input the normal plan answers
    identically (guide §5). The fast path is gone; this test now pins
    the VALUE contract, not the plan shape."""
    from nucliadb_spark.operators import filters as fx
    from nucliadb_spark.operators.find import find

    out = find(spark, sf_dir, "spark join", prefilter=fx.Facet("/l/nonexistent"))
    assert out.count() == 0
    assert out.columns == [
        "id", "score", "matched_sources", "language", "source", "snippet"
    ]


def test_find_all_matching_prefilter_serves_unfiltered(spark, sf_dir):
    """All fast detection: a prefilter every doc matches must produce
    the same rows as no prefilter (and take the served-index path
    rather than building a per-query semijoin of every rid)."""
    from nucliadb_spark.operators import filters as fx
    from nucliadb_spark.operators.find import find

    always = fx.Or([fx.Facet("/n/s/PROCESSED"), fx.Not(fx.Facet("/n/s/PROCESSED"))])
    a = [tuple(r) for r in find(spark, sf_dir, "spark join", prefilter=always).collect()]
    b = [tuple(r) for r in find(spark, sf_dir, "spark join").collect()]
    assert a == b
