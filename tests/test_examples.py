"""EXAMPLES.md executes — the documented user-facing snippets run
against the fixture data (doc-rot guard: an API rename breaks this
before it breaks a user)."""

from __future__ import annotations

import pytest


# r15 slow tier: the EXAMPLES.md walkthroughs re-run whole pipelines;
# covered by the operators' own unit/parity tests in the fast tier.
pytestmark = pytest.mark.slow

def test_find_request_example(spark, sf_dir):
    from nucliadb_spark import api
    from nucliadb_spark.operators import filters as fx

    req = api.FindRequest(
        query="spark shuffle partition",
        features=["keyword", "semantic", "graph"],
        top_k=10,
        min_score=0.1,
        filters=fx.Facet("/s/p/en"),
        fusion_weights={"semantic": 2.0},
        reranker="stub",
        entity_sources=["src3"],
    )
    rows = api.find_request(spark, sf_dir, req).collect()
    assert rows and {"id", "score"} <= set(rows[0].asDict())


def test_pipeline_example(spark, sf_dir):
    from nucliadb_spark.operators import dedup, trainset
    from nucliadb_spark.operators.iterative import connected_components
    from nucliadb_spark.sources import tpch

    docs = tpch.table(spark, sf_dir, "documents")
    pairs = dedup.lsh_pairs(dedup.planted_corpus(docs.select("doc_id", "text")))
    clusters = connected_components(pairs)
    keep = clusters.filter("id = cluster_id")
    assert 0 < keep.count() <= clusters.count()

    sample = trainset.stratified_sample(docs, {"en": 50, "de": 40, "zh": 10})
    assert 0 < sample.count() < docs.count()

    tok = trainset.token_classification(tpch.fields(spark, sf_dir))
    assert tok.first()["tags"].count(" ") == tok.first()["tokens"].count(" ")


def test_timeseries_example(spark, sf_dir):
    from nucliadb_spark.operators import timeseries
    from nucliadb_spark.sources import tpch

    events = tpch.table(spark, sf_dir, "events")
    asof = timeseries.asof_join(events, "purchase", "click", tolerance_us=3_600_000_000)
    assert asof.columns == ["event_id", "user_id", "ts", "right_event_id", "gap_us"]
    assert timeseries.rollup_counts(events).count() > 0
    assert timeseries.value_percentiles(events).count() == 5


def test_shards_example(spark, sf_dir, tmp_path):
    from nucliadb_spark.operators import shards
    from nucliadb_spark.sources import tpch

    res = tpch.resources(spark, sf_dir)
    plan = shards.rollover_plan(res.select("rid"), n_old=4, n_new=6)
    assert plan.columns == ["old_shard", "new_shard", "n_resources"]
    sizes = {
        r["shard"]: r["n_resources"]
        for r in shards.shard_sizes(res.select("rid"), 4).collect()
    }
    moves = shards.rebalance_moves(sizes)
    assert isinstance(moves, list)


def test_hygiene_packing_example(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import ann, textstats, trainset
    from nucliadb_spark.sources import tpch

    docs = tpch.table(spark, sf_dir, "documents")
    model = textstats.unigram_model(docs)
    scored = textstats.unigram_logprob(docs, model=model)
    assert scored.columns == ["id", "n_tokens", "avg_neg_logp"]

    funnel = {r["rule"]: r["n_docs"] for r in textstats.quality_funnel(docs).collect()}
    assert "pass_all" in funnel and len(funnel) == 7

    packed = trainset.pack_sequences(
        docs.select("doc_id", "text", "source"), seq_len=2048
    )
    assert packed.filter("n_seqs < 1").count() == 0

    e = tpch.table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    hits = ann.ivf_sq8_search_labeled(e, q, k=10, nprobe=2)
    assert hits.count() == 10


def test_budget_split_pq_example(spark, sf_dir):
    from nucliadb_spark.operators import ann, dedup, trainset
    from nucliadb_spark.sources import tpch

    docs = tpch.table(spark, sf_dir, "documents")
    sel = trainset.token_budget_select(docs, budget=3000)
    assert {"source", "id", "n_tokens", "cum_tokens"} <= set(sel.columns)
    assert sel.count() > 0

    split = trainset.split_assign(docs)
    assert set(r.split for r in split.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }

    spans = dedup.dup_span_stats(dedup.planted_corpus(docs.select("doc_id", "text")))
    assert spans.filter("n_dup_grams > 0").count() > 0  # planted dups detected

    emb = tpch.table(spark, sf_dir, "embeddings")
    step = ann.kmeans_step_labeled(emb, k=4)
    assert step.count() == 4 * 64

    q = emb.filter("vec_id = 0").selectExpr("embedding AS qvec")
    hits = ann.pq_adc_labeled(emb, q, k=10).collect()
    assert len(hits) == 10 and hits[0].id == 0  # self-match survives rerank


def test_quantized_ladder_example(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import ann
    from nucliadb_spark.sources import tpch

    emb = tpch.table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).selectExpr("embedding AS qvec")
    # full-corpus code scans must surface the exact self-match; the
    # nprobe variants are plan/parity demos here because the fixture's
    # `label` cells are not geometric (recall-true probing is gated in
    # tests/test_ann_recall.py over built clusters)
    for fn in (
        lambda: ann.pq_adc_labeled(emb, q, k=5),
        lambda: ann.rabitq_1bit_labeled(emb, q, k=5),
    ):
        hits = fn().collect()
        assert len(hits) == 5 and hits[0].id == 0  # self-match survives


def test_index_maintenance_example(spark, sf_dir):
    from nucliadb_spark.operators import ann, bm25
    from nucliadb_spark.plans.queries_text import _corpus, _text_index
    from nucliadb_spark.sources import tpch

    post, stats = _text_index(spark, sf_dir)
    prune = bm25.prune_vocabulary(post, _corpus(sf_dir, stats))
    assert {"term", "df", "action", "reason"} <= set(prune.columns)

    plan = ann.ivf_cell_maintenance(
        tpch.vectors(spark, sf_dir), split_above=52, merge_below=48
    )
    acts = {r.action for r in plan.collect()}
    assert acts <= {"split", "merge"} and acts


def test_explain_example(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import bm25, fusion, knn
    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab
    from nucliadb_spark.sources import tpch

    post, stats = _text_index(spark, sf_dir)
    exp = bm25.bm25_explain(
        "spark join window", top_k=5,
        post=post, stats=stats, corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    )
    rows = exp.collect()
    assert rows and {"rid", "term", "tf", "df", "contrib_e4"} <= set(rows[0].asDict())

    emb = tpch.table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).selectExpr("embedding AS qvec")
    sem = knn.exact_knn(emb, q, k=10, id_col="vec_id", vec_col="embedding")
    fx = fusion.rrf_explain({"a": sem, "b": sem}, top_k=5).collect()
    # identical sources -> every fused hit explained by both, same rank
    assert len(fx) == 10 and all(r.contrib_e6 > 0 for r in fx)


def test_curation_example(spark, sf_dir):
    from nucliadb_spark.operators import dedup, textstats, trainset
    from nucliadb_spark.operators.iterative import pagerank
    from nucliadb_spark.sources import tpch

    docs = tpch.table(spark, sf_dir, "documents")
    corpus = dedup.planted_corpus(docs.select("doc_id", "text"))
    rw = dedup.remove_dup_spans(corpus)
    assert {"id", "n_tokens", "n_removed", "cleaned_md5"} <= set(rw.columns)

    w = trainset.dsir_weights(docs.select("doc_id", "text", "source"))
    assert w.count() > 0

    b = textstats.perplexity_buckets(docs)
    assert {"head", "middle", "tail"} >= {
        r["ppl_bucket"] for r in b.select("ppl_bucket").distinct().collect()
    }

    top = trainset.bpe_pair_counts(docs.select("text")).first()
    assert top["pair_count"] > 0

    pr = pagerank(tpch.relations(spark, sf_dir), iters=2, top_k=5)
    assert pr.count() == 5


def test_query_understanding_example(spark, sf_dir):
    from nucliadb_spark import api
    from nucliadb_spark.streaming import ingest

    rows = api.find_request(
        spark,
        sf_dir,
        api.FindRequest(
            query="the spark shuffle and the spark partition", rephrase=True
        ),
    ).collect()
    assert rows

    perc = ingest.stream_percolator(spark, sf_dir).collect()
    assert perc and all(r["n_matching_docs"] > 0 for r in perc)


def test_feedback_hydrate_lifecycle_example(spark, sf_dir):
    from nucliadb_spark.operators import feedback, hydrate, multimodal, vectorsets
    from nucliadb_spark.sources import tpch

    log = feedback.feedback_log(tpch.table(spark, sf_dir, "events"))
    log = feedback.send_feedback(
        spark, log, kbid="kb0", user="user-x",
        req=feedback.FeedbackRequest(
            ident="learn-1", good=False, feedback="wrong answer"
        ),
    )
    assert feedback.kb_feedback_report(log).count() > 0

    paras = tpch.paragraphs(spark, sf_dir)
    req = paras.filter("rid % 7 = 3 AND kind = 'TEXT'").select("paragraph_id")
    assert (
        hydrate.hydrate(
            req, paras, tpch.fields(spark, sf_dir), tpch.resources(spark, sf_dir)
        ).count()
        > 0
    )

    media = multimodal.synthesize_real_media(
        tpch.table(spark, sf_dir, "documents")
    )
    assert multimodal.real_decode(media).count() > 0
    assert multimodal.media_features(media).count() > 0

    flds = tpch.fields(spark, sf_dir).select("rid", "text")
    out = vectorsets.backfill_vectorset(flds, vectorsets.partial_vectorset(flds))
    assert out.count() == flds.count()


def test_services_reads_example(spark, sf_dir):
    from nucliadb_spark.operators import catalog as cat, kvschema
    from nucliadb_spark.sources import tpch

    r = tpch.resources(spark, sf_dir)
    ls = cat.labelsets_listing(r).collect()
    assert {x["labelset"] for x in ls} >= {"type", "brand"}

    meta = tpch.table(spark, sf_dir, "events").selectExpr(
        "to_json(named_struct('uid', user_id, 'etype', event_type)) AS meta"
    )
    sch = {x["key"]: x["type"] for x in kvschema.infer_kv_schema(meta, "meta").collect()}
    assert sch == {"uid": "integer", "etype": "text"}

    page = cat.processing_status(r, limit=20, cursor="1995-03-01 00:00:00").collect()
    assert len(page) <= 20
    assert all(x["status"] == "PENDING" for x in page)
    assert [x["position"] for x in page] == list(range(1, len(page) + 1))


def test_multi_field_examples(spark, sf_dir):
    from nucliadb_spark.operators import feedback, hydrate
    from nucliadb_spark.sources import tpch

    paras = tpch.paragraphs_fielded(spark, sf_dir)
    flds = tpch.fields_multi(spark, sf_dir)
    res = tpch.resources(spark, sf_dir)
    req = paras.filter("rid % 11 = 5").select("paragraph_id")
    rows = hydrate.hydrate(req, paras, flds, res, before=2, after=2).collect()
    assert rows and {"prev_text2", "next_text2", "field_key"} <= set(
        rows[0].asDict()
    )
    log = feedback.feedback_log(tpch.table(spark, sf_dir, "events"), tenants=3)
    trend = feedback.feedback_daily_trend(log).collect()
    assert trend and {"day", "good_rate_to_date"} <= set(trend[0].asDict())
