"""Registry entries for the remaining HTTP API surfaces: /retrieve
(score-history text-block search), /augment (hydration-by-id), and
/summarize (field-text gather + summary stub).

refs: nucliadb/src/nucliadb/search/api/v1/retrieve.py, augment.py,
summarize.py.
"""

from __future__ import annotations

from nucliadb_spark.operators import augment, feedback, find, summarize
from nucliadb_spark.registry import register
from nucliadb_spark.sources import tpch

# --- /retrieve: fused matches with per-index score history -----------------


@register(
    "retrieve_scores",
    find.retrieve_sql(
        "hash join spill",
        query_vec_id=2,
        entity_sources=["src5"],
        top_k=12,
        window=40,
    ),
)
def retrieve_scores(spark, sf_dir):
    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    post, stats = _text_index(spark, sf_dir)
    return find.retrieve(
        spark,
        sf_dir,
        "hash join spill",
        query_vec_id=2,
        entity_sources=["src5"],
        top_k=12,
        window=40,
        post=post,
        stats=stats,
        corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    )


# --- /augment: explicit-id hydration ---------------------------------------

_AUG_RIDS = [1, 2, 3, 17, 31, 51]
_AUG_PROPS = ["title", "slug", "classification_labels", "origin", "ner"]
# paragraph ids valid at every shipped sf (docs with n_chars >= 241)
_AUG_PIDS = ["2/0-240", "8/0-240", "11/0-240", "12/0-240", "13/0-240"]


@register(
    "augment_resources",
    augment.augment_resources_sql(
        tpch.SQL_RESOURCES, tpch.SQL_RELATIONS, _AUG_RIDS, _AUG_PROPS
    ),
)
def augment_resources(spark, sf_dir):
    return augment.augment_resources(
        tpch.resources(spark, sf_dir),
        tpch.relations(spark, sf_dir),
        _AUG_RIDS,
        _AUG_PROPS,
    )


@register(
    "augment_paragraphs",
    augment.augment_paragraphs_by_id_sql(
        tpch.SQL_PARAGRAPHS, tpch.SQL_RESOURCES, _AUG_PIDS
    ),
)
def augment_paragraphs(spark, sf_dir):
    return augment.augment_paragraphs_by_id(
        tpch.paragraphs(spark, sf_dir),
        tpch.resources(spark, sf_dir),
        _AUG_PIDS,
    )


# --- /summarize: per-field extractive summary stub -------------------------

_SUM_RIDS = [2, 8, 11, 12, 13, 17]


@register(
    "summarize_stub",
    summarize.summarize_fields_sql(tpch.SQL_FIELDS, _SUM_RIDS, kind="simple"),
)
def summarize_stub(spark, sf_dir):
    return summarize.summarize_fields(
        tpch.fields(spark, sf_dir), _SUM_RIDS, kind="simple"
    )


# --- legacy /search: separate per-index result sets in ONE response --------
# ref: nucliadb/src/nucliadb/search/api/v1/search.py +
# nucliadb_models/search.py:289-296 KnowledgeboxSearchResults
# (sentences = vector index, paragraphs = paragraph index,
# fulltext = document index — each its own ranked list, NOT fused).

_LS_Q = "window shuffle"
_LS_VEC = 3


def _legacy_search_sql() -> str:
    from nucliadb_spark.operators import bm25, knn

    para = (
        "SELECT 'paragraphs' AS result_type, rid AS id, score FROM ("
        + bm25.bm25_sql(
            f"SELECT paragraph_id AS rid, text FROM ({tpch.SQL_PARAGRAPHS}) pp",
            _LS_Q,
            top_k=10,
        )
        + ")"
    )
    full = (
        "SELECT 'fulltext' AS result_type, CAST(rid AS VARCHAR) AS id, score FROM ("
        + bm25.bm25_sql(tpch.SQL_FIELDS, _LS_Q, top_k=10)
        + ")"
    )
    sent = (
        "SELECT 'sentences' AS result_type, CAST(id AS VARCHAR) AS id, score FROM ("
        + knn.exact_knn_sql(
            tpch.SQL_VECTORS,
            f"SELECT embedding AS qvec FROM embeddings WHERE vec_id = {_LS_VEC}",
            64,
            k=10,
        )
        + ")"
    )
    return (
        f"{para}\nUNION ALL\n{full}\nUNION ALL\n{sent}\n"
        "ORDER BY result_type, score DESC, id"
    )


@register("legacy_search", _legacy_search_sql())
def legacy_search(spark, sf_dir):
    """Legacy /search: each index's top-10 as its own result set,
    distinguished by result_type (the response sections of
    KnowledgeboxSearchResults) — union of three independent
    TakeOrdered DAGs, no fusion."""
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import bm25, knn
    from nucliadb_spark.plans.queries_text import (
        _corpus,
        _paragraph_index,
        _text_index,
        _vocab,
    )
    from nucliadb_spark.plans.queries_vector import _query_df, _vectors

    ppost, pstats, pcorpus = _paragraph_index(spark, sf_dir)
    para = bm25.bm25_search(
        None, _LS_Q, top_k=10, post=ppost, stats=pstats, corpus=pcorpus
    ).select(
        F.lit("paragraphs").alias("result_type"),
        F.col("rid").cast("string").alias("id"),
        "score",
    )
    post, stats = _text_index(spark, sf_dir)
    full = bm25.bm25_search(
        None, _LS_Q, top_k=10, post=post, stats=stats,
        corpus=_corpus(sf_dir, stats), vocab=_vocab(sf_dir, post),
    ).select(
        F.lit("fulltext").alias("result_type"),
        F.col("rid").cast("string").alias("id"),
        "score",
    )
    qv = (
        tpch.table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == _LS_VEC)
        .select(F.col("embedding").alias("qvec"))
    )
    sent = knn.exact_knn(tpch.vectors(spark, sf_dir), qv, k=10).select(
        F.lit("sentences").alias("result_type"),
        F.col("id").cast("string").alias("id"),
        "score",
    )
    return (
        para.unionByName(full)
        .unionByName(sent)
        .orderBy("result_type", F.col("score").desc(), "id")
    )


# --- label alias translation (planner rule) --------------------------------
# ref: nucliadb_models/labels.py:39-67 — the Spark side filters with
# the ALIAS path; the oracle is hand-written against the SYSTEM path,
# proving the translation (not just internal consistency).


@register(
    "catalog_filter_alias",
    f"""
WITH resources AS ({tpch.SQL_RESOURCES})
SELECT status, COUNT(*) AS n
FROM resources
WHERE len(list_filter(labels,
      l -> l = '/n/s/PROCESSED' OR starts_with(l, '/n/s/PROCESSED/'))) > 0
GROUP BY status ORDER BY status
""",
)
def catalog_filter_alias(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark.operators.filters import Facet

    res = tpch.resources(spark, sf_dir)
    return (
        res.filter(Facet("/metadata.status/PROCESSED").to_column())
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("status")
    )


# --- RELATIONS feature: detected entities feed the graph leg ---------------
# ref: fetcher.py:238-257 get_detected_entities (Predict NER) +
# find's relations source: entity entry points → triples with
# paragraph provenance → text blocks at score 1.0, fused via RRF.

_REL_Q = "spark shuffle partition part:3 part:17"


def _relations_feature_sql() -> str:
    from nucliadb_spark.functions.models import detect_entity_values_py
    from nucliadb_spark.operators import bm25, fusion

    ents = detect_entity_values_py(_REL_Q)
    lst = ", ".join(f"'{e}'" for e in ents)
    kw = (
        "SELECT rid AS id, score FROM ("
        + bm25.bm25_sql(tpch.SQL_FIELDS, "spark shuffle partition", top_k=50)
        + ")"
    )
    graph = f"""
SELECT DISTINCT CAST(string_split(r.paragraph_id, '/')[1] AS BIGINT) AS id,
       1.0::DOUBLE AS score
FROM ({tpch.SQL_RELATIONS}) r
WHERE (r.source_value IN ({lst}) OR r.target_value IN ({lst}))
  AND r.paragraph_id IS NOT NULL
"""
    rrf = fusion.rrf_sql({"keyword": kw, "graph": graph}, top_k=10)
    return (
        "SELECT id, score, array_to_string(matched_sources, ',') AS matched_sources "
        f"FROM ({rrf})"
    )


@register("find_relations_feature", _relations_feature_sql())
def find_relations_feature(spark, sf_dir):
    """find() with the RELATIONS feature: NER-detected entity nodes
    become graph entry points; their provenance paragraphs join the
    fusion at constant score 1.0 (ref retrieval.py graph source +
    fetcher.py detected entities)."""
    from pyspark.sql import functions as F

    from nucliadb_spark.cache import cached_df
    from nucliadb_spark.functions.models import detect_entity_values_py
    from nucliadb_spark.operators import bm25, fusion
    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    ents = detect_entity_values_py(_REL_Q)
    post, stats = _text_index(spark, sf_dir)
    keyword = bm25.bm25_search(
        None, "spark shuffle partition", top_k=50,
        post=post, stats=stats, corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    ).select(F.col("rid").alias("id"), "score")

    rel = tpch.relations_index(spark, sf_dir)
    graph = (
        rel.filter(
            (F.col("source_value").isin(ents) | F.col("target_value").isin(ents))
            & F.col("paragraph_id").isNotNull()
        )
        .select(
            F.split("paragraph_id", "/").getItem(0).cast("long").alias("id"),
            F.lit(1.0).alias("score"),
        )
        .distinct()
    )
    fused = fusion.rrf({"keyword": keyword, "graph": graph}, top_k=10)
    return fused.select(
        "id", "score", F.array_join("matched_sources", ",").alias("matched_sources")
    )


# --- /ask retrieval + citations phase --------------------------------------
# ref: nucliadb/src/nucliadb/search/search/chat/ask.py:146-400 — the
# endpoint runs find(), builds context, streams an LLM answer with
# citations. The LLM call is the out-of-engine boundary (like
# /summarize); the deterministic phase graded here is the ranked
# citation set with hydrated snippets, answer = the top citation's
# snippet (the same extractive stub convention as summarize_stub).


def _ask_sql() -> str:
    inner = find.find_sql(
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=5,
        window=50,
    )
    return f"""
SELECT row_number() OVER (ORDER BY score DESC, id ASC) AS rank,
       id, score, snippet,
       row_number() OVER (ORDER BY score DESC, id ASC) = 1 AS is_answer
FROM ({inner})
ORDER BY rank
"""


@register("ask_stub", _ask_sql())
def ask_stub(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    post, stats = _text_index(spark, sf_dir)
    hits = find.find(
        spark,
        sf_dir,
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=5,
        window=50,
        post=post,
        stats=stats,
        corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .select("rank", "id", "score", "snippet", (F.col("rank") == 1).alias("is_answer"))
        .orderBy("rank")
    )


# --- F8: legacy filters translation, oracle-graded --------------------------
# ref: search/search/query.py old-style `filters=[...]` +
# range_creation_*; the oracle predicate is HAND-WRITTEN against the
# translated system semantics, so a translation bug hash-fails.


@register(
    "old_filters_translation",
    f"""
WITH resources AS ({tpch.SQL_RESOURCES})
SELECT status, COUNT(*) AS n
FROM resources
WHERE (len(list_filter(labels, l -> l = '/l/brand/Brand#11' OR starts_with(l, '/l/brand/Brand#11/'))) > 0
       OR len(list_filter(labels, l -> l = '/l/brand/Brand#22' OR starts_with(l, '/l/brand/Brand#22/'))) > 0)
  AND created >= TIMESTAMP '1995-06-01 00:00:00'
GROUP BY status ORDER BY status
""",
)
def old_filters_translation(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark.plans.planner import LegacyFilters, translate_old_filters

    legacy = LegacyFilters(
        filters=[["/l/brand/Brand#11", "/l/brand/Brand#22"]],
        range_creation_start="1995-06-01 00:00:00",
    )
    expr = translate_old_filters(legacy)
    return (
        tpch.resources(spark, sf_dir)
        .filter(expr.to_column())
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("status")
    )


# --- V4: vector dedup in the serving path, oracle-graded --------------------
# planted exact-duplicate vectors must collapse to the min-id
# survivor before top-k (ref nidx_vector/src/searcher.rs:150-199).

_DD_VEC_SQL = f"""
SELECT rid, vector FROM (
  SELECT rid, vector,
         ROW_NUMBER() OVER (PARTITION BY vector ORDER BY rid) AS rn
  FROM (
    SELECT rid, vector FROM ({tpch.SQL_VECTORS})
    UNION ALL
    SELECT rid + 100000 AS rid, vector FROM ({tpch.SQL_VECTORS}) WHERE rid % 10 = 0
  )
) WHERE rn = 1
"""


@register(
    "knn_dedup",
    __import__("nucliadb_spark.operators.knn", fromlist=["x"]).exact_knn_sql(
        _DD_VEC_SQL,
        "SELECT embedding AS qvec FROM embeddings WHERE vec_id = 5",
        64,
        k=10,
    ),
)
def knn_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import knn

    v = tpch.vectors(spark, sf_dir).select("rid", "vector")
    planted = v.filter(F.col("rid") % 10 == 0).select(
        (F.col("rid") + 100000).alias("rid"), "vector"
    )
    corpus = v.unionByName(planted)
    dd = knn.dedup_vectors(corpus)
    qvec = (
        tpch.table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 5)
        .select(F.col("embedding").alias("qvec"))
    )
    return knn.exact_knn(dd, qvec, k=10)


# --- R3 oracle-graded: single-source request skips fusion ------------------
# ref: search/search/rank_fusion.py — one retriever means no RRF; the
# scores must be the retriever's OWN (an accidental RRF pass would
# rescale every score and hash-mismatch against the raw-BM25 oracle).


@register(
    "find_single_source",
    """
SELECT rid AS id, score, 'keyword' AS matched_sources FROM ("""
    + __import__("nucliadb_spark.operators.bm25", fromlist=["x"]).bm25_sql(
        tpch.SQL_FIELDS, "window agg stream", top_k=10
    )
    + ") ORDER BY score DESC, id ASC",
)
def find_single_source(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark import api

    req = api.FindRequest(
        query="window agg stream", features=["keyword"], top_k=10
    )
    return api.find_request(spark, sf_dir, req).select(
        "id", "score", F.array_join("matched_sources", ",").alias("matched_sources")
    )


# --- prequeries RAG strategy, oracle-graded --------------------------------
# ref: nucliadb_models/search.py PreQueriesStrategy — preliminary
# retrievals run independently; a final weighted RRF fuses the main
# result with every prequery result. Keyword-only retrievers keep the
# oracle exact: each source is a raw-BM25 list, the fusion is rrf_sql.

_PREQ_MAIN = "window agg stream"
_PREQ = [("vector index probe", 2.0), ("shard merge compaction", 0.5)]


def _preq_oracle() -> str:
    from nucliadb_spark.operators import bm25, fusion

    sources = {
        "main": "SELECT rid AS id, score FROM ("
        + bm25.bm25_sql(tpch.SQL_FIELDS, _PREQ_MAIN, top_k=10)
        + ")"
    }
    weights = {"main": 1.0}
    for i, (q, w) in enumerate(_PREQ):
        sources[f"pre_{i}"] = (
            "SELECT rid AS id, score FROM ("
            + bm25.bm25_sql(tpch.SQL_FIELDS, q, top_k=10)
            + ")"
        )
        weights[f"pre_{i}"] = w
    inner = fusion.rrf_sql(sources, weights=weights, top_k=10)
    return (
        "SELECT id, score, array_to_string(matched_sources, ',') AS matched_sources "
        f"FROM ({inner})"
    )


@register("find_prequeries", _preq_oracle())
def find_prequeries(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark import api

    req = api.FindRequest(
        query=_PREQ_MAIN,
        features=["keyword"],
        top_k=10,
        prequeries=[
            (api.FindRequest(query=q, features=["keyword"], top_k=10), w)
            for q, w in _PREQ
        ],
    )
    return api.find_request(spark, sf_dir, req).select(
        "id", "score", F.array_join("matched_sources", ",").alias("matched_sources")
    )


# --- T7 oracle-graded: quoted exact-match query disables the semantic leg --
# ref: query parser exact-match detection — a fully-quoted query
# skips vector search; the remaining single retriever returns RAW
# BM25 scores (if T7 regressed, the semantic leg would join the
# fusion and every score would become an RRF value → hash mismatch).


@register(
    "find_exact_match_query",
    """
SELECT rid AS id, score, 'keyword' AS matched_sources FROM ("""
    + __import__("nucliadb_spark.operators.bm25", fromlist=["x"]).bm25_sql(
        tpch.SQL_FIELDS, "window agg stream", top_k=10
    )
    + ") ORDER BY score DESC, id ASC",
)
def find_exact_match_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark import api

    req = api.FindRequest(
        query='"window agg stream"',
        features=["keyword", "semantic"],  # semantic dropped by T7
        top_k=10,
    )
    return api.find_request(spark, sf_dir, req).select(
        "id", "score", F.array_join("matched_sources", ",").alias("matched_sources")
    )


# --- autofilter: detected entities become filters ---------------------------
# ref: /find's autofilter=true (search/search/query.py autofilters +
# fetcher.py:238-257): entities NER-detects in the query text are
# APPLIED as resource filters (not just an extra retriever leg), and
# the response reports which filters were auto-applied.


def _autofilter_sql() -> str:
    from nucliadb_spark.functions.models import detect_entity_values_py
    from nucliadb_spark.operators import bm25

    ents = detect_entity_values_py(_REL_Q)
    lst = ", ".join(f"'{e}'" for e in ents)
    applied = ",".join(sorted(ents))
    allowed = f"""
SELECT DISTINCT CAST(string_split(r.paragraph_id, '/')[1] AS BIGINT) AS rid
FROM ({tpch.SQL_RELATIONS}) r
WHERE (r.source_value IN ({lst}) OR r.target_value IN ({lst}))
  AND r.paragraph_id IS NOT NULL
"""
    kw = bm25.bm25_sql(
        tpch.SQL_FIELDS,
        "spark shuffle partition",
        top_k=10,
        served_where=f"rid IN ({allowed})",
    )
    return f"""
SELECT rid AS id, score, '{applied}' AS autofilters FROM ({kw})
"""


@register("find_autofilter", _autofilter_sql())
def find_autofilter(spark, sf_dir):
    """find() with autofilter=true: NER-detected query entities are
    applied as a resource prefilter on the keyword leg (broadcast
    semi-join of the allowed rid set — the same scan shape as the
    security prefilter), and the applied set is echoed back in
    `autofilters`."""
    from pyspark.sql import functions as F

    from nucliadb_spark.cache import cached_df
    from nucliadb_spark.functions.models import detect_entity_values_py
    from nucliadb_spark.operators import bm25
    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    ents = detect_entity_values_py(_REL_Q)
    post, stats = _text_index(spark, sf_dir)
    rel = tpch.relations_index(spark, sf_dir)
    allowed = (
        rel.filter(
            (F.col("source_value").isin(ents) | F.col("target_value").isin(ents))
            & F.col("paragraph_id").isNotNull()
        )
        .select(F.split("paragraph_id", "/").getItem(0).cast("long").alias("rid"))
        .distinct()
    )
    keyword = bm25.bm25_search(
        None, "spark shuffle partition", top_k=10,
        post=post, stats=stats, corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post), allowed=allowed,
    )
    return keyword.select(
        F.col("rid").alias("id"),
        "score",
        F.lit(",".join(sorted(ents))).alias("autofilters"),
    )


@register("kb_feedback_report", feedback.KB_FEEDBACK_REPORT_SQL)
def kb_feedback_report(spark, sf_dir):
    """`/kb/{kbid}/feedback` endpoint analog (search/api/v1/
    feedback.py:34-70): the audit-append surface accumulated as an
    append-only log (derived deterministically from `events`), read
    back as the per-(kbid, task) quality report — volume, thumbs-up
    rate, commented share, distinct flagged text blocks. One
    kbid-keyed aggregation."""
    return feedback.kb_feedback_report(
        feedback.feedback_log(tpch.table(spark, sf_dir, "events"))
    )


def _hydrate_oracle() -> str:
    from nucliadb_spark.operators import hydrate as H

    req = (
        f"SELECT paragraph_id FROM ({tpch.SQL_PARAGRAPHS})"
        " WHERE rid % 7 = 3 AND kind = 'TEXT'"
    )
    return H.hydrate_sql(
        req, tpch.SQL_PARAGRAPHS, tpch.SQL_FIELDS, tpch.SQL_RESOURCES
    )


@register("hydrate_paragraphs", _hydrate_oracle())
def hydrate_paragraphs(spark, sf_dir):
    """`/kb/{kbid}/hydrate` endpoint (search/api/v1/hydrate.py:56-74):
    an explicit ParagraphId list hydrated into the three-level payload
    — paragraph text + ±1 neighbour windows
    (ParagraphHydration.related.neighbours), field key/type/language,
    resource slug/title/origin/security. The request's rid set
    semijoins (= partition-prunes) every table before the neighbour
    window runs."""
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import hydrate as H

    paras = tpch.paragraphs(spark, sf_dir)
    req = paras.filter((F.col("rid") % 7 == 3) & (F.col("kind") == "TEXT")).select(
        "paragraph_id"
    )
    return H.hydrate(
        req, paras, tpch.fields(spark, sf_dir), tpch.resources(spark, sf_dir)
    )


def _hydrate_multi_field_oracle() -> str:
    from nucliadb_spark.operators import hydrate as H

    req = f"SELECT paragraph_id FROM ({tpch.SQL_PARAGRAPHS_FIELDED}) WHERE rid % 11 = 5"
    return H.hydrate_sql(
        req, tpch.SQL_PARAGRAPHS_FIELDED, tpch.SQL_FIELDS_MULTI, tpch.SQL_RESOURCES
    )


@register("hydrate_multi_field", _hydrate_multi_field_oracle())
def hydrate_multi_field(spark, sf_dir):
    """/hydrate over the MULTI-FIELD corpus: resources carry two
    fields ('/t/body' + the '/a/title' generic field,
    resources.proto:39-48) and paragraph ids carry the reference's
    full 3-segment shape `rid/field/start-end`
    (nidx_paragraph/src/schema.rs). Hydration attaches the OWNING
    field via the (rid, field_id) join parsed from the id
    (nucliadb_models/hydration.py:203-290) — exactly one output row
    per requested paragraph, never a row per (paragraph × field);
    neighbour windows stay inside the owning field's sequence, so a
    title paragraph never leaks in as a body neighbour."""
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import hydrate as H

    paras = tpch.paragraphs_fielded(spark, sf_dir)
    req = paras.filter(F.col("rid") % 11 == 5).select("paragraph_id")
    return H.hydrate(
        req, paras, tpch.fields_multi(spark, sf_dir), tpch.resources(spark, sf_dir)
    )


def _hydrate_depth2_oracle() -> str:
    from nucliadb_spark.operators import hydrate as H

    req = (
        f"SELECT paragraph_id FROM ({tpch.SQL_PARAGRAPHS})"
        " WHERE rid % 13 = 4 AND kind = 'TEXT'"
    )
    return H.hydrate_sql(
        req,
        tpch.SQL_PARAGRAPHS,
        tpch.SQL_FIELDS,
        tpch.SQL_RESOURCES,
        before=2,
        after=2,
    )


@register("hydrate_neighbours_depth2", _hydrate_depth2_oracle())
def hydrate_neighbours_depth2(spark, sf_dir):
    """/hydrate with neighbour depth 2
    (ParagraphHydration.related.neighbours.before/after = 2,
    nucliadb_models/hydration.py:203-290): a stack of lag/lead
    offsets over the owning field's paragraph sequence — still ONE
    window shuffle regardless of depth, never a self-join per
    neighbour."""
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import hydrate as H

    paras = tpch.paragraphs(spark, sf_dir)
    req = paras.filter((F.col("rid") % 13 == 4) & (F.col("kind") == "TEXT")).select(
        "paragraph_id"
    )
    return H.hydrate(
        req,
        paras,
        tpch.fields(spark, sf_dir),
        tpch.resources(spark, sf_dir),
        before=2,
        after=2,
    )


RESOURCE_GET_SQL = f"""
WITH r AS ({tpch.SQL_RESOURCES}),
f AS ({tpch.SQL_FIELDS_MULTI}),
p AS ({tpch.SQL_PARAGRAPHS_FIELDED})
SELECT r.rid, r.slug, r.title, r.status, r.hidden,
       CAST(r.created AS VARCHAR) AS created,
       CAST(r.modified AS VARCHAR) AS modified,
       r.origin_source, r.security_public,
       array_to_string(r.labels, ',') AS labels,
       (SELECT array_to_string(list_sort(list(field_key)), ',')
        FROM f WHERE f.rid = r.rid) AS field_keys,
       (SELECT COUNT(*) FROM f WHERE f.rid = r.rid) AS n_fields,
       (SELECT COUNT(*) FROM p WHERE p.rid = r.rid) AS n_paragraphs
FROM r WHERE r.slug = 'part-42'
"""


@register("resource_get", RESOURCE_GET_SQL)
def resource_get(spark, sf_dir):
    """GET `/kb/{kbid}/slug/{slug}` — the reader's single-resource
    serialization (reader/api/v1/resource.py:230-260 by_slug, show =
    BASIC + ORIGIN + VALUES summary): the resource's basic/origin
    props plus its field inventory and paragraph count. The slug
    lookup is a pushed equality predicate — at 100 TB this is one
    partition-pruned point read, and the field/paragraph summaries
    are broadcast-pruned aggregations over the single rid."""
    from pyspark.sql import functions as F

    r = tpch.resources(spark, sf_dir).filter(F.col("slug") == "part-42")
    f = (
        tpch.fields_multi(spark, sf_dir)
        .groupBy("rid")
        .agg(
            F.array_join(F.array_sort(F.collect_list("field_key")), ",").alias(
                "field_keys"
            ),
            F.count("*").alias("n_fields"),
        )
    )
    p = tpch.paragraphs_fielded(spark, sf_dir).groupBy("rid").agg(
        F.count("*").alias("n_paragraphs")
    )
    return (
        r.join(f, "rid", "left")
        .join(p, "rid", "left")
        .select(
            "rid",
            "slug",
            "title",
            "status",
            "hidden",
            F.col("created").cast("string").alias("created"),
            F.col("modified").cast("string").alias("modified"),
            "origin_source",
            "security_public",
            F.array_join("labels", ",").alias("labels"),
            "field_keys",
            "n_fields",
            "n_paragraphs",
        )
    )


RESOURCES_LIST_SQL = f"""
WITH r AS ({tpch.SQL_RESOURCES})
SELECT rid, slug, title, status,
       CAST(created AS VARCHAR) AS created
FROM r
WHERE NOT hidden
ORDER BY rid
LIMIT 20 OFFSET 40
"""


@register("resources_list", RESOURCES_LIST_SQL)
def resources_list(spark, sf_dir):
    """GET `/kb/{kbid}/resources` — the reader's paged resource
    listing (reader/api/v1/resource.py:112-190: page/size over the
    KB's resource ids, BASIC props, hidden excluded). Page 3 at
    size 20. The offset page is cut with a global TakeOrdered over
    (rid) — at 100 TB a keyset cursor (search_after, O5) replaces
    deep offsets; this is the small-offset endpoint shape."""
    from pyspark.sql import functions as F

    r = tpch.resources(spark, sf_dir).filter(~F.col("hidden"))
    return (
        r.select(
            "rid",
            "slug",
            "title",
            "status",
            F.col("created").cast("string").alias("created"),
        )
        .orderBy("rid")
        .offset(40)
        .limit(20)
    )


RESOURCES_LIST_AFTER_SQL = f"""
WITH r AS (SELECT * FROM ({tpch.SQL_RESOURCES}) WHERE NOT hidden),
page1 AS (
  SELECT created, rid FROM r ORDER BY created DESC, rid ASC LIMIT 20
),
cur AS (
  SELECT created AS c_created, rid AS c_rid
  FROM page1 ORDER BY created ASC, rid DESC LIMIT 1
)
SELECT r.rid, r.slug, r.title, r.status,
       CAST(r.created AS VARCHAR) AS created
FROM r, cur
WHERE r.created < c_created OR (r.created = c_created AND r.rid > c_rid)
ORDER BY r.created DESC, r.rid ASC
LIMIT 20
"""


@register("resources_list_after", RESOURCES_LIST_AFTER_SQL)
def resources_list_after(spark, sf_dir):
    """The reader listing paginated by KEYSET instead of offset:
    page 2 of `/kb/{kbid}/resources` sorted by (created DESC, rid
    ASC), cursored on page 1's last row — the O5 search_after shape
    (nodereader.proto:382-386 tiebreak cursor) applied to the
    listing endpoint. This is the page-N plan you'd actually run at
    100 TB: every page is a filtered top-k whose cost is independent
    of page depth, where the offset variant's TakeOrdered must
    surface offset+size rows. With a client-provided literal cursor
    the predicate pushes into the parquet scan (suggest.search_after,
    O5); here the cursor derives from page 1 IN-plan, so it reaches
    the listing scan as a broadcast 1-row join instead. Both page
    cuts are ordered limits, so the doubly-referenced listing frame
    stays deterministic."""
    from pyspark.sql import functions as F

    r = (
        tpch.resources(spark, sf_dir)
        .filter(~F.col("hidden"))
        .select("rid", "slug", "title", "status", "created")
    )
    page1 = r.orderBy(F.col("created").desc(), F.col("rid").asc()).limit(20)
    cursor = (
        page1.orderBy(F.col("created").asc(), F.col("rid").desc())
        .limit(1)
        .select(
            F.col("created").alias("c_created"), F.col("rid").alias("c_rid")
        )
    )
    after = (F.col("created") < F.col("c_created")) | (
        (F.col("created") == F.col("c_created")) & (F.col("rid") > F.col("c_rid"))
    )
    return (
        r.crossJoin(F.broadcast(cursor))
        .filter(after)
        .orderBy(F.col("created").desc(), F.col("rid").asc())
        .limit(20)
        .select(
            "rid",
            "slug",
            "title",
            "status",
            F.col("created").cast("string").alias("created"),
        )
    )


def _hydrate_conversation_oracle() -> str:
    from nucliadb_spark.operators import hydrate as H

    req = (
        f"SELECT paragraph_id FROM ({tpch.SQL_PARAGRAPHS_CONVERSATION})"
        " WHERE rid % 5 = 2"
    )
    return H.hydrate_sql(
        req,
        tpch.SQL_PARAGRAPHS_CONVERSATION,
        tpch.SQL_FIELDS_CONVERSATION,
        tpch.SQL_RESOURCES_CONVERSATION,
    )


@register("hydrate_conversation", _hydrate_conversation_oracle())
def hydrate_conversation(spark, sf_dir):
    """/hydrate over CONVERSATION fields — the full 4-segment
    ParagraphId `rid/field/split/start-end` where the split addresses
    the message (FieldUid.split, nidx_text/src/reader.rs:482-487).
    Neighbour hydration walks the field's sequence ordered by
    (split, start), so prev/next are the ADJACENT MESSAGES — the
    reference's conversational context strategy hydrates surrounding
    messages exactly this way. Same pruned plan: rid semijoin, one
    window, owning-field join on (rid, field_id)."""
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import hydrate as H

    paras = tpch.paragraphs_conversation(spark, sf_dir)
    req = paras.filter(F.col("rid") % 5 == 2).select("paragraph_id")
    return H.hydrate(
        req,
        paras,
        tpch.fields_conversation(spark, sf_dir),
        # conversations live in their own rid keyspace with their own
        # synthesized resources (tpch.CONV_RID_BASE) — joining the
        # part-derived resources here would attach an unrelated
        # part's slug/title to every conversation
        tpch.resources_conversation(spark, sf_dir),
    )


@register("feedback_daily_trend", feedback.feedback_daily_trend_sql(tenants=3))
def feedback_daily_trend(spark, sf_dir):
    """Per-(kbid, day) feedback good-rate trend over the timestamped
    audit log (audit/stream.py:597-627) at tenant count 3 — daily
    volume + thumbs-up rate + cumulative-to-date rate per KB. The
    cumulative window runs over the already-aggregated day rollup
    (one row per kbid per day), so the ordered window input is tiny;
    the only data-sized shuffle is the (kbid, day) groupBy with
    map-side partial combine. Tenant count 3 (vs the report's 2)
    exercises the per-KB state claim beyond the binary case."""
    return feedback.feedback_daily_trend(
        feedback.feedback_log(tpch.table(spark, sf_dir, "events"), tenants=3)
    )


PARAGRAPH_SEARCH_FIELDED_SQL = f"""
WITH p AS ({tpch.SQL_PARAGRAPHS_FIELDED}),
f AS ({tpch.SQL_FIELDS_MULTI})
SELECT p.paragraph_id, p.rid, p.text, p.kind,
       f.field_key, f.field_type, f.language
FROM p
JOIN f ON f.rid = p.rid
      AND f.field_id = string_split(p.paragraph_id, '/')[2]
WHERE contains(lower(p.text), 'spark')
ORDER BY p.paragraph_id
"""


PARAGRAPH_EXTRACT_FIELDED_SQL = f"""
WITH p0 AS ({tpch.SQL_PARAGRAPHS_FIELDED}),
p AS (
  SELECT *, string_split(paragraph_id, '/')[2] AS field_id
  FROM p0 WHERE rid % 23 = 7
),
f AS ({tpch.SQL_FIELDS_MULTI})
SELECT p.paragraph_id, f.field_key, p.start, p."end",
       substring(f.text, p.start + 1, p."end" - p.start) AS extracted
FROM p
JOIN f ON f.rid = p.rid AND f.field_id = p.field_id
ORDER BY p.paragraph_id
"""


@register("paragraph_extract_fielded", PARAGRAPH_EXTRACT_FIELDED_SQL)
def paragraph_extract_fielded(spark, sf_dir):
    """Paragraph-text extraction from the OWNING field's stored text
    (J4 over the multi-field corpus): the reference groups requested
    paragraph ids by FieldUid parsed from the id and slices each
    field's chars once (nidx_text/src/reader.rs:496-556
    get_paragraphs_text; FieldUid = rid + field type/name from the
    '/a/title'-style facet). Title windows must slice the TITLE
    field's text, body windows the body's — a rid-only join would
    extract from the wrong field. One (rid, field_id)-keyed join;
    substring is row-local."""
    from pyspark.sql import functions as F

    p = (
        tpch.paragraphs_fielded(spark, sf_dir)
        .filter(F.col("rid") % 23 == 7)
        .withColumn("field_id", F.split("paragraph_id", "/").getItem(1))
    )
    f = tpch.fields_multi(spark, sf_dir).select(
        "rid", "field_id", "field_key", F.col("text").alias("full_text")
    )
    return (
        p.join(f, ["rid", "field_id"])
        .select(
            "paragraph_id",
            "field_key",
            "start",
            "end",
            F.expr("substring(full_text, start + 1, end - start)").alias("extracted"),
        )
        .orderBy("paragraph_id")
    )


SEARCH_FIELDS_SCOPED_SQL = f"""
WITH p0 AS ({tpch.SQL_PARAGRAPHS_FIELDED}),
f AS ({tpch.SQL_FIELDS_MULTI}),
scoped AS (
  SELECT p0.*, f.field_key, f.language
  FROM p0
  JOIN f ON f.rid = p0.rid
        AND f.field_id = string_split(p0.paragraph_id, '/')[2]
  WHERE f.field_key = '/a/title'
)
SELECT paragraph_id, rid, text, field_key, language
FROM scoped
WHERE contains(lower(text), 'merge')
ORDER BY paragraph_id
"""


@register("search_fields_scoped", SEARCH_FIELDS_SCOPED_SQL)
def search_fields_scoped(spark, sf_dir):
    """The `fields` search parameter — `fields=["a/title"]` searches
    ONLY the title field (nucliadb_models/search.py:461-468; nidx
    scopes by the field facet). The field scope is a (rid, field_id)
    semijoin applied BEFORE the keyword match, so at 100 TB the
    scoped search scans one field family's paragraphs, not the whole
    corpus; both predicates sit under the join for pushdown."""
    from pyspark.sql import functions as F

    paras = tpch.paragraphs_fielded(spark, sf_dir).withColumn(
        "field_id", F.split("paragraph_id", "/").getItem(1)
    )
    fields = tpch.fields_multi(spark, sf_dir).filter(
        F.col("field_key") == "/a/title"
    )
    return (
        paras.join(
            fields.select("rid", "field_id", "field_key", "language"),
            ["rid", "field_id"],
        )
        .filter(F.lower(F.col("text")).contains("merge"))
        .select("paragraph_id", "rid", "text", "field_key", "language")
        .orderBy("paragraph_id")
    )


_TITLE_FIELDS_SQL = (
    f"SELECT * FROM ({tpch.SQL_FIELDS_MULTI}) WHERE field_key = '/a/title'"
)


def _bm25_fields_scoped_oracle() -> str:
    from nucliadb_spark.operators import bm25

    return bm25.bm25_sql(_TITLE_FIELDS_SQL, "merge stream window", top_k=15)


@register("bm25_fields_scoped", _bm25_fields_scoped_oracle())
def bm25_fields_scoped(spark, sf_dir):
    """`fields=["a/title"]` through the RANKED search path: BM25 over
    ONLY the title-field corpus — corpus stats (N, avgdl, df) are the
    searched field family's, exactly what scoping a tantivy search to
    one field's postings yields (nucliadb_models/search.py:461-468;
    nidx scopes by the field facet). Complements
    `search_fields_scoped` (the unranked filter shape): here the
    scope restricts the index itself, so at 100 TB the postings
    build/scan is proportional to one field family, not the corpus."""
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import bm25

    flds = tpch.fields_multi(spark, sf_dir).filter(
        F.col("field_key") == "/a/title"
    )
    return bm25.bm25_search(flds, "merge stream window", top_k=15)


@register("paragraph_search_fielded", PARAGRAPH_SEARCH_FIELDED_SQL)
def paragraph_search_fielded(spark, sf_dir):
    """Paragraph keyword search over the multi-field corpus with
    owning-field attachment (J4/F9 fan-out semantics): a match in the
    title field and a match in the body field of the SAME resource
    are distinct text blocks, each attached to its own field's
    key/type/language via the (rid, field_id) join — the reference's
    ParagraphId→field resolution (nidx_paragraph/src/schema.rs; field
    ids in paragraph keys). The keyword filter pushes below the join;
    the join fans out by id, never by resource."""
    from pyspark.sql import functions as F

    paras = tpch.paragraphs_fielded(spark, sf_dir)
    fields = tpch.fields_multi(spark, sf_dir)
    seg = F.split("paragraph_id", "/")
    hits = paras.filter(F.lower(F.col("text")).contains("spark")).withColumn(
        "field_id", seg.getItem(1)
    )
    return (
        hits.join(
            fields.select("rid", "field_id", "field_key", "field_type", "language"),
            ["rid", "field_id"],
        )
        .select(
            "paragraph_id",
            "rid",
            "text",
            "kind",
            "field_key",
            "field_type",
            "language",
        )
        .orderBy("paragraph_id")
    )


LINK_FIELD_SEARCH_SQL = f"""
WITH p0 AS ({tpch.SQL_PARAGRAPHS_FIELDED}),
f AS ({tpch.SQL_FIELDS_MULTI}),
scoped AS (
  SELECT p0.paragraph_id, p0.rid, p0.text, f.field_key, f.uri
  FROM p0
  JOIN f ON f.rid = p0.rid
        AND f.field_id = string_split(p0.paragraph_id, '/')[2]
  WHERE f.field_type = 'u'
)
SELECT paragraph_id, rid, text, field_key, uri
FROM scoped
WHERE contains(lower(text), 'stream')
ORDER BY paragraph_id
"""


@register("link_field_search", LINK_FIELD_SEARCH_SQL)
def link_field_search(spark, sf_dir):
    """Keyword search scoped BY FIELD TYPE to the third field family
    ('/u/link' — sparse: every third resource has one), with the
    family's own metadata (the FieldLink `uri`, resources.proto link
    fields) attached to each hit. The F9 prefilter here is
    `field_type = 'u'`, not a named field key — the reference's
    FieldTypeName filter (nucliadb_models/search.py FieldTypeName;
    nidx scopes by the field-type facet prefix). Same at-scale shape
    as `search_fields_scoped`: the type predicate sits under the
    (rid, field_id) join, so the scan prunes to one sparse family
    before the keyword match."""
    from pyspark.sql import functions as F

    paras = tpch.paragraphs_fielded(spark, sf_dir).withColumn(
        "field_id", F.split("paragraph_id", "/").getItem(1)
    )
    links = tpch.fields_multi(spark, sf_dir).filter(F.col("field_type") == "u")
    return (
        paras.join(
            links.select("rid", "field_id", "field_key", "uri"),
            ["rid", "field_id"],
        )
        .filter(F.lower(F.col("text")).contains("stream"))
        .select("paragraph_id", "rid", "text", "field_key", "uri")
        .orderBy("paragraph_id")
    )


FIELD_FAMILY_FACETS_SQL = f"""
SELECT field_type, field_key,
       COUNT(*) AS n_fields,
       COUNT(uri) AS n_with_uri,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(CASE WHEN list_contains(labels, '/n/i/text/html')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_html
FROM ({tpch.SQL_FIELDS_MULTI})
GROUP BY field_type, field_key
ORDER BY field_key
"""


@register("field_family_facets", FIELD_FAMILY_FACETS_SQL)
def field_family_facets(spark, sf_dir):
    """Per-field-family catalog rollup over the 3-family corpus (A1
    facets at field granularity — the reference's field-type facet
    '/t','/a','/u' plus the '/n/i/{{mime}}' icon facet, catalog
    faceted search over field metadata): one row per family with its
    field count, uri-bearing count (only links carry one), total
    chars, and the html-mime label count. One groupBy over a
    3-key column — map-side partial combine; the facet predicates
    are row-local array ops, never an explode-shuffle."""
    from pyspark.sql import functions as F

    return (
        tpch.fields_multi(spark, sf_dir)
        .groupBy("field_type", "field_key")
        .agg(
            F.count("*").alias("n_fields"),
            F.count("uri").alias("n_with_uri"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(
                F.when(
                    F.array_contains("labels", "/n/i/text/html"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("n_html"),
        )
        .orderBy("field_key")
    )


def _fields_scoped_multi_oracle() -> str:
    from nucliadb_spark.operators import bm25

    link_fields = (
        f"SELECT * FROM ({tpch.SQL_FIELDS_MULTI}) WHERE field_key = '/u/link'"
    )
    ta = bm25.bm25_sql(_TITLE_FIELDS_SQL, "merge stream window", top_k=50)
    tu = bm25.bm25_sql(link_fields, "merge stream window", top_k=50)
    return f"""
WITH leg_title AS ({ta}),
leg_link AS ({tu}),
u AS (
  SELECT rid, score FROM leg_title
  UNION ALL
  SELECT rid, score FROM leg_link
)
SELECT rid AS id, ROUND(SUM(score), 4)::DOUBLE AS score
FROM u GROUP BY rid
ORDER BY score DESC, id ASC
LIMIT 15
"""


@register("find_fields_scoped_multi", _fields_scoped_multi_oracle())
def find_fields_scoped_multi(spark, sf_dir):
    """A MULTI-family `fields` scope through the serving API:
    `fields=["a/title", "u/link"]` ranks each scoped family against
    its OWN prebuilt per-family sidecar index (postings / doc-stats /
    vocab / corpus keyed by field_key — _fielded_text_index) and sums
    per-field scores per resource, tantivy's multi-field
    Occur::Should over per-field postings
    (nidx/nidx_text/src/schema.rs:59-114;
    nucliadb_models/search.py:461-468). The serving contract is the
    point: NO per-request tokenization or stats pass — the request
    prunes the session-cached family-keyed sidecars (parquet
    partitioned by field_key at scale), exactly like the unscoped
    find path serves from the global postings cache."""
    from pyspark.sql import functions as F

    from nucliadb_spark import api

    req = api.FindRequest(
        query="merge stream window",
        features=["keyword"],
        top_k=15,
        window=50,
        fields=["a/title", "u/link"],
    )
    # matched_sources is array-typed (not pandas-hashable at the
    # driver boundary) — project the scalar result columns
    return api.find_request(spark, sf_dir, req).select("id", "score")


def _find_hybrid_fielded_oracle() -> str:
    from nucliadb_spark.operators import bm25, fusion, knn

    win = 50  # fusion_window(50, 10)
    link_fields = (
        f"SELECT * FROM ({tpch.SQL_FIELDS_MULTI}) WHERE field_key = '/u/link'"
    )
    keyword = (
        "SELECT rid AS id, score FROM "
        f"({bm25.bm25_sql(link_fields, 'merge stream window', top_k=win)})"
    )
    scope = (
        f"rid IN (SELECT rid FROM ({tpch.SQL_FIELDS_MULTI}) "
        "WHERE field_key = '/u/link')"
    )
    semantic = knn.exact_knn_sql(
        tpch.SQL_VECTORS,
        "SELECT embedding AS qvec FROM embeddings WHERE vec_id = 5",
        64,
        k=win,
        similarity="cosine",
        where=scope,
    )
    fused = fusion.rrf_sql(
        {"keyword": keyword, "semantic": semantic}, top_k=10
    )
    return f"""
WITH fused AS ({fused})
SELECT id, score,
       array_to_string(matched_sources, ',') AS matched_sources
FROM fused
ORDER BY score DESC, id ASC
"""


@register("find_hybrid_fielded", _find_hybrid_fielded_oracle())
def find_hybrid_fielded(spark, sf_dir):
    """The hybrid flagship under a `fields` search scope: keyword +
    semantic retrieval restricted to resources owning a '/u/link'
    field (sparse — every third resource), fused with RRF k=60
    through the serving API. The keyword leg serves from the
    session-cached per-family sidecar (field_key-pruned postings —
    _fielded_text_index, tantivy's per-field postings); the vector
    leg semijoins the scope's rid set (broadcast — the scope is a
    field-family membership list) BEFORE scoring, the reference's
    field-scoped prefilter applied to the vector index
    (nidx/nidx_vector prefilter; nucliadb_models/search.py:461-468).
    At 100 TB both legs scan only the scoped third of their
    partitions; fusion sees ≤2·window rows."""
    from pyspark.sql import functions as F

    from nucliadb_spark import api

    req = api.FindRequest(
        query="merge stream window",
        features=["keyword", "semantic"],
        top_k=10,
        window=50,
        query_vec_id=5,
        fields=["u/link"],
    )
    return api.find_request(spark, sf_dir, req).select(
        "id",
        "score",
        F.array_join("matched_sources", ",").alias("matched_sources"),
    )


def _find_hybrid_fielded_graph_oracle() -> str:
    from nucliadb_spark.functions.models import detect_entity_values_py
    from nucliadb_spark.operators import bm25, fusion, knn

    win = 50
    q = _FIELDED_GRAPH_Q
    link_fields = (
        f"SELECT * FROM ({tpch.SQL_FIELDS_MULTI}) WHERE field_key = '/u/link'"
    )
    keyword = (
        "SELECT rid AS id, score FROM "
        f"({bm25.bm25_sql(link_fields, q, top_k=win)})"
    )
    scope = (
        f"rid IN (SELECT rid FROM ({tpch.SQL_FIELDS_MULTI}) "
        "WHERE field_key = '/u/link')"
    )
    semantic = knn.exact_knn_sql(
        tpch.SQL_VECTORS,
        "SELECT embedding AS qvec FROM embeddings WHERE vec_id = 5",
        64,
        k=win,
        similarity="cosine",
        where=scope,
    )
    lst = ", ".join(f"'{e}'" for e in detect_entity_values_py(q))
    graph = f"""
SELECT DISTINCT CAST(string_split(r.paragraph_id, '/')[1] AS BIGINT) AS id,
       1.0::DOUBLE AS score
FROM ({tpch.SQL_RELATIONS}) r
WHERE (r.source_value IN ({lst}) OR r.target_value IN ({lst}))
  AND r.paragraph_id IS NOT NULL
  AND CAST(string_split(r.paragraph_id, '/')[1] AS BIGINT) IN
      (SELECT rid FROM ({tpch.SQL_FIELDS_MULTI})
       WHERE field_key = '/u/link')
"""
    fused = fusion.rrf_sql(
        {"keyword": keyword, "semantic": semantic, "graph": graph}, top_k=10
    )
    return f"""
WITH fused AS ({fused})
SELECT id, score,
       array_to_string(matched_sources, ',') AS matched_sources
FROM fused
ORDER BY score DESC, id ASC
"""


_FIELDED_GRAPH_Q = "merge stream window part:3 part:6 part:17"


@register("find_hybrid_fielded_graph", _find_hybrid_fielded_graph_oracle())
def find_hybrid_fielded_graph(spark, sf_dir):
    """The scoped flagship fused THREE-way: keyword + semantic +
    RELATIONS under the same '/u/link' fields scope. The graph leg's
    entry points are the query's NER-detected entity values
    (part:3/6/17 via the deterministic stub); matching triples'
    provenance paragraphs enter the fusion at score 1.0 — and the
    scope prefilter applies to the relation index exactly as to the
    other two (triple hits rid-semijoined to the scope's owner set
    BEFORE fusion, nidx/nidx_relation/src/reader.rs:261-271
    apply_prefilter; part:17's provenance rid is not a link owner,
    so the scope filters it). At 100 TB the graph leg is an isin
    scan over the triples table + one broadcast semijoin — no
    corpus-sized shuffle enters the plan."""
    from pyspark.sql import functions as F

    from nucliadb_spark import api

    req = api.FindRequest(
        query=_FIELDED_GRAPH_Q,
        features=["keyword", "semantic", "graph"],
        top_k=10,
        window=50,
        query_vec_id=5,
        fields=["u/link"],
    )
    return api.find_request(spark, sf_dir, req).select(
        "id",
        "score",
        F.array_join("matched_sources", ",").alias("matched_sources"),
    )


def _hydrate_mixed_oracle() -> str:
    from nucliadb_spark.operators import hydrate as H

    paras = (
        f"SELECT rid, paragraph_id, start, \"end\", text, kind"
        f" FROM ({tpch.SQL_PARAGRAPHS_FIELDED})"
        " UNION ALL "
        f"SELECT rid, paragraph_id, start, \"end\", text, kind"
        f" FROM ({tpch.SQL_PARAGRAPHS_CONVERSATION})"
    )
    flds = (
        "SELECT rid, field_id, field_key, field_type, language"
        f" FROM ({tpch.SQL_FIELDS_MULTI})"
        " UNION ALL "
        "SELECT rid, field_id, field_key, field_type, language"
        f" FROM ({tpch.SQL_FIELDS_CONVERSATION})"
    )
    res = (
        "SELECT rid, slug, title, origin_source, security_public"
        f" FROM ({tpch.SQL_RESOURCES})"
        " UNION ALL "
        "SELECT rid, slug, title, origin_source, security_public"
        f" FROM ({tpch.SQL_RESOURCES_CONVERSATION})"
    )
    req = (
        f"SELECT paragraph_id FROM ({paras})"
        " WHERE (rid < 1000000000 AND rid % 97 = 13)"
        " OR (rid >= 1000000000 AND rid % 10 = 2)"
    )
    return H.hydrate_sql(req, paras, flds, res)


@register("hydrate_mixed_corpora", _hydrate_mixed_oracle())
def hydrate_mixed_corpora(spark, sf_dir):
    """/hydrate over a MIXED id list: 3-segment fielded ids
    (rid/field/start-end — body, title AND link families) and
    4-segment conversation ids (rid/field/split/start-end) in the
    SAME request, resolved against the UNION of both corpora. This
    is what the endpoint actually receives when a find response
    mixes text and conversation hits (HydrateRequest.data is one
    list, hydrate.py:56-74). It works because conversations live in
    a DISJOINT rid keyspace (tpch.CONV_RID_BASE) with their own
    synthesized resources — the rid semijoin, owning-field join and
    neighbour windows never cross corpora. Plan shape identical to
    the single-corpus hydrate: the union is a narrow concat of
    scans, pruned by the same rid set before the one window
    shuffle."""
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import hydrate as H

    pcols = ["rid", "paragraph_id", "start", "end", "text", "kind"]
    paras = (
        tpch.paragraphs_fielded(spark, sf_dir)
        .select(*pcols)
        .unionByName(tpch.paragraphs_conversation(spark, sf_dir).select(*pcols))
    )
    fcols = ["rid", "field_id", "field_key", "field_type", "language"]
    flds = (
        tpch.fields_multi(spark, sf_dir)
        .select(*fcols)
        .unionByName(tpch.fields_conversation(spark, sf_dir).select(*fcols))
    )
    rcols = ["rid", "slug", "title", "origin_source", "security_public"]
    res = (
        tpch.resources(spark, sf_dir)
        .select(*rcols)
        .unionByName(tpch.resources_conversation(spark, sf_dir).select(*rcols))
    )
    base = F.lit(tpch.CONV_RID_BASE)
    req = paras.filter(
        ((F.col("rid") < base) & (F.col("rid") % 97 == 13))
        | ((F.col("rid") >= base) & (F.col("rid") % 10 == 2))
    ).select("paragraph_id")
    return H.hydrate(req, paras, flds, res)
