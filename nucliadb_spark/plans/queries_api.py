"""Registry entries for the remaining HTTP API surfaces: /retrieve
(score-history text-block search), /augment (hydration-by-id), and
/summarize (field-text gather + summary stub).

refs: nucliadb/src/nucliadb/search/api/v1/retrieve.py, augment.py,
summarize.py.
"""

from __future__ import annotations

from nucliadb_spark.operators import augment, find, summarize
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
    from nucliadb_spark.plans.queries_text import _corpus, _text_index

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
