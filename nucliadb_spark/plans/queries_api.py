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
