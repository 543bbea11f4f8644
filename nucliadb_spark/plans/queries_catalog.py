"""Registry entries: catalog path (SURVEY §2.2 F1-F8, §2.3 T10,
§2.6 A2-A4, §2.7 O4) over the part-derived resources table."""

from __future__ import annotations

from pyspark.sql import functions as F

from nucliadb_spark.operators import catalog as cat
from nucliadb_spark.operators import filters as fx
from nucliadb_spark.operators import kvschema as kvs
from nucliadb_spark.registry import register
from nucliadb_spark.sources import tpch

_CATALOG_COLS = "rid, title, slug, created, modified, status, origin_source"


def _select_cols(df):
    return df.select("rid", "title", "slug", "created", "modified", "status", "origin_source")


# --- T10 + O4: title words match + sort + paginate ---------------------


@register(
    "catalog_words_paged",
    cat.catalog_search_sql(
        tpch.SQL_RESOURCES,
        query="widget",
        match_kind="words",
        sort_by="created",
        ascending=False,
        page_number=1,
        page_size=10,
        columns=_CATALOG_COLS,
    ),
)
def catalog_words_paged(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    return _select_cols(
        cat.catalog_search(
            r, query="widget", match_kind="words", sort_by="created",
            ascending=False, page_number=1, page_size=10,
        )
    )


# --- T10 fuzzy title match (levenshtein<=1 token) ----------------------


@register(
    "catalog_fuzzy_title",
    cat.catalog_search_sql(
        tpch.SQL_RESOURCES,
        query="widgit",  # 1 edit from "widget"
        match_kind="fuzzy",
        sort_by="rid",
        ascending=True,
        page_number=0,
        page_size=50,
        columns=_CATALOG_COLS,
    ),
)
def catalog_fuzzy_title(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    return _select_cols(
        cat.catalog_search(
            r, query="widgit", match_kind="fuzzy", sort_by="rid",
            ascending=True, page_number=0, page_size=50,
        )
    )


# --- T10 trigram title match (pg_trgm %> semantics) ----------------------


@register(
    "catalog_trigram_title",
    cat.catalog_search_sql(
        tpch.SQL_RESOURCES,
        query="widgett blu",  # trigram-similar to 'widget blue ...'
        match_kind="trigram",
        sort_by="rid",
        ascending=True,
        page_number=0,
        page_size=50,
        columns=_CATALOG_COLS,
    ),
)
def catalog_trigram_title(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    return _select_cols(
        cat.catalog_search(
            r, query="widgett blu", match_kind="trigram", sort_by="rid",
            ascending=True, page_number=0, page_size=50,
        )
    )


# --- F1/F2/F3/F6: boolean filter tree + date range + hidden ------------

_FILTER_TREE = fx.And(
    [
        fx.Or([fx.Facet("/l/type/economy"), fx.Facet("/l/type/promo")]),
        fx.Not(fx.Facet("/n/s/PENDING")),
        fx.DateRange("created", since="1995-06-01 00:00:00", until="1996-06-01 00:00:00"),
        fx.NotHidden(),
    ]
)


@register(
    "filter_expression_tree",
    f"""
WITH resources AS ({tpch.SQL_RESOURCES})
SELECT {_CATALOG_COLS} FROM resources
WHERE {_FILTER_TREE.to_sql()}
""",
)
def filter_expression_tree(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    return _select_cols(r.filter(_FILTER_TREE.to_column()))


# --- F5: security filter ------------------------------------------------

_SECURITY = fx.SecurityFilter(groups=["group-1", "group-3"])


@register(
    "security_filter",
    f"""
WITH resources AS ({tpch.SQL_RESOURCES})
SELECT {_CATALOG_COLS} FROM resources
WHERE {_SECURITY.to_sql()}
""",
)
def security_filter(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    return _select_cols(r.filter(_SECURITY.to_column()))


# --- A2/A4 + A1: faceted search with filter ----------------------------

_FACET_FILTER = fx.DateRange("created", since="1995-01-01 00:00:00", until="1996-01-01 00:00:00")


@register(
    "catalog_facets",
    cat.faceted_search_sql(
        tpch.SQL_RESOURCES, roots=["/l/type", "/l/brand", "/n/s"], filters=_FACET_FILTER
    ),
)
def catalog_facets(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    return cat.faceted_search(
        r, roots=["/l/type", "/l/brand", "/n/s"], filters=_FACET_FILTER
    )


# --- A4: facet hierarchy rollup ------------------------------------------


@register("catalog_facet_rollup", cat.facet_rollup_sql(tpch.SQL_RESOURCES))
def catalog_facet_rollup(spark, sf_dir):
    return cat.facet_rollup(tpch.resources(spark, sf_dir))


# --- A3: totals ---------------------------------------------------------


@register(
    "catalog_count",
    f"""
WITH resources AS ({tpch.SQL_RESOURCES})
SELECT COUNT(*) AS total FROM resources WHERE {_FILTER_TREE.to_sql()}
""",
)
def catalog_count(spark, sf_dir):
    r = tpch.resources(spark, sf_dir)
    return cat.catalog_count(r, filters=_FILTER_TREE)


# --- F7: JSON-KV typed predicate over events.props ---------------------

_JSON_FILTER = fx.And(
    [
        fx.JsonPath("props", "k", "gte", 10.0),
        fx.JsonPath("props", "k", "lte", 50.0),
        fx.FieldEquals("event_type", "purchase"),
    ]
)


@register(
    "json_kv_filter",
    f"""
SELECT event_id, user_id, event_type, value
FROM events
WHERE {_JSON_FILTER.to_sql()}
""",
)
def json_kv_filter(spark, sf_dir):
    e = tpch.table(spark, sf_dir, "events")
    return e.filter(_JSON_FILTER.to_column()).select(
        "event_id", "user_id", "event_type", "value"
    )


# --- F7 (full surface): date-typed + nested-path JSON predicates --------
# ref: nidx/nidx_json/src/search.rs:60-200 — DateRange and nested
# tantivy_path leaves. The events table's metadata is projected into a
# nested JSON document ({"audit": {"created": ..., "uid": ...}}) in
# both engines; the filter runs typed eq/range predicates at the
# dotted paths.

_JSON_DATE_FILTER = fx.And(
    [
        fx.JsonPath(
            "meta", "audit.created", "gte", "2024-01-10 00:00:00", kind="date"
        ),
        fx.JsonPath(
            "meta", "audit.created", "lte", "2024-01-20 00:00:00", kind="date"
        ),
        fx.JsonPath("meta", "audit.uid", "gte", 10, kind="int"),
    ]
)


@register(
    "json_kv_date_range",
    f"""
WITH e AS (
  SELECT event_id, user_id, event_type,
         to_json(struct_pack(
           audit := struct_pack(
             created := strftime(ts, '%Y-%m-%d %H:%M:%S'),
             uid := user_id))) AS meta
  FROM events
)
SELECT event_id, user_id, event_type
FROM e WHERE {_JSON_DATE_FILTER.to_sql()}
ORDER BY event_id
""",
)
def json_kv_date_range(spark, sf_dir):
    e = tpch.table(spark, sf_dir, "events").withColumn(
        "meta",
        F.to_json(
            F.struct(
                F.struct(
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("created"),
                    F.col("user_id").alias("uid"),
                ).alias("audit")
            )
        ),
    )
    return (
        e.filter(_JSON_DATE_FILTER.to_column())
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


# --- F4: keyword filter over documents ---------------------------------

_KW = fx.And([fx.Keyword("spark", column="text"), fx.Keyword("vector", column="text")])


@register(
    "keyword_filter",
    f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_KW.to_sql()}
""",
)
def keyword_filter(spark, sf_dir):
    d = tpch.table(spark, sf_dir, "documents")
    return d.filter(_KW.to_column()).select("doc_id", "lang", "source")


# --- Services surface: labelsets listing + KV-schema inference ---------
# ref: reader/api/v1/services.py:128-209 (GET /labelsets) and
# :364-398 (GET /kv-schemas) — the last two reader-services reads
# without a lakehouse analog. Labelsets are derived from the indexed
# /l/ facets; KV schemas are INFERRED from a JSON metadata column
# (kv_schemas.py:43-99 flat typed keys + required/repeated flags).


@register("kb_labelsets", cat.labelsets_listing_sql(tpch.SQL_RESOURCES))
def kb_labelsets(spark, sf_dir):
    return cat.labelsets_listing(tpch.resources(spark, sf_dir))


# Per-event JSON metadata doc exercising every KVFieldType: int, text,
# float, boolean, date, a repeated (array) field, and an optional
# float (absent when value <= 250 -> required=false). Both engines
# build the doc independently from the same relational columns; the
# inference passes must agree on the derived declaration.
_KV_META_SQL = """
SELECT to_json(struct_pack(
  uid := user_id,
  etype := event_type,
  val := round(value, 2),
  purchase := event_type = 'purchase',
  day := strftime(ts, '%Y-%m-%d'),
  tags := [event_type, 'evt'],
  score := CASE WHEN value > 250 THEN round(value / 10, 2) END
)) AS meta
FROM events
"""


@register("kv_schema_infer", kvs.infer_kv_schema_sql(_KV_META_SQL))
def kv_schema_infer(spark, sf_dir):
    e = tpch.table(spark, sf_dir, "events")
    meta = e.select(
        F.to_json(
            F.struct(
                F.col("user_id").alias("uid"),
                F.col("event_type").alias("etype"),
                F.round("value", 2).alias("val"),
                (F.col("event_type") == "purchase").alias("purchase"),
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                F.array(F.col("event_type"), F.lit("evt")).alias("tags"),
                F.when(F.col("value") > 250, F.round(F.col("value") / 10, 2)).alias(
                    "score"
                ),
            )
        ).alias("meta")
    )
    return kvs.infer_kv_schema(meta, "meta")


# Processing-queue listing: PENDING resources as the queue the
# reference's processing_status endpoint reports (services.py:266-323),
# keyset-cursored. Cursor fixed mid-corpus so the page is non-trivial
# at every SF.
@register(
    "kb_processing_status",
    cat.processing_status_sql(tpch.SQL_RESOURCES, limit=20, cursor="1995-03-01 00:00:00"),
)
def kb_processing_status(spark, sf_dir):
    return cat.processing_status(
        tpch.resources(spark, sf_dir), limit=20, cursor="1995-03-01 00:00:00"
    )
