"""Adapter: the driver's TPC-H-ish parquet tables → engine tables.

FIXTURES.md §7 defines this mapping (part→resources, documents→
fields/paragraphs, embeddings→vectors, lineitem/orders→relations).
Every derivation here has a matching DuckDB SQL CTE string
(``SQL_*``) so oracle queries run the IDENTICAL projection — parity
by construction.

Scale notes: all builds are narrow projections / unions over the base
parquet (no shuffle); `relations` is a union of three projections of
lineitem/orders and stays partition-local. At 100 TB these read as
columnar scans with pushed filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_raw(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Testdata generations differ: one stored events.ts as
    TIMESTAMP(NANOS) (Spark refuses the file without the legacy
    conf), the current one stores TIMESTAMP(MICROS) which Spark 4
    infers as TIMESTAMP_NTZ. Set the confs defensively — the
    grading/driver session is not ours and may lack them — and pin
    the session timezone so NTZ→LTZ normalization is deterministic."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to a plain TIMESTAMP
    regardless of which testdata generation produced the file:

    - ``bigint``        → legacy nanos-as-long; integer DIV (float
      division loses precision at epoch-nanos magnitude ~1.7e18 > 2^53)
    - ``timestamp_ntz`` → cast (session tz pinned to UTC above, so the
      wall-clock value is preserved exactly as DuckDB reads it)
    - ``timestamp``     → already what downstream expects
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


# every temporal column across testdata generations; normalize_ts
# adapts whichever physical type a regeneration produces (r2 lost its
# bench to events.ts flipping TIMESTAMP(NANOS) → TIMESTAMP_NTZ — this
# is the blanket insurance against the next flip)
_TEMPORAL_COLS = {
    "events": ["ts"],
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
}


# (applicationId, sf_dir, name) -> reader frame. spark.read.parquet
# builds a fresh InMemoryFileIndex per call — re-listing the table and
# re-reading footers as a 1-task job during QUERY CONSTRUCTION (the
# r14 baseline profile shows repeated "parquet at <unknown>" jobs in
# nearly every query's construct phase). The reader frame is a plan
# handle, not data: memoizing it per session removes the repeated
# listing/footer work (guide §6 — file listing is a per-session cache
# concern) without caching any rows. The testdata tables are
# immutable inputs; anything the engine writes lives outside sf_dir.
_READER_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    hit = _READER_MEMO.get(key)
    if hit is not None:
        return hit
    if name in _TEMPORAL_COLS:
        ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _TEMPORAL_COLS.get(name, ()):
        df = normalize_ts(df, col)
    _READER_MEMO[key] = df
    return df


# ---------------------------------------------------------------------
# resources: catalog rows derived from `part`.
# ref schema: FIXTURES.md §1 / common/catalog/pg.py:72-92.
# created = 1995-01-01 + (p_partkey % 730) days  (deterministic).
# labels  = [/l/type/{p_type}, /l/brand/{p_brand}, /n/s/{status}, /n/i/text/plain]
# status  = PROCESSED unless p_partkey % 17 == 0 → PENDING
# hidden  = p_partkey % 31 == 0
# ---------------------------------------------------------------------


def resources(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    status = F.when(F.col("p_partkey") % 17 == 0, "PENDING").otherwise("PROCESSED")
    created = F.expr(
        "timestamp '1995-01-01 00:00:00' + make_interval(0, 0, 0, p_partkey % 730, 0, 0, 0)"
    )
    return p.select(
        F.lit("kb0").alias("kbid"),
        F.col("p_partkey").cast("long").alias("rid"),
        F.col("p_name").alias("title"),
        F.concat(F.lit("part-"), F.col("p_partkey")).alias("slug"),
        created.alias("created"),
        (created + F.expr("make_interval(0,0,0,0, p_partkey % 24, 0, 0)")).alias(
            "modified"
        ),
        status.alias("status"),
        (F.col("p_partkey") % 31 == 0).alias("hidden"),
        F.array(
            F.concat(F.lit("/l/type/"), F.lower("p_type")),
            F.concat(F.lit("/l/brand/"), F.col("p_brand")),
            F.concat(F.lit("/n/s/"), status),
            F.lit("/n/i/text/plain"),
        ).alias("labels"),
        (F.col("p_partkey") % 3 != 0).alias("security_public"),
        F.array(F.concat(F.lit("group-"), F.col("p_partkey") % 5)).alias(
            "security_groups"
        ),
        F.element_at(
            F.array(F.lit("WEB"), F.lit("DESKTOP"), F.lit("API")),
            (F.col("p_partkey") % 3 + 1).cast("int"),
        ).alias("origin_source"),
        F.col("p_size").alias("size"),
        F.col("p_retailprice").alias("price"),
    )


SQL_RESOURCES = """
SELECT
  'kb0' AS kbid,
  CAST(p_partkey AS BIGINT) AS rid,
  p_name AS title,
  concat('part-', p_partkey) AS slug,
  TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (p_partkey % 730) DAY AS created,
  TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (p_partkey % 730) DAY
      + INTERVAL (p_partkey % 24) HOUR AS modified,
  CASE WHEN p_partkey % 17 = 0 THEN 'PENDING' ELSE 'PROCESSED' END AS status,
  p_partkey % 31 = 0 AS hidden,
  [concat('/l/type/', lower(p_type)),
   concat('/l/brand/', p_brand),
   concat('/n/s/', CASE WHEN p_partkey % 17 = 0 THEN 'PENDING' ELSE 'PROCESSED' END),
   '/n/i/text/plain'] AS labels,
  p_partkey % 3 <> 0 AS security_public,
  [concat('group-', p_partkey % 5)] AS security_groups,
  (['WEB', 'DESKTOP', 'API'])[(p_partkey % 3 + 1)] AS origin_source,
  p_size AS size,
  p_retailprice AS price
FROM part
"""


# ---------------------------------------------------------------------
# fields: one text field per document (documents table).
# labels = [/s/p/{lang}, /u/s/{source}]
# ---------------------------------------------------------------------


def fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # created/modified: deterministic Basic-metadata timestamps
    # (resources.proto:58-95). `created` is STATIC (written once, so
    # as_of date predicates legally join it by rid); `modified`
    # semantically tracks writes and is NOT as_of-composable
    # (api._STATIC_COLS excludes it) even though this fixture never
    # revises it
    created = F.expr(
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0, doc_id % 365, 0,0,0)"
    )
    return d.select(
        F.lit("kb0").alias("kbid"),
        F.col("doc_id").cast("long").alias("rid"),
        F.lit("t").alias("field_type"),
        F.lit("body").alias("field_id"),
        F.lit("/t/body").alias("field_key"),
        F.col("text"),
        F.col("lang").alias("language"),
        F.col("source"),
        F.col("n_chars"),
        F.array(
            F.concat(F.lit("/s/p/"), F.col("lang")),
            F.concat(F.lit("/u/s/"), F.col("source")),
        ).alias("labels"),
        (F.col("doc_id") % 4 != 0).alias("security_public"),
        F.array(F.concat(F.lit("group-"), F.col("doc_id") % 7)).alias(
            "security_groups"
        ),
        created.alias("created"),
        (created + F.expr("make_interval(0,0,0,0, doc_id % 24, 0, 0)")).alias(
            "modified"
        ),
        # Extra: arbitrary user metadata as a JSON document
        # (resources.proto:124-126) — static per resource, queried
        # via typed JsonPath predicates (F7), incl. at a snapshot
        F.to_json(
            F.struct(
                (F.col("doc_id") % 5).cast("long").alias("priority"),
                F.struct(
                    (F.col("doc_id") % 97).cast("long").alias("uid")
                ).alias("audit"),
            )
        ).alias("extra"),
    )


SQL_FIELDS = """
SELECT
  'kb0' AS kbid,
  CAST(doc_id AS BIGINT) AS rid,
  't' AS field_type,
  'body' AS field_id,
  '/t/body' AS field_key,
  text,
  lang AS language,
  source,
  n_chars,
  [concat('/s/p/', lang), concat('/u/s/', source)] AS labels,
  doc_id % 4 <> 0 AS security_public,
  [concat('group-', doc_id % 7)] AS security_groups,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 365) DAY AS created,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 365) DAY
      + INTERVAL (doc_id % 24) HOUR AS modified,
  to_json(struct_pack(
    priority := CAST(doc_id % 5 AS BIGINT),
    audit := struct_pack(uid := CAST(doc_id % 97 AS BIGINT))
  )) AS extra
FROM documents
"""


# ---------------------------------------------------------------------
# paragraphs: fixed-stride char windows over each document's text —
# paragraph_id "rid/start-end" with unicode-char offsets, mirroring
# the reference's paragraph index keys (nidx_paragraph/src/schema.rs
# `paragraph` = "rid/field/start-end"). Corpus is ASCII so Spark
# substring == DuckDB substring == python slicing.
# ---------------------------------------------------------------------

PARAGRAPH_STRIDE = 240


def paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    start = F.explode(
        F.sequence(F.lit(0), F.col("n_chars") - 1, F.lit(PARAGRAPH_STRIDE))
    ).alias("start")
    p = d.select(F.col("doc_id").cast("long").alias("rid"), "text", "n_chars", start)
    end = F.least(F.col("start") + PARAGRAPH_STRIDE, F.col("n_chars"))
    return p.select(
        "rid",
        F.concat_ws("/", "rid", F.concat_ws("-", "start", end.cast("long"))).alias(
            "paragraph_id"
        ),
        F.col("start").cast("long").alias("start"),
        end.cast("long").alias("end"),
        F.expr(f"substring(text, start + 1, {PARAGRAPH_STRIDE})").alias("text"),
        # paragraph kind (resources.proto:318-342): first window acts
        # as the TITLE block, the rest are TEXT
        F.when(F.col("start") == 0, "TITLE").otherwise("TEXT").alias("kind"),
    )


SQL_PARAGRAPHS = f"""
SELECT CAST(doc_id AS BIGINT) AS rid,
       concat(doc_id, '/', start, '-', least(start + {PARAGRAPH_STRIDE}, n_chars)) AS paragraph_id,
       CAST(start AS BIGINT) AS start,
       CAST(least(start + {PARAGRAPH_STRIDE}, n_chars) AS BIGINT) AS "end",
       substring(text, start + 1, {PARAGRAPH_STRIDE}) AS text,
       CASE WHEN start = 0 THEN 'TITLE' ELSE 'TEXT' END AS kind
FROM (
  SELECT doc_id, text, n_chars,
         unnest(range(0, n_chars, {PARAGRAPH_STRIDE})) AS start
  FROM documents
)
"""


# ---------------------------------------------------------------------
# vectors: embeddings table keyed by vec_id; vec_id ↔ doc_id aligns
# 1:1 with documents (both 500·sf·1000 rows).
# ---------------------------------------------------------------------


def vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        F.lit("kb0").alias("kbid"),
        F.col("vec_id").cast("long").alias("rid"),
        F.col("vec_id").cast("long").alias("paragraph_id"),
        F.col("embedding").alias("vector"),
        F.col("label").alias("cluster_label"),
    )


SQL_VECTORS = """
SELECT
  'kb0' AS kbid,
  CAST(vec_id AS BIGINT) AS rid,
  CAST(vec_id AS BIGINT) AS paragraph_id,
  embedding AS vector,
  label AS cluster_label
FROM embeddings
"""


def vectors_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second vectorset (V8): a 32-dim embedding space derived from
    the same corpus — models a KB serving two vectorsets of different
    models/dimensions (ref: nidx/src/searcher/shard_search.rs:94-105
    routes per-vectorset; dim check searcher.rs:254-262)."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        F.lit("kb0").alias("kbid"),
        F.col("vec_id").cast("long").alias("rid"),
        F.col("vec_id").cast("long").alias("paragraph_id"),
        F.slice(F.col("embedding"), 1, 32).alias("vector"),
        F.col("label").alias("cluster_label"),
    )


SQL_VECTORS_ALT = """
SELECT
  'kb0' AS kbid,
  CAST(vec_id AS BIGINT) AS rid,
  CAST(vec_id AS BIGINT) AS paragraph_id,
  list_slice(embedding, 1, 32) AS vector,
  label AS cluster_label
FROM embeddings
"""

# vectorset registry: name -> (builder, dim) — the per-KB vectorset
# catalog the searcher routes on
VECTORSETS = {
    "multilingual-2024": (vectors, 64),
    "en-small-2023": (vectors_alt, 32),
}


# ---------------------------------------------------------------------
# messages: CONVERSATION field type (resources.proto:155-192
# Conversation/Message) derived from events — one conversation per
# user, messages ordered by event time, who alternates Q/A.
# ---------------------------------------------------------------------


# messages are stored in pages of PAGE_SIZE per conversation field
# (ref: nucliadb/src/nucliadb/ingest/fields/conversation.py:34,126-148
# — 1-indexed pages, FieldConversation metadata pages/size/total;
# Message carries ident/who/to/type, resources.proto:155-168)
CONVERSATION_PAGE_SIZE = 200


def messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    idx = F.row_number().over(w)
    return e.select(
        F.col("user_id").cast("long").alias("conversation_id"),
        idx.alias("message_idx"),
        F.col("ts"),
        F.when(idx % 2 == 1, "QUESTION").otherwise("ANSWER").alias("message_type"),
        F.concat_ws(
            " ", F.col("event_type"), F.lit("value"), F.round("value", 0).cast("long")
        ).alias("text"),
        F.when(idx % 2 == 1, F.concat(F.lit("user-"), F.col("user_id")))
        .otherwise(F.lit("assistant"))
        .alias("who"),
        (F.floor((idx - 1) / CONVERSATION_PAGE_SIZE).cast("int") + 1).alias("page"),
    ).withColumn(
        "message_key",
        F.concat_ws("/", "conversation_id", "message_idx"),
    ).withColumn("ident", F.col("message_key"))


SQL_MESSAGES = f"""
SELECT conversation_id, message_idx, ts, message_type, text, who, page,
       concat(conversation_id, '/', message_idx) AS message_key,
       concat(conversation_id, '/', message_idx) AS ident
FROM (
  SELECT CAST(user_id AS BIGINT) AS conversation_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS message_idx,
         ts,
         CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) % 2 = 1
              THEN 'QUESTION' ELSE 'ANSWER' END AS message_type,
         concat_ws(' ', event_type, 'value', CAST(round(value, 0) AS BIGINT)) AS text,
         CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) % 2 = 1
              THEN concat('user-', CAST(user_id AS BIGINT)) ELSE 'assistant' END AS who,
         CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)
              / {CONVERSATION_PAGE_SIZE}) AS INTEGER) + 1 AS page
  FROM events
)
"""


# ---------------------------------------------------------------------
# relations: knowledge-graph triples from lineitem + orders.
#   part:{pk}     —SUPPLIED_BY→ supplier:{sk}   (distinct, from lineitem)
#   order:{ok}    —CONTAINS→    part:{pk}       (distinct, from lineitem)
#   customer:{ck} —PLACED→      order:{ok}      (from orders)
# ref triple shape: utils.proto:7-49; FIXTURES.md §5.
# ---------------------------------------------------------------------


def relations_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-cached TRIPLE INDEX: `relations` range-partitioned
    and sorted by source_value BEFORE caching, so Spark's cached-batch
    column statistics (min/max per batch) prune node-match scans the
    way the reference's sorted term dictionary does (tantivy relation
    index, nidx/nidx_relation). Measured 1.55x on prefix path queries
    at a 10x corpus; at 100 TB the same layout is the sorted/bucketed
    parquet table with row-group min-max pruning. Row order is an
    index property only — every consumer aggregates or orders its own
    output, so results are unchanged."""
    from nucliadb_spark.cache import cached_df

    return cached_df(
        sf_dir,
        "relations",
        lambda: relations(spark, sf_dir)
        .repartitionByRange(32, "source_value")
        .sortWithinPartitions("source_value"),
        spark=spark,
        pinned=True,
    )


def relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triples with provenance: SUPPLIED_BY triples carry the
    supporting paragraph id of the doc aligned with the part
    (utils.proto:26-33 RelationMetadata.paragraph_id — the hook for
    G6 graph-paths→text-blocks)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    supplied = li.select(
        F.concat(F.lit("part:"), F.col("l_partkey")).alias("source_value"),
        F.lit("ENTITY").alias("source_type"),
        F.lit("PART").alias("source_subtype"),
        F.lit("SUPPLIED_BY").alias("relation_label"),
        F.concat(F.lit("supplier:"), F.col("l_suppkey")).alias("target_value"),
        F.lit("ENTITY").alias("target_type"),
        F.lit("SUPPLIER").alias("target_subtype"),
        F.concat(F.col("l_partkey") % 500, F.lit("/0-240")).alias("paragraph_id"),
    ).distinct()
    contains = li.select(
        F.concat(F.lit("order:"), F.col("l_orderkey")).alias("source_value"),
        F.lit("ENTITY").alias("source_type"),
        F.lit("ORDER").alias("source_subtype"),
        F.lit("CONTAINS").alias("relation_label"),
        F.concat(F.lit("part:"), F.col("l_partkey")).alias("target_value"),
        F.lit("ENTITY").alias("target_type"),
        F.lit("PART").alias("target_subtype"),
        F.lit(None).cast("string").alias("paragraph_id"),
    ).distinct()
    placed = o.select(
        F.concat(F.lit("customer:"), F.col("o_custkey")).alias("source_value"),
        F.lit("ENTITY").alias("source_type"),
        F.lit("CUSTOMER").alias("source_subtype"),
        F.lit("PLACED").alias("relation_label"),
        F.concat(F.lit("order:"), F.col("o_orderkey")).alias("target_value"),
        F.lit("ENTITY").alias("target_type"),
        F.lit("ORDER").alias("target_subtype"),
        F.lit(None).cast("string").alias("paragraph_id"),
    )
    return supplied.unionByName(contains).unionByName(placed)


SQL_RELATIONS = """
SELECT DISTINCT
  concat('part:', l_partkey) AS source_value,
  'ENTITY' AS source_type, 'PART' AS source_subtype,
  'SUPPLIED_BY' AS relation_label,
  concat('supplier:', l_suppkey) AS target_value,
  'ENTITY' AS target_type, 'SUPPLIER' AS target_subtype,
  concat(l_partkey % 500, '/0-240') AS paragraph_id
FROM lineitem
UNION ALL
SELECT DISTINCT
  concat('order:', l_orderkey),
  'ENTITY', 'ORDER',
  'CONTAINS',
  concat('part:', l_partkey),
  'ENTITY', 'PART',
  NULL
FROM lineitem
UNION ALL
SELECT
  concat('customer:', o_custkey),
  'ENTITY', 'CUSTOMER',
  'PLACED',
  concat('order:', o_orderkey),
  'ENTITY', 'ORDER',
  NULL
FROM orders
"""


def flag_repeats(paragraphs_df: DataFrame) -> DataFrame:
    """Add `repeated_in_field`: 0 for the first occurrence of a text
    within its resource, 1 for subsequent identical windows — the
    index-time repeat flag tantivy stores per paragraph and the
    `with_duplicates=false` query filters on
    (nidx/nidx_paragraph/src/search_query.rs:218-223)."""
    from pyspark.sql import Window

    w = Window.partitionBy("rid", "text").orderBy("start")
    return paragraphs_df.withColumn(
        "repeated_in_field",
        (F.row_number().over(w) > 1).cast("int"),
    )


def paragraphs_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flag_repeats(paragraphs(spark, sf_dir))


SQL_PARAGRAPHS_FLAGGED = f"""
SELECT *,
       CASE WHEN ROW_NUMBER() OVER (PARTITION BY rid, text ORDER BY start) > 1
            THEN 1 ELSE 0 END AS repeated_in_field
FROM ({SQL_PARAGRAPHS})
"""


# ---------------------------------------------------------------------
# Multi-field corpus: the reference's resources carry MANY fields
# (resources.proto:39-48 — texts/files/links/conversations plus the
# GENERIC title/summary family), while the base corpus above emits a
# single '/t/body' field per rid. The fielded variants below add a
# second field — the '/a/title' generic field (the resource title,
# stored as a generic field in the reference's field model) — and
# stamp paragraph ids with the reference's full 3-segment shape
# `rid/field/start-end` (nidx_paragraph/src/schema.rs), so the
# owning-field join semantics (hydration J3, extraction J4, prefilter
# F9 fan-out) are exercised for real.
# ---------------------------------------------------------------------

TITLE_CHARS = 80  # generic title field = the document's first 80 chars


LINK_SLICE_CHARS = 160  # link extracted text = 160 chars after the title


def fields_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-field corpus, three field families: the full-text
    '/t/body' field plus an '/a/title' generic field on EVERY
    resource, and a '/u/link' field on every third resource
    (doc_id % 3 == 0 — link fields are sparse in real KBs). The link
    field carries its own metadata: a `uri` (NULL for non-link
    fields — FieldLink.uri, resources.proto link fields) and a
    '/n/i/text/html' mime label next to the shared language/source
    labels; its extracted text is the uri plus the char slice after
    the title (the reference stores the fetched page's extracted
    text as the link field's text). Same join-contract schema as
    `fields`; a narrow union of projections of one scan — no
    shuffle."""
    d = table(spark, sf_dir, "documents")

    def proj(ftype, fid, text_col, nchars_col, uri_col=None, mime=None):
        label_cols = [
            F.concat(F.lit("/s/p/"), F.col("lang")),
            F.concat(F.lit("/u/s/"), F.col("source")),
        ]
        if mime is not None:
            label_cols.append(F.lit("/n/i/" + mime))
        # same static Basic/Extra metadata as `fields` (the join
        # contract the docstring promises): resource-grain, so every
        # field family of a resource carries identical values
        created = F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0, doc_id % 365, 0,0,0)"
        )
        return d.select(
            F.lit("kb0").alias("kbid"),
            F.col("doc_id").cast("long").alias("rid"),
            F.lit(ftype).alias("field_type"),
            F.lit(fid).alias("field_id"),
            F.lit(f"/{ftype}/{fid}").alias("field_key"),
            text_col.alias("text"),
            F.col("lang").alias("language"),
            F.col("source"),
            nchars_col.cast("long").alias("n_chars"),
            (uri_col if uri_col is not None else F.lit(None).cast("string")).alias(
                "uri"
            ),
            F.array(*label_cols).alias("labels"),
            (F.col("doc_id") % 4 != 0).alias("security_public"),
            F.array(F.concat(F.lit("group-"), F.col("doc_id") % 7)).alias(
                "security_groups"
            ),
            created.alias("created"),
            (
                created + F.expr("make_interval(0,0,0,0, doc_id % 24, 0, 0)")
            ).alias("modified"),
            F.to_json(
                F.struct(
                    (F.col("doc_id") % 5).cast("long").alias("priority"),
                    F.struct(
                        (F.col("doc_id") % 97).cast("long").alias("uid")
                    ).alias("audit"),
                )
            ).alias("extra"),
        )

    body = proj("t", "body", F.col("text"), F.col("n_chars"))
    title = proj(
        "a",
        "title",
        F.expr(f"substring(text, 1, {TITLE_CHARS})"),
        F.least(F.lit(TITLE_CHARS), F.col("n_chars")),
    )
    uri = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".example/doc-"), F.col("doc_id")
    )
    link_text = F.concat(
        uri,
        F.lit(" "),
        F.expr(f"substring(text, {TITLE_CHARS} + 1, {LINK_SLICE_CHARS})"),
    )
    link = proj(
        "u", "link", link_text, F.length(link_text), uri_col=uri, mime="text/html"
    ).filter(F.col("rid") % 3 == 0)
    return body.unionByName(title).unionByName(link)


SQL_FIELDS_MULTI = f"""
SELECT 'kb0' AS kbid, CAST(doc_id AS BIGINT) AS rid,
       't' AS field_type, 'body' AS field_id, '/t/body' AS field_key,
       text, lang AS language, source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(NULL AS VARCHAR) AS uri,
       [concat('/s/p/', lang), concat('/u/s/', source)] AS labels,
       doc_id % 4 <> 0 AS security_public,
       [concat('group-', doc_id % 7)] AS security_groups,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 365) DAY AS created,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 365) DAY
           + INTERVAL (doc_id % 24) HOUR AS modified,
       to_json(struct_pack(
         priority := CAST(doc_id % 5 AS BIGINT),
         audit := struct_pack(uid := CAST(doc_id % 97 AS BIGINT))
       )) AS extra
FROM documents
UNION ALL
SELECT 'kb0', CAST(doc_id AS BIGINT),
       'a', 'title', '/a/title',
       substring(text, 1, {TITLE_CHARS}), lang, source,
       CAST(least({TITLE_CHARS}, n_chars) AS BIGINT),
       CAST(NULL AS VARCHAR),
       [concat('/s/p/', lang), concat('/u/s/', source)],
       doc_id % 4 <> 0,
       [concat('group-', doc_id % 7)],
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 365) DAY AS created,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 365) DAY
           + INTERVAL (doc_id % 24) HOUR AS modified,
       to_json(struct_pack(
         priority := CAST(doc_id % 5 AS BIGINT),
         audit := struct_pack(uid := CAST(doc_id % 97 AS BIGINT))
       )) AS extra
FROM documents
UNION ALL
SELECT 'kb0', CAST(doc_id AS BIGINT),
       'u', 'link', '/u/link',
       concat('http://', source, '.example/doc-', doc_id, ' ',
              substring(text, {TITLE_CHARS} + 1, {LINK_SLICE_CHARS})),
       lang, source,
       CAST(length(concat('http://', source, '.example/doc-', doc_id, ' ',
                          substring(text, {TITLE_CHARS} + 1, {LINK_SLICE_CHARS})))
            AS BIGINT),
       concat('http://', source, '.example/doc-', doc_id),
       [concat('/s/p/', lang), concat('/u/s/', source), '/n/i/text/html'],
       doc_id % 4 <> 0,
       [concat('group-', doc_id % 7)],
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 365) DAY AS created,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id % 365) DAY
           + INTERVAL (doc_id % 24) HOUR AS modified,
       to_json(struct_pack(
         priority := CAST(doc_id % 5 AS BIGINT),
         audit := struct_pack(uid := CAST(doc_id % 97 AS BIGINT))
       )) AS extra
FROM documents
WHERE doc_id % 3 = 0
"""


def paragraphs_fielded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraphs over the multi-field corpus, ids in the reference's
    full `rid/field/start-end` shape: the body field's stride windows
    (all TEXT — the title is its own field now, as in the reference's
    field model) plus one TITLE paragraph per rid from the '/a/title'
    generic field."""
    d = table(spark, sf_dir, "documents")
    start = F.explode(
        F.sequence(F.lit(0), F.col("n_chars") - 1, F.lit(PARAGRAPH_STRIDE))
    ).alias("start")
    p = d.select(F.col("doc_id").cast("long").alias("rid"), "text", "n_chars", start)
    end = F.least(F.col("start") + PARAGRAPH_STRIDE, F.col("n_chars"))
    body = p.select(
        "rid",
        F.concat_ws(
            "/", "rid", F.lit("body"), F.concat_ws("-", "start", end.cast("long"))
        ).alias("paragraph_id"),
        F.col("start").cast("long").alias("start"),
        end.cast("long").alias("end"),
        F.expr(f"substring(text, start + 1, {PARAGRAPH_STRIDE})").alias("text"),
        F.lit("TEXT").alias("kind"),
    )
    tend = F.least(F.lit(TITLE_CHARS), F.col("n_chars")).cast("long")
    title = d.select(
        F.col("doc_id").cast("long").alias("rid"),
        F.concat_ws(
            "/",
            F.col("doc_id").cast("long"),
            F.lit("title"),
            F.concat_ws("-", F.lit(0), tend),
        ).alias("paragraph_id"),
        F.lit(0).cast("long").alias("start"),
        tend.alias("end"),
        F.expr(f"substring(text, 1, {TITLE_CHARS})").alias("text"),
        F.lit("TITLE").alias("kind"),
    )
    # one paragraph per '/u/link' field (sparse: every third
    # resource), covering the link field's full extracted text —
    # text must equal the owning field's text slice so owning-field
    # extraction (J4) slices identically across families
    ltext = F.concat(
        F.lit("http://"),
        F.col("source"),
        F.lit(".example/doc-"),
        F.col("doc_id"),
        F.lit(" "),
        F.expr(f"substring(text, {TITLE_CHARS} + 1, {LINK_SLICE_CHARS})"),
    )
    lend = F.length(ltext).cast("long")
    link = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select(
            F.col("doc_id").cast("long").alias("rid"),
            F.concat_ws(
                "/",
                F.col("doc_id").cast("long"),
                F.lit("link"),
                F.concat_ws("-", F.lit(0), lend),
            ).alias("paragraph_id"),
            F.lit(0).cast("long").alias("start"),
            lend.alias("end"),
            ltext.alias("text"),
            F.lit("TEXT").alias("kind"),
        )
    )
    return body.unionByName(title).unionByName(link)


SQL_PARAGRAPHS_FIELDED = f"""
SELECT CAST(doc_id AS BIGINT) AS rid,
       concat(doc_id, '/body/', start, '-', least(start + {PARAGRAPH_STRIDE}, n_chars))
           AS paragraph_id,
       CAST(start AS BIGINT) AS start,
       CAST(least(start + {PARAGRAPH_STRIDE}, n_chars) AS BIGINT) AS "end",
       substring(text, start + 1, {PARAGRAPH_STRIDE}) AS text,
       'TEXT' AS kind
FROM (
  SELECT doc_id, text, n_chars,
         unnest(range(0, n_chars, {PARAGRAPH_STRIDE})) AS start
  FROM documents
)
UNION ALL
SELECT CAST(doc_id AS BIGINT),
       concat(doc_id, '/title/0-', least({TITLE_CHARS}, n_chars)),
       CAST(0 AS BIGINT),
       CAST(least({TITLE_CHARS}, n_chars) AS BIGINT),
       substring(text, 1, {TITLE_CHARS}),
       'TITLE'
FROM documents
UNION ALL
SELECT CAST(doc_id AS BIGINT),
       concat(doc_id, '/link/0-', length(ltext)),
       CAST(0 AS BIGINT),
       CAST(length(ltext) AS BIGINT),
       ltext,
       'TEXT'
FROM (
  SELECT doc_id,
         concat('http://', source, '.example/doc-', doc_id, ' ',
                substring(text, {TITLE_CHARS} + 1, {LINK_SLICE_CHARS})) AS ltext
  FROM documents WHERE doc_id % 3 = 0
)
"""


# Conversation resources get their OWN rid range: conversation_id is
# derived from events.user_id, which would otherwise collide with the
# part/document rid keyspace and attach an unrelated part's
# slug/title/security to every conversation (a wrong-by-construction
# join that parity can't catch because the oracle would do the same).
# The base is % 5 == 0 and % 4 == 0 so id-derived selections and
# security bits depend only on the conversation id.
CONV_RID_BASE = 1_000_000_000


def fields_conversation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One conversation field per conversation (field type 'c',
    resources.proto conversation fields): rid = CONV_RID_BASE +
    conversation_id (a disjoint keyspace — see CONV_RID_BASE),
    language from the conversation's majority is moot here — a fixed
    'en' matches the synthetic messages. Same join-contract columns
    as `fields`/`fields_multi` (rid, field_id, field_key, field_type,
    language)."""
    m = messages(spark, sf_dir)
    return m.groupBy(
        (F.col("conversation_id") + F.lit(CONV_RID_BASE)).alias("rid")
    ).agg(
        F.count("*").alias("n_messages")
    ).select(
        "rid",
        F.lit("c").alias("field_type"),
        F.lit("conv").alias("field_id"),
        F.lit("/c/conv").alias("field_key"),
        F.lit("en").alias("language"),
        "n_messages",
    )


SQL_FIELDS_CONVERSATION = f"""
SELECT rid, 'c' AS field_type, 'conv' AS field_id, '/c/conv' AS field_key,
       'en' AS language, n_messages
FROM (
  SELECT conversation_id + {CONV_RID_BASE} AS rid, COUNT(*) AS n_messages
  FROM ({SQL_MESSAGES}) GROUP BY conversation_id
)
"""


def resources_conversation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One RESOURCE per conversation in the disjoint CONV_RID_BASE
    keyspace — slug/title/security derived from the conversation id,
    so hydrate attaches metadata that actually belongs to the
    conversation (not an unrelated part that happened to share a
    rid). Only the hydrate join-contract columns."""
    m = messages(spark, sf_dir)
    cid = F.col("conversation_id")
    return m.groupBy(cid.alias("conversation_id")).agg(
        F.count("*").alias("n_messages")
    ).select(
        (cid + F.lit(CONV_RID_BASE)).alias("rid"),
        F.concat(F.lit("conversation-"), cid).alias("slug"),
        F.concat(F.lit("Conversation with user-"), cid).alias("title"),
        F.element_at(
            F.array(F.lit("WEB"), F.lit("DESKTOP"), F.lit("API")),
            (cid % 3 + 1).cast("int"),
        ).alias("origin_source"),
        (cid % 4 != 0).alias("security_public"),
    )


SQL_RESOURCES_CONVERSATION = f"""
SELECT conversation_id + {CONV_RID_BASE} AS rid,
       concat('conversation-', conversation_id) AS slug,
       concat('Conversation with user-', conversation_id) AS title,
       (['WEB', 'DESKTOP', 'API'])[(conversation_id % 3 + 1)] AS origin_source,
       conversation_id % 4 <> 0 AS security_public
FROM (
  SELECT conversation_id, COUNT(*) AS n_messages
  FROM ({SQL_MESSAGES}) GROUP BY conversation_id
)
"""


def paragraphs_conversation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation paragraphs with the reference's FULL 4-segment id
    `rid/field/split/start-end` (FieldUid.split addresses the message
    — nidx_text/src/reader.rs:482-487): one paragraph per message,
    split = message_idx, offsets within the message text."""
    m = messages(spark, sf_dir)
    tlen = F.length("text").cast("long")
    rid = F.col("conversation_id") + F.lit(CONV_RID_BASE)
    return m.select(
        rid.alias("rid"),
        F.concat_ws(
            "/",
            rid,
            F.lit("conv"),
            "message_idx",
            F.concat_ws("-", F.lit(0), tlen),
        ).alias("paragraph_id"),
        F.lit(0).cast("long").alias("start"),
        tlen.alias("end"),
        "text",
        F.lit("TEXT").alias("kind"),
    )


SQL_PARAGRAPHS_CONVERSATION = f"""
SELECT conversation_id + {CONV_RID_BASE} AS rid,
       concat(conversation_id + {CONV_RID_BASE}, '/conv/', message_idx,
              '/0-', length(text)) AS paragraph_id,
       CAST(0 AS BIGINT) AS start,
       CAST(length(text) AS BIGINT) AS "end",
       text,
       'TEXT' AS kind
FROM ({SQL_MESSAGES})
"""


def fields_multi_kb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-tenant variant of `fields`: documents split across two
    KBs (kbid = 'kb' || doc_id % 2). The reference is fundamentally
    multi-tenant — every search is kbid-scoped and each KB owns its
    own shards/indexes (nidx/src/searcher/shard_search.rs:94-105), so
    corpus statistics (N, avgdl, df) are PER KB, never global across
    tenants. At 100 TB, kbid is the leading partition key: a scoped
    query's scan prunes to one tenant's files before anything else."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("kb"), F.col("doc_id") % 2).alias("kbid"),
        F.col("doc_id").cast("long").alias("rid"),
        F.col("text"),
        F.col("lang").alias("language"),
        F.col("source"),
    )


SQL_FIELDS_MULTI_KB = """
SELECT concat('kb', doc_id % 2) AS kbid,
       CAST(doc_id AS BIGINT) AS rid,
       text,
       lang AS language,
       source
FROM documents
"""
