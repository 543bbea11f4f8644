"""Catalog search: faceted resource browsing, title match, sort, page.

Re-expresses the reference's PostgreSQL catalog
(ref: nucliadb/src/nucliadb/common/catalog/pg.py:117-415) as Spark
DataFrame ops. Each public function has a ``*_sql`` twin emitting the
equivalent DuckDB SQL (used by the oracle harness): the catalog path
in the reference IS SQL, so parity here is 1:1.

Scale notes:
- title-match & filters are row-local predicates → pushed to the scan.
- facet counting is explode → filter → groupBy: one shuffle keyed by
  facet value; facet cardinality is tiny (thousands) so AQE coalesces
  the post-shuffle partitions. Per-root top-50 is a window over the
  already-aggregated (small) facet counts.
- pagination sorts with a deterministic (sort_key, rid) tiebreak and
  uses TakeOrderedAndProject (orderBy+limit), never a global sort of
  the full table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nucliadb_spark.functions.text import tokenize, tokenize_sql
from nucliadb_spark.operators.filters import Expr, _sql_quote

# --- title match kinds (ref: pg.py:362-394 _prepare_query_search) ------

MATCH_KINDS = (
    "exact",
    "startswith",
    "words",
    "fuzzy",
    "trigram",
    "endswith",
    "contains",
)

TRIGRAM_THRESHOLD = 0.3  # pg_trgm word_similarity default (pg.py %> operator)


def _trigrams(c: Column) -> Column:
    """pg_trgm-style trigrams of the lowercased, space-padded string
    (two leading blanks, one trailing — matching PostgreSQL)."""
    padded = F.concat(F.lit("  "), F.lower(c), F.lit(" "))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(padded) - 2),
            lambda i: F.substring(padded, i, 3),  # type: ignore[arg-type]
        )
    )


def _trigrams_sql(expr: str) -> str:
    padded = f"concat('  ', lower({expr}), ' ')"
    return (
        f"list_distinct([substring({padded}, i, 3) "
        f"for i in range(1, length({padded}) - 1)])"
    )


def title_match(query: str, kind: str, column: str = "title") -> Column:
    q = query.lower()
    c = F.lower(F.col(column))
    if kind == "exact":
        return c == q
    if kind == "startswith":
        return c.startswith(q)
    if kind == "words":
        # every query token appears among the title tokens; single
        # array_except so the title tokenizes once per row
        return F.size(F.array_except(tokenize(F.lit(query)), tokenize(column))) == 0
    if kind == "fuzzy":
        # any title token within edit distance 1 of the query term
        # (ref fuzzy distance 1: nidx_relation/src/reader.rs:33);
        # length band + bounded levenshtein keep the scan cheap
        return F.exists(
            tokenize(column),
            lambda t: (F.abs(F.length(t) - F.lit(len(q))) <= 1)
            & (F.levenshtein(t, F.lit(q), 1) >= 0),
        )
    if kind == "trigram":
        # pg_trgm similarity (ref pg.py:386 `%>`): shared/query
        # trigram ratio ≥ threshold
        qt = _trigrams(F.lit(query))
        tt = _trigrams(c)
        shared = F.size(F.array_intersect(qt, tt)).cast("double")
        return shared / F.size(qt).cast("double") >= TRIGRAM_THRESHOLD
    if kind == "endswith":
        return c.endswith(q)
    if kind == "contains":
        return c.contains(q)
    raise ValueError(f"unknown match kind {kind}")


def title_match_sql(query: str, kind: str, column: str = "title") -> str:
    q = query.lower()
    qs = _sql_quote(q)
    c = f"lower({column})"
    if kind == "exact":
        return f"{c} = {qs}"
    if kind == "startswith":
        return f"starts_with({c}, {qs})"
    if kind == "words":
        return (
            f"len(list_filter({tokenize_sql(_sql_quote(query))}, "
            f"t -> NOT list_contains({tokenize_sql(column)}, t))) = 0"
        )
    if kind == "fuzzy":
        return (
            f"len(list_filter({tokenize_sql(column)}, "
            f"t -> levenshtein(t, {qs}) <= 1)) > 0"
        )
    if kind == "trigram":
        qt = _trigrams_sql(qs)
        tt = _trigrams_sql(f"lower({column})")
        return (
            f"(len(list_filter({qt}, g -> list_contains({tt}, g)))::DOUBLE"
            f" / len({qt})::DOUBLE) >= {TRIGRAM_THRESHOLD}"
        )
    if kind == "endswith":
        return f"ends_with({c}, {qs})"
    if kind == "contains":
        return f"contains({c}, {qs})"
    raise ValueError(f"unknown match kind {kind}")


# --- catalog search (ref: pg.py:117 search, :237 _prepare_query) -------


def catalog_search(
    resources: DataFrame,
    query: str | None = None,
    match_kind: str = "words",
    filters: Expr | None = None,
    sort_by: str = "created",
    ascending: bool = False,
    page_number: int = 0,
    page_size: int = 20,
) -> DataFrame:
    """Filter + sort + paginate the resources table.

    Deterministic pagination: tiebreak on rid. Offset pagination is
    implemented with a row_number window over the top slice only —
    we first cut to (page+1)*size rows via orderBy+limit (TopK, no
    global sort) and then drop the earlier pages.
    """
    df = resources
    if query:
        df = df.filter(title_match(query, match_kind))
    if filters is not None:
        df = df.filter(filters.to_column())
    sort_cols = [
        F.col(sort_by).asc() if ascending else F.col(sort_by).desc(),
        F.col("rid").asc(),
    ]
    take = (page_number + 1) * page_size
    top = df.orderBy(*sort_cols).limit(take)
    w = Window.orderBy(*sort_cols)
    return (
        top.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > page_number * page_size)
        .drop("_rn")
    )


def catalog_search_sql(
    resources_sql: str,
    query: str | None = None,
    match_kind: str = "words",
    filters: Expr | None = None,
    sort_by: str = "created",
    ascending: bool = False,
    page_number: int = 0,
    page_size: int = 20,
    columns: str = "*",
) -> str:
    where = []
    if query:
        where.append(title_match_sql(query, match_kind))
    if filters is not None:
        where.append(filters.to_sql())
    where_sql = ("WHERE " + " AND ".join(where)) if where else ""
    direction = "ASC" if ascending else "DESC"
    return f"""
WITH resources AS ({resources_sql})
SELECT {columns} FROM resources
{where_sql}
ORDER BY {sort_by} {direction}, rid ASC
LIMIT {page_size} OFFSET {page_number * page_size}
"""


def catalog_count(resources: DataFrame, filters: Expr | None = None) -> DataFrame:
    """Total count of the filtered catalog (ref: pg.py:141-147)."""
    df = resources
    if filters is not None:
        df = df.filter(filters.to_column())
    return df.agg(F.count("*").alias("total"))


# --- faceted search (ref: pg.py:124-138, 269-359) ----------------------


def faceted_search(
    resources: DataFrame,
    roots: list[str],
    filters: Expr | None = None,
    top_k: int = 50,
    labels_column: str = "labels",
) -> DataFrame:
    """Per-root child facet counts, top-k per root.

    ref: _faceted_search_unfiltered / _faceted_search_filtered and the
    index-side facet collector (nidx_text/src/reader.rs:43-62,
    top_k=50). Output: (root, facet, count_), deterministic order not
    required (driver hashes order-insensitively).
    """
    df = resources
    if filters is not None:
        df = df.filter(filters.to_column())
    exploded = df.select(F.explode(labels_column).alias("facet"))
    out = None
    for root in roots:
        part = (
            exploded.filter(F.col("facet").startswith(root + "/"))
            .groupBy("facet")
            .agg(F.count("*").alias("count_"))
            .withColumn("root", F.lit(root))
        )
        out = part if out is None else out.unionByName(part)
    assert out is not None
    w = Window.partitionBy("root").orderBy(
        F.col("count_").desc(), F.col("facet").asc()
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .drop("_rn")
        .select("root", "facet", "count_")
    )


def faceted_search_from_counters(
    counters: DataFrame, roots: list[str], top_k: int = 50
) -> DataFrame:
    """:func:`faceted_search` SERVED from a maintained (facet, n)
    counter sidecar instead of the corpus: per-root prefix prune +
    top-k window over a facet-cardinality-sized frame — no corpus
    scan, no label explode, per request. The maintenance plane is
    ingest.cdc_facet_counter_ingest (the streaming analog of the
    catalog_facets table PostgreSQL maintains transactionally,
    nucliadb/src/nucliadb/common/catalog/pg.py:72-107)."""
    out = None
    for root in roots:
        part = (
            counters.filter(F.col("facet").startswith(root + "/"))
            .withColumn("root", F.lit(root))
            .withColumnRenamed("n", "count_")
        )
        out = part if out is None else out.unionByName(part)
    assert out is not None
    w = Window.partitionBy("root").orderBy(
        F.col("count_").desc(), F.col("facet").asc()
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .drop("_rn")
        .select("root", "facet", "count_")
    )


def catalog_endpoint(
    resources: DataFrame,
    query: str | None = None,
    match_kind: str = "words",
    filters: Expr | None = None,
    faceted: list[str] | None = None,
    sort_by: str = "created",
    ascending: bool = False,
    page_number: int = 0,
    page_size: int = 20,
    with_total: bool = True,
) -> dict:
    """The full catalog response (ref: pg.py:117-172 `search` →
    Resources{results, facets, total, next_page}): results page,
    per-root facet counts, filtered total, and next_page via the
    k+1 trick (fetch size+1 rows, report whether the extra exists —
    O7, reader.rs:432-449).

    with_total=False skips the exact filtered COUNT — at scale the
    count is a second full scan of the filtered corpus per page
    request (the reference pays the same SQL COUNT, pg.py:168); when
    it is requested we persist the filtered frame so the page top-k
    and the count share one materialization instead of two scans."""
    df = resources
    if query:
        df = df.filter(title_match(query, match_kind))
    if filters is not None:
        df = df.filter(filters.to_column())
    sort_cols = [
        F.col(sort_by).asc() if ascending else F.col(sort_by).desc(),
        F.col("rid").asc(),
    ]
    skip = page_number * page_size
    persisted = with_total and (query or filters is not None)
    if persisted:
        df = df.persist()
    try:
        top = df.orderBy(*sort_cols).limit(skip + page_size + 1)
        w = Window.orderBy(*sort_cols)
        rows = (
            top.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > skip)
            .drop("_rn")
            .collect()
        )
        return {
            "results": rows[:page_size],
            "next_page": len(rows) > page_size,
            "total": df.count() if with_total else None,
            "facets": faceted_search(resources, faceted, filters) if faceted else None,
        }
    finally:
        if persisted:
            df.unpersist()


def facet_rollup(
    resources: DataFrame,
    max_depth: int = 3,
    labels_column: str = "labels",
) -> DataFrame:
    """Hierarchical facet counts with parent accumulation (A4,
    ref: pg.py:314-359): every label contributes to each of its
    ancestor paths up to max_depth. (facet, count_)."""
    parts = F.split(F.col("label"), "/")
    ancestors = F.transform(
        F.sequence(F.lit(1), F.least(F.size(parts) - 1, F.lit(max_depth))),
        lambda d: F.concat(F.lit("/"), F.array_join(F.slice(parts, 2, d), "/")),
    )
    return (
        resources.select(F.explode(labels_column).alias("label"))
        .select(F.explode(ancestors).alias("facet"))
        .groupBy("facet")
        .agg(F.count("*").alias("count_"))
        .orderBy(F.col("count_").desc(), F.col("facet").asc())
    )


def labelsets_listing(
    resources: DataFrame, labels_column: str = "labels"
) -> DataFrame:
    """GET /kb/{kbid}/labelsets analog (reader/api/v1/services.py:
    128-209): list each classification labelset with its label
    inventory size and usage. The reference reads stored LabelSet
    declarations from KV; the lakehouse analog derives the listing
    from the indexed ``/l/{labelset}/{label}`` facets themselves —
    (labelset, n_labels, n_resources) where n_labels counts distinct
    labels in the set and n_resources counts distinct resources
    carrying any of them. One explode (row-local) + one two-level
    distinct aggregation; cardinality is the labelset vocabulary,
    never the resource count."""
    parts = F.split(F.col("label"), "/")
    return (
        resources.select(
            F.col("rid"), F.explode(labels_column).alias("label")
        )
        .filter(F.col("label").startswith("/l/"))
        .select(
            F.element_at(parts, 3).alias("labelset"),
            F.element_at(parts, 4).alias("label"),
            "rid",
        )
        .groupBy("labelset")
        .agg(
            F.countDistinct("label").cast("long").alias("n_labels"),
            F.countDistinct("rid").cast("long").alias("n_resources"),
        )
        .orderBy("labelset")
    )


def labelsets_listing_sql(resources_sql: str) -> str:
    return f"""
WITH resources AS ({resources_sql}),
l AS (
  SELECT rid, unnest(labels) AS label FROM resources
),
split AS (
  SELECT string_split(label, '/')[3] AS labelset,
         string_split(label, '/')[4] AS label,
         rid
  FROM l WHERE label LIKE '/l/%'
)
SELECT labelset,
       CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
       CAST(COUNT(DISTINCT rid) AS BIGINT) AS n_resources
FROM split
GROUP BY labelset
ORDER BY labelset
"""


def processing_status(
    resources: DataFrame,
    limit: int = 20,
    cursor: str | None = None,
) -> DataFrame:
    """GET /kb/{kbid}/processing-status analog (reader/api/v1/
    services.py:266-323): the reference lists in-flight processing
    requests from the external processing service, composes resource
    titles, and pages by cursor+limit. The lakehouse analog lists
    PENDING resources as the processing queue — (position, rid,
    title, status, created), queue-ordered (created asc, rid asc),
    keyset cursor on created.

    Scale shape: the page is cut with orderBy+limit FIRST
    (TakeOrderedAndProject — a per-partition top-N, no global sort),
    and the position row_number runs over the <=limit-row page, so
    the single-partition window never sees more than one page."""
    from pyspark.sql import Window

    q = resources.filter(F.col("status") == "PENDING")
    if cursor is not None:
        q = q.filter(F.col("created") > F.lit(cursor).cast("timestamp"))
    page = q.select("rid", "title", "status", "created").orderBy(
        "created", "rid"
    ).limit(limit)
    w = Window.orderBy("created", "rid")
    return page.select(
        F.row_number().over(w).cast("long").alias("position"),
        "rid",
        "title",
        "status",
        "created",
    )


def processing_status_sql(
    resources_sql: str, limit: int = 20, cursor: str | None = None
) -> str:
    # oracle-builder input: the cursor is interpolated into SQL, so
    # accept trusted timestamp constants only — never caller data
    if cursor is not None and not all(c in "0123456789-: ." for c in cursor):
        raise ValueError(f"cursor must be a plain timestamp literal: {cursor!r}")
    if not isinstance(limit, int):
        raise ValueError("limit must be an int")
    cur = (
        f"AND created > TIMESTAMP '{cursor}'" if cursor is not None else ""
    )
    return f"""
WITH resources AS ({resources_sql}),
page AS (
  SELECT rid, title, status, created
  FROM resources
  WHERE status = 'PENDING' {cur}
  ORDER BY created, rid
  LIMIT {limit}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY created, rid) AS BIGINT) AS position,
       rid, title, status, created
FROM page
"""


def facet_rollup_sql(resources_sql: str, max_depth: int = 3) -> str:
    return f"""
WITH resources AS ({resources_sql}),
labels AS (SELECT unnest(labels) AS label FROM resources),
ancestors AS (
  SELECT unnest([
    '/' || array_to_string(list_slice(string_split(label, '/'), 2, 1 + d), '/')
    for d in range(1, least(len(string_split(label, '/')) - 1, {max_depth}) + 1)
  ]) AS facet
  FROM labels
)
SELECT facet, COUNT(*) AS count_
FROM ancestors
GROUP BY facet
ORDER BY count_ DESC, facet ASC
"""


def faceted_search_sql(
    resources_sql: str,
    roots: list[str],
    filters: Expr | None = None,
    top_k: int = 50,
) -> str:
    where = f"WHERE {filters.to_sql()}" if filters is not None else ""
    unions = []
    for root in roots:
        r = _sql_quote(root + "/")
        unions.append(
            f"""SELECT {_sql_quote(root)} AS root, facet, COUNT(*) AS count_
FROM (SELECT unnest(labels) AS facet FROM filtered)
WHERE starts_with(facet, {r})
GROUP BY facet"""
        )
    union_sql = "\nUNION ALL\n".join(unions)
    return f"""
WITH resources AS ({resources_sql}),
filtered AS (SELECT * FROM resources {where}),
counts AS ({union_sql}),
ranked AS (
  SELECT root, facet, count_,
         row_number() OVER (PARTITION BY root ORDER BY count_ DESC, facet ASC) AS rn
  FROM counts
)
SELECT root, facet, count_ FROM ranked WHERE rn <= {top_k}
"""
