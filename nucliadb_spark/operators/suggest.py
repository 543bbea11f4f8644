"""Suggest / autocomplete (SURVEY §2.3 T9, §2.5 G8) and keyset
pagination (§2.7 O5).

ref: nidx/src/searcher/shard_suggest.rs:95-180 — suggest runs a
paragraph fuzzy-prefix search and an entity prefix search in
parallel and merges (top 10, fuzzy boosted 0.5). Batch shape:

- paragraph side: vocabulary terms matching prefix (boost 1.0) or
  levenshtein<=1 (boost 0.5) expand into BM25 scoring (the vocabulary
  is tiny relative to the corpus — the expansion join is broadcast).
- entity side: distinct node-value prefix scan of the relations
  table.

search_after (ref: nodereader.proto:382-386, search/search/
search_after.py): keyset pagination — a pushed-down predicate on the
(sort_key, tiebreak_id) cursor instead of OFFSET, so deep pages cost
the same as page one at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nucliadb_spark.functions.text import tokenize_sql
from nucliadb_spark.operators import bm25
from nucliadb_spark.operators.filters import _sql_quote

SUGGEST_TOP_K = 10  # ref: shard_suggest.rs:103
FUZZY_BOOST = 0.5


def suggest_paragraphs(
    fields: DataFrame,
    prefix: str,
    top_k: int = SUGGEST_TOP_K,
    id_col: str = "rid",
    post: DataFrame | None = None,
    stats: DataFrame | None = None,
    vocab: DataFrame | None = None,
    corpus: DataFrame | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Docs whose vocabulary matches the prefix (exact-prefix 1.0 /
    fuzzy 0.5), BM25-ranked: (rid, score).

    post/stats/vocab: the prebuilt serving index (suggest is an
    as-you-type endpoint — it must never rebuild the index per
    keystroke; pass the session-cached postings/docstats/vocabulary).

    allowed: optional (rid) frame — the reference's /suggest accepts
    the same filter surface as find (filter_expression / label
    filters / creation+modification ranges, search/api/v1/
    suggest.py:60-68) applied as a prefilter: candidates semijoin
    the allowed set while df/N/avgdl stay GLOBAL, the serve-time
    contract every other filtered read here follows (never a stats
    rebuild per keystroke). No broadcast hint — the allowed set is
    query-dependent and unbounded, AQE decides."""
    if post is None:
        post = bm25.postings(fields, id_col=id_col)
    if stats is None:
        stats = bm25.doc_stats_from_postings(post)
    if corpus is None:
        corpus = bm25.corpus_stats(stats)
    if vocab is None:
        vocab = bm25.vocabulary(post)
    p = prefix.lower()
    # prefix probe is a codegen range scan; the fuzzy half prunes with
    # the |len| <= 1 band before a bounded (threshold=1) levenshtein
    matched = vocab.filter(
        F.col("term").startswith(p)
        | (
            (F.abs(F.length(F.col("term")) - F.lit(len(p))) <= 1)
            & (F.levenshtein(F.col("term"), F.lit(p), 1) >= 0)
        )
    ).withColumn(
        "boost",
        F.when(F.col("term").startswith(p), F.lit(1.0)).otherwise(F.lit(FUZZY_BOOST)),
    )
    if allowed is not None:
        # postings are always rid-keyed (bm25.postings aliases id_col)
        post = post.join(allowed, "rid", "semi")
    # df rides on the vocab rows (term dictionary stores doc_freq) —
    # no per-keystroke postings aggregation
    scored = (
        post.join(F.broadcast(matched.select("term", "df", "boost")), "term")
        .join(stats, "rid")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "contrib",
            F.col("boost")
            * F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * F.col("tf") * (bm25.K1 + 1.0)
            / (F.col("tf") + bm25.K1 * (1.0 - bm25.B + bm25.B * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("rid")
        .agg(F.round(F.sum("contrib"), 4).cast(bm25.SCORE_TYPE).alias("score"))
        .orderBy(F.col("score").desc(), F.col("rid").asc())
        .limit(top_k)
    )


def suggest_paragraphs_sql(
    fields_sql: str,
    prefix: str,
    top_k: int = SUGGEST_TOP_K,
    allowed_sql: str | None = None,
) -> str:
    """DuckDB twin. allowed_sql: a SELECT yielding allowed rids —
    applied to the CANDIDATES only (the scored aggregation), never to
    post/docstats/corpus, mirroring the served global-stats
    prefilter."""
    p = _sql_quote(prefix.lower())
    allowed_where = (
        f"WHERE p.rid IN ({allowed_sql})" if allowed_sql is not None else ""
    )
    return f"""
WITH fields AS ({fields_sql}),
toks AS (SELECT rid, unnest({tokenize_sql("text")}) AS term FROM fields),
post AS (SELECT rid, term, COUNT(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
docstats AS (SELECT rid, SUM(tf) AS dl FROM post GROUP BY rid),
corpus AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM docstats),
matched AS (
  SELECT term,
         CASE WHEN starts_with(term, {p}) THEN 1.0 ELSE {FUZZY_BOOST} END AS boost
  FROM (SELECT DISTINCT term FROM post)
  WHERE starts_with(term, {p}) OR levenshtein(term, {p}) <= 1
),
dfreq AS (
  SELECT p.term, m.boost, COUNT(*)::DOUBLE AS df
  FROM post p JOIN matched m USING (term) GROUP BY 1, 2
),
scored AS (
  SELECT p.rid,
         SUM(d.boost * ln(1.0 + (c.n - d.df + 0.5) / (d.df + 0.5))
             * p.tf * ({bm25.K1} + 1.0)
             / (p.tf + {bm25.K1} * (1.0 - {bm25.B} + {bm25.B} * s.dl / c.avgdl))) AS raw
  FROM post p
  JOIN dfreq d USING (term)
  JOIN docstats s USING (rid)
  CROSS JOIN corpus c
  {allowed_where}
  GROUP BY p.rid
)
SELECT rid, ROUND(raw, 4)::DOUBLE AS score
FROM scored
ORDER BY score DESC, rid ASC
LIMIT {top_k}
"""


def suggest_entities(
    relations: DataFrame, prefix: str, top_k: int = SUGGEST_TOP_K, fold: bool = False
) -> DataFrame:
    """Entity-name prefix scan over distinct graph nodes (G8):
    (value, subtype).

    fold=True applies the reference's relation-node normalization to
    BOTH sides (ASCII transliteration + lowercase,
    nidx_relation/src/schema.rs:123-137) so accented queries match
    ASCII-indexed entities and vice versa."""
    nodes = relations.select(
        F.col("source_value").alias("value"), F.col("source_subtype").alias("subtype")
    ).unionAll(
        relations.select(
            F.col("target_value").alias("value"), F.col("target_subtype").alias("subtype")
        )
    )
    if fold:
        from nucliadb_spark.functions.text import fold_diacritics, fold_diacritics_py

        match = fold_diacritics(F.col("value")).startswith(fold_diacritics_py(prefix))
    else:
        match = F.col("value").startswith(prefix)
    return (
        nodes.filter(match)
        .distinct()
        .orderBy("value", "subtype")
        .limit(top_k)
    )


def suggest_entities_sql(
    relations_sql: str, prefix: str, top_k: int = SUGGEST_TOP_K, fold: bool = False
) -> str:
    if fold:
        from nucliadb_spark.functions.text import fold_diacritics_py, fold_diacritics_sql

        p = _sql_quote(fold_diacritics_py(prefix))
        value_expr = fold_diacritics_sql("value")
    else:
        p = _sql_quote(prefix)
        value_expr = "value"
    return f"""
WITH relations AS ({relations_sql}),
nodes AS (
  SELECT source_value AS value, source_subtype AS subtype FROM relations
  UNION ALL
  SELECT target_value, target_subtype FROM relations
)
SELECT DISTINCT value, subtype
FROM nodes
WHERE starts_with({value_expr}, {p})
ORDER BY value, subtype
LIMIT {top_k}
"""


# --- search_after keyset pagination (O5) -----------------------------------


def search_after(
    df: DataFrame,
    sort_col: str,
    cursor_sort_value,
    cursor_id,
    page_size: int = 20,
    id_col: str = "rid",
    ascending: bool = False,
) -> DataFrame:
    """Next page strictly after cursor (sort_value, id) — pushed-down
    predicate, no OFFSET scan."""
    s, i = F.col(sort_col), F.col(id_col)
    if ascending:
        cond = (s > cursor_sort_value) | ((s == cursor_sort_value) & (i > cursor_id))
        order = [s.asc(), i.asc()]
    else:
        cond = (s < cursor_sort_value) | ((s == cursor_sort_value) & (i > cursor_id))
        order = [s.desc(), i.asc()]
    return df.filter(cond).orderBy(*order).limit(page_size)


def search_after_sql(
    source_sql: str,
    sort_col: str,
    cursor_sort_value: str,
    cursor_id,
    page_size: int = 20,
    id_col: str = "rid",
    ascending: bool = False,
    columns: str = "*",
) -> str:
    op = ">" if ascending else "<"
    direction = "ASC" if ascending else "DESC"
    return f"""
WITH src AS ({source_sql})
SELECT {columns} FROM src
WHERE {sort_col} {op} {cursor_sort_value}
   OR ({sort_col} = {cursor_sort_value} AND {id_col} > {cursor_id})
ORDER BY {sort_col} {direction}, {id_col} ASC
LIMIT {page_size}
"""


def query_correction(
    query: str,
    vocab: DataFrame,
) -> DataFrame:
    """Did-you-mean: for each query term absent from the vocabulary,
    the highest-df indexed term within edit distance 1 —
    (term, suggestion, df). Terms present in the vocab verbatim emit
    no row (nothing to correct). Same candidate rule as the fuzzy
    query path (length band + bounded levenshtein over the cached
    term dictionary), so the correction is exactly the term fuzzy
    search would have scored best."""
    from nucliadb_spark.functions.text import tokenize_py

    from nucliadb_spark.functions.text import transposition_variants

    terms = sorted(set(tokenize_py(query)))
    present = vocab.filter(F.col("term").isin(terms)).select("term")
    # (q, variant) pairs let the candidate rule count an adjacent
    # transposition as distance 1, like the reference's fuzzy
    # automaton (fuzzy_parser.rs:73)
    swap_rows = [(t, v) for t in terms for v in transposition_variants(t)]
    spark = vocab.sparkSession
    # literal frames (guide §4): createDataFrame parallelizes tiny
    # driver lists into one Python-worker task per slice
    from nucliadb_spark.functions import frames

    swaps = frames.literal_frame(spark, swap_rows, "q string, v string")
    cand = (
        vocab.crossJoin(frames.literal_frame(spark, [(t,) for t in terms], "q string"))
        .join(
            swaps.withColumnRenamed("v", "_swap"),
            ["q"],
            "left",
        )
        .filter(
            (
                (F.abs(F.length("term") - F.length("q")) <= 1)
                & (F.levenshtein(F.col("term"), F.col("q"), 1) >= 0)
                | (F.col("term") == F.col("_swap"))
            )
            & (F.col("term") != F.col("q"))
        )
        .select("q", "term", "df")
        .distinct()
        .join(present.withColumnRenamed("term", "q"), "q", "left_anti")
    )
    best = cand.groupBy("q").agg(
        F.max_by(
            F.struct(F.col("term"), F.col("df")),
            F.struct(F.col("df"), F.col("term")),
        ).alias("_b")
    )
    return best.select(
        F.col("q").alias("term"),
        F.col("_b.term").alias("suggestion"),
        F.col("_b.df").cast("long").alias("df"),
    ).orderBy("term")


def query_correction_sql(fields_sql: str, query: str) -> str:
    from nucliadb_spark.functions.text import tokenize_py, tokenize_sql

    from nucliadb_spark.functions.text import transposition_variants

    terms = sorted(set(tokenize_py(query)))
    lst = ", ".join(f"'{t}'" for t in terms)
    swap_rows = [(t, v) for t in terms for v in transposition_variants(t)]
    swaps_values = (
        "SELECT * FROM (VALUES "
        + ", ".join(f"('{q}', '{v}')" for q, v in swap_rows)
        + ") AS t(q, v)"
        if swap_rows
        else "SELECT '' AS q, '' AS v WHERE false"
    )
    toks = tokenize_sql("text")
    return f"""
WITH fields AS ({fields_sql}),
post AS (
  SELECT DISTINCT rid, unnest(list_distinct({toks})) AS term FROM fields
),
vocab AS (SELECT term, COUNT(*)::BIGINT AS df FROM post GROUP BY term),
qterms AS (SELECT unnest([{lst}]) AS q),
missing AS (
  SELECT q FROM qterms WHERE q NOT IN (SELECT term FROM vocab)
),
swaps AS ({swaps_values}),
cand AS (
  SELECT m.q, v.term, v.df,
         ROW_NUMBER() OVER (PARTITION BY m.q
                            ORDER BY v.df DESC, v.term DESC) AS rn
  FROM missing m JOIN vocab v
    ON ((abs(length(v.term) - length(m.q)) <= 1
         AND levenshtein(v.term, m.q) <= 1)
        OR EXISTS (SELECT 1 FROM swaps s WHERE s.q = m.q AND s.v = v.term))
   AND v.term <> m.q
)
SELECT q AS term, term AS suggestion, df
FROM cand WHERE rn = 1
ORDER BY term
"""


def correction_matched_sql(query: str) -> str:
    """Fragment for bm25_sql(matched_sql=...): the AUTOCORRECTED term
    set as a (term, boost) SELECT — query terms present in the vocab
    pass through, absent terms are replaced by their did-you-mean
    correction (same candidate rule as query_correction), terms with
    no correction drop out. References the surrounding pipeline's
    `vocab (term, df)` CTE (bm25_sql emits it whenever matched_sql
    is set)."""
    from nucliadb_spark.functions.text import tokenize_py, transposition_variants

    terms = sorted(set(tokenize_py(query)))
    lst = ", ".join(f"'{t}'" for t in terms)
    swap_rows = [(t, v) for t in terms for v in transposition_variants(t)]
    swaps_values = (
        "SELECT * FROM (VALUES "
        + ", ".join(f"('{q}', '{v}')" for q, v in swap_rows)
        + ") AS t(q, v)"
        if swap_rows
        else "SELECT '' AS q, '' AS v WHERE false"
    )
    return f"""
  WITH qterms AS (SELECT unnest([{lst}]) AS q),
  missing AS (SELECT q FROM qterms WHERE q NOT IN (SELECT term FROM vocab)),
  swaps AS ({swaps_values}),
  cand AS (
    SELECT m.q, v.term,
           ROW_NUMBER() OVER (PARTITION BY m.q
                              ORDER BY v.df DESC, v.term DESC) AS rn
    FROM missing m JOIN vocab v
      ON ((abs(length(v.term) - length(m.q)) <= 1
           AND levenshtein(v.term, m.q) <= 1)
          OR EXISTS (SELECT 1 FROM swaps s WHERE s.q = m.q AND s.v = v.term))
     AND v.term <> m.q
  )
  SELECT q AS term, 1.0 AS boost FROM qterms
  WHERE q IN (SELECT term FROM vocab)
  UNION
  SELECT term, 1.0 AS boost FROM cand WHERE rn = 1
"""
