"""Registry entries: rank fusion + the flagship find pipeline
(SURVEY §2.9 R1/R2/R4, §3.1)."""

from __future__ import annotations

from nucliadb_spark.operators import bm25, find, fusion, knn
from nucliadb_spark.operators import filters as fx
from nucliadb_spark.registry import register
from nucliadb_spark.sources import tpch

# --- the flagship: keyword + semantic + graph → RRF → hydrate -----------


@register(
    "find_hybrid",
    find.find_sql(
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=10,
        window=50,
    ),
)
def find_hybrid(spark, sf_dir):
    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    post, stats = _text_index(spark, sf_dir)
    return find.find(
        spark,
        sf_dir,
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=10,
        window=50,
        post=post,
        stats=stats,
        corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    )


def _find_after_oracle() -> str:
    inner = find.find_sql(
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=50,
        window=50,
    )
    return f"""
WITH ranking AS ({inner}),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, id ASC) AS rn
  FROM ranking
),
cursor AS (SELECT score AS c_score, id AS c_id FROM ranked WHERE rn = 10)
SELECT r.id, r.score, r.matched_sources, r.language, r.source, r.snippet
FROM ranking r, cursor c
WHERE r.score < c.c_score OR (r.score = c.c_score AND r.id > c.c_id)
ORDER BY r.score DESC, r.id ASC
LIMIT 10
"""


@register("find_hybrid_after", _find_after_oracle())
def find_hybrid_after(spark, sf_dir):
    """PAGE 2 of the flagship via keyset pagination (O5 through the
    find pipeline — ref nodereader.proto:382-386 + search/search/
    search_after.py): the fused ranking is computed once to the
    fusion-window depth (the pageable horizon, O6), page 1's last
    (score, id) row becomes the cursor as a broadcast 1-row join,
    and page 2 is a pushed-down keyset predicate + top-10 — no
    OFFSET scan, so the cost is independent of page depth (the same
    cursor shape `FindRequest.search_after` accepts as literals from
    a client's previous response). All paging work happens on the
    ≤window-row fused frame; the corpus-sized retriever legs are
    untouched."""
    from pyspark.sql import Window, functions as F

    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    post, stats = _text_index(spark, sf_dir)
    ranking = find.find(
        spark,
        sf_dir,
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=50,
        window=50,
        post=post,
        stats=stats,
        corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    cursor = (
        ranking.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 10)
        .select(F.col("score").alias("c_score"), F.col("id").alias("c_id"))
    )
    return (
        ranking.crossJoin(F.broadcast(cursor))
        .filter(
            (F.col("score") < F.col("c_score"))
            | ((F.col("score") == F.col("c_score")) & (F.col("id") > F.col("c_id")))
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(10)
        .select("id", "score", "matched_sources", "language", "source", "snippet")
    )


# --- flagship served from the IVF index (the 100 TB plan shape) ----------
# Semantic leg probes nprobe=2 of the prebuilt cells instead of
# scanning the whole vectors table (V1 serving analog of HNSW,
# nidx/nidx_vector/src/searcher.rs:300-312).


@register(
    "find_hybrid_ivf",
    find.find_sql(
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=10,
        window=50,
        ann="ivf",
        nprobe=2,
    ),
)
def find_hybrid_ivf(spark, sf_dir):
    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    post, stats = _text_index(spark, sf_dir)
    return find.find(
        spark,
        sf_dir,
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=10,
        window=50,
        post=post,
        stats=stats,
        corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
        ann="ivf",
        nprobe=2,
    )


# --- find with prefilter + min_score + weights ---------------------------

_PREF = fx.Facet("/s/p/en")


@register(
    "find_prefiltered",
    find.find_sql(
        "merge join batch",
        query_vec_id=3,
        top_k=10,
        window=40,
        min_score=0.1,
        where=_PREF.to_sql(),
        weights={"keyword": 1.0, "semantic": 2.0},
    ),
)
def find_prefiltered(spark, sf_dir):
    return find.find(
        spark,
        sf_dir,
        "merge join batch",
        query_vec_id=3,
        top_k=10,
        window=40,
        min_score=0.1,
        prefilter=_PREF,
        weights={"keyword": 1.0, "semantic": 2.0},
    )


# --- flagship served-prefilter leg: the 100 TB prefilter plan --------------
# Same request as find_prefiltered, but the keyword leg serves from
# the PREBUILT global index with the filter as a candidate-only
# semijoin (tantivy's serve-time prefilter, nidx/nidx_text/src/
# reader.rs:148-180) instead of rebuilding postings per query.
# Scores differ from the rebuild variant by design: df/N/avgdl are
# corpus-global here, per-filtered-shard there.


@register(
    "find_prefiltered_served",
    find.find_sql(
        "merge join batch",
        query_vec_id=3,
        top_k=10,
        window=40,
        min_score=0.1,
        where=_PREF.to_sql(),
        weights={"keyword": 1.0, "semantic": 2.0},
        served=True,
    ),
)
def find_prefiltered_served(spark, sf_dir):
    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    post, stats = _text_index(spark, sf_dir)
    return find.find(
        spark,
        sf_dir,
        "merge join batch",
        query_vec_id=3,
        top_k=10,
        window=40,
        min_score=0.1,
        prefilter=_PREF,
        weights={"keyword": 1.0, "semantic": 2.0},
        post=post,
        stats=stats,
        corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
        served=True,
    )


# --- F5 in the pipeline: find restricted by security groups ----------------

_SEC = fx.SecurityFilter(groups=["group-2", "group-5"])


@register(
    "find_secured",
    find.find_sql(
        "table scan filter",
        query_vec_id=7,
        top_k=10,
        window=40,
        where=_SEC.to_sql(),
    ),
)
def find_secured(spark, sf_dir):
    return find.find(
        spark,
        sf_dir,
        "table scan filter",
        query_vec_id=7,
        top_k=10,
        window=40,
        prefilter=_SEC,
    )


# --- U4/O5: find second page via shown-result skip set ---------------------
# ref: find.py:122-126 — the search_after token carries the ids already
# shown; the next page anti-joins them out before the cut.

_SHOWN = [340, 159, 309, 24, 336]  # top-5 of find_hybrid at any sf


@register(
    "find_skip_set",
    f"""
WITH page AS ({find.find_sql(
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=15,
        window=50,
    )})
SELECT id, score, matched_sources, language, source, snippet
FROM page
WHERE id NOT IN ({", ".join(str(i) for i in _SHOWN)})
ORDER BY score DESC, id ASC
LIMIT 10
""",
)
def find_skip_set(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    post, stats = _text_index(spark, sf_dir)
    page = find.find(
        spark,
        sf_dir,
        "spark shuffle partition",
        query_vec_id=0,
        entity_sources=["src3", "src11"],
        top_k=15,
        window=50,
        post=post,
        stats=stats,
        corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    )
    return (
        page.filter(~F.col("id").isin(_SHOWN))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(10)
    )


# --- R2: WeightedCombSum over the same two retrievers --------------------

_KW_SQL = (
    "SELECT rid AS id, score FROM ("
    + bm25.bm25_sql(tpch.SQL_FIELDS, "window agg stream", top_k=30)
    + ")"
)
_SEM_SQL = knn.exact_knn_sql(
    tpch.SQL_VECTORS,
    "SELECT embedding AS qvec FROM embeddings WHERE vec_id = 5",
    64,
    k=30,
)


@register(
    "combsum_fusion",
    fusion.comb_sum_sql(
        {"keyword": _KW_SQL, "semantic": _SEM_SQL},
        weights={"keyword": 0.5, "semantic": 1.5},
        top_k=15,
    ),
)
def combsum_fusion(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    vectors = tpch.vectors(spark, sf_dir)
    qvec = (
        tpch.table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 5)
        .select(F.col("embedding").alias("qvec"))
    )
    post, stats = _text_index(spark, sf_dir)
    keyword = bm25.bm25_search(
        None, "window agg stream", top_k=30,
        post=post, stats=stats, corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    ).select(F.col("rid").alias("id"), "score")
    semantic = knn.exact_knn(vectors, qvec, k=30)
    return fusion.comb_sum(
        {"keyword": keyword, "semantic": semantic},
        weights={"keyword": 0.5, "semantic": 1.5},
        top_k=15,
    )


@register(
    "rrf_explain",
    fusion.rrf_explain_sql(
        {"keyword": _KW_SQL, "semantic": _SEM_SQL}, top_k=10
    ),
)
def rrf_explain(spark, sf_dir):
    """Fusion debugger for the hybrid pipeline: per-source rank and
    scaled RRF contribution for every fused-top-10 hit — shows which
    retriever surfaced each result and at what depth."""
    from pyspark.sql import functions as F

    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    vectors = tpch.vectors(spark, sf_dir)
    qvec = (
        tpch.table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 5)
        .select(F.col("embedding").alias("qvec"))
    )
    post, stats = _text_index(spark, sf_dir)
    keyword = bm25.bm25_search(
        None, "window agg stream", top_k=30,
        post=post, stats=stats, corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    ).select(F.col("rid").alias("id"), "score")
    semantic = knn.exact_knn(vectors, qvec, k=30)
    return fusion.rrf_explain(
        {"keyword": keyword, "semantic": semantic}, top_k=10
    )


# --- find response: relations subgraph --------------------------------------
# ref: find.py:152-159 — the find response carries a `relations`
# section: the subgraph of knowledge-graph triples whose provenance
# paragraphs belong to the RETURNED resources (so the client can
# render the entity neighborhood of its hits without a second query).


@register(
    "find_relations_subgraph",
    f"""
WITH hits AS (
  SELECT id FROM ({find.find_sql(
      "spark shuffle partition",
      query_vec_id=0,
      entity_sources=["src3", "src11"],
      top_k=10,
      window=50,
  )})
)
SELECT DISTINCT r.source_value AS from_value, r.relation_label AS label,
       r.target_value AS to_value
FROM ({tpch.SQL_RELATIONS}) r
WHERE r.paragraph_id IS NOT NULL
  AND CAST(string_split(r.paragraph_id, '/')[1] AS BIGINT)
        IN (SELECT id FROM hits)
ORDER BY from_value, label, to_value
""",
)
def find_relations_subgraph(spark, sf_dir):
    """The `relations` section of the find response: distinct triples
    whose provenance paragraph lives in one of the returned
    resources — a semi-join of the (tiny) hit set into the relation
    index."""
    from pyspark.sql import functions as F

    from nucliadb_spark.cache import cached_df
    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    post, stats = _text_index(spark, sf_dir)
    hits = find.find(
        spark, sf_dir, "spark shuffle partition",
        query_vec_id=0, entity_sources=["src3", "src11"],
        top_k=10, window=50,
        post=post, stats=stats, corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    ).select("id")
    rel = tpch.relations_index(spark, sf_dir)
    return (
        rel.filter(F.col("paragraph_id").isNotNull())
        .withColumn(
            "_rid", F.split("paragraph_id", "/").getItem(0).cast("long")
        )
        .join(F.broadcast(hits), F.col("_rid") == F.col("id"), "left_semi")
        .select(
            F.col("source_value").alias("from_value"),
            F.col("relation_label").alias("label"),
            F.col("target_value").alias("to_value"),
        )
        .distinct()
        .orderBy("from_value", "label", "to_value")
    )


# --- find with Predict-rephrase (semantic leg embeds the rewrite) --------

_REPHRASE_QUERY = "the spark shuffle and the spark partition"


def _rephrased_literal() -> str:
    from nucliadb_spark.functions.models import stub_rephrase_py

    return stub_rephrase_py(_REPHRASE_QUERY)


@register(
    "find_rephrased",
    find.find_sql(
        _REPHRASE_QUERY,
        top_k=10,
        window=40,
        rephrase_text=_rephrased_literal(),
    ),
)
def find_rephrased(spark, sf_dir):
    """Predict-rephrase flow (search/search/query.py:78-79): the
    keyword leg sees the user's original query, the semantic leg
    embeds the deterministic rewrite ('the spark shuffle and the
    spark partition' → 'spark shuffle partition') in the stub
    embedding space — the fetcher.get_query_vector split."""
    from nucliadb_spark.plans.queries_text import _corpus, _text_index, _vocab

    post, stats = _text_index(spark, sf_dir)
    return find.find(
        spark,
        sf_dir,
        _REPHRASE_QUERY,
        top_k=10,
        window=40,
        rephrase=True,
        post=post,
        stats=stats,
        corpus=_corpus(sf_dir, stats),
        vocab=_vocab(sf_dir, post),
    )
