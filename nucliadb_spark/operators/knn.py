"""Vector search: exact KNN, filtered KNN, multivector MaxSim
(SURVEY §2.4 V2, V4, V5, V6, V7).

The reference serves ANN from a per-segment HNSW graph
(ref: nidx/nidx_vector/src/hnsw/search.rs:242-388); batch-first Spark
replaces the graph walk with a scan-and-top-k plan:

- exact KNN = one pass over the vectors table computing the
  similarity as a pure Column expression (whole-stage codegen over
  array<float>, no Python), then ``orderBy(score).limit(k)`` which
  Spark executes as TakeOrderedAndProject — a per-partition heap +
  driver merge, NO global sort and NO shuffle of the scored rows.
- the query vector rides in as a 1-row broadcast (crossJoin) so the
  whole plan stays declarative — no driver-side collect.
- filtered search (V5 formula / F9 prefilter) filters BEFORE scoring
  (exact, unlike the reference's during-walk filter — batch makes
  filter-then-score natural and strictly more accurate).
- multivector MaxSim (V6, searcher.rs:345-394): explode query
  vectors → per-vector sim → groupBy(target) agg of per-query max,
  summed. One shuffle keyed by target id.

At 100 TB the same plan parallelizes linearly (scan-heavy, shuffle
only carries k rows per partition); the IVF-accelerated path lives in
operators/ann.py.

Scores are DOUBLE rounded to 5 places; similarity math is double with
left-associative accumulation, mirrored exactly by the unrolled
oracle SQL (functions/vector.py), so hashes match bit-for-bit.
Similarity: dot | cosine (ref: config.rs:163-168); min_score cut V7.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nucliadb_spark.functions import vector as V
from nucliadb_spark.operators.filters import Expr

SCORE_TYPE = "double"


def _sim(similarity: str, a: Column, b: Column) -> Column:
    if similarity == "dot":
        return V.dot(a, b)
    if similarity == "cosine":
        return V.cosine(a, b)
    raise ValueError(f"unknown similarity {similarity}")


def sim_sql(similarity: str, a: str, b: str, dim: int) -> str:
    if similarity == "dot":
        return V.dot_sql_unrolled(a, b, dim)
    if similarity == "cosine":
        return V.cosine_sql_unrolled(a, b, dim)
    raise ValueError(f"unknown similarity {similarity}")


def exact_knn(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    similarity: str = "cosine",
    min_score: float | None = None,
    prefilter: Expr | None = None,
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Brute-force top-k: (id, score).

    query: 1-row DataFrame with the query vector column (broadcast).
    min_score filters on the RAW score before rounding (V7,
    searcher.rs:267) so the cut is bit-identical to the oracle's.
    """
    if prefilter is not None:
        vectors = vectors.filter(prefilter.to_column())
    scored = vectors.crossJoin(F.broadcast(query)).select(
        F.col(id_col).alias("id"),
        _sim(similarity, F.col(vec_col), F.col(query_vec_col)).alias("raw"),
    )
    if min_score is not None:
        scored = scored.filter(F.col("raw") >= min_score)
    return (
        scored.select("id", F.round("raw", 5).cast(SCORE_TYPE).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def batch_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    similarity: str = "cosine",
    exclude_self: bool = False,
    id_col: str = "rid",
    vec_col: str = "vector",
) -> DataFrame:
    """Multi-query exact KNN in ONE pass: (query_id, id, score, rank)
    — the vector sibling of bm25.batch_bm25 and the kNN-GRAPH shape
    (SemDeDup / clustering mining jobs run exactly this: every doc's
    top-k neighbours in one job, never one query at a time).

    queries: (query_id, qvec). The query frame broadcasts — this
    exact variant is the bounded-Q baseline (eval sets, probe
    panels). For corpus-sized Q the cartesian score matrix is the
    wrong plan at any k; use ann.batch_knn_ivf, whose probe turns
    the cartesian into a cell-keyed EQUI-join.

    Per-query top-k is one window cut keyed by query_id; the rank
    orders by the ROUNDED score (id tiebreak) so the SQL twin cuts
    identically. exclude_self drops the trivial self-match when
    queries come from the corpus itself (kNN-graph convention).
    """
    from pyspark.sql import Window

    scored = vectors.crossJoin(F.broadcast(queries)).select(
        "query_id",
        F.col(id_col).alias("id"),
        F.round(_sim(similarity, F.col(vec_col), F.col("qvec")), 5)
        .cast(SCORE_TYPE)
        .alias("score"),
    )
    if exclude_self:
        scored = scored.filter(F.col("id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def batch_knn_sql(
    vectors_sql: str,
    queries_sql: str,
    dim: int,
    k: int = 10,
    similarity: str = "cosine",
    exclude_self: bool = False,
    id_col: str = "rid",
) -> str:
    self_cut = f"WHERE v.{id_col} <> q.query_id" if exclude_self else ""
    return f"""
WITH q AS ({queries_sql}),
scored AS (
  SELECT q.query_id, v.{id_col} AS id,
         ROUND({sim_sql(similarity, "v.vector", "q.qvec", dim)}, 5)::DOUBLE AS score
  FROM ({vectors_sql}) v CROSS JOIN q
  {self_cut}
)
SELECT query_id, id, score, rank FROM (
  SELECT *, row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


def exact_knn_sql(
    vectors_sql: str,
    query_sql: str,
    dim: int,
    k: int = 10,
    similarity: str = "cosine",
    min_score: float | None = None,
    where: str | None = None,
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> str:
    """DuckDB twin of :func:`exact_knn` (same accumulation order)."""
    where_sql = f"WHERE {where}" if where else ""
    cut = f"WHERE raw >= {min_score!r}" if min_score is not None else ""
    return f"""
WITH vectors AS ({vectors_sql}),
q AS ({query_sql}),
scored AS (
  SELECT v.{id_col} AS id,
         {sim_sql(similarity, f"v.{vec_col}", f"q.{query_vec_col}", dim)} AS raw
  FROM (SELECT * FROM vectors {where_sql}) v CROSS JOIN q
)
SELECT id, ROUND(raw, 5)::DOUBLE AS score
FROM scored
{cut}
ORDER BY score DESC, id ASC
LIMIT {k}
"""


# RaBitQ serving budget: exact-rerank the top RERANKING_FACTOR·k
# quantized candidates, capped (ref: nidx_vector/src/vector_types/
# rabitq.rs:30-36 — factor 100, cap 2000).
RABITQ_RERANK_FACTOR = 100
RABITQ_RERANK_CAP = 2000


def rabitq_rerank_budget(k: int) -> int:
    return min(RABITQ_RERANK_FACTOR * k, RABITQ_RERANK_CAP)


def quantized_rerank_knn(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    rerank_top: int | None = None,
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """1-bit quantized first pass + exact rerank (V3 analog of
    RaBitQ, ref: nidx_vector/src/vector_types/rabitq.rs:30-255 —
    1-bit signs, estimated score, exact rerank of the top
    RERANKING_FACTOR·k).

    First pass scores sign-agreement (integer, exact in any engine) —
    at scale the sign bits pack 64:1 and the first pass reads 1/32nd
    of the bytes; only `rerank_top` candidates get full-precision
    cosine. rerank_top defaults to the reference's serving budget
    min(100·k, 2000).
    """
    if rerank_top is None:
        rerank_top = rabitq_rerank_budget(k)
    sign_dot = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col(query_vec_col),
            lambda x, y: F.when((x >= 0) == (y >= 0), 1).otherwise(-1),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    first_pass = (
        vectors.crossJoin(F.broadcast(query))
        .withColumn("qscore", sign_dot)
        .orderBy(F.col("qscore").desc(), F.col(id_col).asc())
        .limit(rerank_top)
    )
    return (
        first_pass.select(
            F.col(id_col).alias("id"),
            F.round(V.cosine(F.col(vec_col), F.col(query_vec_col)), 5)
            .cast(SCORE_TYPE)
            .alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def quantized_rerank_knn_sql(
    vectors_sql: str,
    query_sql: str,
    dim: int,
    k: int = 10,
    rerank_top: int = 50,
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> str:
    sign_terms = " + ".join(
        f"(CASE WHEN (v.{vec_col}[{i}] >= 0) = (q.{query_vec_col}[{i}] >= 0) "
        f"THEN 1 ELSE -1 END)"
        for i in range(1, dim + 1)
    )
    cos = V.cosine_sql_unrolled(f"v.{vec_col}", f"q.{query_vec_col}", dim)
    return f"""
WITH vectors AS ({vectors_sql}),
q AS ({query_sql}),
first_pass AS (
  SELECT v.{id_col} AS id, v.{vec_col}, ({sign_terms}) AS qscore
  FROM vectors v CROSS JOIN q
  ORDER BY qscore DESC, id ASC
  LIMIT {rerank_top}
)
SELECT f.id, ROUND({cos.replace(f"v.{vec_col}", f"f.{vec_col}")}, 5)::DOUBLE AS score
FROM first_pass f CROSS JOIN q
ORDER BY score DESC, id ASC
LIMIT {k}
"""


def sq8_rerank_knn(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    rerank_top: int = 50,
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Scalar (int8) quantized first pass + exact rerank — the SQ8
    sibling of the 1-bit RaBitQ path (V3; ref serving config
    nidx_vector/src/config.rs VectorType variants).

    Components quantize to 0..255 against the dataset-global
    [min, max] (one tiny agg, broadcast back); the first pass ranks
    by the INTEGER dot product of quantized vectors — exact in any
    engine, and at 100 TB the u8 codes read 1/4 of the float bytes
    (packed to binary in a real sidecar; array<int> here keeps the
    oracle twin exact). Only `rerank_top` survivors pay the
    full-precision cosine.
    """
    lo, hi = F.col("_lo"), F.col("_hi")
    stats = vectors.agg(
        F.min(F.array_min(F.col(vec_col))).alias("_lo"),
        F.max(F.array_max(F.col(vec_col))).alias("_hi"),
    )

    def q8(col: Column) -> Column:
        return F.transform(
            col, lambda x: F.round((x - lo) / (hi - lo) * 255.0).cast("int")
        )

    qv = vectors.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), F.col(vec_col), q8(F.col(vec_col)).alias("_q8")
    )
    qq = query.crossJoin(F.broadcast(stats)).select(
        F.col(query_vec_col), q8(F.col(query_vec_col)).alias("_q8q")
    )
    int_dot = F.aggregate(
        F.zip_with(F.col("_q8"), F.col("_q8q"), lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    first_pass = (
        qv.crossJoin(F.broadcast(qq))
        .withColumn("qscore", int_dot)
        .orderBy(F.col("qscore").desc(), F.col(id_col).asc())
        .limit(rerank_top)
    )
    return (
        first_pass.select(
            F.col(id_col).alias("id"),
            F.round(V.cosine(F.col(vec_col), F.col(query_vec_col)), 5)
            .cast(SCORE_TYPE)
            .alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def sq8_rerank_knn_sql(
    vectors_sql: str,
    query_sql: str,
    dim: int,
    k: int = 10,
    rerank_top: int = 50,
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> str:
    def q8(expr: str, i: int) -> str:
        return f"round((({expr}[{i}]) - s.lo) / (s.hi - s.lo) * 255.0)::BIGINT"

    dot_terms = " + ".join(
        f"({q8('v.' + vec_col, i)} * {q8('q.' + query_vec_col, i)})"
        for i in range(1, dim + 1)
    )
    cos = V.cosine_sql_unrolled(f"f.{vec_col}", f"q.{query_vec_col}", dim)
    return f"""
WITH vectors AS ({vectors_sql}),
q AS ({query_sql}),
s AS (
  SELECT MIN(list_min({vec_col})) AS lo, MAX(list_max({vec_col})) AS hi
  FROM vectors
),
first_pass AS (
  SELECT v.{id_col} AS id, v.{vec_col}, ({dot_terms}) AS qscore
  FROM vectors v CROSS JOIN q CROSS JOIN s
  ORDER BY qscore DESC, id ASC
  LIMIT {rerank_top}
)
SELECT f.id, ROUND({cos}, 5)::DOUBLE AS score
FROM first_pass f CROSS JOIN q
ORDER BY score DESC, id ASC
LIMIT {k}
"""


def matryoshka_knn(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    first_dims: int = 16,
    rerank_top: int = 50,
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Matryoshka two-stage KNN (ref: knowledgebox.proto:203-230
    matryoshka_dimensions — nested-representation models let a prefix
    of the vector act as a cheaper embedding): first pass scores the
    first `first_dims` components (reads 1/4 of the vector bytes with
    dim 64→16), full-precision rerank of the top candidates."""
    short_sim = V.cosine(
        F.slice(F.col(vec_col), 1, first_dims),
        F.slice(F.col(query_vec_col), 1, first_dims),
    )
    first_pass = (
        vectors.crossJoin(F.broadcast(query))
        .withColumn("qscore", F.round(short_sim, 5))
        .orderBy(F.col("qscore").desc(), F.col(id_col).asc())
        .limit(rerank_top)
    )
    return (
        first_pass.select(
            F.col(id_col).alias("id"),
            F.round(V.cosine(F.col(vec_col), F.col(query_vec_col)), 5)
            .cast(SCORE_TYPE)
            .alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def matryoshka_knn_sql(
    vectors_sql: str,
    query_sql: str,
    dim: int,
    k: int = 10,
    first_dims: int = 16,
    rerank_top: int = 50,
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> str:
    short = V.cosine_sql_unrolled(f"v.{vec_col}", f"q.{query_vec_col}", first_dims)
    full = V.cosine_sql_unrolled(f"f.{vec_col}", f"q.{query_vec_col}", dim)
    return f"""
WITH vectors AS ({vectors_sql}),
q AS ({query_sql}),
first_pass AS (
  SELECT v.{id_col} AS id, v.{vec_col},
         ROUND({short}, 5) AS qscore
  FROM vectors v CROSS JOIN q
  ORDER BY qscore DESC, id ASC
  LIMIT {rerank_top}
)
SELECT f.id, ROUND({full}, 5)::DOUBLE AS score
FROM first_pass f CROSS JOIN q
ORDER BY score DESC, id ASC
LIMIT {k}
"""


def dedup_vectors(
    vectors: DataFrame, vec_col: str = "vector", id_col: str = "rid"
) -> DataFrame:
    """V4 `with_duplicates=false` (ref: nidx_vector/src/searcher.rs:
    150-199 Fssc dedup): keep one row per identical vector — the
    deterministic survivor is the min id. One shuffle keyed by the
    vector hash, never by the raw float array."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(vec_col).cast("string"))).orderBy(
        F.col(id_col).asc()
    )
    return (
        vectors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def pick_vectorset(
    spark, sf_dir: str, vectorsets: dict, name: str, expect_dim: int
) -> DataFrame:
    """V8 vectorset routing (ref: shard_search.rs:94-105 + dimension
    check searcher.rs:254-262): choose the named embedding table and
    assert its dimension.

    vectorsets values: either a parquet table name (vector column
    `embedding`) or a `(builder(spark, sf_dir), dim)` pair (vector
    column `vector`) as in sources.tpch.VECTORSETS."""
    if name not in vectorsets:
        raise KeyError(f"unknown vectorset {name!r}; have {sorted(vectorsets)}")
    spec = vectorsets[name]
    if isinstance(spec, str):
        df, vec_col = spark.read.parquet(f"{sf_dir}/{spec}.parquet"), "embedding"
    else:
        builder, _dim = spec
        df, vec_col = builder(spark, sf_dir), "vector"
    bad = df.filter(F.size(F.col(vec_col)) != expect_dim).limit(1).count()
    if bad:
        raise ValueError(f"vectorset {name!r} has vectors of dim != {expect_dim}")
    return df


def maxsim_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    similarity: str = "dot",
    id_col: str = "rid",
    vec_col: str = "vector",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Multivector MaxSim (V6): score(d) = Σ_q max_{v∈d} sim(q, v).

    queries: small DataFrame (qid, qvec), broadcast. Two aggregations:
    max per (doc, query) then sum per doc — both partial-aggregated
    map-side, single shuffle key=id.
    """
    per_pair = (
        vectors.crossJoin(F.broadcast(queries))
        .select(
            F.col(id_col).alias("id"),
            F.col(query_id_col).alias("qid"),
            _sim(similarity, F.col(vec_col), F.col(query_vec_col)).alias("raw"),
        )
        .groupBy("id", "qid")
        .agg(F.max("raw").alias("best"))
    )
    return (
        per_pair.groupBy("id")
        .agg(F.round(F.sum("best"), 5).cast(SCORE_TYPE).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def maxsim_knn_sql(
    vectors_sql: str,
    queries_sql: str,
    dim: int,
    k: int = 10,
    similarity: str = "dot",
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> str:
    return f"""
WITH vectors AS ({vectors_sql}),
queries AS ({queries_sql}),
per_pair AS (
  SELECT v.{id_col} AS id, q.qid,
         MAX({sim_sql(similarity, f"v.{vec_col}", f"q.{query_vec_col}", dim)}) AS best
  FROM vectors v CROSS JOIN queries q
  GROUP BY 1, 2
)
SELECT id, ROUND(SUM(best), 5)::DOUBLE AS score
FROM per_pair
GROUP BY id
ORDER BY score DESC, id ASC
LIMIT {k}
"""


# --- ranking-quality evaluation (nDCG of a cheap ranking vs exact) -----------
# The recall curve (ann.ivf_recall_report) answers "did the candidates
# survive"; nDCG answers "did the ORDER survive" — the metric a team
# tuning the quantization/prefix-dim dial actually tracks. Ground
# truth = exact full-dim cosine top-k; the evaluated ranking here is
# the matryoshka prefix (first_dims components), i.e. "how much
# ranking quality does reading 1/4 of the vector bytes cost".
# Binary relevance (in exact top-k), positions log2-discounted, IDCG
# normalizes — standard nDCG@k.
#
# Scale shape: one broadcast of the Q query vectors against the
# vectors table computes BOTH scores in a single scan; two per-query
# windows (bounded partitions: Q queries) cut the top-k lists.


def rank_quality_report(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    first_dims: int = 16,
    id_col: str = "rid",
    vec_col: str = "vector",
) -> DataFrame:
    """(query_id, n_overlap, ndcg) per query — nDCG@k of the
    prefix-dim ranking against the exact full-dim top-k. queries:
    (query_id, qvec) rows, broadcast."""
    from pyspark.sql import Window

    import math

    scored = vectors.crossJoin(F.broadcast(queries)).select(
        F.col("query_id"),
        F.col(id_col).alias("id"),
        F.round(V.cosine(F.col(vec_col), F.col("qvec")), 5).alias("full_s"),
        F.round(
            V.cosine(
                F.slice(F.col(vec_col), 1, first_dims),
                F.slice(F.col("qvec"), 1, first_dims),
            ),
            5,
        ).alias("pre_s"),
    )
    w_full = Window.partitionBy("query_id").orderBy(
        F.col("full_s").desc(), F.col("id").asc()
    )
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("pre_s").desc(), F.col("id").asc()
    )
    ranked = scored.select(
        "query_id",
        "id",
        F.row_number().over(w_full).alias("full_rank"),
        F.row_number().over(w_pre).alias("pre_rank"),
    ).filter((F.col("full_rank") <= k) | (F.col("pre_rank") <= k))
    idcg = sum(1.0 / math.log2(i + 1) for i in range(1, k + 1))
    rel = (F.col("full_rank") <= k).cast("double")
    gain = rel / F.log2(F.col("pre_rank") + 1)
    return (
        ranked.filter(F.col("pre_rank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(rel.cast("long")).cast("long").alias("n_overlap"),
            F.round(F.sum(gain) / idcg, 5).cast("double").alias("ndcg"),
        )
        .orderBy("query_id")
    )


def rank_quality_report_sql(
    vectors_sql: str,
    queries_sql: str,
    dim: int,
    k: int = 10,
    first_dims: int = 16,
    id_col: str = "rid",
    vec_col: str = "vector",
) -> str:
    import math

    full = V.cosine_sql_unrolled(f"v.{vec_col}", "q.qvec", dim)
    pre = V.cosine_sql_unrolled(f"v.{vec_col}", "q.qvec", first_dims)
    idcg = sum(1.0 / math.log2(i + 1) for i in range(1, k + 1))
    return f"""
WITH vectors AS ({vectors_sql}),
q AS ({queries_sql}),
scored AS (
  SELECT q.query_id, v.{id_col} AS id,
         ROUND({full}, 5) AS full_s, ROUND({pre}, 5) AS pre_s
  FROM vectors v CROSS JOIN q
),
ranked AS (
  SELECT query_id, id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY full_s DESC, id ASC) AS full_rank,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY pre_s DESC, id ASC) AS pre_rank
  FROM scored
)
SELECT query_id,
       SUM(CASE WHEN full_rank <= {k} THEN 1 ELSE 0 END)::BIGINT AS n_overlap,
       ROUND(SUM((CASE WHEN full_rank <= {k} THEN 1.0 ELSE 0.0 END)
                 / log2(pre_rank + 1)) / {idcg!r}, 5)::DOUBLE AS ndcg
FROM ranked
WHERE pre_rank <= {k}
GROUP BY query_id
ORDER BY query_id
"""
