"""Rank fusion: RRF and WeightedCombSum (SURVEY §2.9 R1-R4).

ref: nucliadb/src/nucliadb/search/search/rank_fusion.py:106-254 —
RRF = Σ_r w(r) / (k + rank_r(d)) with k=60 and 0-based ranks
(enumerate over each retriever's score-sorted list);
WeightedCombSum = Σ_r w(r)·score_r(d).

Spark shape: each retriever's result is a small DataFrame (≤ window
≤ 500 rows — MAX_RANK_FUSION_WINDOW, search.py:352), so fusion is a
driver-cheap plan: per-source row_number window (the input IS tiny —
single-partition window is fine and deterministic), unionByName,
one groupBy(id). Ranks tiebreak on id so both engines agree.

Fused scores are DOUBLE rounded to 6 places: both engines round the
same bit-identical double, and pandas sees float64 on both sides, so
the driver row-hash matches (DECIMAL became decimal.Decimal in pandas
and broke the hash).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

RRF_K = 60.0
SCORE_TYPE = "double"


def _ranked(df: DataFrame, source: str, weight: float) -> DataFrame:
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return df.select("id", "score").withColumn(
        "rank", F.row_number().over(w) - 1
    ).select(
        "id",
        F.lit(source).alias("source"),
        F.lit(weight).alias("weight"),
        "rank",
        F.col("score").cast("double").alias("src_score"),
    )


def rrf(
    sources: dict[str, DataFrame],
    k: float = RRF_K,
    weights: dict[str, float] | None = None,
    top_k: int = 20,
) -> DataFrame:
    """(id, score, matched_sources). Sources: name -> (id, score)."""
    weights = weights or {}
    ranked = [
        _ranked(df, name, weights.get(name, 1.0)) for name, df in sorted(sources.items())
    ]
    all_ranked = reduce(lambda a, b: a.unionByName(b), ranked)
    return (
        all_ranked.withColumn("contrib", F.col("weight") / (F.lit(k) + F.col("rank")))
        .groupBy("id")
        .agg(
            F.round(F.sum("contrib"), 6).cast(SCORE_TYPE).alias("score"),
            F.sort_array(F.collect_set("source")).alias("matched_sources"),
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(top_k)
    )


def rrf_sql(
    sources_sql: dict[str, str],
    k: float = RRF_K,
    weights: dict[str, float] | None = None,
    top_k: int = 20,
) -> str:
    """DuckDB twin. sources_sql: name -> SELECT producing (id, score)."""
    weights = weights or {}
    parts = []
    for name, sql in sorted(sources_sql.items()):
        w = weights.get(name, 1.0)
        parts.append(
            f"""SELECT id, '{name}' AS source, {w!r} AS weight,
       row_number() OVER (ORDER BY score DESC, id ASC) - 1 AS rank
FROM ({sql})"""
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH ranked AS (
{union}
)
SELECT id,
       ROUND(SUM(weight / ({k!r} + rank)), 6)::DOUBLE AS score,
       list_sort(list(DISTINCT source)) AS matched_sources
FROM ranked
GROUP BY id
ORDER BY score DESC, id ASC
LIMIT {top_k}
"""


def rrf_with_scores(
    sources: dict[str, DataFrame],
    k: float = RRF_K,
    weights: dict[str, float] | None = None,
    top_k: int = 20,
) -> DataFrame:
    """RRF fusion keeping the per-source score history (the /retrieve
    endpoint's ``Scores.history``: one KeywordScore/SemanticScore/
    GraphScore per index the match came from, plus the fused RRF value
    — ref nucliadb_models/retrieval.py:169-213, retrieval.py:46).

    Output: (id, score, <name>_score ... one DOUBLE per source, null
    when that index didn't return the id, matched_sources)."""
    weights = weights or {}
    ranked = [
        _ranked(df, name, weights.get(name, 1.0)) for name, df in sorted(sources.items())
    ]
    all_ranked = reduce(lambda a, b: a.unionByName(b), ranked)
    per_source = [
        F.round(
            F.max(F.when(F.col("source") == name, F.col("src_score"))), 6
        ).cast(SCORE_TYPE).alias(f"{name}_score")
        for name in sorted(sources)
    ]
    return (
        all_ranked.withColumn("contrib", F.col("weight") / (F.lit(k) + F.col("rank")))
        .groupBy("id")
        .agg(
            F.round(F.sum("contrib"), 6).cast(SCORE_TYPE).alias("score"),
            *per_source,
            F.sort_array(F.collect_set("source")).alias("matched_sources"),
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(top_k)
    )


def rrf_with_scores_sql(
    sources_sql: dict[str, str],
    k: float = RRF_K,
    weights: dict[str, float] | None = None,
    top_k: int = 20,
) -> str:
    """DuckDB twin of :func:`rrf_with_scores`."""
    weights = weights or {}
    parts = []
    for name, sql in sorted(sources_sql.items()):
        w = weights.get(name, 1.0)
        parts.append(
            f"""SELECT id, '{name}' AS source, {w!r} AS weight, score AS src_score,
       row_number() OVER (ORDER BY score DESC, id ASC) - 1 AS rank
FROM ({sql})"""
        )
    union = "\nUNION ALL\n".join(parts)
    per_source = ",\n       ".join(
        f"ROUND(MAX(CASE WHEN source = '{name}' THEN src_score END), 6)::DOUBLE AS {name}_score"
        for name in sorted(sources_sql)
    )
    return f"""
WITH ranked AS (
{union}
)
SELECT id,
       ROUND(SUM(weight / ({k!r} + rank)), 6)::DOUBLE AS score,
       {per_source},
       list_sort(list(DISTINCT source)) AS matched_sources
FROM ranked
GROUP BY id
ORDER BY score DESC, id ASC
LIMIT {top_k}
"""


def comb_sum(
    sources: dict[str, DataFrame],
    weights: dict[str, float] | None = None,
    top_k: int = 20,
) -> DataFrame:
    """WeightedCombSum (R2): Σ w(r)·score_r(d)."""
    weights = weights or {}
    parts = [
        df.select(
            "id",
            (F.col("score").cast("double") * F.lit(weights.get(name, 1.0))).alias(
                "contrib"
            ),
        )
        for name, df in sorted(sources.items())
    ]
    all_parts = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        all_parts.groupBy("id")
        .agg(F.round(F.sum("contrib"), 6).cast(SCORE_TYPE).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(top_k)
    )


def comb_sum_sql(
    sources_sql: dict[str, str],
    weights: dict[str, float] | None = None,
    top_k: int = 20,
) -> str:
    weights = weights or {}
    parts = [
        f"SELECT id, score::DOUBLE * {weights.get(name, 1.0)!r} AS contrib FROM ({sql})"
        for name, sql in sorted(sources_sql.items())
    ]
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH scored AS (
{union}
)
SELECT id, ROUND(SUM(contrib), 6)::DOUBLE AS score
FROM scored
GROUP BY id
ORDER BY score DESC, id ASC
LIMIT {top_k}
"""


def rrf_explain(
    sources: dict[str, DataFrame],
    k: float = RRF_K,
    weights: dict[str, float] | None = None,
    top_k: int = 20,
) -> DataFrame:
    """Fusion debugger: one row per (fused-top-k id, source) with the
    per-source rank and the scaled RRF contribution —
    (id, source, rank, contrib_e6). Shows WHY a hit ranked where it
    did (which retriever surfaced it and at what depth), the fusion
    analog of bm25_explain."""
    weights = weights or {}
    ranked = [
        _ranked(df, name, weights.get(name, 1.0))
        for name, df in sorted(sources.items())
    ]
    all_ranked = reduce(lambda a, b: a.unionByName(b), ranked)
    fused = rrf(sources, k=k, weights=weights, top_k=top_k).select("id")
    return (
        all_ranked.join(F.broadcast(fused), "id", "semi")
        .select(
            "id",
            "source",
            F.col("rank").cast("long").alias("rank"),
            F.round(F.col("weight") / (F.lit(k) + F.col("rank")) * 1e6)
            .cast("long")
            .alias("contrib_e6"),
        )
        .orderBy("id", "source")
    )


def rrf_explain_sql(
    sources_sql: dict[str, str],
    k: float = RRF_K,
    weights: dict[str, float] | None = None,
    top_k: int = 20,
) -> str:
    weights = weights or {}
    parts = []
    for name, sql in sorted(sources_sql.items()):
        w = weights.get(name, 1.0)
        parts.append(
            f"""SELECT id, '{name}' AS source, {w!r} AS weight,
       row_number() OVER (ORDER BY score DESC, id ASC) - 1 AS rank
FROM ({sql})"""
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH ranked AS (
{union}
),
fused AS (
  SELECT id FROM (
    SELECT id, SUM(weight / ({k!r} + rank)) AS s
    FROM ranked GROUP BY id
    ORDER BY ROUND(s, 6) DESC, id ASC LIMIT {top_k}
  )
)
SELECT id, source, rank::BIGINT AS rank,
       ROUND(weight / ({k!r} + rank) * 1e6)::BIGINT AS contrib_e6
FROM ranked
WHERE id IN (SELECT id FROM fused)
ORDER BY id, source
"""
