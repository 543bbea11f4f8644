"""Approximate nearest neighbor at scale: IVF cells + probe
(SURVEY §2.4 V1 replacement).

The reference serves ANN with a per-segment HNSW graph walk
(ref: nidx/nidx_vector/src/hnsw/search.rs:242-388, params.rs:34-46).
A graph walk is a pointer-chasing serving structure — wrong shape for
Spark. The batch-first equivalent is IVF (inverted file):

- build: k-means centroids over the corpus (MLlib KMeans,
  deterministic seed); each vector is assigned its nearest centroid
  → a `cell` column. At 100 TB the vectors table is WRITTEN
  partitioned by cell, so a probe reads only nprobe/k of the data
  (partition pruning does the work HNSW's graph does).
- search: rank cells by query↔centroid similarity (centroids are a
  tiny broadcast table), take nprobe cells, exact-score only those
  cells' vectors, top-k.

Quality gate mirrored from the reference's recall test
(nidx/nidx_vector/src/segment.rs:842-912): recall@5 vs brute force
≥ 0.95 — see tests/test_ann_recall.py.

`ivf_search_labeled` is the oracle-checkable variant: it uses a
precomputed cell assignment column and element-wise-mean centroids,
expressed in pure SQL-parity DataFrame ops (cell scores rounded to 6
decimals before ranking so Spark/DuckDB float aggregation agrees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nucliadb_spark.functions import vector as V
from nucliadb_spark.operators import knn

SCORE_TYPE = "double"


# --- MLlib IVF build + probe (the scale path) -----------------------------


def build_ivf(
    vectors: DataFrame,
    k_cells: int = 16,
    seed: int = 42,
    vec_col: str = "vector",
) -> tuple[DataFrame, DataFrame]:
    """→ (assigned, centroids): assigned = vectors + `cell`,
    centroids = (cell, centroid array<double>).

    Deterministic: fixed seed, fixed maxIter. At scale: persist
    `assigned` partitioned by cell; centroids are broadcast-sized
    (k_cells ≤ a few thousand even at 100 TB).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml = vectors.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=k_cells, seed=seed, maxIter=20, featuresCol="_features", predictionCol="cell"
    ).fit(ml)
    assigned = model.transform(ml).drop("_features")
    centroids = vectors.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    similarity: str = "cosine",
    id_col: str = "rid",
    vec_col: str = "vector",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Probe nprobe closest cells, exact-score within them, top-k."""
    sim = {"cosine": V.cosine, "dot": V.dot}[similarity]
    probe = (
        centroids.crossJoin(F.broadcast(query))
        .select("cell", sim(F.col("centroid"), F.col(query_vec_col)).alias("csim"))
        .orderBy(F.col("csim").desc(), F.col("cell").asc())
        .limit(nprobe)
        .select("cell")
    )
    candidates = assigned.join(F.broadcast(probe), "cell")
    return knn.exact_knn(
        candidates,
        query,
        k=k,
        similarity=similarity,
        id_col=id_col,
        vec_col=vec_col,
        query_vec_col=query_vec_col,
    )


# --- label-cell IVF (oracle-checkable variant) -----------------------------


def ivf_search_labeled(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    dim: int = 64,
) -> DataFrame:
    """IVF probe using the precomputed `label` cell assignment and
    element-wise-mean centroids. (id, score, cell)."""
    pos = embeddings.select("label", F.posexplode("embedding").alias("pos", "val"))
    cent_long = pos.groupBy("label", "pos").agg(F.avg("val").alias("m"))
    centroids = (
        cent_long.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )
    probe = (
        centroids.crossJoin(F.broadcast(query))
        .select(
            "label",
            F.round(V.cosine(F.col("centroid"), F.col("qvec")), 6).alias("csim"),
        )
        .orderBy(F.col("csim").desc(), F.col("label").asc())
        .limit(nprobe)
        .select("label")
    )
    cand = embeddings.join(F.broadcast(probe), "label")
    raw = V.cosine(F.col("embedding"), F.col("qvec"))
    return (
        cand.crossJoin(F.broadcast(query))
        .select(
            F.col("vec_id").alias("id"),
            F.round(raw, 5).cast(SCORE_TYPE).alias("score"),
            F.col("label").alias("cell"),
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def ivf_search_labeled_sql(k: int = 10, nprobe: int = 2, dim: int = 64) -> str:
    """DuckDB twin of :func:`ivf_search_labeled`.

    Centroid means aggregate per (label, pos) — identical grouping in
    both engines; cell-ranking cosines are rounded to 6 decimals so
    sub-ulp AVG differences can't flip the probe order (cells are
    well-separated by construction).
    """
    cos_cq = V.cosine_sql_unrolled("c.centroid", "q.qvec", dim)
    cos_eq = V.cosine_sql_unrolled("e.embedding", "q.qvec", dim)
    return f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
pos AS (
  SELECT label, unnest(generate_series(1, {dim})) AS pos,
         unnest(embedding) AS val
  FROM embeddings
),
cent_long AS (
  SELECT label, pos, AVG(val) AS m FROM pos GROUP BY label, pos
),
centroids AS (
  SELECT label, list(m ORDER BY pos) AS centroid FROM cent_long GROUP BY label
),
probe AS (
  SELECT c.label
  FROM centroids c CROSS JOIN q
  ORDER BY ROUND({cos_cq}, 6) DESC, c.label ASC
  LIMIT {nprobe}
)
SELECT e.vec_id AS id,
       ROUND({cos_eq}, 5)::DOUBLE AS score,
       e.label AS cell
FROM embeddings e
JOIN probe p ON e.label = p.label
CROSS JOIN q
ORDER BY score DESC, id ASC
LIMIT {k}
"""
