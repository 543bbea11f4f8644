"""Index-time vector normalization (vectorset config
`normalize_vectors`).

Port of nidx/tests/integration/vector_normalization.rs: 20 sentence
vectors [i]*10 are L2-normalized at index time; the query vector is
pre-normalized [17/|17*10|]*10; similarity is plain DOT (no
normalization at query time) with min_score 0.9 — every vector is
colinear with the query, so all 20 must come back scoring ~1.0.
"""

import math

from pyspark.sql import functions as F

from nucliadb_spark.functions import vector as V
from nucliadb_spark.operators import knn

DIM = 10


def test_normalized_index_dot_scores_one(spark):
    vecs = spark.range(1, 21).select(
        F.col("id").alias("rid"),
        F.array(*[F.col("id").cast("double") for _ in range(DIM)]).alias("vector"),
    )
    # index-time normalization (config.rs normalize_vectors=true)
    indexed = vecs.withColumn("vector", V.l2_normalize(F.col("vector")))

    magnitude = math.sqrt(17.0**2 * DIM)
    q = spark.createDataFrame(
        [([17.0 / magnitude] * DIM,)], "qvec array<double>"
    )
    res = knn.exact_knn(
        indexed, q, k=30, similarity="dot", min_score=0.9
    ).collect()
    assert len(res) == 20
    assert all(r.score >= 0.999 for r in res)


def test_l2_normalize_unit_norm(spark):
    vecs = spark.range(1, 6).select(
        F.array(
            (F.col("id") * 2).cast("double"), (F.col("id") * -1).cast("double")
        ).alias("vector")
    )
    norms = (
        vecs.select(V.norm(V.l2_normalize(F.col("vector"))).alias("n")).collect()
    )
    assert all(abs(r.n - 1.0) < 1e-12 for r in norms)
