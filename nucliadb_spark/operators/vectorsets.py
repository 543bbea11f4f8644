"""Vectorset lifecycle: add a vectorset to a live KB and backfill
the rids the new model hasn't embedded yet.

ref: nucliadb/src/nucliadb/writer/api/v1/vectorsets.py:41-96
(add_vectorset registers the set in config + index; existing content
is backfilled by reprocessing) and reader/api/v1/vectorsets.py:32-43
(list). The reference ships backfill to the external processing
pipeline; the Spark-first analog is one declarative pass — the
corpus ANTI-JOINS the partial vectorset to find unembedded rids,
the embedder (V9 stub here, a real model UDF in production) fills
exactly those, and the union is the complete set. At 100 TB the
anti-join is rid-keyed (partition-aligned with every other per-rid
table) and embedding cost is proportional to the MISSING rows only —
never a full-corpus re-embed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nucliadb_spark.functions import models


def backfill_vectorset(fields: DataFrame, existing: DataFrame) -> DataFrame:
    """fields(rid, text) + existing(rid, vector) → the completed
    vectorset (rid, vector, backfilled): existing rows pass through,
    missing rids get embedded. left_anti keeps the embed UDF off the
    already-covered rows."""
    missing = fields.join(existing.select("rid"), "rid", "left_anti")
    filled = missing.select(
        "rid",
        models.stub_embedding(F.col("text")).alias("vector"),
        F.lit(True).alias("backfilled"),
    )
    have = existing.select("rid", "vector", F.lit(False).alias("backfilled"))
    return have.unionByName(filled).orderBy("rid")


def partial_vectorset(fields: DataFrame, mod: int = 3, keep: int = 1) -> DataFrame:
    """A vectorset added mid-life: only rids with rid % mod != keep
    were embedded before the backfill run."""
    return fields.filter(F.col("rid") % mod != keep).select(
        "rid", models.stub_embedding(F.col("text")).alias("vector")
    )


def backfill_sql(mod: int = 3, keep: int = 1) -> str:
    """Oracle: after backfill every rid carries the model's embedding
    of its text; only the membership of `backfilled` depends on the
    pre-existing coverage."""
    return f"""
SELECT CAST(doc_id AS BIGINT) AS rid,
       {models.stub_embedding_sql("text")} AS vector,
       doc_id % {mod} = {keep} AS backfilled
FROM documents
ORDER BY rid
"""


def backfill_report_sql(mod: int = 3, keep: int = 1) -> str:
    """Driver-hashable twin: scalar digests of each vector (arrays
    are not pandas-hashable in the driver's comparator)."""
    return f"""
WITH completed AS ({backfill_sql(mod, keep)})
SELECT rid, backfilled,
       ROUND(vector[1], 5) AS v0,
       ROUND(list_aggregate(vector, 'sum'), 5) AS vsum
FROM completed
ORDER BY rid
"""
