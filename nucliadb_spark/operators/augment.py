"""RAG context augmentors (SURVEY §2.14): the retrieval-adjacent
operators /ask uses to build LLM context around hits.

ref: nucliadb/src/nucliadb/search/search/chat/prompt.py (strategies
at nucliadb_models/search.py:1147-1500), neighbouring paragraphs at
search/augmentor/paragraphs.py. Batch shapes:

- neighbouring_paragraphs: hits ⋈ paragraphs on same field within
  ±n ordinal positions — a RANGE JOIN on the paragraph offsets. The
  hit set is tiny (top-k), so it broadcasts and the range predicate
  evaluates against the paragraphs scan (pruned by rid).
- hierarchy: prepend the resource title to each hit (join resources).
- full_resource: expand hits to every paragraph of their documents
  (semi-join on rid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nucliadb_spark.sources.tpch import PARAGRAPH_STRIDE


def neighbouring_paragraphs(
    paragraphs: DataFrame, hits: DataFrame, before: int = 1, after: int = 1
) -> DataFrame:
    """hits(rid, start) → neighbor paragraphs within ±n windows:
    (hit_paragraph_id, paragraph_id, position, text)."""
    h = hits.select(
        F.col("paragraph_id").alias("hit_paragraph_id"),
        F.col("rid").alias("hit_rid"),
        F.col("start").alias("hit_start"),
    )
    lo = F.col("hit_start") - before * PARAGRAPH_STRIDE
    hi = F.col("hit_start") + after * PARAGRAPH_STRIDE
    return (
        paragraphs.join(
            F.broadcast(h),
            (F.col("rid") == F.col("hit_rid"))
            & (F.col("start") >= lo)
            & (F.col("start") <= hi),
        )
        .select(
            "hit_paragraph_id",
            "paragraph_id",
            ((F.col("start") - F.col("hit_start")) / PARAGRAPH_STRIDE)
            .cast("long")
            .alias("position"),
            "text",
        )
        .orderBy("hit_paragraph_id", "position")
    )


def neighbouring_paragraphs_sql(
    paragraphs_sql: str, hits_sql: str, before: int = 1, after: int = 1
) -> str:
    return f"""
WITH paragraphs AS ({paragraphs_sql}),
hits AS ({hits_sql})
SELECT h.paragraph_id AS hit_paragraph_id,
       p.paragraph_id,
       CAST((p.start - h.start) / {PARAGRAPH_STRIDE} AS BIGINT) AS position,
       p.text
FROM paragraphs p
JOIN hits h
  ON p.rid = h.rid
 AND p.start >= h.start - {before * PARAGRAPH_STRIDE}
 AND p.start <= h.start + {after * PARAGRAPH_STRIDE}
ORDER BY hit_paragraph_id, position
"""


def conversation_context(
    messages: DataFrame, hits: DataFrame, before: int = 2, after: int = 2
) -> DataFrame:
    """Conversational strategy: surround each hit message with its
    ±n neighbors in the same conversation (range join on the message
    ordinal). hits: (message_key, conversation_id, message_idx)."""
    h = hits.select(
        F.col("message_key").alias("hit_key"),
        F.col("conversation_id").alias("hit_conv"),
        F.col("message_idx").alias("hit_idx"),
    )
    return (
        messages.join(
            F.broadcast(h),
            (F.col("conversation_id") == F.col("hit_conv"))
            & (F.col("message_idx") >= F.col("hit_idx") - before)
            & (F.col("message_idx") <= F.col("hit_idx") + after),
        )
        .select(
            "hit_key",
            "message_key",
            (F.col("message_idx") - F.col("hit_idx")).alias("position"),
            "message_type",
            "text",
        )
        .orderBy("hit_key", "position")
    )


def conversation_context_sql(
    messages_sql: str, hits_sql: str, before: int = 2, after: int = 2
) -> str:
    return f"""
WITH messages AS ({messages_sql}),
hits AS ({hits_sql})
SELECT h.message_key AS hit_key,
       m.message_key,
       m.message_idx - h.message_idx AS position,
       m.message_type,
       m.text
FROM messages m
JOIN hits h
  ON m.conversation_id = h.conversation_id
 AND m.message_idx >= h.message_idx - {before}
 AND m.message_idx <= h.message_idx + {after}
ORDER BY hit_key, position
"""


def hierarchy_context(hits: DataFrame, resources: DataFrame) -> DataFrame:
    """Prepend resource title to each hit (hierarchy strategy)."""
    return hits.join(
        F.broadcast(resources.select("rid", "title")), hits["rid"] == resources["rid"]
    ).select(hits["rid"].alias("rid"), "title", hits["paragraph_id"], hits["text"])


def full_resource_context(paragraphs: DataFrame, hits: DataFrame) -> DataFrame:
    """Expand hits to all paragraphs of their resources."""
    rids = hits.select("rid").distinct()
    return paragraphs.join(F.broadcast(rids), "rid", "semi").orderBy("paragraph_id")
