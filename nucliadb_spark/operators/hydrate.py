"""Standalone `/kb/{kbid}/hydrate` endpoint analog: hydrate an
EXPLICIT set of paragraph ids into the three-level Hydrated payload
(paragraphs + their fields + their resources).

ref: nucliadb/src/nucliadb/search/api/v1/hydrate.py:56-74 (the
endpoint: HydrateRequest.data is a list of ParagraphId, hydration
config selects what to attach) and
nucliadb_models/src/nucliadb_models/hydration.py:203-290
(ParagraphHydration.text + related.neighbours.before/after,
FieldHydration value, ResourceHydration title/origin/security;
HydratedResource id/slug/title).

Spark-first shape: the id list's rid set SEMIJOINS the paragraph/
field/resource tables first — at 100 TB that is partition pruning
(rid is the leading key), so hydration cost is proportional to the
requested resources, never the corpus. Neighbour hydration
(before=1/after=1) is a lag/lead window inside each rid's paragraph
sequence — no self-join, one shuffle keyed by the already-pruned
rid set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hydrate(
    request_ids: DataFrame,
    paragraphs: DataFrame,
    fields: DataFrame,
    resources: DataFrame,
) -> DataFrame:
    """request_ids(paragraph_id) → one row per requested paragraph
    carrying paragraph text + ±1 neighbour texts, the owning field's
    key/type/language, and the owning resource's slug/title/origin/
    security — the flattened Hydrated payload.

    request_ids must be DETERMINISTIC (it is referenced twice in the
    DAG: once for the ids, once for the rid prune set) — a bare
    limit() without ordering would pick two different row sets.
    Endpoint requests are literal id lists, which trivially satisfy
    this."""
    from pyspark.sql import Window

    req = request_ids.select("paragraph_id")
    rids = (
        req.select(F.split("paragraph_id", "/").getItem(0).cast("long").alias("rid"))
        .distinct()
    )
    # neighbours must come from the rid's FULL paragraph sequence
    # (they need not be in the request), so prune by rid first, then
    # window within the pruned set
    w = Window.partitionBy("rid").orderBy("start")
    p = (
        paragraphs.join(rids, "rid")
        .select(
            "rid",
            "paragraph_id",
            "start",
            "end",
            "text",
            "kind",
            F.lag("text").over(w).alias("prev_text"),
            F.lead("text").over(w).alias("next_text"),
        )
    )
    return (
        req.join(p, "paragraph_id")
        .join(
            fields.select("rid", "field_key", "field_type", "language"), "rid"
        )
        .join(
            resources.select(
                "rid", "slug", "title", "origin_source", "security_public"
            ),
            "rid",
        )
        .select(
            "paragraph_id",
            "rid",
            "start",
            "end",
            "text",
            "kind",
            "prev_text",
            "next_text",
            "field_key",
            "field_type",
            "language",
            "slug",
            "title",
            "origin_source",
            "security_public",
        )
        .orderBy("paragraph_id")
    )


def hydrate_sql(
    request_sql: str, paragraphs_sql: str, fields_sql: str, resources_sql: str
) -> str:
    return f"""
WITH req AS (SELECT paragraph_id FROM ({request_sql})),
p0 AS ({paragraphs_sql}),
rids AS (
  SELECT DISTINCT CAST(string_split(paragraph_id, '/')[1] AS BIGINT) AS rid
  FROM req
),
p AS (
  SELECT p0.rid, p0.paragraph_id, p0.start, p0."end", p0.text, p0.kind,
         lag(p0.text) OVER (PARTITION BY p0.rid ORDER BY p0.start) AS prev_text,
         lead(p0.text) OVER (PARTITION BY p0.rid ORDER BY p0.start) AS next_text
  FROM p0 JOIN rids USING (rid)
),
f AS ({fields_sql}),
r AS ({resources_sql})
SELECT p.paragraph_id, p.rid, p.start, p."end", p.text, p.kind,
       p.prev_text, p.next_text,
       f.field_key, f.field_type, f.language,
       r.slug, r.title, r.origin_source, r.security_public
FROM req
JOIN p USING (paragraph_id)
JOIN f ON f.rid = p.rid
JOIN r ON r.rid = p.rid
ORDER BY p.paragraph_id
"""
