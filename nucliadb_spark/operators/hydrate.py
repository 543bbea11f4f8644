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
(before/after, default 1 each) is a stack of lag/lead offsets inside
each field's paragraph sequence — no self-join, one shuffle keyed by
the already-pruned rid set regardless of depth.

Owning-field semantics: the reference's ParagraphId carries a field
segment (`rid/field/start-end`, nidx_paragraph/src/schema.rs) and
hydration attaches the OWNING field, not every field of the
resource. The id is parsed here: 3-segment ids yield their field_id,
legacy 2-segment ids (`rid/start-end`, the single-field corpus)
default to 'body'. The fields join is on (rid, field_id), so a
multi-field resource hydrates to exactly one row per requested
paragraph — never a row per (paragraph × field).

Split segment: conversation fields address each message as a SPLIT
of the field (FieldUid.split, nidx_text/src/reader.rs:482-487
`parts.get(3)`), so a conversation paragraph id is the 4-segment
`rid/field/split/start-end`. The split is parsed into the output and
into the neighbour ordering — neighbours walk the field's paragraph
sequence ordered by (split, start), which for conversations means
the ADJACENT MESSAGES (the reference's conversational context
strategy hydrates surrounding messages the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _neighbour_col(prefix: str, i: int) -> str:
    """prev_text / next_text at depth 1 (the historical schema);
    prev_text2 / next_text2 … beyond."""
    return f"{prefix}_text" if i == 1 else f"{prefix}_text{i}"


def hydrate(
    request_ids: DataFrame,
    paragraphs: DataFrame,
    fields: DataFrame,
    resources: DataFrame,
    before: int = 1,
    after: int = 1,
) -> DataFrame:
    """request_ids(paragraph_id) → one row per requested paragraph
    carrying paragraph text + ``before``/``after`` neighbour texts
    (ParagraphHydration.related.neighbours), the OWNING field's
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
    # neighbours must come from the owning FIELD's full paragraph
    # sequence (they need not be in the request), so prune by rid
    # first, then window within the pruned set
    seg = F.split("paragraph_id", "/")
    field_id = F.when(F.size(seg) >= 3, seg.getItem(1)).otherwise(F.lit("body"))
    # 4-segment conversation ids carry the message split; everything
    # else sorts at split 0 so the ordering is unchanged for them
    split_id = (
        F.when(F.size(seg) == 4, seg.getItem(2)).otherwise(F.lit("0")).cast("long")
    )
    w = Window.partitionBy("rid", "field_id").orderBy("split", "start")
    neighbour_cols = [
        F.lag("text", i).over(w).alias(_neighbour_col("prev", i))
        for i in range(1, before + 1)
    ] + [
        F.lead("text", i).over(w).alias(_neighbour_col("next", i))
        for i in range(1, after + 1)
    ]
    p = (
        paragraphs.join(rids, "rid")
        .withColumn("field_id", field_id)
        .withColumn("split", split_id)
        .select(
            "rid",
            "field_id",
            "split",
            "paragraph_id",
            "start",
            "end",
            "text",
            "kind",
            *neighbour_cols,
        )
    )
    return (
        req.join(p, "paragraph_id")
        .join(
            fields.select("rid", "field_id", "field_key", "field_type", "language"),
            ["rid", "field_id"],
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
            "split",
            "start",
            "end",
            "text",
            "kind",
            *[_neighbour_col("prev", i) for i in range(1, before + 1)],
            *[_neighbour_col("next", i) for i in range(1, after + 1)],
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
    request_sql: str,
    paragraphs_sql: str,
    fields_sql: str,
    resources_sql: str,
    before: int = 1,
    after: int = 1,
) -> str:
    """DuckDB twin of :func:`hydrate`, column-for-column — including
    the owning-field join on (rid, field_id) parsed from the id and
    the lag/lead neighbour stack at arbitrary depth."""
    lag_lines = "".join(
        f"         lag(p0.text, {i}) OVER fieldseq AS {_neighbour_col('prev', i)},\n"
        for i in range(1, before + 1)
    )
    lead_lines = "".join(
        f"         lead(p0.text, {i}) OVER fieldseq AS {_neighbour_col('next', i)},\n"
        for i in range(1, after + 1)
    )
    neighbour_out = "".join(
        f"       p.{_neighbour_col('prev', i)},\n" for i in range(1, before + 1)
    ) + "".join(
        f"       p.{_neighbour_col('next', i)},\n" for i in range(1, after + 1)
    )
    return f"""
WITH req AS (SELECT paragraph_id FROM ({request_sql})),
p0 AS (
  SELECT *,
         CASE WHEN len(string_split(paragraph_id, '/')) >= 3
              THEN string_split(paragraph_id, '/')[2]
              ELSE 'body' END AS field_id,
         CAST(CASE WHEN len(string_split(paragraph_id, '/')) = 4
              THEN string_split(paragraph_id, '/')[3]
              ELSE '0' END AS BIGINT) AS split
  FROM ({paragraphs_sql})
),
rids AS (
  SELECT DISTINCT CAST(string_split(paragraph_id, '/')[1] AS BIGINT) AS rid
  FROM req
),
p AS (
  SELECT p0.rid, p0.field_id, p0.split, p0.paragraph_id, p0.start, p0."end",
         p0.text, p0.kind,
{lag_lines}{lead_lines}         p0.text AS _self
  FROM p0 JOIN rids USING (rid)
  WINDOW fieldseq AS (PARTITION BY p0.rid, p0.field_id ORDER BY p0.split, p0.start)
),
f AS ({fields_sql}),
r AS ({resources_sql})
SELECT p.paragraph_id, p.rid, p.split, p.start, p."end", p.text, p.kind,
{neighbour_out}       f.field_key, f.field_type, f.language,
       r.slug, r.title, r.origin_source, r.security_public
FROM req
JOIN p USING (paragraph_id)
JOIN f ON f.rid = p.rid AND f.field_id = p.field_id
JOIN r ON r.rid = p.rid
ORDER BY p.paragraph_id
"""
