"""Maintenance-plane operators: the scheduled jobs a deployment runs
against its own index — orphan purge planning and referential
integrity audit (ref nucliadb/src/nucliadb/purge/__init__.py:54-204 —
purge_kbs / purge_deleted_resource_storage / purge_kb_vectorsets walk
tombstone keys and delete the dependent storage+index entries; the
audit half mirrors rollover's validate_indexed_data counts,
common/cluster/rollover.py:459, and rebalance.py:426's metadata-vs-
actual paragraph counts).

Scale notes:
- the purge plan is a broadcast semijoin per index family against the
  tombstone set (tombstones are a tiny fraction of the corpus by
  construction — they're what accumulated since the last purge), then
  a full map-side-combinable aggregate: one row out per family, no
  wide shuffle anywhere;
- the integrity audit is anti-join counting: each check is a
  broadcast/shuffled LEFT ANTI against the owning table followed by a
  count aggregate. At 100 TB each check is one scan + one semijoin —
  the checks are independent, so Spark schedules them as parallel
  jobs over the same cached scans;
- both emit fixed-size reports (rows = families/checks), so the
  driver/collect side is O(1) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: tombstone mark for the synthetic corpus: every 19th resource is
#: "deleted but not yet purged" (the reference marks deletion by a
#: tombstone key under /deletedkbs|/deleted, purge/__init__.py:48-95;
#: the modulus stands in for that key scan and keeps the oracle twin
#: one WHERE clause)
PURGE_MOD = 19


def tombstones(fields: DataFrame, mod: int = PURGE_MOD) -> DataFrame:
    """Distinct rids marked deleted — the purge worklist."""
    return (
        fields.select("rid").filter(F.col("rid") % mod == 0).distinct()
    )


def tombstones_sql(fields_sql: str, mod: int = PURGE_MOD) -> str:
    return f"SELECT DISTINCT rid FROM ({fields_sql}) WHERE rid % {mod} = 0"


def purge_orphans_plan(
    fields: DataFrame,
    paragraphs: DataFrame,
    vectors: DataFrame,
    dim: int,
    mod: int = PURGE_MOD,
) -> DataFrame:
    """(kind, n_rows, bytes) — what one purge pass would delete from
    each index family, given the current tombstone set: the review
    artifact before running the destructive job (the reference logs
    exactly these counts as it purges, purge/__init__.py:139-202).

    bytes is the storage each family returns to the pool: text bytes
    for fields/paragraphs (ASCII corpus: chars == bytes), 4·dim per
    float32 vector.
    """
    tomb = F.broadcast(tombstones(fields, mod))
    f = (
        fields.join(tomb, "rid", "left_semi")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("bytes"),
        )
        .select(F.lit("field").alias("kind"), "n_rows", "bytes")
    )
    p = (
        paragraphs.join(tomb, "rid", "left_semi")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum(F.length("text")), F.lit(0))
            .cast("long")
            .alias("bytes"),
        )
        .select(F.lit("paragraph").alias("kind"), "n_rows", "bytes")
    )
    v = (
        vectors.join(tomb, "rid", "left_semi")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            F.lit("vector").alias("kind"),
            F.col("n_rows"),
            (F.col("n_rows") * 4 * dim).cast("long").alias("bytes"),
        )
    )
    return f.unionByName(p).unionByName(v).orderBy("kind")


def purge_orphans_plan_sql(
    fields_sql: str,
    paragraphs_sql: str,
    vectors_sql: str,
    dim: int,
    mod: int = PURGE_MOD,
) -> str:
    return f"""
WITH f AS ({fields_sql}),
p AS ({paragraphs_sql}),
v AS ({vectors_sql}),
tomb AS ({tombstones_sql(fields_sql, mod)})
SELECT 'field' AS kind,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS bytes
FROM f JOIN tomb USING (rid)
UNION ALL
SELECT 'paragraph',
       CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(length(text)), 0) AS BIGINT)
FROM p JOIN tomb USING (rid)
UNION ALL
SELECT 'vector',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) * 4 * {dim} AS BIGINT)
FROM v JOIN tomb USING (rid)
ORDER BY kind
"""


def integrity_audit(
    resources: DataFrame,
    fields: DataFrame,
    paragraphs: DataFrame,
    vectors: DataFrame,
) -> DataFrame:
    """(check, n_checked, n_bad) — referential fsck over the index
    families (the rollover validator's counts, rollover.py:459, plus
    the embedding-coverage gap the backfill pipeline consumes):

    - field_without_resource: fields whose rid has no resource row;
    - paragraph_without_field: paragraphs whose (rid, field_id) —
      parsed from the 3-segment paragraph id — has no field row;
    - field_without_vector: text fields with no embedding yet (the
      vectorset backfill backlog — legitimately nonzero);
    - vector_without_field: embeddings whose owner is gone (must be
      zero; nonzero means a purge missed the vector index).
    """

    def _report(name: str, bad: DataFrame, n_checked: DataFrame) -> DataFrame:
        return (
            bad.agg(F.count("*").cast("long").alias("n_bad"))
            .crossJoin(F.broadcast(n_checked))
            .select(
                F.lit(name).alias("check"),
                F.col("n_checked"),
                F.col("n_bad"),
            )
        )

    def _n(df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_checked"))

    rids = resources.select("rid").distinct()
    field_keys = fields.select("rid", "field_id").distinct()
    field_rids = fields.select("rid").distinct()
    vec_rids = vectors.select("rid").distinct()

    seg = F.split("paragraph_id", "/")
    para_keys = paragraphs.select(
        "rid", seg.getItem(1).alias("field_id")
    )

    checks = [
        _report(
            "field_without_resource",
            fields.join(rids, "rid", "left_anti"),
            _n(fields),
        ),
        _report(
            "paragraph_without_field",
            para_keys.join(field_keys, ["rid", "field_id"], "left_anti"),
            _n(paragraphs),
        ),
        _report(
            "field_without_vector",
            field_rids.join(vec_rids, "rid", "left_anti"),
            _n(field_rids),
        ),
        _report(
            "vector_without_field",
            vectors.join(field_rids, "rid", "left_anti"),
            _n(vectors),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check")


def integrity_audit_sql(
    resources_sql: str,
    fields_sql: str,
    paragraphs_sql: str,
    vectors_sql: str,
) -> str:
    return f"""
WITH r AS (SELECT DISTINCT rid FROM ({resources_sql})),
f AS ({fields_sql}),
fk AS (SELECT DISTINCT rid, field_id FROM f),
fr AS (SELECT DISTINCT rid FROM f),
p AS (SELECT rid, string_split(paragraph_id, '/')[2] AS field_id
      FROM ({paragraphs_sql})),
v AS ({vectors_sql}),
vr AS (SELECT DISTINCT rid FROM v)
SELECT 'field_without_resource' AS check,
       CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS n_checked,
       CAST((SELECT COUNT(*) FROM f WHERE f.rid NOT IN (SELECT rid FROM r))
            AS BIGINT) AS n_bad
UNION ALL
SELECT 'paragraph_without_field',
       CAST((SELECT COUNT(*) FROM p) AS BIGINT),
       CAST((SELECT COUNT(*) FROM p ANTI JOIN fk
             ON p.rid = fk.rid AND p.field_id = fk.field_id) AS BIGINT)
UNION ALL
SELECT 'field_without_vector',
       CAST((SELECT COUNT(*) FROM fr) AS BIGINT),
       CAST((SELECT COUNT(*) FROM fr WHERE fr.rid NOT IN (SELECT rid FROM vr))
            AS BIGINT)
UNION ALL
SELECT 'vector_without_field',
       CAST((SELECT COUNT(*) FROM v) AS BIGINT),
       CAST((SELECT COUNT(*) FROM v WHERE v.rid NOT IN (SELECT rid FROM fr))
            AS BIGINT)
ORDER BY "check"
"""


def fielded_compaction_plan(log: DataFrame) -> DataFrame:
    """(field_key, n_fields_live, n_dead_versions, n_ops) — the
    review artifact a compaction pass reads before force-merging the
    streamed fielded index (the per-family sibling of the segment
    merge scheduler; ref log_merge.rs:59-110 deletion purging and
    the indexer's per-field delete-then-reindex, indexer.rs:254-298).

    n_fields_live = field versions a compacted index keeps;
    n_dead_versions = superseded upsert segments a purge deletes
    (a revised field's old version, a deleted field's whole history);
    n_ops = total op-log length. Two map-side-combinable groupBys —
    (rid, field_id) then field_key; report size = family count.
    """
    pf = log.groupBy("field_key", "rid", "field_id").agg(
        F.count("*").alias("n_ops"),
        F.count(F.when(F.col("op") == "upsert", True)).alias("n_upserts"),
        (F.max_by("op", "seq") == "upsert").cast("int").alias("live"),
    )
    return (
        pf.groupBy("field_key")
        .agg(
            F.sum("live").cast("long").alias("n_fields_live"),
            F.sum(F.col("n_upserts") - F.col("live"))
            .cast("long")
            .alias("n_dead_versions"),
            F.sum("n_ops").cast("long").alias("n_ops"),
        )
        .orderBy("field_key")
    )


def fielded_compaction_plan_sql(log_sql: str) -> str:
    return f"""
WITH log AS ({log_sql}),
pf AS (
  SELECT field_key, rid, field_id,
         COUNT(*) AS n_ops,
         COUNT(CASE WHEN op = 'upsert' THEN 1 END) AS n_upserts,
         CASE WHEN max_by(op, seq) = 'upsert' THEN 1 ELSE 0 END AS live
  FROM log GROUP BY 1, 2, 3
)
SELECT field_key,
       CAST(SUM(live) AS BIGINT) AS n_fields_live,
       CAST(SUM(n_upserts - live) AS BIGINT) AS n_dead_versions,
       CAST(SUM(n_ops) AS BIGINT) AS n_ops
FROM pf GROUP BY 1 ORDER BY 1
"""
