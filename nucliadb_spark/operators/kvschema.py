"""KV-schema inference: derive the reference's KVSchema declaration
from the data itself.

The reference stores user-declared KV schemas per knowledge box and
serves them at GET ``/kb/{kbid}/kv-schemas`` (reader/api/v1/
services.py:364-398): a flat list of typed fields — ``KVFieldType``
in {text, integer, float, boolean, date} plus ``required`` and
``repeated`` flags (nucliadb_models/kv_schemas.py:43-99; keys are
flat, no ``/`` or ``.``).  In a lakehouse there is no KV store to
read declarations from, so the Spark-first analog INFERS the schema
from a JSON metadata column: one distributed pass that explodes
(doc, key, rendered-value) pairs row-locally, classifies each value
by shape, and aggregates per key to the declaration the reference
would store.

Classification is on the *rendered* JSON value (both engines render
numbers/bools/arrays to the same shapes), so a text field whose
every value happens to look like ``"true"`` infers as boolean — the
same ambiguity any schema-inference pass has, and deterministic
across engines.  JSON ``null`` values are treated as absent (Spark's
``to_json`` omits null struct fields; DuckDB keeps ``key: null`` —
filtering nulls makes presence counts identical).

Type promotion per key (applied identically in SQL):
  all array            -> repeated text   (reference allows repeated
                                           only for TEXT)
  all boolean          -> boolean
  all date             -> date
  all integer          -> integer
  all integer|float    -> float
  anything else        -> text
``required`` = present (non-null) in every document.

Scale: the explode is row-local (no shuffle); the only shuffle is
the per-key aggregation, whose cardinality is the KV vocabulary
(bounded by MAX_KV_SCHEMA_FIELDS-ish key counts in practice, never
by document count).  The doc-count frame is a broadcast 1-row
crossJoin, the same pattern as the BM25 corpus stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# regexes shared verbatim between the Spark plan and the DuckDB twin
_RE_DATE = r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2})?$"
_RE_INT = r"^-?\d+$"
_RE_FLOAT = r"^-?\d+\.\d+([eE][+-]?\d+)?$"


def infer_kv_schema(docs: DataFrame, json_col: str = "meta") -> DataFrame:
    """(key, type, required, repeated, n_present) — one row per KV
    key of the JSON column, ordered by key."""
    kv = (
        docs.select(
            F.explode(F.from_json(F.col(json_col), "map<string,string>")).alias(
                "key", "v"
            )
        )
        .filter(F.col("v").isNotNull())
    )
    t = (
        F.when(F.col("v").startswith("["), "array")
        .when(F.col("v").isin("true", "false"), "boolean")
        .when(F.col("v").rlike(_RE_DATE), "date")
        .when(F.col("v").rlike(_RE_INT), "integer")
        .when(F.col("v").rlike(_RE_FLOAT), "float")
        .otherwise("text")
    )
    totals = docs.agg(F.count("*").alias("n_total"))
    agg = (
        kv.withColumn("t", t)
        .groupBy("key")
        .agg(
            F.count("*").cast("long").alias("n_present"),
            F.bool_and(F.col("t") == "array").alias("all_array"),
            F.bool_and(F.col("t") == "boolean").alias("all_bool"),
            F.bool_and(F.col("t") == "date").alias("all_date"),
            F.bool_and(F.col("t") == "integer").alias("all_int"),
            F.bool_and(F.col("t").isin("integer", "float")).alias("all_num"),
        )
        .crossJoin(F.broadcast(totals))
    )
    kv_type = (
        F.when(F.col("all_array"), "text")
        .when(F.col("all_bool"), "boolean")
        .when(F.col("all_date"), "date")
        .when(F.col("all_int"), "integer")
        .when(F.col("all_num"), "float")
        .otherwise("text")
    )
    return agg.select(
        "key",
        kv_type.alias("type"),
        (F.col("n_present") == F.col("n_total")).alias("required"),
        F.col("all_array").alias("repeated"),
        "n_present",
    ).orderBy("key")


def infer_kv_schema_sql(docs_sql: str, json_col: str = "meta") -> str:
    """DuckDB twin: json_keys + dynamic-path extraction (this
    build has no json_each table function), same classification
    regexes and promotion ladder."""
    return f"""
WITH docs AS ({docs_sql}),
tot AS (SELECT COUNT(*) AS n_total FROM docs),
kv AS (
  SELECT key, json_extract_string({json_col}, '$.' || key) AS v
  FROM (SELECT unnest(json_keys({json_col})) AS key, {json_col} FROM docs)
  WHERE json_extract_string({json_col}, '$.' || key) IS NOT NULL
),
cls AS (
  SELECT key, CASE
    WHEN v LIKE '[%' THEN 'array'
    WHEN v IN ('true', 'false') THEN 'boolean'
    WHEN regexp_matches(v, '{_RE_DATE}') THEN 'date'
    WHEN regexp_matches(v, '{_RE_INT}') THEN 'integer'
    WHEN regexp_matches(v, '{_RE_FLOAT}') THEN 'float'
    ELSE 'text' END AS t
  FROM kv
)
SELECT key,
  CASE
    WHEN bool_and(t = 'array') THEN 'text'
    WHEN bool_and(t = 'boolean') THEN 'boolean'
    WHEN bool_and(t = 'date') THEN 'date'
    WHEN bool_and(t = 'integer') THEN 'integer'
    WHEN bool_and(t IN ('integer', 'float')) THEN 'float'
    ELSE 'text' END AS type,
  COUNT(*) = min((SELECT n_total FROM tot)) AS required,
  bool_and(t = 'array') AS repeated,
  CAST(COUNT(*) AS BIGINT) AS n_present
FROM cls
GROUP BY key
ORDER BY key
"""
