"""/summarize endpoint analog (SURVEY §2.13 model-hook surface).

ref: nucliadb/src/nucliadb/search/api/v1/summarize.py +
search/search/summarize.py — gather the extracted text of every field
of the requested resources (get_extracted_texts, bounded by
MAX_GET_EXTRACTED_TEXT_OPS), ship them to the Predict API's summarize
model (SummarizeRequest.summary_kind simple|extended), return one
summary per field plus a per-resource roll-up.

Spark shape: the gather is a pruned scan of the fields table filtered
to the requested rids (request-sized IN-list → parquet row-group
skipping); the LLM boundary is replaced by a deterministic extractive
stub (first-k-words) expressed as built-in Column functions so the
whole thing stays in codegen and is oracle-checkable. A real model
drops in as a pandas UDF over the same (rid, field_key, text) rows —
the plan shape doesn't change, per functions/models.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# words kept by the extractive stub per summary kind
# (SummarizeRequest.summary_kind, nucliadb_models/search.py)
KIND_WORDS = {"simple": 25, "extended": 50}


def summarize_fields(
    fields: DataFrame, rids: list[int], kind: str = "simple"
) -> DataFrame:
    """Per-field extractive summary for the requested resources:
    (rid, field_key, summary, n_tokens). n_tokens mirrors the
    reference's tokens accounting in SummarizedResponse."""
    words = KIND_WORDS[kind]
    toks = F.split(F.col("text"), " ")
    return (
        fields.filter(F.col("rid").isin(rids))
        .select(
            "rid",
            "field_key",
            F.concat_ws(" ", F.slice(toks, 1, words)).alias("summary"),
            F.size(toks).cast("long").alias("n_tokens"),
        )
        .orderBy("rid", "field_key")
    )


def summarize_fields_sql(fields_sql: str, rids: list[int], kind: str = "simple") -> str:
    words = KIND_WORDS[kind]
    id_list = ", ".join(str(r) for r in rids)
    return f"""
WITH fields AS ({fields_sql})
SELECT rid, field_key,
       array_to_string(list_slice(string_split(text, ' '), 1, {words}), ' ') AS summary,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM fields
WHERE rid IN ({id_list})
ORDER BY rid, field_key
"""
