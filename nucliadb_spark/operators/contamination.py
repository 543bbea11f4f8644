"""Benchmark-contamination detection (n-gram overlap).

Before a corpus becomes training data, every pipeline needs the
GPT-3/PaLM-style decontamination pass: does a training document
contain an n-gram that also appears in a held-out evaluation set?
(The published recipes use 8-13 word grams; n=8 here.)

Scale shape — the part that matters at 100 TB:
- the eval set is tiny relative to the corpus, so its distinct
  n-grams are hashed to 60-bit ints and **broadcast**; the corpus
  side streams through a map-side hash join (no shuffle of corpus
  shingles against corpus shingles, never all-pairs);
- the only shuffle is the final per-doc groupBy of matched grams,
  with map-side partial aggregation on a set already filtered down
  to actual hits.

The synthetic corpus is random word soup (30-word vocabulary ⇒ no
natural 8-gram collisions), so the registered query *plants*
contamination deterministically: every 17th training doc gets the
8-token prefix of an arithmetically-chosen eval doc appended —
identical arithmetic in the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nucliadb_spark.functions.text import (
    md5_int60,
    md5_int60_sql,
    tokenize,
    tokenize_sql,
    word_shingles_from_tokens,
    word_shingles_sql,
)

NGRAM = 8
EVAL_MOD = 97  # every 97th doc is the held-out benchmark set
PLANT_MOD = 17  # every 17th training doc gets planted contamination


def eval_split(docs: DataFrame, id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """(train_docs, eval_docs) disjoint split by id arithmetic."""
    is_eval = F.col(id_col) % EVAL_MOD == 0
    return docs.filter(~is_eval), docs.filter(is_eval)


def plant_contamination(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Append the 8-token prefix of eval doc ``97*((id*31) % n_eval)``
    to every 17th training doc. Lazy: n_eval comes from a 1-row
    aggregate cross-joined in (broadcast), not a driver count."""
    train, ev = eval_split(docs, id_col)
    n_eval = ev.agg(F.count("*").cast("long").alias("_n_eval"))
    prefixes = ev.select(
        F.col(id_col).alias("_eval_id"),
        F.array_join(F.slice(tokenize(text_col), 1, NGRAM), " ").alias("_prefix"),
    )
    keyed = train.crossJoin(F.broadcast(n_eval)).withColumn(
        "_want_eval",
        F.when(
            F.col(id_col) % PLANT_MOD == 0,
            F.lit(EVAL_MOD) * F.pmod(F.col(id_col) * 31, F.col("_n_eval")),
        ),
    )
    return (
        keyed.join(
            F.broadcast(prefixes), keyed["_want_eval"] == prefixes["_eval_id"], "left"
        )
        .select(
            F.col(id_col),
            F.when(
                F.col("_prefix").isNotNull(),
                F.concat(F.col(text_col), F.lit(" "), F.col("_prefix")),
            )
            .otherwise(F.col(text_col))
            .alias(text_col),
        )
    )


def plant_contamination_sql(
    docs_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    toks = tokenize_sql(text_col)
    return f"""
WITH alldocs AS ({docs_sql}),
ev AS (SELECT * FROM alldocs WHERE {id_col} % {EVAL_MOD} = 0),
train AS (SELECT * FROM alldocs WHERE {id_col} % {EVAL_MOD} <> 0),
prefixes AS (
  SELECT {id_col} AS eval_id,
         array_to_string(list_slice({toks}, 1, {NGRAM}), ' ') AS prefix
  FROM ev
),
keyed AS (
  SELECT {id_col}, {text_col},
         CASE WHEN {id_col} % {PLANT_MOD} = 0
              THEN {EVAL_MOD} * (({id_col} * 31) % (SELECT COUNT(*) FROM ev))
         END AS want_eval
  FROM train
)
SELECT keyed.{id_col} AS {id_col},
       CASE WHEN prefixes.prefix IS NOT NULL
            THEN concat(keyed.{text_col}, ' ', prefixes.prefix)
            ELSE keyed.{text_col} END AS {text_col}
FROM keyed LEFT JOIN prefixes ON keyed.want_eval = prefixes.eval_id
"""


def contamination_check(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = NGRAM,
) -> DataFrame:
    """(id, n_hits) — training docs sharing ≥1 word n-gram with the
    eval set, with the count of matching gram occurrences.

    eval grams → distinct 60-bit hashes → broadcast; train grams
    stream through the broadcast join; groupBy(id) is the only
    shuffle (partial-agg, hits only).
    """
    def grams(df):
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles_from_tokens(tokenize(text_col), n)).alias("g"),
        ).select("id", md5_int60(F.col("g"), salt="contam:").alias("h"))

    eval_grams = eval_docs.select(
        F.explode(word_shingles_from_tokens(tokenize(text_col), n)).alias("g")
    ).select(md5_int60(F.col("g"), salt="contam:").alias("h")).distinct()

    return (
        grams(train)
        .join(F.broadcast(eval_grams), "h")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_hits"))
        .orderBy("id")
    )


def contamination_check_sql(
    train_sql: str,
    eval_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = NGRAM,
) -> str:
    shingles = word_shingles_sql(text_col, n)
    return f"""
WITH train AS ({train_sql}),
ev AS ({eval_sql}),
train_grams AS (
  SELECT {id_col} AS id, {md5_int60_sql("g", salt="contam:")} AS h
  FROM (SELECT {id_col}, unnest({shingles}) AS g FROM train)
),
eval_grams AS (
  SELECT DISTINCT {md5_int60_sql("g", salt="contam:")} AS h
  FROM (SELECT unnest({shingles}) AS g FROM ev)
)
SELECT id, COUNT(*)::BIGINT AS n_hits
FROM train_grams JOIN eval_grams USING (h)
GROUP BY id
ORDER BY id
"""
