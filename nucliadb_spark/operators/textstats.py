"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, content fingerprinting.

These extend the reference's text processing (its language metadata
arrives from an external processing pipeline —
resources.proto FieldMetadata.language) with the in-engine analysis
ops a 100 TB corpus pipeline needs. Everything is a row-local Column
expression (whole-stage codegen; zero shuffles except final
aggregation queries), with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nucliadb_spark.functions.text import (
    md5_int60,
    md5_int60_sql,
    tokenize,
    tokenize_sql,
    word_shingles,
    word_shingles_from_tokens,
)
from nucliadb_spark.operators.filters import _sql_quote

# --- language ID (stopword n-gram heuristic) ------------------------------
# Tiny per-language function-word profiles; score = fraction of tokens
# in the profile; argmax with deterministic tie order (profile order).

LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
}


def _lang_score(toks: Column, words: list[str]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def _lang_score_sql(toks: str, words: list[str]) -> str:
    lst = ", ".join(_sql_quote(w) for w in words)
    return (
        f"(len(list_filter({toks}, t -> t IN ({lst})))::DOUBLE"
        f" / greatest(len({toks}), 1)::DOUBLE)"
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, predicted_lang, confidence DOUBLE rounded to 5 places).

    Tokens are projected once (a bound column) — per-language scores
    reference the array 2× each; inlining tokenize() would re-run the
    tokenizer 8× per row (see SCALE.md plan-shape lessons).
    """
    docs = docs.select(F.col(id_col).alias(id_col), tokenize(text_col).alias("_toks"))
    toks = F.col("_toks")
    scores = {lang: _lang_score(toks, ws) for lang, ws in LANG_PROFILES.items()}
    langs = list(LANG_PROFILES)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return docs.select(
        F.col(id_col).alias("id"),
        best.alias("predicted_lang"),
        F.round(best_score, 5).cast("double").alias("confidence"),
    ).orderBy("id")


def language_id_sql(docs_sql: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = tokenize_sql(text_col)
    langs = list(LANG_PROFILES)
    score_cols = ",\n       ".join(
        f"{_lang_score_sql(toks, LANG_PROFILES[lang])} AS s_{lang}" for lang in langs
    )
    best = f"'{langs[0]}'"
    best_score = f"s_{langs[0]}"
    for lang in langs[1:]:
        best = f"CASE WHEN s_{lang} > {best_score} THEN '{lang}' ELSE {best} END"
        best_score = f"CASE WHEN s_{lang} > {best_score} THEN s_{lang} ELSE {best_score} END"
    return f"""
WITH docs AS ({docs_sql}),
scored AS (
  SELECT {id_col} AS id,
       {score_cols}
  FROM docs
)
SELECT id,
       {best} AS predicted_lang,
       ROUND({best_score}, 5)::DOUBLE AS confidence
FROM scored
ORDER BY id
"""


# --- quality scoring --------------------------------------------------------
# Length / stopword-ratio / mean-token-length features and a composite
# score in [0,1]: docs in a "healthy" band score high.

STOPWORDS = LANG_PROFILES["en"]


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, n_tokens, mean_token_len, stopword_ratio, quality)."""
    docs = docs.select(
        F.col(id_col).alias(id_col),
        F.col(text_col).alias(text_col),
        tokenize(text_col).alias("_toks"),
    )
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    mean_tok = n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast(
        "double"
    ) / F.greatest(n_tokens, F.lit(1)).cast("double")
    # composite: length band [50, 5000] chars, stopword band [0.01, 0.5]
    len_ok = (n_chars >= 50) & (n_chars <= 5000)
    stop_ok = (stop_ratio >= 0.01) & (stop_ratio <= 0.5)
    quality = (
        F.when(len_ok, 0.5).otherwise(0.0) + F.when(stop_ok, 0.5).otherwise(0.0)
    )
    return docs.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok, 5).cast("double").alias("mean_token_len"),
        F.round(stop_ratio, 5).cast("double").alias("stopword_ratio"),
        F.round(quality, 2).cast("double").alias("quality"),
    ).orderBy("id")


def quality_features_sql(docs_sql: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = tokenize_sql(text_col)
    stop = ", ".join(_sql_quote(w) for w in STOPWORDS)
    return f"""
WITH docs AS ({docs_sql}),
feat AS (
  SELECT {id_col} AS id,
         length({text_col}) AS n_chars,
         len({toks}) AS n_tokens,
         length({text_col})::DOUBLE / greatest(len({toks}), 1)::DOUBLE AS mean_tok,
         len(list_filter({toks}, t -> t IN ({stop})))::DOUBLE
           / greatest(len({toks}), 1)::DOUBLE AS stop_ratio
  FROM docs
)
SELECT id, n_chars, n_tokens,
       ROUND(mean_tok, 5)::DOUBLE AS mean_token_len,
       ROUND(stop_ratio, 5)::DOUBLE AS stopword_ratio,
       ROUND((CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 0.5 ELSE 0.0 END)
             + (CASE WHEN stop_ratio BETWEEN 0.01 AND 0.5 THEN 0.5 ELSE 0.0 END),
             2)::DOUBLE AS quality
FROM feat
ORDER BY id
"""


# --- token counting ----------------------------------------------------------
# whitespace tokens + a BPE-ish subword estimate (ceil(len/4) pieces
# per word — the standard chars/4 rule applied per token, exact
# integer arithmetic in both engines).


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    docs = docs.select(F.col(id_col).alias(id_col), tokenize(text_col).alias("_toks"))
    toks = F.col("_toks")
    bpe = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        bpe.alias("n_bpe_tokens"),
    ).orderBy("id")


def token_counts_sql(docs_sql: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = tokenize_sql(text_col)
    return f"""
WITH docs AS ({docs_sql})
SELECT {id_col} AS id,
       len({toks})::BIGINT AS n_tokens,
       list_aggregate(list_transform({toks}, t -> ceil(length(t) / 4.0)::BIGINT),
                      'sum')::BIGINT AS n_bpe_tokens
FROM docs
ORDER BY id
"""


# --- content fingerprint (winnowing) ------------------------------------------
# Rolling 5-token window hashes; the document fingerprint is the
# minimum window hash (winnowing with one global window) plus the
# distinct-window count — robust to local edits, exact in both engines.

WINDOW = 5


def winnow_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    from nucliadb_spark.functions.text import word_shingles_from_tokens

    sh = (
        docs.select(F.col(id_col).alias("id"), tokenize(text_col).alias("_toks"))
        .select(
            "id",
            F.explode(word_shingles_from_tokens(F.col("_toks"), WINDOW)).alias("win"),
        )
        .withColumn("h", md5_int60(F.col("win"), salt="winnow:"))
    )
    return (
        sh.groupBy("id")
        .agg(
            F.min("h").alias("fingerprint"),
            F.countDistinct("h").alias("n_windows"),
        )
        .orderBy("id")
    )


def winnow_fingerprint_sql(docs_sql: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = tokenize_sql(text_col)
    n = WINDOW
    shingles = (
        f"[array_to_string(list_slice({toks}, i, i + {n - 1}), ' ') "
        f"for i in range(1, greatest(len({toks}) - {n - 1}, 0) + 1)]"
    )
    return f"""
WITH docs AS ({docs_sql}),
wins AS (
  SELECT {id_col} AS id, unnest({shingles}) AS win FROM docs
),
hashed AS (
  SELECT id, {md5_int60_sql("win", salt="winnow:")} AS h FROM wins
)
SELECT id, MIN(h) AS fingerprint, COUNT(DISTINCT h) AS n_windows
FROM hashed
GROUP BY id
ORDER BY id
"""


# --- repetition signals (Gopher-style quality filters) -----------------------
# The Gopher/MassiveText quality rules cut documents dominated by
# repeated content: duplicate n-gram fraction, fraction of the doc
# covered by the single most frequent n-gram, and consecutive-token
# repetition. All three are row-local array expressions here (zero
# shuffles — each doc computes its own signals inside whole-stage
# codegen), which is what makes the filter linear at 100 TB. The
# DuckDB twin verifies via unnest+GROUP BY, numerically identical.


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bigrams, dup_bigram_frac, top_bigram_frac,
        consec_repeat_frac) — all fracs DOUBLE rounded to 5 places.

    - dup_bigram_frac: 1 - distinct/total bigrams (how much of the
      doc is re-used phrasing).
    - top_bigram_frac: tokens covered by the most frequent bigram
      (2 * mode_count / n_tokens). The mode count is computed
      row-locally: sort the bigram array, then a single aggregate()
      pass tracks the longest equal-run.
    - consec_repeat_frac: fraction of adjacent token pairs that are
      the same token (stutter).
    """
    docs = docs.select(F.col(id_col).alias(id_col), tokenize(text_col).alias("_toks"))
    toks = F.col("_toks")
    docs = docs.select(
        F.col(id_col),
        toks,
        F.array_sort(word_shingles_from_tokens(toks, 2)).alias("_bg"),
    )
    bg = F.col("_bg")
    n_toks = F.size(toks)
    n_bg = F.size(bg)

    zero = F.lit(0).cast("long")
    run_state = F.struct(
        F.lit(" ").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    mode_count = F.aggregate(bg, run_state, _step, lambda acc: acc["best"])

    consec = F.when(
        n_toks >= 2,
        F.aggregate(
            F.zip_with(
                F.slice(toks, 1, n_toks - 1),
                F.slice(toks, 2, n_toks - 1),
                lambda a, b: (a == b).cast("long"),
            ),
            zero,
            lambda acc, x: acc + x,
        ),
    ).otherwise(zero)

    dbl = lambda c: F.round(c, 5).cast("double")  # noqa: E731
    return docs.select(
        F.col(id_col).alias("id"),
        n_bg.cast("long").alias("n_bigrams"),
        dbl(
            F.lit(1.0)
            - F.size(F.array_distinct(bg)).cast("double")
            / F.greatest(n_bg, F.lit(1)).cast("double")
        ).alias("dup_bigram_frac"),
        dbl(
            F.lit(2.0) * mode_count.cast("double")
            / F.greatest(n_toks, F.lit(1)).cast("double")
        ).alias("top_bigram_frac"),
        dbl(
            consec.cast("double") / F.greatest(n_toks - 1, F.lit(1)).cast("double")
        ).alias("consec_repeat_frac"),
    ).orderBy("id")


# --- unigram LM quality (CCNet-style perplexity proxy) -----------------------
# CCNet/RedPajama filter corpora by language-model perplexity; the
# in-engine analog scores each document by the mean negative log10
# probability of its tokens under the corpus's own unigram model.
# The model (token → logp) is an index-build artifact: one
# explode+groupBy over the corpus. Scoring is explode + model join +
# groupBy(doc) — at testdata scale the model broadcasts; at 100 TB
# vocabulary it stays a shuffle join on the token key (Zipf skew is
# benign here: the heavy tokens are spread over the doc side, and AQE
# splits any oversized partition).


def unigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, logp DOUBLE) — log10 of the corpus unigram probability."""
    counts = (
        docs.select(F.explode(tokenize(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    total = counts.agg(F.sum("c").cast("double").alias("n"))
    return counts.crossJoin(F.broadcast(total)).select(
        "token",
        F.log10(F.col("c").cast("double") / F.col("n")).alias("logp"),
    )


def unigram_logprob(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, avg_neg_logp DOUBLE rounded to 5 places).

    Higher avg_neg_logp = rarer vocabulary = "surprising" text (the
    unigram stand-in for LM perplexity; CCNet buckets head/middle/tail
    on exactly this kind of score). Tokens are scored with duplicates
    kept — a doc repeating one common word scores low.
    """
    if model is None:
        model = unigram_model(docs, text_col)
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("token")
    )
    return (
        tok.join(F.broadcast(model), "token")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(-F.avg("logp"), 5).cast("double").alias("avg_neg_logp"),
        )
        .orderBy("id")
    )


def unigram_logprob_sql(
    docs_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    toks = tokenize_sql(text_col)
    return f"""
WITH docs AS ({docs_sql}),
tok AS (
  SELECT {id_col} AS id, unnest({toks}) AS token FROM docs
),
counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
tot AS (SELECT SUM(c)::DOUBLE AS n FROM counts),
model AS (
  SELECT token, log10(c::DOUBLE / n) AS logp FROM counts CROSS JOIN tot
)
SELECT t.id AS id,
       COUNT(*)::BIGINT AS n_tokens,
       ROUND(-AVG(m.logp), 5)::DOUBLE AS avg_neg_logp
FROM tok t JOIN model m USING (token)
GROUP BY t.id
ORDER BY id
"""


# --- quality funnel (per-rule drop report) -----------------------------------
# The Gopher/Dolma-style cleaning pipelines report how many documents
# each rule rejects — the funnel is what a pipeline operator tunes
# thresholds against. One pass: every rule is a CASE aggregate over
# the row-local features (no per-rule scans), one final 1-row shuffle.

FUNNEL_RULES: list[tuple[str, str]] = [
    # (rule name, human description) — predicates defined in both
    # engines below; ORDER here is the output order.
    ("too_short", "n_chars < 50"),
    ("too_long", "n_chars > 5000"),
    ("low_stopword", "stopword_ratio < 0.01"),
    ("high_stopword", "stopword_ratio > 0.5"),
    ("repetitive", "dup_bigram_frac > 0.30"),
    ("stutter", "consec_repeat_frac > 0.10"),
]


def quality_funnel(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(rule, n_fail, frac DOUBLE) per rule + a final ('pass_all',
    n_pass, frac) row — the cleaning-funnel report.

    All rule inputs are row-local, so they're computed in ONE
    projection over one tokenize pass — no join of separately
    materialized feature frames (measured 20s → 2s at 500k docs; the
    join forced two tokenize passes, two sorts and an id shuffle).
    Features are rounded to the same 5 places as the standalone
    feature queries so the rule thresholds bite identically.
    """
    docs = docs.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n_chars"),
        tokenize(text_col).alias("_toks"),
    )
    toks = F.col("_toks")
    n_toks = F.size(toks)
    stop_ratio = F.round(
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")
        / F.greatest(n_toks, F.lit(1)).cast("double"),
        5,
    )
    # bigrams via ONE zip_with of two shifted slices — cheaper than
    # even the element_at-based generic shingle helper for n=2 (no
    # index sequence materialized; measured 7.5s → 1.7s at 200k docs
    # for the funnel vs the old slice-per-position form). Identical
    # strings, so the distinct count (and the SQL twin) are unchanged.
    bigrams = F.when(
        n_toks >= 2,
        F.zip_with(
            F.slice(toks, 1, n_toks - 1),
            F.slice(toks, 2, n_toks - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = docs.select(
        "id",
        "n_chars",
        toks,
        stop_ratio.alias("stopword_ratio"),
        # unsorted: the funnel only needs the DISTINCT count, not the
        # run-length mode that repetition_signals sorts for
        bigrams.alias("_bg"),
    )
    bg = F.col("_bg")
    n_toks = F.size(F.col("_toks"))
    n_bg = F.size(bg)
    dup_frac = F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(bg)).cast("double")
        / F.greatest(n_bg, F.lit(1)).cast("double"),
        5,
    )
    zero = F.lit(0).cast("long")
    consec = F.when(
        n_toks >= 2,
        F.aggregate(
            F.zip_with(
                F.slice(F.col("_toks"), 1, n_toks - 1),
                F.slice(F.col("_toks"), 2, n_toks - 1),
                lambda a, b: (a == b).cast("long"),
            ),
            zero,
            lambda acc, x: acc + x,
        ),
    ).otherwise(zero)
    consec_frac = F.round(
        consec.cast("double") / F.greatest(n_toks - 1, F.lit(1)).cast("double"), 5
    )
    j = docs.select(
        "id",
        "n_chars",
        "stopword_ratio",
        dup_frac.alias("dup_bigram_frac"),
        consec_frac.alias("consec_repeat_frac"),
    )
    preds = {
        "too_short": F.col("n_chars") < 50,
        "too_long": F.col("n_chars") > 5000,
        "low_stopword": F.col("stopword_ratio") < 0.01,
        "high_stopword": F.col("stopword_ratio") > 0.5,
        "repetitive": F.col("dup_bigram_frac") > 0.30,
        "stutter": F.col("consec_repeat_frac") > 0.10,
    }
    fail_any = None
    aggs = [F.count("*").alias("_n")]
    for rule, _ in FUNNEL_RULES:
        p = preds[rule]
        aggs.append(F.sum(p.cast("long")).alias(rule))
        fail_any = p if fail_any is None else (fail_any | p)
    aggs.append(F.sum((~fail_any).cast("long")).alias("pass_all"))
    row = j.agg(*aggs)
    # unpivot the single aggregate row into (rule, n_fail, frac)
    pairs = [
        F.struct(F.lit(rule).alias("rule"), F.col(rule).alias("n"))
        for rule, _ in FUNNEL_RULES
    ] + [F.struct(F.lit("pass_all").alias("rule"), F.col("pass_all").alias("n"))]
    return (
        row.select(F.col("_n"), F.explode(F.array(*pairs)).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.n").cast("long").alias("n_docs"),
            F.round(F.col("r.n").cast("double") / F.col("_n").cast("double"), 5)
            .cast("double")
            .alias("frac"),
        )
        .orderBy("rule")
    )


def quality_funnel_sql(
    docs_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    feats = quality_features_sql(docs_sql, id_col, text_col)
    reps = repetition_signals_sql(docs_sql, id_col, text_col)
    preds = {
        "too_short": "f.n_chars < 50",
        "too_long": "f.n_chars > 5000",
        "low_stopword": "f.stopword_ratio < 0.01",
        "high_stopword": "f.stopword_ratio > 0.5",
        "repetitive": "r.dup_bigram_frac > 0.30",
        "stutter": "r.consec_repeat_frac > 0.10",
    }
    sums = ",\n         ".join(
        f"SUM(CASE WHEN {preds[rule]} THEN 1 ELSE 0 END) AS {rule}"
        for rule, _ in FUNNEL_RULES
    )
    fail_any = " OR ".join(preds[rule] for rule, _ in FUNNEL_RULES)
    branches = "\nUNION ALL\n".join(
        f"SELECT '{rule}' AS rule, {rule} AS n, _n FROM agg" for rule, _ in FUNNEL_RULES
    )
    return f"""
WITH feats AS ({feats}),
reps AS ({reps}),
agg AS (
  SELECT COUNT(*) AS _n,
         {sums},
         SUM(CASE WHEN NOT ({fail_any}) THEN 1 ELSE 0 END) AS pass_all
  FROM feats f JOIN reps r USING (id)
)
SELECT rule, n::BIGINT AS n_docs, ROUND(n::DOUBLE / _n::DOUBLE, 5)::DOUBLE AS frac
FROM ({branches}
UNION ALL
SELECT 'pass_all' AS rule, pass_all AS n, _n FROM agg)
ORDER BY rule
"""


def repetition_signals_sql(
    docs_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    from nucliadb_spark.functions.text import word_shingles_sql

    toks = tokenize_sql(text_col)
    bigrams = word_shingles_sql(text_col, 2)
    return f"""
WITH docs AS ({docs_sql}),
tok AS (
  SELECT {id_col} AS id, {toks} AS toks, {bigrams} AS bgs FROM docs
),
bg AS (SELECT id, unnest(bgs) AS bg FROM tok),
cnt AS (SELECT id, bg, COUNT(*) AS c FROM bg GROUP BY id, bg),
agg AS (
  SELECT id, SUM(c) AS n_bg, MAX(c) AS topc, COUNT(*) AS dist
  FROM cnt GROUP BY id
),
consec AS (
  SELECT id, len(toks) AS n_toks,
         len([1 for i in range(1, len(toks)) if toks[i] = toks[i+1]]) AS nrep
  FROM tok
)
SELECT consec.id AS id,
       COALESCE(agg.n_bg, 0)::BIGINT AS n_bigrams,
       ROUND(1.0 - COALESCE(agg.dist, 0)::DOUBLE
             / greatest(COALESCE(agg.n_bg, 0), 1)::DOUBLE, 5)::DOUBLE
         AS dup_bigram_frac,
       ROUND(2.0 * COALESCE(agg.topc, 0)::DOUBLE
             / greatest(consec.n_toks, 1)::DOUBLE, 5)::DOUBLE
         AS top_bigram_frac,
       ROUND(consec.nrep::DOUBLE
             / greatest(consec.n_toks - 1, 1)::DOUBLE, 5)::DOUBLE
         AS consec_repeat_frac
FROM consec LEFT JOIN agg USING (id)
ORDER BY id
"""


# --- CCNet perplexity-bucket selection ---------------------------------------
# CCNet's defining move: within each language, rank documents by LM
# perplexity and split into head/middle/tail terciles; training reads
# head+middle and drops the tail. The rank is per-language (a language
# must not be penalized for a globally-rarer vocabulary), so the
# window partitions by lang — bounded partitions, no global sort.


def perplexity_buckets(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(id, lang, avg_neg_logp, ppl_bucket, kept) — per-language
    head/middle/tail terciles of the unigram LM score; kept=true for
    head+middle (the CCNet default). Ties broken by id, so bucket
    assignment is deterministic across engines."""
    from pyspark.sql import Window

    scores = unigram_logprob(docs, model=model, id_col=id_col, text_col=text_col)
    langs = docs.select(F.col(id_col).alias("id"), F.col(lang_col).alias("lang"))
    w = Window.partitionBy("lang").orderBy("avg_neg_logp", "id")
    tile = F.ntile(3).over(w)
    bucket = (
        F.when(tile == 1, "head").when(tile == 2, "middle").otherwise("tail")
    )
    return (
        scores.join(langs, "id")
        .select(
            "id",
            "lang",
            "avg_neg_logp",
            bucket.alias("ppl_bucket"),
            (tile <= 2).alias("kept"),
        )
        .orderBy("id")
    )


def perplexity_buckets_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> str:
    toks = tokenize_sql(text_col)
    return f"""
WITH docs AS ({docs_sql}),
tok AS (SELECT {id_col} AS id, unnest({toks}) AS token FROM docs),
counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
tot AS (SELECT SUM(c)::DOUBLE AS n FROM counts),
model AS (SELECT token, log10(c::DOUBLE / n) AS logp FROM counts CROSS JOIN tot),
scores AS (
  SELECT t.id, COUNT(*)::BIGINT AS n_tokens,
         ROUND(-AVG(m.logp), 5)::DOUBLE AS avg_neg_logp
  FROM tok t JOIN model m USING (token)
  GROUP BY t.id
),
tiled AS (
  SELECT s.id, d.{lang_col} AS lang, s.avg_neg_logp,
         NTILE(3) OVER (PARTITION BY d.{lang_col}
                        ORDER BY s.avg_neg_logp, s.id) AS tile
  FROM scores s JOIN docs d ON d.{id_col} = s.id
)
SELECT id, lang, avg_neg_logp,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket,
       (tile <= 2) AS kept
FROM tiled
ORDER BY id
"""


# --- KMV distinct-cardinality sketch -----------------------------------------
# At 100 TB you don't count a vocabulary exactly — you sketch it.
# Spark's approx_count_distinct (HyperLogLog) is the production tool,
# but its estimate is engine-specific, so it can't be oracle-graded.
# The k-minimum-values sketch CAN: keep the k smallest hash values of
# the distinct items; estimate = (k-1) / kth_smallest_normalized.
# Pure function of the item set → bit-identical across engines, and
# mergeable exactly like HLL (union = k smallest of the union), which
# is what makes sketches shuffle-friendly: partial sketches combine
# per partition, only k values per group cross the wire.

KMV_K = 256
_KMV_SPACE = float(1 << 60)  # md5_int60 hash space


def kmv_shingle_cardinality(
    docs: DataFrame,
    k: int = KMV_K,
    n: int = 3,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, exact_distinct, kmv_estimate, rel_err_e3) per language
    over distinct word n-gram shingles — the cardinality that sizes
    an n-gram index (contamination/LSH sidecars). The exact count
    rides along so the estimate's error is itself graded.
    rel_err_e3 = |est - exact| / exact in thousandths (BIGINT)."""
    from nucliadb_spark.functions.text import word_shingles_from_tokens

    # project tokens ONCE, then shingle the bound column —
    # word_shingles(text) inline re-evaluates the tokenizer per
    # shingle position (the measured trap in functions/text.py)
    toks = docs.select(
        F.col(lang_col).alias("lang"), tokenize(text_col).alias("_toks")
    )
    items = toks.select(
        "lang",
        F.explode(word_shingles_from_tokens(F.col("_toks"), n)).alias("t"),
    ).distinct()
    hashed = items.select("lang", md5_int60(F.col("t"), salt="kmv:").alias("h"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("h")
    ranked = hashed.withColumn("rk", F.row_number().over(w))
    kth = ranked.filter(F.col("rk") == k).select("lang", F.col("h").alias("kth"))
    exact = hashed.groupBy("lang").agg(
        F.count("*").cast("long").alias("exact_distinct")
    )
    # LEFT join: a group with fewer than k distinct items has no kth
    # hash — fall back to its exact count (error 0) instead of
    # silently dropping the group (no-silent-caps rule)
    est = F.when(
        F.col("kth").isNull(), F.col("exact_distinct")
    ).otherwise(F.round((k - 1) * _KMV_SPACE / F.col("kth")).cast("long"))
    return (
        exact.join(kth, "lang", "left")
        .select(
            "lang",
            "exact_distinct",
            est.alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("exact_distinct"))
                * 1000.0
                / F.col("exact_distinct")
            ).cast("long").alias("rel_err_e3"),
        )
        .orderBy("lang")
    )


def kmv_shingle_cardinality_sql(
    docs_sql: str,
    k: int = KMV_K,
    n: int = 3,
    lang_col: str = "lang",
    text_col: str = "text",
) -> str:
    from nucliadb_spark.functions.text import word_shingles_sql

    gh = md5_int60_sql("t", salt="kmv:")
    shingles = word_shingles_sql(text_col, n)
    return f"""
WITH items AS (
  SELECT DISTINCT {lang_col} AS lang, t
  FROM (SELECT {lang_col}, unnest({shingles}) AS t FROM ({docs_sql}))
),
hashed AS (SELECT lang, {gh} AS h FROM items),
ranked AS (
  SELECT lang, h,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rk
  FROM hashed
),
kth AS (SELECT lang, h AS kth FROM ranked WHERE rk = {k}),
exact AS (SELECT lang, COUNT(*)::BIGINT AS exact_distinct FROM hashed GROUP BY lang)
SELECT e.lang AS lang, e.exact_distinct,
       CASE WHEN kth.kth IS NULL THEN e.exact_distinct
            ELSE ROUND(({k} - 1) * {_KMV_SPACE!r} / kth.kth)::BIGINT END
         AS kmv_estimate,
       ROUND(abs((CASE WHEN kth.kth IS NULL THEN e.exact_distinct
                       ELSE ROUND(({k} - 1) * {_KMV_SPACE!r} / kth.kth)::BIGINT END)
                 - e.exact_distinct)
             * 1000.0 / e.exact_distinct)::BIGINT AS rel_err_e3
FROM exact e LEFT JOIN kth USING (lang)
ORDER BY lang
"""
