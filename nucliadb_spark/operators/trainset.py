"""Trainset generators — the rest of the dataset.proto task-type
family (SURVEY §2 S6; ref nucliadb_protos/dataset.proto:9-18 and
nucliadb/src/nucliadb/train/generators/*.py).

Round 1/2 shipped FIELD_CLASSIFICATION + PARAGRAPH_CLASSIFICATION;
this module adds the remaining six task types re-expressed as pure
DataFrame projections (narrow, shuffle-free except where a join to
labels is required — each oracle-checkable and exportable through
exporter.export_arrow_stream):

- SENTENCE_CLASSIFICATION  (generators/sentence_classifier.py:44-103)
- TOKEN_CLASSIFICATION     (generators/token_classifier.py:44-117)
- IMAGE_CLASSIFICATION     (generators/image_classifier.py:38-89)
- PARAGRAPH_STREAMING      (generators/paragraph_streaming.py:31-76)
- QUESTION_ANSWER_STREAMING(generators/question_answer_streaming.py:33-106)
- FIELD_STREAMING          (generators/field_streaming.py:37-123)

Scale notes: every generator is a projection over fields/paragraphs
with at most one broadcast-able join (labels live on the same row in
our brain projection, so most need none). The reference streams these
row-by-row from the searcher gRPC API; here the same payloads are a
DataFrame any sink can partition-parallel write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nucliadb_spark.functions.text import (
    md5_int60,
    md5_int60_sql,
    tokenize,
    tokenize_sql,
)

# Sentences: fixed-stride char windows WITHIN each paragraph window —
# the corpus is synthetic word soup with no punctuation, so the
# sentence boundary rule is a deterministic stride (mirrors how
# paragraphs themselves are derived, sources/tpch.py PARAGRAPH_STRIDE).
SENTENCE_STRIDE = 60


def sentences(paragraphs: DataFrame) -> DataFrame:
    """Explode paragraph windows into sentence windows.

    sentence_id = '<paragraph_id>/<soff>-<send>' with offsets relative
    to the paragraph, matching the reference's nested position keys
    (train/generators/sentence_classifier.py:72-88).
    """
    plen = F.col("end") - F.col("start")
    p = paragraphs.select(
        "rid",
        "paragraph_id",
        plen.alias("_plen"),
        F.col("text").alias("_ptext"),
        F.explode(
            F.sequence(F.lit(0), plen - 1, F.lit(SENTENCE_STRIDE))
        ).alias("soff"),
    )
    send = F.least(F.col("soff") + SENTENCE_STRIDE, F.col("_plen"))
    return p.select(
        "rid",
        "paragraph_id",
        F.concat_ws(
            "/",
            "paragraph_id",
            F.concat_ws("-", "soff", send.cast("long")),
        ).alias("sentence_id"),
        F.expr(f"substring(_ptext, soff + 1, {SENTENCE_STRIDE})").alias("text"),
    )


def sentences_sql(paragraphs_sql: str) -> str:
    return f"""
SELECT rid, paragraph_id,
       concat(paragraph_id, '/', soff, '-', least(soff + {SENTENCE_STRIDE}, plen)) AS sentence_id,
       substring(ptext, soff + 1, {SENTENCE_STRIDE}) AS text
FROM (
  SELECT rid, paragraph_id, "end" - start AS plen, text AS ptext,
         unnest(range(0, "end" - start, {SENTENCE_STRIDE})) AS soff
  FROM ({paragraphs_sql})
)
"""


# Token classification: a fixed entity dictionary (the reference's
# entity groups, train/generators/token_classifier.py:60-66 filters on
# `/e/<group>` labels) mapped over the shared tokenizer. Single-token
# entities tag as B-<GROUP>; everything else is the outside tag 'O' —
# the BIO scheme the reference emits (token_classifier.py:186-219).
ENTITY_TAGS: dict[str, str] = {
    "spark": "TECH",
    "query": "TECH",
    "hash": "TECH",
    "customer": "ACTOR",
    "supplier": "ACTOR",
    "table": "OBJECT",
    "window": "OBJECT",
    "stream": "OBJECT",
}


def _tag_token(tok: Column) -> Column:
    expr: Column = F.lit("O")
    for word, grp in reversed(list(ENTITY_TAGS.items())):
        expr = F.when(tok == word, F.lit(f"B-{grp}")).otherwise(expr)
    return expr


def token_classification(fields: DataFrame) -> DataFrame:
    """(rid, field_key, tokens, tags) — space-joined token/BIO-tag
    sequences of equal length. Pure per-row array transform: no
    explode, no shuffle — the whole job is one codegen'd scan."""
    toks = tokenize("text")
    return fields.select(
        "rid",
        "field_key",
        F.array_join(toks, " ").alias("tokens"),
        F.array_join(F.transform(toks, _tag_token), " ").alias("tags"),
    )


def token_classification_sql(fields_sql: str) -> str:
    cases = " ".join(
        f"WHEN t = '{w}' THEN 'B-{g}'" for w, g in ENTITY_TAGS.items()
    )
    toks = tokenize_sql("text")
    return f"""
SELECT rid, field_key,
       array_to_string({toks}, ' ') AS tokens,
       array_to_string(
         list_transform({toks}, t -> CASE {cases} ELSE 'O' END), ' ') AS tags
FROM ({fields_sql})
"""


def question_answer(fields: DataFrame, paragraphs: DataFrame) -> DataFrame:
    """QUESTION_ANSWER_STREAMING payloads: one QA pair per field —
    question derived from the field's first token, answer = the TITLE
    paragraph, with its paragraph_id as provenance (the reference
    streams question/answer/paragraph-ids triples,
    question_answer_streaming.py:58-96)."""
    q = fields.select(
        "rid",
        F.col("language"),
        F.concat(
            F.lit("what is "), F.element_at(tokenize("text"), 1), F.lit("?")
        ).alias("question"),
    )
    a = paragraphs.filter(F.col("kind") == "TITLE").select(
        "rid",
        F.col("paragraph_id").alias("answer_paragraph"),
        F.col("text").alias("answer"),
    )
    return q.join(a, "rid").select(
        "rid", "question", "answer", "answer_paragraph", "language"
    )


def question_answer_sql(fields_sql: str, paragraphs_sql: str) -> str:
    first_tok = f"list_element({tokenize_sql('f.text')}, 1)"
    return f"""
SELECT f.rid AS rid,
       concat('what is ', {first_tok}, '?') AS question,
       p.text AS answer,
       p.paragraph_id AS answer_paragraph,
       f.language AS language
FROM ({fields_sql}) f
JOIN ({paragraphs_sql}) p ON f.rid = p.rid AND p.kind = 'TITLE'
"""


def image_classification(media: DataFrame, fields: DataFrame) -> DataFrame:
    """IMAGE_CLASSIFICATION payloads: image-typed media rows labeled
    with their resource's classification labels (image_classifier.py
    selects page images + their labels). Binary stays out of the
    output contract — payload identity travels as (n_bytes, md5)."""
    imgs = media.filter(F.col("content_type") == "image/png")
    labels = fields.select(
        F.col("rid").alias("media_id"), F.array_join("labels", ",").alias("labels")
    )
    return imgs.join(labels, "media_id").select(
        "media_id",
        "content_type",
        "n_bytes",
        F.md5(F.col("content")).alias("content_md5"),
        "labels",
    )


def image_classification_sql(media_sql: str, fields_sql: str) -> str:
    return f"""
SELECT m.media_id AS media_id, m.content_type AS content_type,
       m.n_bytes AS n_bytes,
       md5(m.content::VARCHAR) AS content_md5,
       array_to_string(f.labels, ',') AS labels
FROM ({media_sql}) m
JOIN ({fields_sql}) f ON m.media_id = f.rid
WHERE m.content_type = 'image/png'
"""


# --- pipeline ops beyond the reference --------------------------------------


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    md5-hash(id) mod 100 < rate(stratum). Unlike df.sampleBy this is
    reproducible across engines and runs (the portable 60-bit md5
    hash, functions/text.py) — which is what a training-data pipeline
    needs for auditable subset lineage. Narrow: filter only."""
    bucket = md5_int60(F.col(id_col).cast("string"), salt="sample:") % 100
    rate: Column = F.lit(0)
    for stratum, pct in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return docs.filter(bucket < rate)


def stratified_sample_sql(
    docs_sql: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> str:
    cases = " ".join(f"WHEN {strata_col} = '{s}' THEN {p}" for s, p in rates.items())
    bucket = f"{md5_int60_sql(f'CAST({id_col} AS VARCHAR)', salt='sample:')} % 100"
    return f"""
SELECT * FROM ({docs_sql})
WHERE {bucket} < CASE {cases} ELSE 0 END
"""


# --- domain-mixture resampling ---------------------------------------------
# DoReMi/The-Pile-style static mixing: given target proportions per
# domain (language, source, ...), keep the LARGEST corpus subset whose
# domain mix equals the target. The binding domain (smallest
# count/target ratio) survives whole; every other domain downsamples
# deterministically via the portable md5 bucket, so the subset is
# reproducible across engines and runs. Plan shape: one tiny groupBy
# for the counts, the thresholds broadcast back — the corpus itself
# is touched by exactly one filter pass (no shuffle of data rows).


def mixture_resample(
    docs: DataFrame,
    targets: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """(id, stratum) rows of the resampled subset, ordered by id.

    keep_frac(d) = target_d * scale / count_d with
    scale = min_d(count_d / target_d); keep iff
    (md5(id) % 2^20) < keep_frac * 2^20. Domains absent from
    `targets` are dropped (target 0)."""
    tgt: Column = F.lit(0.0)
    for stratum, frac in targets.items():
        tgt = F.when(F.col(strata_col) == stratum, F.lit(frac)).otherwise(tgt)
    t = docs.select(
        F.col(id_col), F.col(strata_col), tgt.alias("_tgt")
    ).filter(F.col("_tgt") > 0)
    cnts = t.groupBy(strata_col, "_tgt").agg(F.count("*").cast("long").alias("_cnt"))
    scale = cnts.agg(F.min(F.col("_cnt") / F.col("_tgt")).alias("_scale"))
    thr = cnts.crossJoin(F.broadcast(scale)).select(
        F.col(strata_col),
        ((F.col("_tgt") * F.col("_scale")) / F.col("_cnt")).alias("_keep"),
    )
    bucket = (
        md5_int60(F.col(id_col).cast("string"), salt="mix:") % 1048576
    ).cast("double")
    return (
        t.join(F.broadcast(thr), strata_col)
        .filter(bucket < F.col("_keep") * 1048576)
        .select(F.col(id_col).alias("id"), F.col(strata_col).alias("stratum"))
        .orderBy("id")
    )


def mixture_resample_sql(
    docs_sql: str,
    targets: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> str:
    cases = " ".join(f"WHEN {strata_col} = '{s}' THEN {f!r}" for s, f in targets.items())
    bucket = f"{md5_int60_sql(f'CAST({id_col} AS VARCHAR)', salt='mix:')} % 1048576"
    return f"""
WITH t AS (
  SELECT {id_col}, {strata_col},
         CASE {cases} ELSE 0.0 END AS tgt
  FROM ({docs_sql})
  WHERE (CASE {cases} ELSE 0.0 END) > 0
),
cnts AS (SELECT {strata_col}, tgt, COUNT(*)::BIGINT AS cnt FROM t GROUP BY 1, 2),
scale AS (SELECT MIN(cnt / tgt) AS s FROM cnts),
thr AS (SELECT {strata_col}, (tgt * s) / cnt AS keep FROM cnts, scale)
SELECT t.{id_col} AS id, t.{strata_col} AS stratum
FROM t JOIN thr USING ({strata_col})
WHERE ({bucket})::DOUBLE < keep * 1048576
ORDER BY id
"""


# --- temperature-weighted language/domain sampling ---------------------------
# mT5/XLM-R-style temperature sampling: sampling probability per
# domain p_d ∝ n_d^alpha (alpha < 1 upweights low-resource domains).
# The report is a per-domain weight table — raw share, tempered
# share, the boost factor low-resource domains get, and the expected
# document count at corpus size. Plan shape: one tiny groupBy, the
# normalizer broadcast back; the corpus is never reshuffled.


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.7,
    strata_col: str = "lang",
    weight_col: str | None = None,
) -> DataFrame:
    """(stratum, n, p_raw, p_temp, boost, expected_docs), ordered by
    stratum. weight_col: weight domains by a per-doc size column
    (e.g. token counts) instead of doc counts."""
    w = F.count("*").cast("double") if weight_col is None else F.sum(weight_col)
    cnts = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        w.cast("double").alias("n")
    )
    tot = cnts.agg(
        F.sum("n").alias("_tot"), F.sum(F.pow("n", F.lit(alpha))).alias("_tot_a")
    )
    return (
        cnts.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("_tot"), 6).alias("p_raw"),
            F.round(F.pow("n", F.lit(alpha)) / F.col("_tot_a"), 6).alias("p_temp"),
            F.round(
                (F.pow("n", F.lit(alpha)) / F.col("_tot_a"))
                / (F.col("n") / F.col("_tot")),
                4,
            ).alias("boost"),
            # +1e-9 before floor: JVM Math.pow and DuckDB std::pow can
            # differ in the last ulp, and floor at an exact-integer
            # boundary would turn that into an off-by-one cross-engine
            # mismatch (round() columns absorb ulp noise, floor doesn't)
            F.floor(
                F.pow("n", F.lit(alpha)) / F.col("_tot_a") * F.col("_tot")
                + F.lit(1e-9)
            ).cast("long").alias("expected_docs"),
        )
        .orderBy("stratum")
    )


def temperature_weights_sql(
    docs_sql: str,
    alpha: float = 0.7,
    strata_col: str = "lang",
    weight_col: str | None = None,
) -> str:
    w = "COUNT(*)::DOUBLE" if weight_col is None else f"SUM({weight_col})::DOUBLE"
    return f"""
WITH cnts AS (
  SELECT {strata_col} AS stratum, {w} AS n
  FROM ({docs_sql}) GROUP BY 1
),
tot AS (SELECT SUM(n) AS t, SUM(POW(n, {alpha})) AS ta FROM cnts)
SELECT stratum, CAST(n AS BIGINT) AS n,
       ROUND(n / t, 6) AS p_raw,
       ROUND(POW(n, {alpha}) / ta, 6) AS p_temp,
       ROUND((POW(n, {alpha}) / ta) / (n / t), 4) AS boost,
       CAST(FLOOR(POW(n, {alpha}) / ta * t + 1e-9) AS BIGINT) AS expected_docs
FROM cnts, tot
ORDER BY stratum
"""


# --- per-domain document caps ------------------------------------------------
# RefinedWeb/FineWeb-style domain caps: no single domain (site,
# source, ...) may contribute more than `cap` documents. The pick
# within a domain is deterministic-random — ranked by the portable
# md5 of the id, so the surviving subset is reproducible across
# engines and unbiased by ingestion order. Plan shape: one window
# shuffle keyed by the domain column; no global sort.


def domain_cap(
    docs: DataFrame,
    cap: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, stratum) of the capped subset, ordered by id."""
    from pyspark.sql import Window

    h = md5_int60(F.col(id_col).cast("string"), salt="cap:")
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.select(F.col(id_col), F.col(strata_col), F.row_number().over(w).alias("_rk"))
        .filter(F.col("_rk") <= cap)
        .select(F.col(id_col).alias("id"), F.col(strata_col).alias("stratum"))
        .orderBy("id")
    )


def domain_cap_sql(
    docs_sql: str, cap: int, strata_col: str = "source", id_col: str = "doc_id"
) -> str:
    h = md5_int60_sql(f"CAST({id_col} AS VARCHAR)", salt="cap:")
    return f"""
SELECT id, stratum FROM (
  SELECT {id_col} AS id, {strata_col} AS stratum,
         ROW_NUMBER() OVER (PARTITION BY {strata_col}
                            ORDER BY {h} ASC, {id_col} ASC) AS rk
  FROM ({docs_sql})
)
WHERE rk <= {cap}
ORDER BY id
"""


# --- sequence packing (concat-and-chunk) ------------------------------------
# LLM pretraining packs documents into fixed-length token sequences by
# concatenating the corpus and chunking at seq_len boundaries
# (GPT-style "concat and chunk"). The op assigns every document its
# span in that virtual token stream: which training sequence it starts
# in, which it ends in, and how many sequences it touches — the
# bookkeeping a packing writer needs to emit shards.
#
# Scale shape: the stream is defined PER SOURCE (partitionBy(source),
# ordered by doc_id), so the cumulative sum is a bounded window per
# domain shard, not one global single-partition scan. At 100 TB you'd
# sub-shard big sources on a doc_id range — same two-level offset
# arithmetic, since chunk ids only need to be unique within a shard.


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """(source, id, n_tokens, start_offset, first_seq, last_seq,
    n_seqs) — token offsets into the per-source concat stream and the
    seq_len-sized training sequences each document spans.

    Token counts use the same BPE-ish estimate as token_counts
    (ceil(len/4) subword pieces per whitespace token).
    """
    from pyspark.sql import Window

    toks = tokenize(text_col)
    bpe = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    t = docs.select(
        F.col(by).alias("source"), F.col(id_col).alias("id"), bpe.alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("id")
    # bind the running sum ONCE — referencing the expression from
    # several output columns would make the Window operator compute
    # the same running sum per reference (7× in the physical plan)
    t = t.withColumn("_cum", F.sum("n_tokens").over(w))
    cum = F.col("_cum")
    first_seq = F.floor((cum - F.col("n_tokens")) / seq_len).cast("long")
    # an empty doc occupies no sequence: last := first for stability
    last_seq = F.greatest(F.floor((cum - 1) / seq_len).cast("long"), first_seq)
    return t.select(
        "source",
        "id",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("start_offset"),
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).cast("long").alias("n_seqs"),
    ).orderBy("source", "id")


def pack_sequences_sql(
    docs_sql: str,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> str:
    toks = tokenize_sql(text_col)
    return f"""
WITH docs AS ({docs_sql}),
t AS (
  SELECT {by} AS source, {id_col} AS id,
         list_aggregate(list_transform({toks}, x -> ceil(length(x) / 4.0)::BIGINT),
                        'sum')::BIGINT AS n_tokens
  FROM docs
),
c AS (
  SELECT source, id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t
)
SELECT source, id, n_tokens,
       (cum - n_tokens)::BIGINT AS start_offset,
       ((cum - n_tokens) // {seq_len})::BIGINT AS first_seq,
       greatest((cum - 1) // {seq_len}, (cum - n_tokens) // {seq_len})::BIGINT
         AS last_seq,
       (greatest((cum - 1) // {seq_len}, (cum - n_tokens) // {seq_len})
        - ((cum - n_tokens) // {seq_len}) + 1)::BIGINT AS n_seqs
FROM c
ORDER BY source, id
"""


# --- token-budget selection -------------------------------------------------
# A pretraining run is sized in tokens, not documents: "take the first
# B tokens of each domain" (Chinchilla-style budget split across
# sources). Walk each source's docs in a stable order and keep rows
# while the running BPE-token total stays within the budget — the
# running sum is a bounded window per domain shard (same scale note as
# pack_sequences: sub-shard big sources on id ranges at 100 TB).


def token_budget_select(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """(source, id, n_tokens, cum_tokens) — the per-source prefix of
    documents whose cumulative token count fits the budget. A doc that
    would cross the budget line is excluded (conservative cut, so the
    shipped token count never exceeds budget per source)."""
    from pyspark.sql import Window

    toks = tokenize(text_col)
    bpe = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    t = docs.select(
        F.col(by).alias("source"), F.col(id_col).alias("id"), bpe.alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("id")
    t = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return t.filter(F.col("cum_tokens") <= budget).orderBy("source", "id")


def token_budget_select_sql(
    docs_sql: str,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> str:
    toks = tokenize_sql(text_col)
    return f"""
WITH t AS (
  SELECT {by} AS source, {id_col} AS id,
         list_aggregate(list_transform({toks}, x -> ceil(length(x) / 4.0)::BIGINT),
                        'sum')::BIGINT AS n_tokens
  FROM ({docs_sql})
), c AS (
  SELECT source, id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ::BIGINT AS cum_tokens
  FROM t
)
SELECT source, id, n_tokens, cum_tokens FROM c
WHERE cum_tokens <= {budget}
ORDER BY source, id
"""


# --- BPE pair counts (the inner step of tokenizer training) -----------------
# Sennrich et al. "Neural Machine Translation of Rare Words with
# Subword Units": BPE training loops K times over {count adjacent
# symbol pairs across the weighted vocabulary; merge the argmax}.
# This op is that inner counting step at the character level (round
# 0 of the loop, where every word is its char sequence plus the
# terminal '</w>' marker) — the argmax row IS the first merge rule.
# The K-merge loop is driver-side over this op with a symbols column
# rewritten per round, exactly how the published algorithm iterates.
#
# Scale shape: pair counting runs over the DISTINCT weighted vocab
# (|V| rows, not corpus tokens), so after the one vocab groupBy the
# whole step is tiny no matter the corpus size. Two shuffles total:
# token→vocab counts (map-side combine) and pair aggregation over a
# per-word explode of ≤ len(w) rows.


def bpe_pair_counts(
    docs: DataFrame, top_k: int = 20, text_col: str = "text"
) -> DataFrame:
    """(left, right, pair_count) — the top_k most frequent adjacent
    character pairs across the corpus vocabulary, each word weighted
    by its corpus frequency and terminated by '</w>'. Ordered by
    (pair_count DESC, left, right); row 1 is the first BPE merge."""
    vocab = (
        docs.select(F.explode(tokenize(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    pair = F.struct(
        F.substring(F.col("w"), F.col("i"), 1).alias("left"),
        F.when(
            F.col("i") < F.length("w"), F.substring(F.col("w"), F.col("i") + 1, 1)
        )
        .otherwise(F.lit("</w>"))
        .alias("right"),
    )
    return (
        vocab.select(
            "w",
            "cnt",
            F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"),
        )
        .select(pair.alias("p"), "cnt")
        .groupBy("p.left", "p.right")
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left", "right")
        .limit(top_k)
    )


def bpe_pair_counts_sql(
    docs_sql: str, top_k: int = 20, text_col: str = "text"
) -> str:
    toks = tokenize_sql(text_col)
    return f"""
WITH vocab AS (
  SELECT w, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest({toks}) AS w FROM ({docs_sql}))
  GROUP BY w
),
pairs AS (
  SELECT substring(w, i, 1) AS "left",
         CASE WHEN i < length(w) THEN substring(w, i + 1, 1)
              ELSE '</w>' END AS "right",
         cnt
  FROM vocab, unnest(range(1, length(w) + 1)) AS u(i)
)
SELECT "left", "right", SUM(cnt)::BIGINT AS pair_count
FROM pairs GROUP BY 1, 2
ORDER BY pair_count DESC, "left", "right"
LIMIT {top_k}
"""


# --- DSIR importance resampling ---------------------------------------------
# Xie et al. "Data Selection for Language Models via Importance
# Resampling": estimate how target-like each raw document is from the
# ratio of hashed-feature distributions p_target / p_raw, then keep
# the highest-weight documents. Features here are unigram tokens
# hashed to N_BUCKETS via the portable md5 hash (the paper uses
# hashed n-grams for exactly this dimensionality-bounding reason);
# per-doc weight = mean per-token log-ratio, smoothing +1 per bucket.
#
# Scale shape: the two distribution estimates are one groupBy each
# over N_BUCKETS keys (map-side combined to ≤ N_BUCKETS rows per
# partition); the log-ratio table is ≤ N_BUCKETS rows and broadcasts;
# scoring is one explode + broadcast join + one groupBy(doc). Nothing
# is ever N², and the only wide shuffle is keyed by doc_id.

DSIR_BUCKETS = 1024


def dsir_weights(
    docs: DataFrame,
    target_col: str = "source",
    target_value: str = "src1",
    top_k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable_hash: bool = True,
) -> DataFrame:
    """(id, stratum, n_tokens, dsir_weight) — top_k raw documents by
    estimated target-domain importance (weight DESC, id ASC).

    Log-ratios are rounded to 6 places before the per-doc mean (and
    the mean to 5) so Spark's and the oracle's float summation order
    can't flip the hash.

    portable_hash=True buckets tokens with the md5-derived hash the
    DuckDB oracle can reproduce; False uses Spark-native xxhash64 —
    same plan, same statistical behavior, measured 5x faster at the
    2M-doc probe (66 s → 12.6 s). Single-engine production wants
    False; cross-engine-verified runs need True."""
    if portable_hash:
        bucket = md5_int60(F.col("t"), salt="dsir:") % DSIR_BUCKETS
    else:
        bucket = F.pmod(F.xxhash64(F.col("t")), F.lit(DSIR_BUCKETS))
    tf = docs.select(
        F.col(id_col).alias("id"),
        F.col(target_col).alias("stratum"),
        F.explode(tokenize(text_col)).alias("t"),
    ).select("id", "stratum", bucket.alias("b"))
    raw = tf.groupBy("b").agg(F.count("*").cast("long").alias("n_raw"))
    tgt = (
        tf.filter(F.col("stratum") == target_value)
        .groupBy("b")
        .agg(F.count("*").cast("long").alias("n_tgt"))
    )
    tot = raw.agg(F.sum("n_raw").alias("_nr"))
    tot_t = tgt.agg(F.sum("n_tgt").alias("_nt"))
    ratios = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce("n_tgt", F.lit(0)) + 1)
                    / (F.col("_nt") + DSIR_BUCKETS)
                )
                - F.log((F.col("n_raw") + 1) / (F.col("_nr") + DSIR_BUCKETS)),
                6,
            ).alias("lr"),
        )
    )
    return (
        tf.join(F.broadcast(ratios), "b")
        .groupBy("id", "stratum")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("lr"), 5).cast("double").alias("dsir_weight"),
        )
        .orderBy(F.desc("dsir_weight"), "id")
        .limit(top_k)
    )


def dsir_weights_sql(
    docs_sql: str,
    target_col: str = "source",
    target_value: str = "src1",
    top_k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    toks = tokenize_sql(text_col)
    bucket = f"{md5_int60_sql('t', salt='dsir:')} % {DSIR_BUCKETS}"
    return f"""
WITH tf AS (
  SELECT {id_col} AS id, {target_col} AS stratum, {bucket} AS b
  FROM (SELECT {id_col}, {target_col}, unnest({toks}) AS t FROM ({docs_sql}))
),
raw AS (SELECT b, COUNT(*)::BIGINT AS n_raw FROM tf GROUP BY b),
tgt AS (SELECT b, COUNT(*)::BIGINT AS n_tgt FROM tf
        WHERE stratum = '{target_value}' GROUP BY b),
tot AS (SELECT SUM(n_raw) AS nr FROM raw),
tott AS (SELECT SUM(n_tgt) AS nt FROM tgt),
ratios AS (
  SELECT raw.b,
         ROUND(ln((COALESCE(tgt.n_tgt, 0) + 1) / (tott.nt + {DSIR_BUCKETS}))
               - ln((raw.n_raw + 1) / (tot.nr + {DSIR_BUCKETS})), 6) AS lr
  FROM raw LEFT JOIN tgt USING (b), tot, tott
)
SELECT tf.id AS id, tf.stratum AS stratum,
       COUNT(*)::BIGINT AS n_tokens,
       ROUND(AVG(r.lr), 5)::DOUBLE AS dsir_weight
FROM tf JOIN ratios r USING (b)
GROUP BY tf.id, tf.stratum
ORDER BY dsir_weight DESC, id
LIMIT {top_k}
"""


# --- deterministic train/val/test split -------------------------------------
# The split must be a pure function of the document id (NOT row order
# or an RNG): reproducible across engines, stable under corpus
# regeneration, and immune to partitioning — the property every
# training pipeline needs so a doc can never migrate between train and
# held-out across runs. Narrow: a filter-free projection, then one
# aggregation for the audit counts.


def split_assign(
    docs: DataFrame,
    pcts: tuple[int, int, int] = (90, 5, 5),
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds a `split` column: md5-bucket(id) mod 100 mapped to
    train/val/test bands of `pcts` percent each."""
    train, val, _ = pcts
    bucket = md5_int60(F.col(id_col).cast("string"), salt="split:") % 100
    split = (
        F.when(bucket < train, "train")
        .when(bucket < train + val, "val")
        .otherwise("test")
    )
    return docs.withColumn("split", split)


def split_counts_sql(
    docs_sql: str,
    pcts: tuple[int, int, int] = (90, 5, 5),
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> str:
    train, val, _ = pcts
    bucket = f"{md5_int60_sql(f'CAST({id_col} AS VARCHAR)', salt='split:')} % 100"
    return f"""
SELECT CASE WHEN ({bucket}) < {train} THEN 'train'
            WHEN ({bucket}) < {train + val} THEN 'val'
            ELSE 'test' END AS split,
       {strata_col} AS stratum,
       COUNT(*)::BIGINT AS n_docs,
       SUM(length(text))::BIGINT AS n_chars
FROM ({docs_sql})
GROUP BY 1, 2
ORDER BY split, stratum
"""


# --- length-grouped batching (inference-side dynamic batching) ---------------
# Batch-inference throughput dies on padding: batching a 40-token doc
# with a 2000-token doc pads the short one 50x. The standard fix
# groups rows into length buckets (padded_len = n_tokens rounded up
# to a multiple of PAD_QUANTUM) and fills each batch from ONE bucket
# with rows_per_batch = max_batch_tokens // padded_len rows — every
# batch's token footprint is bounded and padding waste is at most the
# quantum. Pure window arithmetic (rank within bucket), shuffle-free
# except the one bucket-keyed window partition.

PAD_QUANTUM = 64


def batch_by_length(
    docs: DataFrame,
    max_batch_tokens: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, padded_len, batch_idx) — padding-efficient
    batch assignment: batch_idx numbers batches WITHIN each
    padded-length bucket; (padded_len, batch_idx) is the batch key.
    Deterministic: rank within bucket orders by id."""
    from pyspark.sql import Window

    toks = tokenize(text_col)
    bpe = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    t = docs.select(F.col(id_col).alias("id"), bpe.alias("n_tokens"))
    padded = (
        F.ceil(F.greatest(F.col("n_tokens"), F.lit(1)) / PAD_QUANTUM)
        * PAD_QUANTUM
    ).cast("long")
    t = t.withColumn("padded_len", padded)
    rows_per_batch = F.greatest(
        F.lit(1), (F.lit(max_batch_tokens) / F.col("padded_len")).cast("long")
    )
    w = Window.partitionBy("padded_len").orderBy("id")
    return t.select(
        "id",
        "n_tokens",
        "padded_len",
        F.floor((F.row_number().over(w) - 1) / rows_per_batch)
        .cast("long")
        .alias("batch_idx"),
    ).orderBy("padded_len", "batch_idx", "id")


def batch_by_length_sql(
    docs_sql: str,
    max_batch_tokens: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    toks = tokenize_sql(text_col)
    return f"""
WITH t AS (
  SELECT {id_col} AS id,
         list_aggregate(list_transform({toks}, x -> ceil(length(x) / 4.0)::BIGINT),
                        'sum')::BIGINT AS n_tokens
  FROM ({docs_sql})
),
p AS (
  SELECT id, n_tokens,
         (ceil(greatest(n_tokens, 1) / {PAD_QUANTUM}.0) * {PAD_QUANTUM})::BIGINT
           AS padded_len
  FROM t
)
SELECT id, n_tokens, padded_len,
       ((ROW_NUMBER() OVER (PARTITION BY padded_len ORDER BY id) - 1)
        // greatest(1, ({max_batch_tokens} // padded_len)))::BIGINT AS batch_idx
FROM p
ORDER BY padded_len, batch_idx, id
"""
