"""Registry entries: training-data pipeline ops — dedup suite
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine)
over the documents and embeddings tables."""

from __future__ import annotations

from nucliadb_spark.operators import dedup, textstats
from nucliadb_spark.registry import register
from nucliadb_spark.sources import tpch

_DOCS_SQL = "SELECT doc_id, text FROM documents"


def _docs(spark, sf_dir):
    return tpch.table(spark, sf_dir, "documents")


def _planted(spark, sf_dir):
    return dedup.planted_corpus(_docs(spark, sf_dir))


_PLANTED_SQL = dedup.planted_corpus_sql(_DOCS_SQL)


# --- exact dedup (bag-of-words canonical form) ---------------------------


@register("dedup_exact", dedup.exact_dedup_sql(_DOCS_SQL))
def dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_docs(spark, sf_dir))


# --- MinHash + LSH candidate pairs + exact-Jaccard verify ----------------


@register("dedup_minhash_lsh", dedup.lsh_pairs_sql(_PLANTED_SQL))
def dedup_minhash_lsh(spark, sf_dir):
    return dedup.lsh_pairs(_planted(spark, sf_dir))


# --- SimHash identical-signature pairs ------------------------------------


@register("dedup_simhash", dedup.simhash_pairs_sql(_PLANTED_SQL))
def dedup_simhash(spark, sf_dir):
    return dedup.simhash_pairs(_planted(spark, sf_dir))


# --- exact n-gram Jaccard on the planted pairs -----------------------------


@register("dedup_ngram_jaccard", dedup.jaccard_planted_sql(_PLANTED_SQL))
def dedup_ngram_jaccard(spark, sf_dir):
    return dedup.jaccard_planted(_planted(spark, sf_dir))


# --- embedding cosine near-dup (cluster-bucketed join) ---------------------


@register(
    "dedup_embedding_cosine",
    dedup.embedding_near_dups_sql(labels=[0, 1, 2], threshold=0.3),
)
def dedup_embedding_cosine(spark, sf_dir):
    e = tpch.table(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dups(e, labels=[0, 1, 2], threshold=0.3)


# --- text analysis ----------------------------------------------------------


@register("text_language_id", textstats.language_id_sql(_DOCS_SQL))
def text_language_id(spark, sf_dir):
    return textstats.language_id(_docs(spark, sf_dir))


@register("text_quality", textstats.quality_features_sql(_DOCS_SQL))
def text_quality(spark, sf_dir):
    return textstats.quality_features(_docs(spark, sf_dir))


@register("text_token_counts", textstats.token_counts_sql(_DOCS_SQL))
def text_token_counts(spark, sf_dir):
    return textstats.token_counts(_docs(spark, sf_dir))


@register("text_fingerprint", textstats.winnow_fingerprint_sql(_DOCS_SQL))
def text_fingerprint(spark, sf_dir):
    return textstats.winnow_fingerprint(_docs(spark, sf_dir))
