"""Multimodal columns: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas UDFs (mapInPandas).

The reference stores media as CloudFile refs (S7,
resources.proto:9-36) and delegates decode/feature-extraction to an
external processing pipeline. In-engine, the 100 TB pipeline shape
is: a `binary` content column + typed metadata struct, transformed by
`mapInPandas` so each Arrow batch crosses the JVM↔Python boundary
once (never per-row).

The decode step itself is STUBBED (no image/audio libs in this
container): `fake_decode_features` derives deterministic pseudo
dimensions from the content's md5, so the Spark-side plumbing —
schema, batch shape, partitioning — is real and oracle-checkable,
and a real decoder (PIL/librosa/ffmpeg) drops in by replacing ONE
function. The real-decoder path raises NotImplementedError behind an
import guard.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("content_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media table from documents (text bytes as payload) —
    the container has no real image fixtures; the binary column,
    schema and batch path are exactly what a real corpus would use."""
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.encode("text", "utf-8").cast("binary").alias("content"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("content_type"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


MEDIA_FROM_DOCUMENTS_SQL = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       encode(text) AS content,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS content_type,
       octet_length(encode(text)) AS n_bytes
FROM documents
"""


def _fake_dims(content: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo decode: dims from the payload md5.
    (Replace with a real decoder to productionize — signature stays.)
    Mirrored in SQL by fake_decode_features_sql."""
    h = hashlib.md5(content).hexdigest()
    width = 160 + int(h[:4], 16) % 1920
    height = 120 + int(h[4:8], 16) % 1080
    n_frames = 1 + int(h[8:12], 16) % 240
    return width, height, n_frames


def fake_decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract: one Arrow batch at a time,
    vectorized pandas inside. Output: FEATURE_SCHEMA."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_fake_dims)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_type": pdf["content_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": feats.map(lambda t: t[0]),
                    "height": feats.map(lambda t: t[1]),
                    "n_frames": feats.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


def fake_decode_features_sql(media_sql: str) -> str:
    """DuckDB twin of the md5-derived pseudo decode."""
    return f"""
WITH media AS ({media_sql})
SELECT media_id, content_type, n_bytes,
       160 + CAST(('0x' || substring(md5(content::VARCHAR), 1, 4)) AS BIGINT) % 1920 AS width,
       120 + CAST(('0x' || substring(md5(content::VARCHAR), 5, 4)) AS BIGINT) % 1080 AS height,
       1 + CAST(('0x' || substring(md5(content::VARCHAR), 9, 4)) AS BIGINT) % 240 AS n_frames
FROM media
"""


def real_decode_features(media: DataFrame) -> DataFrame:  # pragma: no cover
    """Real decoder path — requires PIL/librosa/av, not in this
    container. Kept as the drop-in replacement boundary."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decoding needs image/audio libs (PIL/librosa/av); "
            "use fake_decode_features for plumbing tests"
        ) from e
    raise NotImplementedError("wire the real decoder here")


def frame_sample(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: explode pseudo frame indexes
    (0, every_n, 2·every_n, …) per video — the partition-preserving
    expand a real sampler would do after decode."""
    feats = fake_decode_features(media).filter(F.col("content_type") == "video/mp4")
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def frame_sample_sql(media_sql: str, every_n: int = 30) -> str:
    return f"""
WITH feats AS ({fake_decode_features_sql(media_sql)})
SELECT media_id, unnest(range(0, n_frames, {every_n})) AS frame_idx
FROM feats
WHERE content_type = 'video/mp4'
"""


# --- cross-modal retrieval (text query → image top-k) ------------------------
# The CLIP-shaped serving path: media and text live in ONE embedding
# space; a text query embeds once and ranks images by cosine. The
# image-encoder here derives the embedding from the payload md5 (same
# deterministic-stub philosophy as functions/models.py — swap in a
# real CLIP pandas_udf to productionize, every plan shape stays). The
# embedding is a pure JVM Column expression, so the scan is codegen'd
# end to end — at 100 TB the image embeddings are an index-build
# artifact stored next to the media, and this becomes knn/ann over
# that column.

CLIP_STUB_DIM = 8


def media_stub_embedding(content_col) -> F.Column:
    """binary payload → deterministic CLIP_STUB_DIM-dim embedding
    (md5-derived, matches functions/models._hash_embed's formula)."""
    h = F.md5(content_col)
    comps = [
        (
            F.conv(F.substring(h, i * 4 + 1, 4), 16, 10).cast("double")
            / 65535.0
        )
        for i in range(CLIP_STUB_DIM)
    ]
    return F.array(*comps)


def media_embedding_index(media: DataFrame) -> DataFrame:
    """(media_id, content_type, emb) — the cross-modal embedding
    sidecar: an index-build artifact computed once (cache/persist it)
    so each query is a scan of precomputed vectors, never a per-query
    embedding pass over the payloads."""
    return media.select(
        "media_id",
        "content_type",
        media_stub_embedding(F.col("content")).alias("emb"),
    )


def text_to_image_search(
    media: DataFrame, query_text: str, k: int = 10,
    emb: DataFrame | None = None,
) -> DataFrame:
    """(media_id, content_type, score) — top-k images for a text
    query by cosine in the stub cross-modal space. One codegen'd scan
    + a per-partition top-k heap; no shuffle of scored rows.

    emb: precomputed :func:`media_embedding_index` (the serving
    path); falls back to embedding inline when absent."""
    from nucliadb_spark.functions import vector as V
    from nucliadb_spark.functions.models import _hash_embed

    qvec = F.array(*[F.lit(x) for x in _hash_embed(query_text)])
    if emb is None:
        emb = media_embedding_index(media)
    imgs = emb.filter(F.col("content_type") == "image/png")
    return (
        imgs.select(
            "media_id",
            "content_type",
            F.round(V.cosine(F.col("emb"), qvec), 5)
            .cast("double").alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("media_id").asc())
        .limit(k)
    )


def text_to_image_search_sql(media_sql: str, query_text: str, k: int = 10) -> str:
    from nucliadb_spark.functions.models import stub_embedding_sql
    from nucliadb_spark.functions.vector import cosine_sql_unrolled
    from nucliadb_spark.operators.filters import _sql_quote

    emb = stub_embedding_sql("m.content::VARCHAR")
    qv = stub_embedding_sql(_sql_quote(query_text))
    cos = cosine_sql_unrolled("e.emb", "q.qvec", CLIP_STUB_DIM)
    return f"""
WITH m AS ({media_sql}),
e AS (
  SELECT media_id, content_type, {emb} AS emb
  FROM m WHERE content_type = 'image/png'
),
q AS (SELECT {qv} AS qvec)
SELECT e.media_id AS media_id, e.content_type AS content_type,
       ROUND({cos}, 5)::DOUBLE AS score
FROM e CROSS JOIN q
ORDER BY score DESC, media_id ASC
LIMIT {k}
"""
