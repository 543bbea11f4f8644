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


def real_decode_features(media: DataFrame) -> DataFrame:
    """Codec-library decode path: JPEG/PNG/GIF/WebP/TIFF via PIL,
    emitting the SAME FEATURE_SCHEMA as fake_decode_features so the
    two are drop-in interchangeable (n_frames from the container's
    frame count for animated formats, else 1). Import-guarded —
    raises NotImplementedError when PIL is absent so CI stays
    hermetic (the self-describing formats BMP/WAV-PCM/PPM decode
    WITHOUT any codec lib via real_decode below; this function is
    the boundary for formats that genuinely need one, mirroring the
    reference's external processing pipeline — resources.proto:9-36
    carries CloudFile refs, decode happens out-of-repo there too).

    Same scale shape as every decode path here: Arrow-batched
    mapInPandas, per-file work only, no shuffle."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - exercised only sans PIL
        raise NotImplementedError(
            "real media decoding needs an image codec lib (PIL); "
            "use fake_decode_features for plumbing tests or "
            "real_decode for the self-describing formats"
        ) from e

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image as _Image

        for pdf in batches:
            widths, heights, frames = [], [], []
            for payload in pdf["content"]:
                with _Image.open(io.BytesIO(bytes(payload))) as img:
                    widths.append(int(img.width))
                    heights.append(int(img.height))
                    frames.append(int(getattr(img, "n_frames", 1)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_type": pdf["content_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": widths,
                    "height": heights,
                    "n_frames": frames,
                }
            )

    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


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


# --- real decoders (self-describing uncompressed formats) -------------------
# The fake_decode path above keeps the plumbing testable with zero
# fixtures; these are REAL byte-level decoders for formats that need
# no external codec libs: BMP (24-bit uncompressed, BITMAPINFOHEADER),
# WAV (RIFF/PCM16 canonical layout) and PPM (P6). Compressed/codec
# media (JPEG, H.264, …) stay at the external-processing boundary,
# exactly where the reference delegates them (CloudFile +
# processing pipeline, resources.proto:9-36). The corpus is
# synthesized as REAL media files from `documents` (dims/rates
# derived from doc_id, payload bytes from the text), so the graded
# query is a true synthesize→parse roundtrip: if the decoder
# mis-reads any header field, it diverges from the analytic oracle.

REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
    ]
)


def _bmp_bytes(w: int, h: int, payload: bytes) -> bytes:
    import struct

    row = (3 * w + 3) // 4 * 4
    size = row * h
    px = (payload * (size // max(len(payload), 1) + 1))[:size]
    header = struct.pack("<2sIHHI", b"BM", 54 + size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, size, 2835, 2835, 0, 0)
    return header + info + px


def _wav_bytes(rate: int, n_samples: int, payload: bytes) -> bytes:
    import struct

    size = 2 * n_samples
    data = (payload * (size // max(len(payload), 1) + 1))[:size]
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + size, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
        + struct.pack("<4sI", b"data", size)
        + data
    )


def _ppm_bytes(w: int, h: int, payload: bytes) -> bytes:
    size = 3 * w * h
    px = (payload * (size // max(len(payload), 1) + 1))[:size]
    return f"P6\n{w} {h}\n255\n".encode() + px


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """documents → a media table whose `content` column holds REAL
    BMP/WAV/PPM files (deterministic dims/rates from doc_id, payload
    bytes from the text). mapInPandas: one Arrow batch per crossing."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "content": [], "content_type": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                payload = text.encode("utf-8") or b"\x00"
                kind = doc_id % 3
                w, h = 8 + doc_id % 24, 4 + doc_id % 12
                if kind == 0:
                    content, ctype = _bmp_bytes(w, h, payload), "image/bmp"
                elif kind == 1:
                    rate = 8000 + (doc_id % 8) * 1000
                    ns = 64 + len(payload) % 192
                    content, ctype = _wav_bytes(rate, ns, payload), "audio/wav"
                else:
                    content, ctype = _ppm_bytes(w, h, payload), "image/ppm"
                out["media_id"].append(doc_id)
                out["content"].append(content)
                out["content_type"].append(ctype)
            yield pd.DataFrame(out)

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
            StructField("content_type", StringType()),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(gen, schema=schema)


def decode_bmp(b: bytes) -> tuple[int, int]:
    """BITMAPFILEHEADER + BITMAPINFOHEADER (little-endian)."""
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    w, h = struct.unpack_from("<ii", b, 18)
    return w, abs(h)


def decode_wav(b: bytes) -> tuple[int, int]:
    """Canonical RIFF/PCM: fmt chunk at 12, data chunk follows."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    rate = struct.unpack_from("<I", b, 24)[0]
    bits = struct.unpack_from("<H", b, 34)[0]
    data_size = struct.unpack_from("<I", b, 40)[0]
    return rate, data_size // (bits // 8)


def decode_ppm(b: bytes) -> tuple[int, int]:
    if b[:2] != b"P6":
        raise ValueError("not a PPM")
    head = b[: b.index(b"255\n") + 4].decode()
    w, h = head.split("\n")[1].split(" ")
    return int(w), int(h)


def real_decode(media: DataFrame) -> DataFrame:
    """REAL decode: parse each payload's actual bytes (magic sniff →
    format-specific header parse). mapInPandas keeps the Arrow-batch
    shape of the stub path; per-file parsing is row-local work inside
    the batch — the same shape PIL/soundfile would have. Unknown
    magics raise (the external-processing boundary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in REAL_FEATURE_SCHEMA.fieldNames()}
            for mid, content, ctype in zip(
                pdf["media_id"], pdf["content"], pdf["content_type"]
            ):
                b = bytes(content)
                w = h = rate = ns = None
                if b[:2] == b"BM":
                    w, h = decode_bmp(b)
                elif b[:4] == b"RIFF":
                    rate, ns = decode_wav(b)
                elif b[:2] == b"P6":
                    w, h = decode_ppm(b)
                else:
                    raise ValueError(f"undecodable media {mid}: {b[:8]!r}")
                rows["media_id"].append(int(mid))
                rows["content_type"].append(ctype)
                rows["n_bytes"].append(len(b))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(ns)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=REAL_FEATURE_SCHEMA)


REAL_DECODE_SQL = """
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         doc_id % 3 AS kind,
         8 + doc_id % 24 AS w,
         4 + doc_id % 12 AS h,
         8000 + (doc_id % 8) * 1000 AS rate,
         64 + GREATEST(octet_length(encode(text)), 1) % 192 AS ns
  FROM documents
)
SELECT media_id,
       CASE kind WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
            ELSE 'image/ppm' END AS content_type,
       CAST(CASE kind
            WHEN 0 THEN 54 + (3 * w + 3) // 4 * 4 * h
            WHEN 1 THEN 44 + 2 * ns
            ELSE 3 + length(CAST(w AS VARCHAR)) + 1
                   + length(CAST(h AS VARCHAR)) + 5 + 3 * w * h
       END AS BIGINT) AS n_bytes,
       CAST(CASE WHEN kind <> 1 THEN w END AS BIGINT) AS width,
       CAST(CASE WHEN kind <> 1 THEN h END AS BIGINT) AS height,
       CAST(CASE WHEN kind = 1 THEN rate END AS BIGINT) AS sample_rate,
       CAST(CASE WHEN kind = 1 THEN ns END AS BIGINT) AS n_samples
FROM m
"""


MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content_type", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("byte_max", LongType()),
    ]
)


def media_features(media: DataFrame) -> DataFrame:
    """Payload-level feature extraction over the DECODED media bytes
    (the step after header parse): strip each format's header, then
    numpy-vectorize over the raw payload — sum and max byte here,
    where a production extractor computes histograms / RMS energy /
    perceptual hashes with the identical access pattern. The whole
    payload crosses as one Arrow buffer and is reduced with
    np.frombuffer, never a Python byte loop."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in MEDIA_FEATURES_SCHEMA.fieldNames()}
            for mid, content, ctype in zip(
                pdf["media_id"], pdf["content"], pdf["content_type"]
            ):
                b = bytes(content)
                if b[:2] == b"BM":
                    payload = b[54:]
                elif b[:4] == b"RIFF":
                    payload = b[44:]
                elif b[:2] == b"P6":
                    payload = b[b.index(b"255\n") + 4 :]
                else:
                    raise ValueError(f"undecodable media {mid}: {b[:8]!r}")
                arr = np.frombuffer(payload, dtype=np.uint8)
                rows["media_id"].append(int(mid))
                rows["content_type"].append(ctype)
                rows["payload_bytes"].append(len(payload))
                rows["byte_sum"].append(int(arr.sum()))
                rows["byte_max"].append(int(arr.max()) if len(arr) else 0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)


# Oracle: the payload is the document text tiled to the format's
# pixel/sample size (see synthesize_real_media), so its byte sum is
# k·sum(text bytes) + sum(first r text bytes) for payload length
# n = k·len + r — computed exactly from a per-character unnest. BMP
# rows are 4-byte padded, so its payload (row stride × height)
# includes the pad bytes, which the tiling fills with text too.
# ASCII-corpus assumption: this oracle walks CHARACTER positions via
# ascii(substring(...)) while the Spark path sums raw UTF-8 BYTES —
# the two agree only because the TPC-H-ish document text is ASCII
# (1 char == 1 byte; the same assumption tpch.py's paragraphs
# section documents). Non-ASCII text would silently diverge the
# grade; synthesize_real_media's payloads inherit the guarantee.
MEDIA_FEATURES_SQL = """
WITH src AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         doc_id % 3 AS kind,
         8 + doc_id % 24 AS w,
         4 + doc_id % 12 AS h,
         64 + GREATEST(octet_length(encode(text)), 1) % 192 AS ns,
         CASE WHEN octet_length(encode(text)) = 0
              THEN chr(0) ELSE text END AS payload_src
  FROM documents
),
sized AS (
  SELECT media_id, kind, payload_src,
         octet_length(encode(payload_src)) AS len,
         CASE kind
              WHEN 0 THEN (3 * w + 3) // 4 * 4 * h
              WHEN 1 THEN 2 * ns
              ELSE 3 * w * h
         END AS n
  FROM src
),
chars AS (
  SELECT media_id, i,
         ascii(substring(payload_src, CAST(i AS INTEGER), 1)) AS byte
  FROM sized, unnest(range(1, len + 1)) AS t(i)
),
stats AS (
  SELECT media_id,
         SUM(byte) AS text_sum,
         MAX(byte) AS text_max
  FROM chars GROUP BY media_id
),
prefix AS (
  SELECT c.media_id, SUM(c.byte) AS prefix_sum
  FROM chars c JOIN sized s USING (media_id)
  WHERE c.i <= s.n % s.len
  GROUP BY c.media_id
)
SELECT s.media_id,
       CASE s.kind WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav'
            ELSE 'image/ppm' END AS content_type,
       CAST(s.n AS BIGINT) AS payload_bytes,
       CAST((s.n // s.len) * st.text_sum + COALESCE(p.prefix_sum, 0)
            AS BIGINT) AS byte_sum,
       CAST(CASE WHEN s.n >= s.len THEN st.text_max
            ELSE (SELECT MAX(c2.byte) FROM chars c2
                  WHERE c2.media_id = s.media_id AND c2.i <= s.n)
       END AS BIGINT) AS byte_max
FROM sized s
JOIN stats st USING (media_id)
LEFT JOIN prefix p USING (media_id)
"""
