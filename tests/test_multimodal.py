"""Real media decoders (S7 upgrade): byte-level BMP/WAV/PPM parsing,
synthesize→decode roundtrip, payload integrity."""

import pytest

from nucliadb_spark.operators import multimodal as mm


def test_decode_bmp_known_bytes():
    b = mm._bmp_bytes(17, 9, b"abcdef")
    assert b[:2] == b"BM"
    assert mm.decode_bmp(b) == (17, 9)
    # row stride padded to 4 bytes: 3*17=51 -> 52
    assert len(b) == 54 + 52 * 9


def test_decode_wav_known_bytes():
    b = mm._wav_bytes(11000, 77, b"xyz")
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert mm.decode_wav(b) == (11000, 77)
    assert len(b) == 44 + 2 * 77


def test_decode_ppm_known_bytes():
    b = mm._ppm_bytes(12, 5, b"qq")
    assert mm.decode_ppm(b) == (12, 5)
    assert len(b) == len(b"P6\n12 5\n255\n") + 3 * 12 * 5


def test_decode_rejects_unknown_magic():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"GIF89a....")
    with pytest.raises(ValueError):
        mm.decode_wav(b"OggS......")
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P3\n1 1\n255\n...")


def test_synthesize_decode_roundtrip_with_payload(spark, sf_dir):
    """Not just headers: the payload bytes inside the synthesized
    files must be the repeated document text (what a real feature
    extractor would consume)."""
    from nucliadb_spark.sources import tpch

    docs = tpch.table(spark, sf_dir, "documents").limit(30)
    media = mm.synthesize_real_media(docs).cache()
    feats = {r.media_id: r for r in mm.real_decode(media).collect()}
    for r in media.collect():
        b = bytes(r.content)
        f = feats[r.media_id]
        assert f.n_bytes == len(b)
        if r.content_type == "image/bmp":
            w, h = mm.decode_bmp(b)
            assert (f.width, f.height) == (w, h)
            payload = b[54:]
        elif r.content_type == "audio/wav":
            payload = b[44:]
            assert len(payload) == 2 * f.n_samples
        else:
            w, h = mm.decode_ppm(b)
            assert (f.width, f.height) == (w, h)
            payload = b[b.index(b"255\n") + 4 :]
        # payload is the doc text tiled to size
        doc = docs.filter(docs.doc_id == f.media_id).collect()[0]
        src = doc.text.encode("utf-8") or b"\x00"
        tiled = (src * (len(payload) // len(src) + 1))[: len(payload)]
        assert payload == tiled


def test_media_features_match_pure_python(spark, sf_dir):
    """byte_sum/byte_max over the stripped payload must equal a
    reference computation done directly on the synthesized bytes."""
    from nucliadb_spark.sources import tpch

    docs = tpch.table(spark, sf_dir, "documents").limit(40)
    media = mm.synthesize_real_media(docs).cache()
    feats = {r.media_id: r for r in mm.media_features(media).collect()}
    for r in media.collect():
        b = bytes(r.content)
        if r.content_type == "image/bmp":
            payload = b[54:]
        elif r.content_type == "audio/wav":
            payload = b[44:]
        else:
            payload = b[b.index(b"255\n") + 4 :]
        f = feats[r.media_id]
        assert f.payload_bytes == len(payload)
        assert f.byte_sum == sum(payload)
        assert f.byte_max == (max(payload) if payload else 0)


def test_real_decode_features_via_pil(spark, sf_dir):
    """Codec-library decode boundary: when PIL is present,
    real_decode_features must decode PNG through the same
    FEATURE_SCHEMA as the fake path. Skips hermetically without PIL
    (the guarded import is the documented extension boundary —
    multimodal.py real_decode_features)."""
    from nucliadb_spark.sources import tpch

    try:
        from PIL import Image
    except ImportError:
        with pytest.raises(NotImplementedError, match="codec lib"):
            mm.real_decode_features(
                mm.media_from_documents(
                    tpch.table(spark, sf_dir, "documents")
                )
            )
        pytest.skip("PIL not installed; guard behavior verified")

    import io

    def png_bytes(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (1, 2, 3)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(i, png_bytes(16 + i, 8 + i), "image/png") for i in range(4)]
    media = spark.createDataFrame(
        [(m, c, t, len(c)) for m, c, t in rows],
        schema="media_id long, content binary, content_type string, n_bytes long",
    )
    out = {r.media_id: r for r in mm.real_decode_features(media).collect()}
    assert len(out) == 4
    for i in range(4):
        assert (out[i].width, out[i].height, out[i].n_frames) == (16 + i, 8 + i, 1)
