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
