"""Real uncompressed-media codecs (multimodal/codecs.py) and their
wiring into the decode stages."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from apache_beam_spark.multimodal.codecs import (
    decode_bmp,
    decode_image_real,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    sniff_format,
)


def test_wav_round_trip_all_bit_depths():
    rng = np.random.RandomState(7)
    for bits, lo, hi in ((8, 0, 255), (16, -32768, 32767),
                         (32, -2**31, 2**31 - 1)):
        s = rng.randint(lo, hi, size=(1000, 2))
        rate, ch, back = decode_wav(encode_wav(s, 44100, bits=bits))
        assert (rate, ch) == (44100, 2)
        assert np.array_equal(back, s)


def test_wav_mono_and_header_fields():
    s = np.arange(-50, 50, dtype=np.int16)
    payload = encode_wav(s, 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, ch, back = decode_wav(payload)
    assert rate == 8000 and ch == 1 and back.shape == (100, 1)
    assert np.array_equal(back[:, 0], s)


def test_wav_rejects_non_pcm_and_garbage():
    s = np.zeros(4, dtype=np.int16)
    payload = bytearray(encode_wav(s, 8000))
    payload[20] = 3  # audio format -> IEEE float
    with pytest.raises(NotImplementedError, match="non-PCM"):
        decode_wav(bytes(payload))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")


def test_wav_extra_chunk_skipped():
    """Chunk walk must skip unknown chunks (e.g. LIST metadata)."""
    s = np.array([1, -2, 3], dtype=np.int16)
    base = encode_wav(s, 16000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    spliced = (b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:])
    rate, ch, back = decode_wav(spliced)
    assert rate == 16000 and np.array_equal(back[:, 0], s)


def test_bmp_round_trip_with_row_padding():
    rng = np.random.RandomState(9)
    for w, h in ((5, 3), (4, 4), (1, 7)):  # w=5 -> 15-byte rows pad to 16
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_ppm_round_trip_and_comment_header():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    with_comment = b"P6\n# a comment\n4 2\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(with_comment), img)


def test_sniff_format():
    assert sniff_format(encode_wav(np.zeros(1, np.int16), 8000)) == "wav"
    assert sniff_format(encode_bmp(np.zeros((1, 1, 3), np.uint8))) == "bmp"
    assert sniff_format(b"P6\n1 1\n255\n\x00\x00\x00") == "ppm"
    assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_real(b"\xff\xd8\xff\xe0rest")


def test_decode_image_stage_uses_real_bmp_codec(spark):
    """The Spark decode stage must decode a genuine BMP without
    fake=True and yield the true dimensions/pixels."""
    from apache_beam_spark.multimodal.columns import decode_image

    img = np.random.RandomState(3).randint(
        0, 256, size=(6, 5, 3)).astype(np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_bmp(img)))],
                               "doc_id long, payload binary")
    row = decode_image(df).first()
    assert (row["width"], row["height"], row["channels"]) == (5, 6, 3)
    assert bytes(row["pixels"]) == img.tobytes()


def test_decode_audio_stage(spark):
    from apache_beam_spark.multimodal.columns import decode_audio

    s = np.array([100, -200, 300, -400], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, 8000)))], "doc_id long, payload binary")
    row = decode_audio(df).first()
    assert row["sample_rate"] == 8000
    assert row["num_samples"] == 4
    assert row["peak_abs"] == 400
    assert row["duration_s"] == pytest.approx(4 / 8000)
    assert row["rms"] == pytest.approx(float(np.sqrt((s.astype(float)**2).mean())))


def test_decode_media_deadletter_routing(spark):
    from apache_beam_spark.multimodal.codecs import encode_bmp, encode_wav
    from apache_beam_spark.multimodal.columns import decode_media_with_deadletter

    img = np.zeros((2, 3, 3), dtype=np.uint8)
    wav = encode_wav(np.array([1, 2], dtype=np.int16), 8000)
    rows = [(1, bytearray(encode_bmp(img))),
            (2, bytearray(wav)),
            (3, bytearray(b"\xff\xd8\xffjpeg-ish")),   # gated codec
            (4, bytearray(b"garbage"))]                 # unknown container
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    ok, errors = decode_media_with_deadletter(df)
    got = {r["doc_id"]: (r["format"], r["width"], r["sample_rate"])
           for r in ok.collect()}
    assert got[1] == ("bmp", 3, None)
    assert got[2] == ("wav", None, 8000)
    errs = {r["doc_id"]: (r["format"], r["error"]) for r in errors.collect()}
    assert set(errs) == {3, 4}
    assert errs[3][0] == "jpeg" and "NotImplementedError" in errs[3][1]
    assert "unrecognized" in errs[4][1]
