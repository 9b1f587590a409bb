"""Multimodal plumbing tests: binary payload columns + typed metadata +
Arrow-batched decode stages (deterministic fake decoder — the container
has no codec libraries; the Spark-side contracts are what's under test).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.multimodal import (
    attach_media_metadata,
    decode_image,
    image_features,
    resize_images,
    sample_frames,
)
from apache_beam_spark.multimodal.columns import _decode_image_impl


@pytest.fixture(scope="module")
def media(spark):
    # payloads derived from the documents table: deterministic binary
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .limit(50)
          .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload")))
    return df.cache()


def test_attach_metadata_jvm_side(media):
    out = attach_media_metadata(media, format="img")
    row = out.select("meta.size_bytes", "meta.format", "content_sha").first()
    assert row["size_bytes"] > 0 and row["format"] == "img"
    assert len(row["content_sha"]) == 64
    # metadata stage must not invoke Python (stays whole-stage codegen)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_decode_requires_codec_or_fake(media):
    with pytest.raises(Exception, match="NotImplementedError|image decoding"):
        decode_image(media, fake=False).collect()


def test_decode_image_shapes(media):
    out = decode_image(media, fake=True)
    assert out.schema.simpleString() == \
        "struct<doc_id:bigint,width:int,height:int,channels:int,pixels:binary>"
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["pixels"]) == r["width"] * r["height"] * r["channels"]
        assert 8 <= r["width"] <= 15


def test_decode_deterministic(media):
    a = {r["doc_id"]: r["pixels"] for r in decode_image(media, fake=True).collect()}
    b = {r["doc_id"]: r["pixels"] for r in decode_image(media, fake=True).collect()}
    assert a == b


def test_image_features_normalized(media):
    rows = image_features(media, bins=16, fake=True).collect()
    for r in rows:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-3


def test_resize_exact_dims(media):
    rows = resize_images(media, 4, 4, fake=True).collect()
    for r in rows:
        assert (r["width"], r["height"]) == (4, 4)
        assert len(r["pixels"]) == 4 * 4 * 3


def test_sample_frames_fanout(media):
    rows = sample_frames(media, every_n=5, fake=True).collect()
    assert len(rows) > 50  # 1->N fanout
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for idxs in by_doc.values():
        assert idxs == sorted(idxs) and all(i % 5 == 0 for i in idxs)


def test_fake_decoder_pure_function():
    w1 = _decode_image_impl(b"hello world", fake=True)
    w2 = _decode_image_impl(b"hello world", fake=True)
    assert w1 == w2


def test_audio_frame_features_reference(spark):
    """audio_frame_features vs a straight numpy reference, including a
    partial tail frame, an all-silent doc, an empty doc, and a FLAC
    payload (the stage sniffs the container)."""
    import numpy as np

    from apache_beam_spark.multimodal.codecs import encode_flac, encode_wav
    from apache_beam_spark.multimodal.columns import audio_frame_features

    sigs = {
        1: np.array([100, -100] * 50, dtype=np.int16),       # max ZCR
        2: np.arange(-5, 95, dtype=np.int16),                # one crossing
        3: np.zeros(130, dtype=np.int16),                    # silent, tail
        4: np.array([], dtype=np.int16),                     # empty
        5: (np.arange(70) * 997 % 65536 - 32768).astype(np.int16),
    }
    rows = [(k, bytearray(encode_wav(v, 8000)) if k != 5
             else bytearray(encode_flac(v.astype(np.int64), 8000)))
            for k, v in sigs.items()]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in
           audio_frame_features(df, frame=64, silence_peak=512).collect()}
    for k, v in sigs.items():
        s = v.astype(np.int64)
        n = len(s)
        r = got[k]
        if n == 0:
            assert (r["n_frames"], r["zero_crossings"], r["total_energy"],
                    r["max_frame_energy"], r["silent_frames"]) == (0,) * 5
            continue
        starts = np.arange(0, n, 64)
        fe = np.add.reduceat(s * s, starts)
        fm = np.maximum.reduceat(np.abs(s), starts)
        assert r["n_frames"] == len(starts)          # tail frame counted
        assert r["zero_crossings"] == int(
            np.count_nonzero((s[:-1] >= 0) != (s[1:] >= 0)))
        assert r["total_energy"] == int((s * s).sum())
        assert r["max_frame_energy"] == int(fe.max())
        assert r["silent_frames"] == int((fm < 512).sum())
    assert got[3]["silent_frames"] == got[3]["n_frames"] == 3  # 130/64


def test_image_dhash_invariant_under_pixel_doubling(spark):
    """dHash's nearest-neighbor grid makes a 2x pixel-doubled image
    hash IDENTICALLY ((r*2h)//8 // 2 == (r*h)//8) — the perceptual
    property that makes it a near-dup fingerprint, not a byte hash."""
    import numpy as np

    from apache_beam_spark.multimodal.codecs import encode_ppm
    from apache_beam_spark.multimodal.columns import image_dhash

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    big = img.repeat(2, axis=0).repeat(2, axis=1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img))), (2, bytearray(encode_ppm(big)))],
        "doc_id bigint, payload binary")
    got = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert len(got[1]) == 64 and set(got[1]) <= {"0", "1"}
    assert got[1] == got[2]


def test_dhash_near_dup_matches_brute_force(spark):
    """Pigeonhole-banded near-dup pairs == brute-force hamming pairs
    (all pairs within max_hamming found — the pigeonhole guarantee —
    and none beyond it)."""
    import itertools
    import random

    from apache_beam_spark.multimodal.columns import dhash_near_dup

    random.seed(11)
    base = "".join(random.choice("01") for _ in range(64))

    def flip(s, ks):
        l = list(s)
        for k in ks:
            l[k] = "1" if l[k] == "0" else "0"
        return "".join(l)

    hashes = {0: base,
              1: flip(base, [3]),                      # d=1 from 0
              2: flip(base, [3, 17, 40, 63]),          # d=4 from 0
              3: flip(base, list(range(0, 30))),       # far from all
              4: flip(base, [9, 22])}                  # d=2 from 0
    df = spark.createDataFrame(list(hashes.items()),
                               "doc_id bigint, dhash string")
    got = sorted((r["id_a"], r["id_b"], r["hamming"])
                 for r in dhash_near_dup(df, max_hamming=4).collect())
    want = []
    for a, b in itertools.combinations(sorted(hashes), 2):
        d = sum(x != y for x, y in zip(hashes[a], hashes[b]))
        if d <= 4:
            want.append((a, b, d))
    assert got == sorted(want) and len(got) >= 3


def test_video_frames_compose_into_image_stages(spark):
    """Composability: decode_video_frames' pixels column feeds
    image_dhash directly (the multimodal pipeline shape — video ->
    frames -> perceptual dedup) via a PPM re-wrap of the raw frame."""
    import numpy as np

    from apache_beam_spark.multimodal.codecs import encode_avi_mjpeg
    from apache_beam_spark.multimodal.columns import (decode_video_frames,
                                                      image_dhash)

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
              for _ in range(4)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi_mjpeg(frames, fps=5)))],
        "doc_id bigint, payload binary")
    fr = decode_video_frames(df, every_n=2)
    rows = fr.collect()
    assert [r["frame_idx"] for r in rows] == [0, 2]
    assert all(r["fps"] == 5.0 and r["channels"] == 3 for r in rows)

    import pandas as pd

    def rewrap(batches):
        from apache_beam_spark.multimodal.codecs import encode_ppm
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                px = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(
                    r["height"], r["width"], r["channels"])
                out.append({"doc_id": int(r["doc_id"]) * 10
                            + int(r["frame_idx"]),
                            "payload": encode_ppm(px)})
            yield pd.DataFrame(out)

    wrapped = fr.mapInPandas(rewrap, "doc_id bigint, payload binary")
    hashes = image_dhash(wrapped).collect()
    assert len(hashes) == 2
    assert all(len(r["dhash"]) == 64 for r in hashes)


def test_sample_frames_real_avi(spark):
    """sample_frames fake=False is REAL for MJPEG AVI: every_n-th
    frame re-emitted as a decodable PPM; other containers still raise
    the DESCOPED gap."""
    import numpy as np
    import pytest

    from apache_beam_spark.multimodal.codecs import (decode_ppm,
                                                     encode_avi_mjpeg)
    from apache_beam_spark.multimodal.columns import sample_frames

    frames = [np.full((4, 5, 3), 40 * f + 10, dtype=np.uint8)
              for f in range(5)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi_mjpeg(frames, fps=5)))],
        "doc_id bigint, payload binary")
    rows = sample_frames(df, every_n=2, fake=False).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r in rows:
        px = decode_ppm(bytes(r["frame"]))
        assert px.shape == (4, 5, 3)
        # constant tiles survive the MJPEG round trip at the closed-
        # form value (2*floor((v-128)/2+.5)+128 clipped)
        v = 40 * r["frame_idx"] + 10
        want = min(max(2 * int(np.floor((v - 128) / 2 + 0.5)) + 128, 0), 255)
        assert (px == want).all()

    bad = spark.createDataFrame([(2, bytearray(b"\x00\x01\x02"))],
                                "doc_id bigint, payload binary")
    with pytest.raises(Exception, match="DESCOPED"):
        sample_frames(bad, every_n=2, fake=False).collect()


def test_resample_audio_reference(spark):
    """resample_audio: strided decimation vs numpy, WAV and FLAC
    inputs, empty payload."""
    import numpy as np

    from apache_beam_spark.multimodal.codecs import encode_flac, encode_wav
    from apache_beam_spark.multimodal.columns import (decode_audio,
                                                      resample_audio)

    sigs = {1: (np.arange(100) * 997 % 65536 - 32768).astype(np.int16),
            2: np.array([], dtype=np.int16),
            3: (np.arange(33) * 7919 % 65536 - 32768).astype(np.int16)}
    rows = [(1, bytearray(encode_wav(sigs[1], 8000))),
            (2, bytearray(encode_wav(sigs[2], 8000))),
            (3, bytearray(encode_flac(sigs[3].astype(np.int64), 8000)))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in
           decode_audio(resample_audio(df, factor=4)).collect()}
    for k, s in sigs.items():
        dec = s[::4].astype(np.int64)
        r = got[k]
        assert r["sample_rate"] == 2000
        assert r["num_samples"] == len(dec)
        assert r["peak_abs"] == (int(np.abs(dec).max()) if len(dec) else 0)
