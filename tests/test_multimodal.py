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
