"""Multimodal (image/audio/video) column support.

The reference has no media types — media flowed through Beam as opaque
``byte[]`` elements with ``ByteArrayCoder`` (``coders/ByteArrayCoder.java``)
and user DoFns doing the decoding.  Here media is an opaque ``binary``
column plus a typed metadata struct, and decode / feature-extract /
resize / frame-sample are Arrow-batched ``mapInPandas`` stages.  The
actual codec calls are stubbed (image/audio libraries are not in this
container) behind deterministic fakes, but every Spark-side contract —
schemas, UDF signatures, batch iteration, partition sizing — is real and
tested.
"""

from apache_beam_spark.multimodal.columns import (
    AUDIO_META_SCHEMA,
    IMAGE_META_SCHEMA,
    attach_media_metadata,
    decode_image,
    image_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "IMAGE_META_SCHEMA", "AUDIO_META_SCHEMA", "attach_media_metadata",
    "decode_image", "image_features", "resize_images", "sample_frames",
]
