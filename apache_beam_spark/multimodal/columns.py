"""Binary media columns + Pandas-UDF processing stages.

Design for 100 TB of media: payloads stay in one ``binary`` column that
is column-pruned away by every stage that only needs metadata; decode
stages run as ``mapInPandas`` (Arrow-batched, one Python worker per
input split — media work parallelizes by repartitioning on row count,
not bytes, so ``repartition_for_media`` sizes partitions by payload
bytes instead).

Containers decode FOR REAL via ``codecs.py`` (pure struct/zlib/numpy
— WAV PCM/float/G.711 and FLAC audio; BMP, PPM, PNG incl.
Adam7/16-bit, GIF, TIFF, JPEG in all SOF0/1/2/3/9/10 flavors).
MP3 and H.264 are DESCOPED (SURVEY §8: perceptual codecs with no
in-container oracle — decode belongs to an ffmpeg-equipped cluster
image) and raise ``NotImplementedError`` saying so; a deterministic
fake decoder remains for plumbing tests of those paths — it derives
(width, height, channels) and pixel statistics purely from the
payload bytes, so tests have stable expected values.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: typed metadata carried next to the binary payload
IMAGE_META_SCHEMA = "struct<format:string,width:int,height:int,channels:int,size_bytes:bigint>"
AUDIO_META_SCHEMA = "struct<format:string,sample_rate:int,num_samples:bigint,channels:int,size_bytes:bigint>"
VIDEO_META_SCHEMA = "struct<format:string,width:int,height:int,num_frames:int,fps:double,size_bytes:bigint>"


def attach_media_metadata(df: DataFrame, payload_col: str = "payload",
                          format: str = "raw", meta_col: str = "meta") -> DataFrame:
    """Cheap metadata columns computed JVM-side (no Python) — size and a
    content hash; the decode-dependent fields stay null until a decode
    stage fills them."""
    return df.withColumn(meta_col, F.struct(
        F.lit(format).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("channels"),
        F.length(F.col(payload_col)).cast("bigint").alias("size_bytes"),
    )).withColumn("content_sha", F.sha2(F.col(payload_col), 256))


def _decode_image_impl(payload: bytes, fake: bool) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixel_bytes).

    PNG (incl. Adam7/16-bit), JPEG (baseline + progressive), GIF,
    TIFF, BMP 24bpp and PPM P6 decode FOR REAL via ``codecs.py`` — no
    media libs.  The deterministic fake derives everything from the
    payload so plumbing tests for UNDECODABLE containers have stable
    oracles."""
    from apache_beam_spark.multimodal.codecs import (
        decode_image_real, sniff_format)

    if sniff_format(payload) in ("bmp", "ppm", "png", "jpeg", "gif",
                                 "tiff"):
        rgb = decode_image_real(payload)
        if rgb.ndim == 2:  # grayscale PNG/JPEG: channels=1
            h_, w_, c_ = rgb.shape[0], rgb.shape[1], 1
        else:
            h_, w_, c_ = rgb.shape
        return w_, h_, c_, rgb.tobytes()
    if not fake:
        raise NotImplementedError(
            "unrecognized image container; PNG/JPEG/GIF/TIFF/BMP/PPM "
            "decode natively, or pass fake=True for the deterministic "
            "test decoder")
    h = hashlib.sha256(payload).digest()
    width = 8 + h[0] % 8
    height = 8 + h[1] % 8
    channels = 3
    n = width * height * channels
    # pixels = payload tiled to size, xor'd with the hash byte
    reps = (n // max(len(payload), 1)) + 1
    tiled = (payload * reps)[:n]
    pixels = bytes(b ^ h[2] for b in tiled)
    return width, height, channels, pixels


def decode_image(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Decode stage: (id, payload) -> (id, width, height, channels, pixels).

    ``mapInPandas`` so one Arrow batch of payloads is decoded per call —
    the bundle shape the reference gave DoFns (@StartBundle/@ProcessElement),
    with Arrow replacing per-element coder serialization.
    """
    schema = f"{id_col} bigint, width int, height int, channels int, pixels binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "w": [], "h": [], "c": [], "p": []}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, c, px = _decode_image_impl(bytes(payload), fake)
                out["id"].append(i); out["w"].append(w)
                out["h"].append(h); out["c"].append(c); out["p"].append(px)
            yield pd.DataFrame({id_col: out["id"], "width": out["w"],
                                "height": out["h"], "channels": out["c"],
                                "pixels": out["p"]})

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def image_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id", bins: int = 16,
                   fake: bool = False) -> DataFrame:
    """Feature-extract stage: normalized ``bins``-bucket byte histogram
    of the decoded pixels — (id, features array<float>).  The embedding
    analog for media dedup/similarity on the same engine paths as text."""
    schema = f"{id_col} bigint, features array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, feats = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                _, _, _, px = _decode_image_impl(bytes(payload), fake)
                hist = np.bincount(
                    np.frombuffer(px, dtype=np.uint8) >> (8 - bins.bit_length() + 1),
                    minlength=bins)[:bins]
                feats.append((hist / max(hist.sum(), 1)).astype("float32"))
                ids.append(i)
            yield pd.DataFrame({id_col: ids, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload", id_col: str = "doc_id",
                  fake: bool = False) -> DataFrame:
    """Resize stage (nearest-neighbor on the fake decoder's pixel grid)."""
    schema = f"{id_col} bigint, width int, height int, pixels binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, px_out = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, c, px = _decode_image_impl(bytes(payload), fake)
                a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
                yi = (np.arange(height) * h // height)
                xi = (np.arange(width) * w // width)
                px_out.append(a[yi][:, xi].tobytes())
                ids.append(i)
            yield pd.DataFrame({id_col: ids, "width": width, "height": height,
                                "pixels": px_out})

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def sample_frames(df: DataFrame, every_n: int = 10, payload_col: str = "payload",
                  id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Video frame-sampling stage: 1→N rows (id, frame_idx, frame binary).
    The fake treats the payload as a concatenation of fixed-size frames."""
    schema = f"{id_col} bigint, frame_idx int, frame binary"
    frame_bytes = 64

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if not fake:
                    from apache_beam_spark.multimodal.codecs import (
                        decode_avi_mjpeg, encode_ppm, sniff_format)

                    if sniff_format(b) != "avi":
                        raise NotImplementedError(
                            "H.264 and other inter-frame video codecs "
                            "are DESCOPED (SURVEY §8: perceptual codec;"
                            " needs ffmpeg on the cluster image) — "
                            "MJPEG AVI decodes natively, or pass "
                            "fake=True for the plumbing-test decoder")
                    _, avi_frames = decode_avi_mjpeg(b)
                    for fi in range(0, len(avi_frames), every_n):
                        fr = avi_frames[fi]
                        if fr.ndim == 2:
                            import numpy as np
                            fr = np.repeat(fr[:, :, None], 3, axis=2)
                        ids.append(i)
                        idxs.append(fi)
                        frames.append(encode_ppm(fr))
                    continue
                n_frames = max(len(b) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(i); idxs.append(fi)
                    frames.append(b[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def repartition_for_media(df: DataFrame, payload_col: str = "payload",
                          target_partition_bytes: int = 128 << 20,
                          sample_fraction: float = 0.01) -> DataFrame:
    """Partition by payload BYTES, not rows: media rows are wildly
    variable-sized, so row-count partitioning (maxPartitionBytes sees
    only encoded parquet size) can put 100 GB of video in one task.
    Estimates total bytes from a sample and repartitions accordingly."""
    sampled = df.sample(fraction=sample_fraction, seed=42) \
        .agg(F.sum(F.length(payload_col)).alias("b")).collect()[0]["b"]
    if not sampled:
        return df
    total = sampled / sample_fraction
    parts = max(int(total // target_partition_bytes) + 1,
                df.sparkSession.sparkContext.defaultParallelism)
    return df.repartition(parts)


def decode_audio(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """REAL audio decode stage for PCM WAV and FLAC payloads
    (codecs.py — pure struct/numpy): (id, sample_rate, channels,
    num_samples, duration_s, peak_abs, rms).  Other compressed audio
    raises with the needed library (gated-loader pattern)."""
    schema = (f"{id_col} bigint, sample_rate int, channels int, "
              "num_samples bigint, duration_s double, peak_abs bigint, "
              "rms double")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from apache_beam_spark.multimodal.codecs import (
            decode_flac, decode_wav, sniff_format)

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                fmt = sniff_format(b)
                if fmt == "wav":
                    rate, channels, samples = decode_wav(b)
                elif fmt == "flac":
                    rate, channels, samples = decode_flac(b)
                else:
                    raise NotImplementedError(
                        "MP3 and other perceptual audio codecs are "
                        "DESCOPED (SURVEY §8: no in-container oracle; "
                        "needs ffmpeg/librosa on the cluster image); "
                        "PCM WAV and FLAC decode natively")
                s = samples.astype(np.float64)
                # abs in int64: np.abs(int16 -32768) overflows back to
                # -32768 in the narrow dtype (caught by the oracle)
                wide = samples.astype(np.int64)
                rows.append({
                    id_col: i, "sample_rate": rate, "channels": channels,
                    "num_samples": samples.shape[0],
                    "duration_s": samples.shape[0] / rate,
                    "peak_abs": int(np.abs(wide).max()) if samples.size else 0,
                    "rms": float(np.sqrt((s * s).mean())) if samples.size else 0.0,
                })
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def decode_video_frames(df: DataFrame, every_n: int = 1,
                        payload_col: str = "payload",
                        id_col: str = "doc_id") -> DataFrame:
    """REAL video decode stage for MJPEG AVI payloads (codecs.py —
    RIFF container walk + the real per-frame JPEG decoder, no media
    libs): 1 -> N fan-out of every ``every_n``-th frame as
    (id, frame_idx, width, height, channels, fps, pixel_sum, pixels).
    ``pixel_sum`` is the integer checksum the `video_mjpeg_roundtrip`
    oracle recomputes closed-form; downstream image stages
    (image_dhash, image_features, resize) consume ``pixels`` as-is.
    Inter-frame codecs (H.264 etc.) raise the DESCOPED gap from
    ``decode_avi_mjpeg``.

    100 TB: payload-parallel like decode_audio; the fan-out multiplies
    rows, not shuffles — repartition_for_media upstream sizes splits
    by payload bytes so one worker never holds more than a batch of
    videos."""
    schema = (f"{id_col} bigint, frame_idx int, width int, height int, "
              "channels int, fps double, pixel_sum bigint, pixels binary")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from apache_beam_spark.multimodal.codecs import (
            decode_avi_mjpeg, sniff_format)

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if sniff_format(b) != "avi":
                    raise NotImplementedError(
                        "only MJPEG AVI decodes natively; other video "
                        "containers are DESCOPED (SURVEY §8)")
                fps, frames = decode_avi_mjpeg(b)
                for fi in range(0, len(frames), every_n):
                    fr = frames[fi]
                    ch = 1 if fr.ndim == 2 else fr.shape[2]
                    rows.append({
                        id_col: i, "frame_idx": fi,
                        "width": int(fr.shape[1]),
                        "height": int(fr.shape[0]), "channels": ch,
                        "fps": float(fps),
                        "pixel_sum": int(fr.astype(np.int64).sum()),
                        "pixels": fr.tobytes(),
                    })
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def image_dhash(df: DataFrame, grid_w: int = 9, grid_h: int = 8,
                payload_col: str = "payload", id_col: str = "doc_id",
                fake: bool = False) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded pixels —
    the image near-dup fingerprint of a multimodal training-data
    pipeline (the image analogue of SimHash on text).

    Per image: decode (any native container), integer grayscale
    ``(r+g+b)//3``, nearest-neighbor sample to a ``grid_w x grid_h``
    grid (``src = (dst*size)//grid`` — pure integer, so the hash is
    engine-reproducible), then one bit per horizontally-adjacent cell
    pair (strict ``>``), row-major: ``(grid_w-1)*grid_h`` bits as a
    '0'/'1' string (64 at the default 9x8 — the classic dHash shape).

    Integer end-to-end, so the whole stage value-oracles against the
    same arithmetic in SQL (`image_dhash_dedup`).  Near-duplicate
    pairing at hamming distance goes through ``dhash_near_dup``
    (pigeonhole-banded, no all-pairs)."""
    schema = f"{id_col} bigint, dhash string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, hs = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, c, px = _decode_image_impl(bytes(payload), fake)
                a = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                if c == 1:
                    gray = a.reshape(h, w)
                else:
                    gray = a.reshape(h, w, c)[:, :, :3].sum(axis=2) // 3
                rr = (np.arange(grid_h) * h) // grid_h
                cc = (np.arange(grid_w) * w) // grid_w
                g = gray[np.ix_(rr, cc)]
                bits = (g[:, :-1] > g[:, 1:]).ravel()
                ids.append(i)
                hs.append("".join("1" if b else "0" for b in bits))
            yield pd.DataFrame({id_col: ids, "dhash": hs})

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def dhash_near_dup(hashed: DataFrame, max_hamming: int = 4,
                   n_bits: int = 64, id_col: str = "doc_id",
                   hash_col: str = "dhash") -> DataFrame:
    """Near-duplicate image pairs at hamming <= ``max_hamming`` over
    dHash bit strings — PIGEONHOLE-banded like the SimHash dedup: the
    hash splits into ``max_hamming + 1`` chunks, any pair within the
    distance must agree exactly on at least one chunk, so candidates
    come from per-chunk equality joins (never all-pairs) and only
    candidates pay the exact hamming verify (a codegen `aggregate`
    over the bit positions, no UDF).  Returns (id_a, id_b, hamming)
    with id_a < id_b.

    100 TB: chunk buckets shuffle (chunk_idx, chunk_value) pairs only;
    hot buckets are bounded by the corpus's near-dup density, the same
    over-cap discipline as dedup/simhash.py."""
    chunks = max_hamming + 1
    width = (n_bits + chunks - 1) // chunks
    # pack the bit string into 32-bit words ONCE per row: the hamming
    # verify becomes bit_count(xor) on integers — the string-walking
    # aggregate version cost ~64 substring allocations per CANDIDATE
    # and blew up on hot buckets (measured: sf0.1 ran minutes; this
    # runs seconds)
    n_words = (n_bits + 31) // 32
    words = [F.conv(F.substring(F.col(hash_col), wi * 32 + 1, 32),
                    2, 10).cast("long").alias(f"w{wi}")
             for wi in range(n_words)]
    pieces = F.array(*[
        F.struct(F.lit(ci).alias("ci"),
                 F.substring(F.col(hash_col), ci * width + 1, width)
                 .alias("cv"))
        for ci in range(chunks)])
    from apache_beam_spark.plans.caching import cache_scoped

    # cache the banded hash rows (ints only, chunks per image — TINY
    # vs the images): the self-join below consumes the frame on BOTH
    # sides, and uncached each side re-ran the upstream decode+dHash
    # Python pass — at 100 TB that is a second full image decode just
    # to re-derive a 64-bit hash (optimization r13, guide §1.2)
    banded = cache_scoped(
        (hashed.select(id_col, *words,
                       F.explode(pieces).alias("b"))
         .select(id_col, *[f"w{wi}" for wi in range(n_words)],
                 F.col("b.ci").alias("ci"),
                 F.xxhash64("b.ci", "b.cv").alias("cv"))))
    a, b = banded.alias("a"), banded.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.w{wi}").bitwiseXOR(F.col(f"b.w{wi}")))
        for wi in range(n_words))
    return (a.join(b, (F.col("a.ci") == F.col("b.ci"))
                   & (F.col("a.cv") == F.col("b.cv"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    hamming.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def resample_audio(df: DataFrame, factor: int,
                   payload_col: str = "payload",
                   id_col: str = "doc_id") -> DataFrame:
    """Integer audio decimation: decode any native payload (WAV/FLAC),
    keep every ``factor``-th sample, re-encode PCM WAV at
    ``rate // factor``.  Plain stride decimation WITHOUT an anti-alias
    low-pass — bit-exact and engine-reproducible (the
    `audio_resample` oracle recomputes the strided formula in SQL);
    a filtered polyphase resampler is float-library-dependent and
    belongs next to the perceptual codecs on an ffmpeg-equipped
    image.  Payload-parallel like the other decode stages."""
    schema = f"{id_col} bigint, payload binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from apache_beam_spark.multimodal.codecs import (
            decode_flac, decode_wav, encode_wav, sniff_format)

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                fmt = sniff_format(b)
                if fmt == "wav":
                    rate, _, samples = decode_wav(b)
                elif fmt == "flac":
                    rate, _, samples = decode_flac(b)
                else:
                    raise NotImplementedError(
                        "MP3 and other perceptual audio codecs are "
                        "DESCOPED (SURVEY §8); PCM WAV and FLAC decode "
                        "natively")
                out = samples[::factor].astype(np.int16)
                rows.append({id_col: i,
                             "payload": encode_wav(out, rate // factor)})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def audio_frame_features(df: DataFrame, frame: int = 64,
                         silence_peak: int = 512,
                         payload_col: str = "payload",
                         id_col: str = "doc_id") -> DataFrame:
    """Per-document audio features from REAL decoded PCM/FLAC payloads
    — the audio-quality-filtering stage of a training-data pipeline
    (the audio analogue of the text quality scores): non-overlapping
    ``frame``-sample frames, integer frame energy, whole-signal
    zero-crossing count, and silence-frame detection (frame peak <
    ``silence_peak``).  All features are INTEGER functions of the
    decoded samples, so the stage is value-oracle-able end-to-end
    through the same mapInPandas plumbing as ``decode_audio``.

    Definitions (pinned by the `audio_features` oracle):
      * a partial tail frame counts as a frame;
      * zero crossing at i in [1, n): sign change of (x >= 0);
      * energies in int64 (peak 32768² ≈ 2³⁰ per sample — a frame
        overflows int64 only beyond 2³³ samples, far past any frame).

    100 TB: payload-parallel (repartition_for_media), no shuffle — one
    Arrow-batched map stage; frames never materialize as rows."""
    schema = (f"{id_col} bigint, n_frames int, zero_crossings bigint, "
              "total_energy bigint, max_frame_energy bigint, "
              "silent_frames int")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from apache_beam_spark.multimodal.codecs import (
            decode_flac, decode_wav, sniff_format)

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                fmt = sniff_format(b)
                if fmt == "wav":
                    _, _, samples = decode_wav(b)
                elif fmt == "flac":
                    _, _, samples = decode_flac(b)
                else:
                    raise NotImplementedError(
                        "MP3 and other perceptual audio codecs are "
                        "DESCOPED (SURVEY §8); PCM WAV and FLAC decode "
                        "natively")
                s = samples.astype(np.int64)
                n = s.shape[0]
                if n == 0:
                    rows.append({id_col: i, "n_frames": 0,
                                 "zero_crossings": 0, "total_energy": 0,
                                 "max_frame_energy": 0, "silent_frames": 0})
                    continue
                zc = int(np.count_nonzero((s[:-1] >= 0) != (s[1:] >= 0)))
                e = s * s
                starts = np.arange(0, n, frame)
                fe = np.add.reduceat(e, starts)
                fm = np.maximum.reduceat(np.abs(s), starts)
                rows.append({
                    id_col: i, "n_frames": int(starts.shape[0]),
                    "zero_crossings": zc,
                    "total_energy": int(e.sum()),
                    "max_frame_energy": int(fe.max()),
                    "silent_frames": int((fm < silence_peak).sum()),
                })
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def decode_media_with_deadletter(df: DataFrame, payload_col: str = "payload",
                                 id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Decode a MIXED media column, routing failures to a dead-letter
    output instead of failing the job (the 100 TB reality: some
    payloads are always corrupt or in a codec you don't have).

    Returns ``(ok, errors)``: ok rows carry the sniffed format + the
    decoded summary (image dims or audio rate/samples); error rows
    carry the id, sniffed format, error class and message.  One pass,
    Arrow-batched; both outputs derive from the same tagged frame, the
    multi-output-ParDo shape (reference additionalOutputs)."""
    from apache_beam_spark.multimodal.codecs import (
        decode_flac, decode_image_real, decode_wav, sniff_format)

    schema = (f"{id_col} bigint, ok boolean, format string, width int, "
              "height int, sample_rate int, num_samples bigint, "
              "error string")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                fmt = sniff_format(b)
                row = {id_col: int(i), "ok": True, "format": fmt,
                       "width": None, "height": None,
                       "sample_rate": None, "num_samples": None,
                       "error": None}
                try:
                    if fmt in ("wav", "flac"):
                        dec = decode_wav if fmt == "wav" else decode_flac
                        rate, _, samples = dec(b)
                        row["sample_rate"] = rate
                        row["num_samples"] = samples.shape[0]
                    else:
                        rgb = decode_image_real(b)
                        row["height"], row["width"] = rgb.shape[:2]
                except Exception as e:  # noqa: BLE001 - the dead letter IS the handler
                    row["ok"] = False
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows)

    tagged = df.select(id_col, payload_col).mapInPandas(fn, schema)
    ok = tagged.filter("ok").drop("ok", "error")
    errors = tagged.filter("NOT ok").select(id_col, "format", "error")
    return ok, errors
