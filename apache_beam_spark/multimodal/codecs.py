"""REAL codecs for uncompressed media containers — pure Python/numpy,
no external media libraries.

The compressed formats (JPEG/PNG/MP3/H.264) stay gated behind
``NotImplementedError`` (no codec libs in this container), but the
uncompressed containers every media pipeline also carries are fully
decodable with struct + numpy:

* **WAV** (RIFF little-endian, PCM 8/16/32-bit): chunk walk honoring
  chunk sizes and padding; returns (sample_rate, channels, samples)
  with samples as an (n, channels) int numpy array.
* **BMP** (BITMAPINFOHEADER, 24bpp uncompressed): bottom-up BGR rows
  with 4-byte row padding -> (h, w, 3) RGB array.
* **PPM** (P6, maxval 255): whitespace/comment-tolerant header -> raw
  RGB array.

Encoders exist for all three so round trips are testable in-sandbox;
the decode stages in ``columns.py`` sniff magic bytes and use these
before falling back to the gated/fake paths.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ WAV


def encode_wav(samples: np.ndarray, sample_rate: int,
               bits: int = 16) -> bytes:
    """PCM WAV writer.  ``samples``: (n,) or (n, channels) ints."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
    data = s.astype(dtype).tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, samples[n, channels]).  PCM only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    fmt = data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_format})")
    dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
    samples = np.frombuffer(data, dtype=dtype)
    samples = samples[: (len(samples) // channels) * channels]
    return sample_rate, channels, samples.reshape(-1, channels)


# ------------------------------------------------------------------ BMP


def encode_bmp(rgb: np.ndarray) -> bytes:
    """24bpp BITMAPINFOHEADER writer.  ``rgb``: (h, w, 3) uint8."""
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = []
    bgr = rgb[:, :, ::-1]
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bgr[y].tobytes()
        rows.append(row + b"\x00" * (row_bytes - len(row)))
    data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 from a 24bpp uncompressed BMP."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    header_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if header_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24bpp uncompressed BITMAPINFOHEADER (got bpp={bpp}, "
            f"compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        start = data_offset + i * row_bytes
        row = np.frombuffer(payload[start:start + w * 3], dtype=np.uint8)
        y = (h - 1 - i) if bottom_up else i
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


# ------------------------------------------------------------------ PPM


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: three whitespace-separated ints, '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while payload[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval 255 PPM")
    arr = np.frombuffer(payload[pos:pos + w * h * 3], dtype=np.uint8)
    return arr.reshape(h, w, 3)


# ------------------------------------------------------------ dispatch

def sniff_format(payload: bytes) -> str:
    """Magic-byte container detection for the decode stages."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


def decode_image_real(payload: bytes) -> np.ndarray:
    """Decode BMP/PPM for real; compressed formats raise with the
    library needed (the gated-loader pattern)."""
    fmt = sniff_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt in ("jpeg", "png"):
        raise NotImplementedError(
            f"{fmt} decoding requires Pillow/opencv (not in this "
            "container); uncompressed BMP/PPM decode natively")
    raise ValueError(f"unrecognized image container ({fmt})")
