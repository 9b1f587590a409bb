"""REAL codecs for common media containers — pure Python/stdlib-zlib/
numpy, no external media libraries.

MP3/H.264 are DESCOPED (SURVEY §8: perceptual audio/video codecs with
no in-container oracle — their decode belongs to an ffmpeg-equipped
cluster image, and the ``NotImplementedError`` gates say so), but the
two dominant image formats of a web crawl — PNG and JPEG in all four
entropy/scan flavors — plus FLAC and the uncompressed containers are
fully decodable:

* **PNG** (RFC 2083): chunk walk with CRC verification, zlib inflate,
  None/Sub/Up/Average/Paeth unfiltering; 8- and 16-bit gray/RGB/
  palette/alpha, sequential AND Adam7-interlaced rasters (sub-byte
  depths raise with the gap named).
* **JPEG** (ITU-T T.81): marker walk, Annex K / arbitrary DQT+DHT
  tables, huffman entropy decode with restart intervals, dequantize +
  batched numpy IDCT, 1-2x chroma sampling with replication upsample,
  YCbCr->RGB.  Baseline sequential (SOF0/1), progressive (SOF2,
  Annex G spectral selection + successive approximation),
  arithmetic-coded (SOF9 sequential AND SOF10 progressive — the
  Annex D QM-coder, r9) and LOSSLESS (SOF3, Annex H DPCM, r9) frames
  all decode; hierarchical/differential frames (SOF5-7/13-15, DHP)
  are DESCOPED — effectively extinct in real corpora (SURVEY §8) —
  and raise NotImplementedError saying so.

* **WAV** (RIFF little-endian): chunk walk honoring chunk sizes and
  padding; integer PCM 8/16/32-bit, IEEE float 32/64 (r8), and G.711
  A-law/mu-law (r8: spec-algorithm companding, exact byte-level
  encode<->decode inverses) -> (sample_rate, channels, samples) with
  samples as an (n, channels) numpy array.
* **FLAC** (xiph.org lossless audio, r9; LPC r10): STREAMINFO +
  metadata walk, constant/verbatim/fixed order 0-4 AND general LPC
  order 1-32 subframes (quantized coefficients, signed shift), rice
  residual partitions (incl. 5-bit params and escapes), UTF-8 frame
  numbers, wasted bits, all four stereo decorrelation assignments,
  CRC-8/CRC-16/raw-MD5 verification; encoder picks predictors and
  rice parameters by exact cost, with opt-in Levinson-Durbin LPC
  (``use_lpc=True``).  Round trips are BIT-exact (lossless).
* **BMP** (BITMAPINFOHEADER, 24bpp uncompressed): bottom-up BGR rows
  with 4-byte row padding -> (h, w, 3) RGB array.
* **PPM** (P6, maxval 255): whitespace/comment-tolerant header -> raw
  RGB array.
* **GIF** (87a/89a, r8): logical screen walk, global/local color
  tables, variable-code-width LZW decode, 4-pass de-interlacing,
  89a extension blocks skipped; first frame -> (h, w, 3) RGB.
* **TIFF** (baseline 6.0, r8): II/MM byte orders, first-IFD walk,
  8-bit gray (photometric 0 inverted) / RGB, strip assembly,
  Compression 1 and PackBits; tiles/LZW/16-bit raise with the gap
  named.

Encoders exist for all three so round trips are testable in-sandbox;
the decode stages in ``columns.py`` sniff magic bytes and use these
before falling back to the gated/fake paths.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ WAV


def encode_wav(samples: np.ndarray, sample_rate: int,
               bits: int = 16, audio_format: int = 1) -> bytes:
    """WAV writer.  ``samples``: (n,) or (n, channels).  Formats: 1
    (integer PCM, default), 3 (IEEE float, bits 32/64), 6 (A-law) and
    7 (mu-law) — for 6/7 pass the uint8 G.711 codes (bits=8), e.g.
    from ``alaw_encode``/``ulaw_encode``."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    if audio_format == 3:
        dtype = {32: np.float32, 64: np.float64}[bits]
    elif audio_format in (6, 7):
        if bits != 8:
            raise ValueError("G.711 WAV carries 8-bit codes, "
                             f"got bits={bits}")
        dtype = np.uint8
    else:
        dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
    data = s.astype(dtype).tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", audio_format, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# G.711 companding, implemented from the spec's segment algorithm
# (not copied magic tables) — encode/decode are exact inverses on the
# 256 code points, asserted exhaustively in tests/test_codecs.py, with
# ONE spec-canonical exception: mu-law 0x7F ('negative zero') decodes
# to 0, which re-encodes as 0xFF (positive zero).

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> uint8 G.711 mu-law codes (vectorized)."""
    x = np.asarray(samples, np.int32)
    sign = (x < 0).astype(np.uint8) * 0x80
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    seg = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg.astype(np.uint8) << 4)
              | mant.astype(np.uint8))).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 mu-law codes -> int16 linear (vectorized)."""
    u = ~np.asarray(codes, np.uint8)
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant.astype(np.int32) << 3) + _ULAW_BIAS)
           << seg.astype(np.int32)) - _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> uint8 G.711 A-law codes (the CCITT reference
    algorithm, vectorized): 13-bit magnitude, segment = position of
    the leading bit, mask 0xD5 for non-negative / 0x55 for negative
    (A-law transmits with even bits inverted)."""
    x = np.asarray(samples, np.int32) >> 3     # 16 -> 13 bit
    neg = x < 0
    mask = np.where(neg, 0x55, 0xD5)
    p = np.where(neg, -x - 1, x)
    p = np.minimum(p, 0xFFF)
    seg = np.maximum(
        np.floor(np.log2(np.maximum(p, 1))).astype(np.int32) - 4,
        0).clip(0, 7)
    mant = np.where(seg < 2, p >> 1, p >> seg) & 0x0F
    return (((seg << 4) | mant) ^ mask).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 A-law codes -> int16 linear (the CCITT reference
    expansion, vectorized)."""
    a = np.asarray(codes, np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108,
                          (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, samples[n, channels]).  Formats: 1
    (integer PCM 8/16/32), 3 (IEEE float 32/64 -> float32 array),
    6 (G.711 A-law -> expanded int16), 7 (G.711 mu-law -> int16);
    WAVE_FORMAT_EXTENSIBLE and compressed codecs raise with the gap
    named."""
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
    if audio_format == 1:
        if bits not in (8, 16, 32):
            raise ValueError(f"invalid PCM WAV bit depth {bits}")
        dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
        samples = np.frombuffer(data, dtype=dtype)
    elif audio_format == 3:
        if bits not in (32, 64):
            raise ValueError(f"invalid float WAV bit depth {bits}")
        dtype = {32: np.float32, 64: np.float64}[bits]
        samples = np.frombuffer(data, dtype=dtype).astype(np.float32)
    elif audio_format in (6, 7):
        if bits != 8:
            raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
        dec = alaw_decode if audio_format == 6 else ulaw_decode
        samples = dec(np.frombuffer(data, np.uint8))
    else:
        raise NotImplementedError(f"non-PCM WAV (format {audio_format})")
    samples = samples[: (len(samples) // channels) * channels]
    return sample_rate, channels, samples.reshape(-1, channels)


# ----------------------------------------------------------------- FLAC
# Lossless audio (the xiph.org FLAC format, public spec, r9; LPC
# subframes r10): constant / verbatim / fixed order 0-4 / general LPC
# order 1-32 subframes, rice residual coding (4- and 5-bit params,
# escapes, any partition order), UTF-8-coded frame numbers, CRC-8
# header + CRC-16 frame checks, STREAMINFO with the raw-audio MD5.
# Losslessness is the point: round trips are BIT-exact, so the whole
# path is value-oracle-able the way wav_roundtrip is (the
# `flac_roundtrip` query).  The decoder additionally understands all
# three stereo decorrelation assignments (left/side, right/side,
# mid/side) and wasted-bits shifts.  LPC decode follows the spec
# prediction exactly — residual[i] + ((sum qcoef[j]*x[i-1-j]) >>
# shift) in arbitrary-precision integers with an arithmetic shift —
# so ANY valid quantized-coefficient stream (libFLAC/ffmpeg defaults
# are LPC-coded) reconstructs bit-exactly; the encoder gains opt-in
# LPC via windowed autocorrelation + Levinson-Durbin +
# precision-15 quantization (use_lpc=True), kept opt-in so the
# oracled fixed-subset byte streams are unchanged.

_FLAC_BLOCK = 4096

#: CRC tables — CRC-8 poly 0x07 and CRC-16 poly 0x8005, both init 0,
#: MSB-first (the FLAC frame checks)
_FLAC_CRC8 = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07 if _c & 0x80 else _c << 1) & 0xFF
    _FLAC_CRC8.append(_c)
_FLAC_CRC16 = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005 if _c & 0x8000 else _c << 1) & 0xFFFF
    _FLAC_CRC16.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _FLAC_CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _FLAC_CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _FlacBitWriter:
    """MSB-first bit accumulator (no byte stuffing — FLAC frames are
    CRC-protected, not marker-delimited)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length:
            self.acc = (self.acc << length) | (value & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                self.n -= 8
                self.out.append((self.acc >> self.n) & 0xFF)
            self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)                 # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


class _FlacBitReader:
    """MSB-first bit reader over one payload: multi-bit reads slice
    bytes directly (no per-bit loop) and unary reads scan a byte at a
    time — the two hot paths of rice decoding."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        end = self.byte * 8 + self.bit + length
        nbytes = (self.bit + length + 7) // 8
        chunk = self.data[self.byte:self.byte + nbytes]
        if len(chunk) != nbytes:
            raise ValueError("truncated FLAC frame")
        v = int.from_bytes(chunk, "big")
        v = (v >> (nbytes * 8 - self.bit - length)) & ((1 << length) - 1)
        self.byte, self.bit = divmod(end, 8)
        return v

    def read_signed(self, length: int) -> int:
        v = self.read(length)
        return v - (1 << length) if v >> (length - 1) else v

    def read_unary(self) -> int:
        q = 0
        data = self.data
        while True:
            if self.byte >= len(data):
                raise ValueError("truncated FLAC frame")
            cur = data[self.byte] & (0xFF >> self.bit)
            if cur:
                one = 8 - cur.bit_length()   # bit index of the 1
                q += one - self.bit
                self.bit = one + 1
                if self.bit == 8:
                    self.bit = 0
                    self.byte += 1
                return q
            q += 8 - self.bit
            self.bit = 0
            self.byte += 1

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _flac_utf8(n: int) -> bytes:
    """UTF-8-style coding of the frame number (FLAC frame header)."""
    if n < 0x80:
        return bytes([n])
    for extra, lead, limit in ((1, 0xC0, 1 << 11), (2, 0xE0, 1 << 16),
                               (3, 0xF0, 1 << 21), (4, 0xF8, 1 << 26),
                               (5, 0xFC, 1 << 31)):
        if n < limit:
            shift = 6 * extra
            out = [lead | (n >> shift)]
            for _ in range(extra):
                shift -= 6
                out.append(0x80 | ((n >> shift) & 0x3F))
            return bytes(out)
    raise ValueError("FLAC frame number out of range")


def _flac_read_utf8(r: "_FlacBitReader") -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    extra = 0
    for lead, width in ((0xC0, 0xE0), (0xE0, 0xF0), (0xF0, 0xF8),
                        (0xF8, 0xFC), (0xFC, 0xFE)):
        extra += 1
        if lead <= b0 < width:
            break
    else:
        raise ValueError("malformed FLAC frame number")
    n = b0 & (0x3F >> extra)
    for _ in range(extra):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("malformed FLAC frame number")
        n = (n << 6) | (b & 0x3F)
    return n


#: fixed-predictor residual: coefficient rows for orders 0..4
_FLAC_FIXED = [np.array(c, np.int64) for c in
               ([], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1])]


def _flac_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + u.size * (k + 1)


def _levinson_durbin(ac: np.ndarray, order: int) -> np.ndarray:
    """LPC coefficients from an autocorrelation vector (standard
    Levinson-Durbin recursion; prediction convention
    ``x[i] ~= sum(c[j] * x[i-1-j])``).  Stops early if the prediction
    error hits zero (perfectly predictable input)."""
    err = float(ac[0])
    lpc = np.zeros(order, np.float64)
    for i in range(order):
        if err <= 0:
            return lpc[:i]
        acc = float(ac[i + 1])
        for j in range(i):
            acc -= lpc[j] * float(ac[i - j])
        k = acc / err
        half = i >> 1
        for j in range(half):
            t = lpc[j]
            lpc[j] = t - k * lpc[i - 1 - j]
            lpc[i - 1 - j] -= k * t
        if i & 1:
            lpc[half] -= k * lpc[half]
        lpc[i] = k
        err *= 1.0 - k * k
    return lpc


def _flac_quantize_lpc(lpc: np.ndarray,
                       precision: int = 15) -> tuple | None:
    """(qcoefs, precision, shift) — fixed-point quantization with
    error feedback (the libFLAC scheme): shift chosen so the largest
    coefficient fills ``precision`` signed bits, clamped to the 5-bit
    non-negative shift range the subframe header can carry."""
    import math

    cmax = float(np.abs(lpc).max()) if len(lpc) else 0.0
    if not np.isfinite(cmax) or cmax <= 0:
        return None
    shift = precision - 1 - (math.frexp(cmax)[1] - 1) - 1
    shift = max(0, min(15, shift))
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    err = 0.0
    qc = []
    for c in lpc:
        v = float(c) * (1 << shift) + err
        q = min(qmax, max(qmin, int(round(v))))
        err = v - q
        qc.append(q)
    if all(q == 0 for q in qc):
        return None
    return qc, precision, shift


def _flac_lpc_residual(x: np.ndarray, qc: list[int],
                       shift: int) -> np.ndarray:
    """Exact integer LPC residual — the same arithmetic the decoder
    inverts (int64 accumulate, arithmetic right shift)."""
    order = len(qc)
    n = len(x)
    acc = np.zeros(n - order, np.int64)
    for j, c in enumerate(qc):
        acc += np.int64(c) * x[order - 1 - j:n - 1 - j]
    return x[order:] - (acc >> shift)


def _flac_part_sizes(bs: int, order: int, porder: int) -> list[int]:
    """Per-partition residual counts at one rice partition order (the
    spec layout: first partition short by the warmup samples)."""
    nparts = 1 << porder
    return [bs // nparts - order] + [bs // nparts] * (nparts - 1)


def _flac_plan_residual(res: np.ndarray, bs: int, order: int) -> tuple:
    """(exact_bits, porder, ks) — best rice partitioning of one
    residual section: exact search over partition orders 0..6 with a
    per-partition optimal 4-bit parameter (method 0), honoring the
    spec constraints (bs divisible by 2^porder, first partition short
    by the warmup).  The decoder has understood arbitrary partition
    orders since r9; r10 makes the encoder EMIT them, which pays on
    non-stationary frames (quiet->loud transitions get per-region
    parameters instead of one compromise k)."""
    u = (np.abs(res) * 2 - (res < 0)).astype(np.int64)
    best = None
    for porder in range(7):
        nparts = 1 << porder
        if bs % nparts or bs // nparts < order:
            continue
        sizes = _flac_part_sizes(bs, order, porder)
        bits = 2 + 4                     # method + porder fields
        ks = []
        pos = 0
        for sz in sizes:
            part = u[pos:pos + sz]
            pos += sz
            if sz == 0:
                ks.append(0)
                bits += 4
                continue
            k = min(range(15), key=lambda kk: _rice_cost(part, kk))
            ks.append(k)
            bits += 4 + _rice_cost(part, k)
        if best is None or bits < best[0]:
            best = (bits, porder, ks)
    return best


def _flac_plan_subframe(x: np.ndarray, sb: int, use_lpc: bool) -> tuple:
    """(exact_bits, plan) for the cheapest coding of one subframe —
    constant / best fixed order 0-4 / (opt-in) best LPC / verbatim.
    Costs are true bit counts (8 header bits + warmup + coef fields +
    the partitioned rice section), so plans are comparable ACROSS
    stereo decorrelation candidates, which is what ``assign="auto"``
    sums."""
    if np.all(x == x[0]):
        return 8 + sb, ("constant", int(x[0]))
    bs = len(x)
    best = None
    for order in range(min(5, bs)):
        res = _flac_residual(x, order)
        rbits, porder, ks = _flac_plan_residual(res, bs, order)
        cost = 8 + order * sb + rbits
        if best is None or cost < best[0]:
            best = (cost, ("fixed", order, porder, ks, res))
    if use_lpc and bs > 16:
        # Hann-windowed autocorrelation; every candidate's cost is
        # EXACT (header + coef + rice bits of the true quantized-
        # integer residual), so LPC only wins when it genuinely beats
        # the best fixed predictor
        xf = x.astype(np.float64) * np.hanning(bs)
        max_order = min(12, bs - 1)
        ac = np.array([float(np.dot(xf[:len(xf) - lag], xf[lag:]))
                       for lag in range(max_order + 1)])
        for order in sorted({2, 4, 8, max_order}):
            if order > max_order or ac[0] <= 0:
                continue
            q = _flac_quantize_lpc(_levinson_durbin(ac, order))
            if q is None:
                continue
            qc, prec, shift = q
            res = _flac_lpc_residual(x, qc, shift)
            rbits, porder, ks = _flac_plan_residual(res, bs, len(qc))
            cost = 8 + len(qc) * (sb + prec) + 4 + 5 + rbits
            if cost < best[0]:
                best = (cost, ("lpc", qc, prec, shift, porder, ks, res))
    verbatim = 8 + bs * sb
    if verbatim <= best[0]:              # rice blew up -> raw samples
        return verbatim, ("verbatim",)
    return best


def _flac_write_subframe(w: "_FlacBitWriter", x: np.ndarray, sb: int,
                         plan: tuple) -> None:
    kind = plan[0]
    w.write(0, 1)                        # subframe pad bit
    if kind == "constant":
        w.write(0b000000, 6)
        w.write(0, 1)
        w.write(plan[1] & ((1 << sb) - 1), sb)
        return
    if kind == "verbatim":
        w.write(0b000001, 6)
        w.write(0, 1)
        for v in x:
            w.write(int(v) & ((1 << sb) - 1), sb)
        return
    if kind == "fixed":
        _, order, porder, ks, res = plan
        w.write(0b001000 | order, 6)
    else:                                # lpc
        _, qc, prec, shift, porder, ks, res = plan
        order = len(qc)
        w.write(0b100000 | (order - 1), 6)
    w.write(0, 1)                        # no wasted bits
    for v in x[:order]:                  # warmup
        w.write(int(v) & ((1 << sb) - 1), sb)
    if kind == "lpc":
        w.write(prec - 1, 4)
        w.write(shift, 5)                # 5-bit signed, always >= 0 here
        for c in qc:
            w.write(int(c) & ((1 << prec) - 1), prec)
    w.write(0b00, 2)                     # 4-bit rice parameters
    w.write(porder, 4)
    pos = 0
    for k, sz in zip(ks, _flac_part_sizes(len(x), order, porder)):
        w.write(k, 4)
        for v in res[pos:pos + sz]:
            u = int(v) * 2 if v >= 0 else -int(v) * 2 - 1
            w.write_unary(u >> k)
            w.write(u, k)
        pos += sz


def _flac_subframe_arrays(blk: np.ndarray, bits: int,
                          assign: str) -> list:
    """[(samples, sample_bits)] per subframe under one stereo
    decorrelation (side channels carry bits+1 — all four lossless)."""
    if assign == "indep":
        return [(blk[:, ch], bits) for ch in range(blk.shape[1])]
    if assign == "left_side":
        return [(blk[:, 0], bits), (blk[:, 0] - blk[:, 1], bits + 1)]
    if assign == "right_side":
        return [(blk[:, 0] - blk[:, 1], bits + 1), (blk[:, 1], bits)]
    return [((blk[:, 0] + blk[:, 1]) >> 1, bits),       # mid_side
            (blk[:, 0] - blk[:, 1], bits + 1)]


def encode_flac(samples: np.ndarray, sample_rate: int,
                bits: int = 16, assign: str = "indep",
                use_lpc: bool = False) -> bytes:
    """FLAC writer: ``samples`` is (n,) or (n, channels<=2) integers
    within the ``bits``-bit signed range (8 or 16).  Per 4096-sample
    frame and channel the encoder picks constant / best fixed order
    0-4 by rice cost / verbatim, rice parameter by exact cost
    minimization; with ``use_lpc=True`` it additionally tries general
    LPC subframes (Hann-windowed autocorrelation -> Levinson-Durbin ->
    precision-15 quantization, orders up to 12) and keeps whichever
    coding is cheapest — still bit-exact lossless, since the residual
    is computed with the same quantized integer arithmetic the decoder
    inverts.  ``use_lpc`` defaults off so the oracled fixed-subset
    streams (flac_roundtrip) keep the r9 coding.  ``assign`` selects
    the stereo decorrelation ("indep", "left_side", "right_side",
    "mid_side" — side channels carry bits+1, all lossless) or
    ``"auto"`` (r10): PER FRAME, all four candidates' exact subframe
    bit costs are summed and the cheapest assignment is written into
    that frame's header — the libFLAC behavior, legal because the
    assignment is a frame-header field (not STREAMINFO) and the
    decoder already reads it per frame.  Bit-exact round trip with
    ``decode_flac``; STREAMINFO carries the raw-audio MD5 the decoder
    verifies.  n==0 emits a
    frameless stream (STREAMINFO total 0 + empty-audio MD5) rather
    than a padding frame (r9 ADVICE)."""
    import hashlib

    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or not 1 <= s.shape[1] <= 2:
        raise ValueError(f"unsupported FLAC channel shape {s.shape}")
    if bits not in (8, 16):
        raise ValueError(f"unsupported FLAC bit depth {bits}")
    if assign not in ("indep", "left_side", "right_side", "mid_side",
                      "auto"):
        raise ValueError(f"unknown FLAC channel assignment {assign!r}")
    if assign not in ("indep", "auto") and s.shape[1] != 2:
        raise ValueError("stereo decorrelation needs 2 channels")
    if assign == "auto" and s.shape[1] == 1:
        assign = "indep"                 # auto on mono is independent
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    s = s.astype(np.int64)
    if s.size and (s.min() < lo or s.max() > hi):
        raise ValueError(f"samples exceed the {bits}-bit signed range")
    n, channels = s.shape

    # raw-audio MD5: interleaved little-endian at the declared width
    inter = s.astype({8: np.int8, 16: "<i2"}[bits]).tobytes()
    md5 = hashlib.md5(inter).digest()

    si = _FlacBitWriter()
    si.write(_FLAC_BLOCK, 16)
    si.write(_FLAC_BLOCK, 16)
    si.write(0, 24)                      # min frame size unknown
    si.write(0, 24)                      # max frame size unknown
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    streaminfo = bytes(si.out) + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, len(streaminfo)])   # last-block, type 0
    out += streaminfo

    ch_codes = {"indep": channels - 1, "left_side": 0b1000,
                "right_side": 0b1001, "mid_side": 0b1010}
    candidates = (("indep", "left_side", "right_side", "mid_side")
                  if assign == "auto" else (assign,))
    # n == 0: no frames at all — the decoder's unknown/zero-total loop
    # decodes nothing and the MD5 over empty audio matches (r9 ADVICE:
    # the old 1-sample padding frame made empty payloads dead-letter)
    for fidx in range((n + _FLAC_BLOCK - 1) // _FLAC_BLOCK):
        blk = s[fidx * _FLAC_BLOCK:(fidx + 1) * _FLAC_BLOCK]
        bs = blk.shape[0]
        full = bs == _FLAC_BLOCK

        best = None                # (total_bits, assign, [(x, sb, plan)])
        for a in candidates:
            planned, cost = [], 0
            for x, sb in _flac_subframe_arrays(blk, bits, a):
                c, plan = _flac_plan_subframe(x, sb, use_lpc)
                planned.append((x, sb, plan))
                cost += c
            if best is None or cost < best[0]:
                best = (cost, a, planned)
        _, frame_assign, planned = best

        hdr = bytearray(b"\xff\xf8")
        hdr.append(((0b1100 if full else 0b0111) << 4) | 0b0000)
        hdr.append(ch_codes[frame_assign] << 4
                   | ({8: 0b001, 16: 0b100}[bits] << 1))
        hdr += _flac_utf8(fidx)
        if not full:
            hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))

        w = _FlacBitWriter()
        for x, sb, plan in planned:
            _flac_write_subframe(w, x, sb, plan)
        w.align()
        frame = bytes(hdr) + bytes(w.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


#: frame-header lookup tables (the subset the encoder emits plus the
#: spec codes a foreign fixed-subset stream could carry)
_FLAC_BS_CODE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                 **{n: 256 << (n - 8) for n in range(8, 16)}}
_FLAC_SSIZE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def _flac_read_residual(r: "_FlacBitReader", bs: int,
                        order: int) -> list[int]:
    """Rice-coded residual section shared by the fixed and LPC
    subframe types: 2-bit method (4-/5-bit params), 4-bit partition
    order, escape partitions, first partition short by ``order``
    warmup samples."""
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    porder = r.read(4)
    res: list[int] = []
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("FLAC partition order mismatch")
    for p in range(nparts):
        cnt = bs // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC partition underflow")
        k = r.read(pbits)
        if k == esc:
            raw = r.read(5)
            res += [r.read_signed(raw) if raw else 0
                    for _ in range(cnt)]
        else:
            for _ in range(cnt):
                u = (r.read_unary() << k) | r.read(k)
                res.append(u >> 1 if u & 1 == 0
                           else -((u + 1) >> 1))
    return res


def decode_flac(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, samples[n, channels] int32) from a FLAC
    stream — the ``decode_wav`` contract.  Subframe coverage: constant
    / verbatim / fixed 0-4 / general LPC order 1-32 (4-bit quantized
    precision, signed shift, signed coefficients — the libFLAC/ffmpeg
    default coding), rice partitions (any partition order), wasted
    bits, all four channel assignments.  CRC-8/CRC-16/MD5 mismatches
    raise ValueError (dead-letter contract)."""
    import hashlib

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(payload):       # metadata block walk
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated FLAC metadata block")
        if hdr & 0x7F == 0:
            streaminfo = body
        pos += 4 + size
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing FLAC STREAMINFO")
    r = _FlacBitReader(streaminfo)
    r.read(16)                           # min blocksize
    r.read(16)                           # max blocksize
    r.read(24)
    r.read(24)
    rate = r.read(20)
    channels = r.read(3) + 1
    bits = r.read(5) + 1
    total = r.read(36)
    md5 = streaminfo[18:34]

    chans: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    # STREAMINFO total_samples == 0 means UNKNOWN (a streaming
    # encoder): decode frames until the payload ends instead of
    # treating the stream as empty (r9 review)
    known_total = total > 0
    while (got < total) if known_total else (pos + 2 <= len(payload)):
        if pos + 2 > len(payload):
            raise ValueError("truncated FLAC stream")
        if payload[pos] != 0xFF or payload[pos + 1] & 0xFC != 0xF8:
            raise ValueError("lost FLAC frame sync")
        fstart = pos
        r = _FlacBitReader(payload, pos + 2)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)                        # reserved
        _flac_read_utf8(r)               # frame/sample number
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code in _FLAC_BS_CODE:
            bs = _FLAC_BS_CODE[bs_code]
        else:
            raise ValueError(f"reserved FLAC block size code {bs_code}")
        # codes 0b0001-0b1011 are fixed spec rates (no trailing bytes);
        # only the uncommon-rate codes carry a rate field after the
        # frame number: 8-bit kHz / 16-bit Hz / 16-bit daHz (r9 review:
        # the trailing bytes were misattached to the fixed codes)
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid FLAC sample rate code")
        ssize = bits if ss_code == 0 else _FLAC_SSIZE.get(ss_code)
        if ssize is None:
            raise ValueError(f"reserved FLAC sample size code {ss_code}")
        r.align()
        crc_pos = r.byte                 # CRC-8 byte follows the header
        if crc_pos >= len(payload) \
                or _crc8(payload[fstart:crc_pos]) != payload[crc_pos]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        r.byte = crc_pos + 1

        if ch_code < 8:
            nch, assign = ch_code + 1, "indep"
        elif ch_code == 0b1000:
            nch, assign = 2, "left_side"
        elif ch_code == 0b1001:
            nch, assign = 2, "right_side"
        elif ch_code == 0b1010:
            nch, assign = 2, "mid_side"
        else:
            raise ValueError(f"reserved FLAC channel code {ch_code}")
        if nch != channels:
            raise ValueError("FLAC frame channel count != STREAMINFO")

        sub = []
        for ch in range(nch):
            # side channels carry one extra bit of precision
            sb = ssize + (1 if (assign == "left_side" and ch == 1)
                          or (assign == "right_side" and ch == 0)
                          or (assign == "mid_side" and ch == 1) else 0)
            if r.read(1):
                raise ValueError("bad FLAC subframe padding bit")
            stype = r.read(6)
            wasted = 0
            if r.read(1):                # wasted-bits flag
                wasted = 1 + r.read_unary()
                sb -= wasted
            if stype == 0b000000:        # constant
                x = np.full(bs, r.read_signed(sb), np.int64)
            elif stype == 0b000001:      # verbatim
                x = np.array([r.read_signed(sb) for _ in range(bs)],
                             np.int64)
            elif 0b001000 <= stype <= 0b001100:     # fixed order 0-4
                order = stype & 0x7
                warm = [r.read_signed(sb) for _ in range(order)]
                res = _flac_read_residual(r, bs, order)
                if order:
                    coef = [int(c) for c in _FLAC_FIXED[order]]
                    xs = [int(v) for v in warm]
                    for v in res:
                        acc = int(v)
                        for j in range(order):
                            acc += coef[j] * xs[-1 - j]
                        xs.append(acc)
                    x = np.array(xs, np.int64)
                else:
                    x = np.array(res, np.int64)
            elif stype >= 0b100000:                 # LPC order 1-32
                order = (stype & 0x1F) + 1
                if order > bs:
                    raise ValueError("FLAC LPC order exceeds block size")
                warm = [r.read_signed(sb) for _ in range(order)]
                prec = r.read(4)
                if prec == 0b1111:
                    raise ValueError("invalid FLAC LPC precision code")
                prec += 1
                shift = r.read_signed(5)
                if shift < 0:      # spec: negative shifts are reserved
                    raise ValueError("negative FLAC LPC shift")
                coefs = [r.read_signed(prec) for _ in range(order)]
                res = _flac_read_residual(r, bs, order)
                # spec prediction: residual + (sum(qcoef*history) >>
                # shift), exact integers, ARITHMETIC right shift
                # (python // floor semantics on negatives)
                xs = [int(v) for v in warm]
                for v in res:
                    acc = 0
                    for j in range(order):
                        acc += coefs[j] * xs[-1 - j]
                    xs.append(int(v) + (acc >> shift))
                x = np.array(xs, np.int64)
            else:
                raise ValueError(f"reserved FLAC subframe type {stype}")
            if wasted:
                x = x << wasted
            sub.append(x)

        if assign == "left_side":                # [L, side=L-R]
            sub = [sub[0], sub[0] - sub[1]]
        elif assign == "right_side":             # [side=L-R, R]
            sub = [sub[1] + sub[0], sub[1]]
        elif assign == "mid_side":               # [mid=(L+R)>>1, side]
            mid, side = sub
            lr_sum = (mid << 1) | (side & 1)     # restore the mid LSB
            sub = [(lr_sum + side) >> 1, (lr_sum - side) >> 1]
        r.align()
        if _crc16(payload[fstart:r.byte]) != int.from_bytes(
                payload[r.byte:r.byte + 2], "big"):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.byte + 2
        for ch in range(channels):
            chans[ch].extend(int(v) for v in sub[ch])
        got += bs

    trim = total if known_total else got
    out = np.stack([np.array(c[:trim], np.int64)
                    for c in chans], axis=1).astype(np.int32)
    if md5 != b"\x00" * 16:
        # the spec MD5 covers ceil(bits/8)-byte little-endian samples
        # (r9 review: 12-bit packs 2 bytes, 20/24-bit pack 3)
        nb = (bits + 7) // 8
        if nb == 1:
            inter = out.astype(np.int8).tobytes()
        elif nb == 2:
            inter = out.astype("<i2").tobytes()
        else:
            inter = out.astype("<i4").tobytes()
            inter = bytes(b for i, b in enumerate(inter) if i % 4 < 3)
        if hashlib.md5(inter).digest() != md5:
            raise ValueError("FLAC MD5 signature mismatch")
    return rate, channels, out


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


# ------------------------------------------------------------------ PNG
#
# Pure stdlib-zlib + numpy implementation of the public PNG spec
# (RFC 2083 / https://www.w3.org/TR/png-3/): chunk walk with CRC
# verification, zlib inflate, per-scanline unfiltering (None/Sub/Up/
# Average/Paeth).  Coverage: bit depths 8 and 16 (big-endian
# samples), color types 0 (gray), 2 (RGB), 3 (palette), 4
# (gray+alpha), 6 (RGBA), sequential and Adam7-interlaced rasters
# (r8).  Sub-byte depths raise NotImplementedError with the exact gap
# named (the gated-loader standard).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec 4.5.9)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """PNG writer: (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA —
    uint8 (depth 8) or uint16 (depth 16, big-endian samples).  Filter
    0 on every scanline (decoders must accept any per-row filter, so
    the simplest legal stream round-trips); ``interlace`` emits the
    seven Adam7 passes instead of the sequential raster."""
    import zlib

    a = np.asarray(img)
    if a.dtype == np.uint16:
        depth = 16
    else:
        a = a.astype(np.uint8)
        depth = 8
    a = np.ascontiguousarray(a)
    if a.ndim == 2:
        color_type = 0
        a3 = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
        a3 = a
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type = 6
        a3 = a
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]

    def rows_bytes(sub: np.ndarray) -> bytes:
        # (ph, pw, ch) -> filter-0 scanlines, big-endian samples
        ph = sub.shape[0]
        if depth == 16:
            flat = sub.astype(">u2").reshape(ph, -1).view(np.uint8)
        else:
            flat = sub.reshape(ph, -1)
        return b"".join(b"\x00" + flat[y].tobytes() for y in range(ph))

    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = a3[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(rows_bytes(sub))
        raw = b"".join(parts)
    else:
        raw = rows_bytes(a3)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters.  Up is vectorized; Sub/
    Average/Paeth carry a sequential dependency along x, so those rows
    loop (spec-exact; per-row cost only on streams that use them)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, offset=off + 1).copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256 per spec
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
            out[y] = line
        elif f == 3:  # Average
            p = prev.astype(np.int32)
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((a + int(p[x])) >> 1)) & 0xFF
            out[y] = line
        elif f == 4:  # Paeth
            p = prev.astype(np.int32)
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                c = int(p[x - bpp]) if x >= bpp else 0
                b = int(p[x])
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"invalid PNG filter type {f}")
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Image array from a PNG: (h, w) for grayscale, (h, w, 3) for
    RGB/palette, (h, w, 2)/(h, w, 4) with alpha — uint8 for depth 8,
    uint16 for depth 16; sequential and Adam7-interlaced rasters both
    decode.  Chunk CRCs are verified (malformed input raises
    ValueError, the dead-letter contract); sub-byte depths raise
    NotImplementedError naming the gap."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth} not supported "
                                  "(8/16-bit only; sub-byte depths are "
                                  "palette-era streams)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    if color_type == 3 and depth != 8:
        raise ValueError("palette PNG requires bit depth <= 8")
    channels = _PNG_CHANNELS[color_type]
    bytes_per = depth // 8
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e

    bpp = channels * bytes_per

    def to_samples(grid: np.ndarray, ph: int, pw: int) -> np.ndarray:
        # byte grid (ph, pw*bpp) -> sample grid (ph, pw, channels)
        if depth == 16:  # big-endian sample pairs
            g = grid.reshape(ph, pw * channels, 2).astype(np.uint16)
            return ((g[:, :, 0] << 8) | g[:, :, 1]).reshape(
                ph, pw, channels)
        return grid.reshape(ph, pw, channels)

    if interlace == 1:
        # Adam7: seven independently-filtered sub-images, scattered
        # back onto the full raster (empty passes carry no bytes)
        out = np.zeros((h, w, channels),
                       dtype=np.uint16 if depth == 16 else np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            grid = _png_unfilter(raw[pos:pos + need], ph, stride, bpp)
            pos += need
            out[y0::dy, x0::dx] = to_samples(grid, ph, pw)
        if pos != len(raw):
            raise ValueError("PNG pixel data length mismatch "
                             f"(got {len(raw)}, Adam7 needs {pos})")
        samples = out
    else:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch "
                             f"(got {len(raw)}, need {h * (stride + 1)})")
        grid = _png_unfilter(raw, h, stride, bpp)
        samples = to_samples(grid, h, w)

    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = samples.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        if trns is not None:      # palette alpha: RGBA out (r8)
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:min(len(trns), len(plte))] = trns[:len(plte)]
            return np.dstack([plte[idx], alpha[idx]])   # (h, w, 4)
        return plte[idx]          # (h, w, 3)
    if trns is not None and color_type in (0, 2):
        pass  # color-key transparency carried in metadata, not pixels
    return samples[:, :, 0] if channels == 1 else samples


# ----------------------------------------------------------------- TIFF
#
# Baseline TIFF 6.0 (the public Adobe spec): II/MM byte orders, first
# IFD walk, 8-bit gray (photometric 0/1) and RGB, chunky planar
# config, strip assembly, Compression 1 (none) and 32773 (PackBits).
# Tiled / LZW / JPEG-in-TIFF and 16-bit raise NotImplementedError
# naming the gap; malformed input raises ValueError (the dead-letter
# contract).  The encoder writes II or MM so the decoder's both-order
# paths round-trip in-sandbox.


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n == 128:                      # noop
            continue
        if n < 128:                       # n+1 literal bytes
            out += data[i:i + n + 1]
            i += n + 1
        else:                             # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated TIFF PackBits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) < expect:
        raise ValueError("truncated TIFF PackBits data")
    return bytes(out[:expect])


def _packbits_encode(row: bytes) -> bytes:
    """Simple spec-legal PackBits: runs of >= 3 as replicate packets,
    everything else literal."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (i - lit_start) < 128:
            run = 1
            while i + run < n and row[i + run] == row[i] and run < 128:
                run += 1
            if run >= 3:
                break
            i += run
        chunk = row[lit_start:i][:128]
        i = lit_start + len(chunk)
        out += bytes([len(chunk) - 1]) + chunk
    return bytes(out)


def encode_tiff(img: np.ndarray, packbits: bool = False,
                big_endian: bool = False) -> bytes:
    """Baseline TIFF writer: (h, w) gray or (h, w, 3) RGB uint8, one
    strip per row when PackBits else one strip, II or MM byte order."""
    a = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    e = ">" if big_endian else "<"
    rows = a.reshape(h, -1)
    if packbits:
        strips = [_packbits_encode(rows[y].tobytes()) for y in range(h)]
        rows_per_strip = 1
    else:
        strips = [a.tobytes()]
        rows_per_strip = h

    # layout: header(8) + IFD + [bits-per-sample array] + strip data
    tags = []  # (tag, type, count, value-or-bytes)
    def short(v):
        return (3, 1, v)

    tags.append((256, *short(w)))
    tags.append((257, *short(h)))
    if spp == 3:
        tags.append((258, 3, 3, None))    # needs external array
    else:
        tags.append((258, *short(8)))
    tags.append((259, *short(32773 if packbits else 1)))
    tags.append((262, *short(1 if gray else 2)))
    tags.append((273, 4, len(strips), None))
    tags.append((277, *short(spp)))
    tags.append((278, *short(rows_per_strip)))
    tags.append((279, 4, len(strips), None))

    n_tags = len(tags)
    ifd_size = 2 + 12 * n_tags + 4
    pos = 8 + ifd_size
    extra = bytearray()
    ext_off = {}
    if spp == 3:
        ext_off[258] = pos + len(extra)
        extra += struct.pack(e + "HHH", 8, 8, 8)
    counts = [len(s) for s in strips]
    if len(strips) > 1:
        ext_off[279] = pos + len(extra)
        extra += b"".join(struct.pack(e + "I", c) for c in counts)
        ext_off[273] = pos + len(extra)
        data_start = pos + len(extra) + 4 * len(strips)
        offs, run = [], data_start
        for c in counts:
            offs.append(run)
            run += c
        extra += b"".join(struct.pack(e + "I", o) for o in offs)
    else:
        data_start = pos + len(extra)

    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    out += struct.pack(e + "I", 8)
    out += struct.pack(e + "H", n_tags)
    for tag, typ, cnt, val in sorted(tags):
        if tag == 273:
            v = data_start if len(strips) == 1 else ext_off[273]
        elif tag == 279:
            v = counts[0] if len(strips) == 1 else ext_off[279]
        elif tag == 258 and spp == 3:
            v = ext_off[258]
        else:
            v = val
        if typ == 3 and cnt == 1:
            # SHORT value is left-justified in the 4-byte field
            vbytes = struct.pack(e + "HH", v, 0)
        else:
            vbytes = struct.pack(e + "I", v)
        out += struct.pack(e + "HHI", tag, typ, cnt) + vbytes
    out += struct.pack(e + "I", 0)        # no next IFD
    out += extra
    out += b"".join(strips)
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """uint8 array from a baseline TIFF: (h, w) gray (photometric 0
    inverted per spec) or (h, w, 3) RGB; II/MM, strips, Compression
    1/PackBits.  Tiles, LZW/JPEG compression and non-8-bit samples
    raise NotImplementedError naming the gap."""
    if payload[:4] == b"II\x2a\x00":
        e = "<"
    elif payload[:4] == b"MM\x00\x2a":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (n_tags,) = struct.unpack(e + "H", payload[ifd_off:ifd_off + 2])
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    tags = {}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack(e + "HHI", payload[off:off + 8])
        if typ not in type_size:
            continue                      # RATIONAL etc: not needed
        total = type_size[typ] * cnt
        if total <= 4:
            body = payload[off + 8:off + 8 + total]
        else:
            (voff,) = struct.unpack(e + "I", payload[off + 8:off + 12])
            body = payload[voff:voff + total]
            if len(body) != total:
                raise ValueError("truncated TIFF tag value")
        tags[tag] = list(struct.unpack(e + str(cnt) + type_fmt[typ], body))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if w == 0 or h == 0:
        raise ValueError("zero-dimension TIFF")
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    comp = one(259, 1)
    photo = one(262, 1)
    planar = one(284, 1)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} "
                                  "(8-bit only)")
    if planar != 1:
        raise NotImplementedError("planar TIFF not supported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF not supported")
    if comp not in (1, 32773):
        raise NotImplementedError(f"TIFF compression {comp} "
                                  "(none/PackBits only)")
    if photo not in (0, 1, 2) or spp not in (1, 3):
        raise NotImplementedError(
            f"TIFF photometric {photo} x {spp} samples not supported")
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(278, h)
    raw = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        strip = payload[o:o + c]
        if len(strip) != c:
            raise ValueError("truncated TIFF strip")
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        if comp == 32773:
            raw += _packbits_decode(strip, nrows * w * spp)
        else:
            raw += strip
    if len(raw) < h * w * spp:
        raise ValueError("TIFF pixel data ended early")
    arr = np.frombuffer(bytes(raw[:h * w * spp]), np.uint8)
    img = arr.reshape(h, w, spp)
    if photo == 0:                        # white-is-zero: invert
        img = 255 - img
    return img[:, :, 0] if spp == 1 else img


# ------------------------------------------------------------------ GIF
#
# GIF87a/89a (the public W3C/CompuServe spec): logical screen
# descriptor, global/local color tables, LZW-compressed image data in
# sub-blocks, optional Adam-style 4-pass interlacing, 89a extension
# blocks skipped.  Decodes the FIRST image frame to (h, w, 3) RGB —
# the crawl-pipeline contract (animation frames are a metadata
# concern; sampling them is `media_frame_sample`'s job).  The encoder
# writes a real variable-code-width LZW stream so round trips are
# testable in-sandbox, same standard as the other codecs.


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> bytearray:
    """GIF-flavor LZW: variable code width starting at
    ``min_code_size + 1``, CLEAR and EOI codes, width grows AFTER the
    table fills a width (max 12 bits).  Returns index bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: GIF packs codes LSB-first
    acc = nbits = pos = 0

    def read(width):
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    def reset_table():
        return ({i: bytes([i]) for i in range(clear)}, clear + 2,
                min_code_size + 1)

    table, next_code, width = reset_table()
    prev = None
    while len(out) < npix:
        code = read(width)
        if code is None:
            raise ValueError("truncated GIF LZW stream")
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("invalid GIF LZW code")
        elif code in table:
            entry = table[code]
        elif code == next_code:          # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError("invalid GIF LZW code")
        out += entry
        if prev is not None:
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        prev = entry
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW writer (the decoder's exact inverse): emits
    CLEAR first, grows code width when the next code would not fit,
    re-CLEARs at table 4096, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def write(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset():
        return ({bytes([i]): i for i in range(clear)}, clear + 2,
                min_code_size + 1)

    table, next_code, width = reset()
    write(clear, width)
    cur = b""
    for bch in indices:
        nxt = cur + bytes([bch])
        if nxt in table:
            cur = nxt
            continue
        write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            write(clear, width)
            table, next_code, width = reset()
        cur = bytes([bch])
    if cur:
        write(table[cur], width)
    write(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


#: GIF 4-pass interlace row schedule: (start row, step)
_GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def encode_gif(rgb: np.ndarray, interlace: bool = False) -> bytes:
    """GIF87a writer for an (h, w, 3) uint8 image with at most 256
    distinct colors (GIF is palette-indexed; more raises ValueError —
    quantization is a modeling choice, not a codec concern)."""
    a = np.asarray(rgb, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <= 256 distinct colors, "
                         f"got {len(palette)}")
    # color table size: power of two >= max(2, len(palette))
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    table = np.zeros((1 << bits, 3), np.uint8)
    table[:len(palette)] = palette
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = [r for s, st in _GIF_INTERLACE for r in range(s, h, st)]
        idx = idx[rows]
    min_code = max(2, bits)
    lzw = _lzw_encode(idx.tobytes(), min_code)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4)
                       | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"," + struct.pack("<HHHHB", 0, 0, w, h,
                              0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00;"                       # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 from the FIRST frame of a GIF87a/89a
    stream: LZW decode, palette lookup, 4-pass de-interlacing;
    89a extension blocks (graphics control, comments, application)
    are skipped.  Malformed input raises ValueError."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            np.uint8).reshape(-1, 3)
        if len(gct) != n:
            raise ValueError("truncated GIF color table")
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:                     # trailer
            break
        if b == 0x21:                     # 89a extension: skip blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        if pos + 10 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB",
                                               payload[pos + 1:pos + 10])
        pos += 10
        table = gct
        if iflags & 0x80:                 # local color table
            n = 2 << (iflags & 0x07)
            body = payload[pos:pos + 3 * n]
            if len(body) != 3 * n:
                raise ValueError("truncated GIF local color table")
            table = np.frombuffer(body, np.uint8).reshape(-1, 3)
            if len(table) != n:
                raise ValueError("truncated GIF local color table")
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        if iw == 0 or ih == 0:
            raise ValueError("zero-dimension GIF frame")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        pos += 1
        # spec maximum is 8 (256-color palettes); 9-11 would reach the
        # LZW table reset with roots >= 256 and die on a misleading
        # bytes() range error instead of this named gap (ADVICE r8)
        if not 2 <= min_code <= 8:
            raise ValueError(f"invalid GIF LZW code size {min_code}")
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(data), min_code, iw * ih),
                            np.uint8)
        if len(idx) < iw * ih:
            raise ValueError("GIF LZW data ended early")
        idx = idx[:iw * ih].reshape(ih, iw)
        if iflags & 0x40:                 # de-interlace (4 passes)
            rows = [r for s, st in _GIF_INTERLACE for r in range(s, ih, st)]
            grid = np.empty_like(idx)
            grid[rows] = idx
            idx = grid
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF palette index out of range")
        return table[idx]                 # first frame only
    raise ValueError("GIF stream has no image frame")


# ------------------------------------------------------------ dispatch

def sniff_format(payload: bytes) -> str:
    """Magic-byte container detection for the decode stages."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        return "tiff"
    return "unknown"


def decode_image_real(payload: bytes) -> np.ndarray:
    """Decode BMP/PPM/PNG/JPEG (baseline + progressive) for real — no
    media libraries.  Arithmetic/lossless JPEG raises
    NotImplementedError from ``decode_jpeg`` naming the gap."""
    fmt = sniff_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "jpeg":
        return decode_jpeg(payload)
    if fmt == "gif":
        return decode_gif(payload)
    if fmt == "tiff":
        return decode_tiff(payload)
    raise ValueError(f"unrecognized image container ({fmt})")


# ----------------------------------------------------------------- JPEG
#
# JFIF (ITU-T T.81 / ISO 10918-1, public spec): huffman entropy
# coding with the Annex K tables, zigzag, dequantize, batched numpy
# IDCT, chroma upsampling, YCbCr->RGB.  Same "real codec" standard as
# the PNG path: the encoders exist so round trips are testable
# in-sandbox (no JPEG files ship in the container); baseline (SOF0/1),
# progressive (SOF2), arithmetic-coded (SOF9 sequential, SOF10
# progressive — Annex D QM-coder) and lossless (SOF3, Annex H DPCM)
# frames all decode; hierarchical/differential frames are DESCOPED
# (SURVEY §8) and raise NotImplementedError saying so; malformed
# streams raise ValueError (the dead-letter contract).

_ZIGZAG = []
for _s in range(15):
    _rs = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (reversed(_rs) if _s % 2 == 0 else _rs):
        _ZIGZAG.append((_r, _s - _r))
_ZZ_ROW = np.array([r for r, c in _ZIGZAG])
_ZZ_COL = np.array([c for r, c in _ZIGZAG])

#: Annex K quantization tables (luminance, chrominance)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
_QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int32).reshape(8, 8)

#: Annex K huffman specs: (BITS[1..16], HUFFVAL)
_HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                   list(range(12)))
_HUFF_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HUFF_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0] /= np.sqrt(2.0)
    return c


_DCT_C = _dct_matrix()


_HUFF_CANON_MEMO: dict = {}


def _huff_canonical(bits, vals):
    """(symbol -> (code, length)) canonical huffman assignment —
    memoized: the encoder builds the same four Annex K tables for
    every image."""
    key = (tuple(bits), tuple(vals))
    hit = _HUFF_CANON_MEMO.get(key)
    if hit is not None:
        return hit
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    _HUFF_CANON_MEMO[key] = out
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:           # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _encode_block(zz: np.ndarray, dc_pred: int, dc_tbl, ac_tbl,
                  w: _BitWriter) -> int:
    """Huffman-encode one zigzagged quantized block; returns new DC."""
    diff = int(zz[0]) - dc_pred
    size = int(diff).bit_length() if diff else 0
    code, ln = dc_tbl[size]
    w.write(code, ln)
    if size:
        w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tbl[0xF0]      # ZRL
            w.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_tbl[(run << 4) | size]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, ln = ac_tbl[0x00]          # EOB
        w.write(code, ln)
    return int(zz[0])


def _jpeg_quantized_planes(img: np.ndarray, subsampling: str):
    """Shared front half of the baseline and progressive encoders:
    color transform, subsampling, MCU-grid padding, batch DCT and
    deterministic round-half-up quantization.  Returns
    (zz_planes, samp, comp_q, mcus_x, mcus_y, h, w) with zz_planes[i]
    of shape (bh, bw, 64) in zigzag order."""
    a = np.asarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    if subsampling not in ("444", "422", "420"):
        raise ValueError(f"subsampling must be '444', '422' or '420', "
                         f"got {subsampling!r}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("zero-dimension image")

    if gray:
        planes = [a.astype(np.float64) - 128.0]
        qts = [_QT_LUMA]
        comp_q = [0]
        samp = [(1, 1)]
    else:
        rgb = a.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168735892 * rgb[..., 0] \
            - 0.331264108 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418687589 * rgb[..., 1] \
            - 0.081312411 * rgb[..., 2]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [_QT_LUMA, _QT_CHROMA, _QT_CHROMA]
        comp_q = [0, 1, 1]
        samp = {"420": [(2, 2), (1, 1), (1, 1)],
                "422": [(2, 1), (1, 1), (1, 1)],
                "444": [(1, 1)] * 3}[subsampling]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # per component: subsample, pad with edge replication to the MCU
    # grid, batch-DCT every 8x8 block
    zz_planes = []
    for p, qt, (hi, vi) in zip(planes, qts, samp):
        if (hi, vi) != (hmax, vmax):
            # 2x2 mean downsample (pad full-res to even dims first)
            fy, fx = vmax // vi, hmax // hi
            pe = np.pad(p, ((0, (-p.shape[0]) % fy), (0, (-p.shape[1]) % fx)),
                        mode="edge")
            p = pe.reshape(pe.shape[0] // fy, fy,
                           pe.shape[1] // fx, fx).mean(axis=(1, 3))
        bh, bw = mcus_y * vi, mcus_x * hi
        pad = np.pad(p, ((0, bh * 8 - p.shape[0]),
                         (0, bw * 8 - p.shape[1])), mode="edge")
        blocks = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,nmxy,vy->nmuv", _DCT_C, blocks, _DCT_C)
        # 6-dp pre-round: mathematically-integer coefficients (e.g. the
        # DC of a constant block) must not fall on the wrong side of
        # floor(x + .5) from float cosine error — keeps the constant-
        # tile closed form exact for the oracle
        q = np.floor(np.round(coef, 6) / qt + 0.5).astype(np.int32)
        zz_planes.append(q[:, :, _ZZ_ROW, _ZZ_COL])   # (bh, bw, 64)
    return zz_planes, samp, comp_q, mcus_x, mcus_y, h, w


def _jpeg_header(h, w, samp, comp_q, sof_marker: int,
                 restart_interval: int, ac_tables=None) -> bytes:
    """SOI..tables..SOFn header shared by both encoders.
    ``ac_tables`` is a list of (table id, (bits, vals)); defaults to
    the Annex K luma/chroma pair."""
    ncomp = len(samp)
    sof_comps = b"".join(
        bytes([i + 1, samp[i][0] << 4 | samp[i][1], comp_q[i]])
        for i in range(ncomp))
    out = (b"\xff\xd8"                                   # SOI
           + _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
           + _seg(0xFFDB, bytes([0]) + bytes(
               _QT_LUMA[_ZZ_ROW, _ZZ_COL].astype(np.uint8))))
    if ncomp == 3:
        out += _seg(0xFFDB, bytes([1]) + bytes(
            _QT_CHROMA[_ZZ_ROW, _ZZ_COL].astype(np.uint8)))
    out += _seg(sof_marker,
                struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    out += _seg(0xFFC4, _dht_body(0, 0, _HUFF_DC_LUMA))
    if ncomp == 3:
        out += _seg(0xFFC4, _dht_body(0, 1, _HUFF_DC_CHROMA))
    if ac_tables is None:
        ac_tables = [(0, _HUFF_AC_LUMA)]
        if ncomp == 3:
            ac_tables.append((1, _HUFF_AC_CHROMA))
    for tid, spec in ac_tables:
        out += _seg(0xFFC4, _dht_body(1, tid, spec))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    return out


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _dht_body(cls: int, tid: int, spec) -> bytes:
    bits, vals = spec
    return bytes([cls << 4 | tid] + bits + vals)


def encode_jpeg(img: np.ndarray, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF writer: (h, w) gray or (h, w, 3) RGB uint8,
    Annex K tables, ``subsampling`` "444" (one block per component
    per MCU), "422" (horizontal-only 2x chroma) or "420" (2x2 luma
    blocks + 2x2-averaged chroma — the dominant layout of real crawl
    JPEGs), optional ``restart_interval``
    (DRI segment + RSTn markers every N MCUs with DC-predictor
    resets).  Deterministic: quantization rounds half-up
    (``floor(x + 0.5)``), so the decode of a CONSTANT gray tile has
    the closed form ``clip(2*floor((v-128)/2 + .5) + 128)`` — the
    oracle hook for ``jpeg_roundtrip``."""
    zz_planes, samp, comp_q, mcus_x, mcus_y, h, w = \
        _jpeg_quantized_planes(img, subsampling)
    planes = zz_planes
    dc_tbls = [_huff_canonical(*_HUFF_DC_LUMA),
               _huff_canonical(*_HUFF_DC_CHROMA)]
    ac_tbls = [_huff_canonical(*_HUFF_AC_LUMA),
               _huff_canonical(*_HUFF_AC_CHROMA)]

    scan_parts = []
    wtr = _BitWriter()
    dc_pred = [0] * len(planes)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_index
                    and mcu_index % restart_interval == 0):
                scan_parts.append(wtr.flush())
                scan_parts.append(bytes(
                    [0xFF, 0xD0 + (mcu_index // restart_interval - 1) % 8]))
                wtr = _BitWriter()
                dc_pred = [0] * len(planes)
            for ci, (hi, vi) in enumerate(samp):
                t = comp_q[ci] and 1
                for by in range(vi):
                    for bx in range(hi):
                        dc_pred[ci] = _encode_block(
                            zz_planes[ci][my * vi + by, mx * hi + bx],
                            dc_pred[ci], dc_tbls[t], ac_tbls[t], wtr)
            mcu_index += 1
    scan_parts.append(wtr.flush())
    scan = b"".join(scan_parts)

    ncomp = len(planes)
    sos_comps = b"".join(
        bytes([i + 1, (comp_q[i] and 1) * 0x11]) for i in range(ncomp))
    out = _jpeg_header(h, w, samp, comp_q, 0xFFC0, restart_interval)
    out += _seg(0xFFDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00")
    return out + scan + b"\xff\xd9"                      # EOI


#: (bits, vals) -> (symbol list[65536], code-length list[65536]) —
#: 16-bit-lookahead huffman LUTs, memoized because nearly every crawl
#: JPEG ships the same four Annex K tables.  Plain python lists: scalar
#: list indexing is ~3x faster than numpy scalar indexing in the
#: per-symbol decode loop.
_HUFF_LUT_MEMO: dict = {}


def _huff_lut(bits, vals) -> tuple:
    """LUT huffman decoder tables: ``sym[lookahead16]`` is the decoded
    symbol and ``ln[lookahead16]`` the bits it consumes (0 = invalid
    code).  Replaces bit-at-a-time tree walking with one table read
    per symbol — the flat-LUT shape every fast JPEG decoder uses."""
    key = (tuple(bits), tuple(vals))
    hit = _HUFF_LUT_MEMO.get(key)
    if hit is not None:
        return hit
    sym = [0] * 65536
    ln = [0] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = [vals[k]] * (hi - lo)
            ln[lo:hi] = [length] * (hi - lo)
            code += 1
            k += 1
        code <<= 1
    _HUFF_LUT_MEMO[key] = (sym, ln)
    return sym, ln


#: lookahead tables at or below this many bit positions materialize as a
#: plain python list (scalar list indexing is ~3x faster than numpy in
#: the per-symbol loop); ABOVE it the numpy array is kept and indexed
#: via ``.item`` — a python-int list costs ~36 B per BIT of segment
#: (~290x the segment size in transient memory), so a multi-MB scan
#: segment must never take the list path.  1<<20 bits = 128 KB of
#: segment = ~36 MB transient list, the worst case the fast path allows.
_VAL16_LIST_MAX_BITS = 1 << 20


def _segment_val16(seg: bytes) -> tuple:
    """(getter, bit count) for one entropy-coded (destuffed) segment:
    ``get(p)`` is the next 16 bits starting at bit ``p`` as a python
    int, zero-padded past the end — computed in 16 vectorized
    shift-adds, so the per-symbol decode loop does no bit twiddling at
    all.  Small segments bind ``list.__getitem__`` (fastest scalar
    read); large ones bind ``ndarray.item`` so transient memory stays
    ~4 B/bit instead of ~36 (ADVICE r6).  The pad is sized so a
    malformed stream that runs past the end keeps reading zeros for at
    least one whole block's worth of symbols before the per-block
    overrun check fires (64 symbols x at most 32 bits each)."""
    b = np.unpackbits(np.frombuffer(seg, np.uint8))
    nbits = b.size
    pad = 64 * 32 + 16
    ext = np.concatenate([b, np.zeros(pad, np.uint8)]).astype(np.uint32)
    v = np.zeros(nbits + pad - 16, np.uint32)
    for i in range(16):
        v += ext[i:i + v.size] << (15 - i)
    if v.size <= _VAL16_LIST_MAX_BITS:
        return v.tolist().__getitem__, nbits
    return v.item, nbits


def decode_jpeg(payload: bytes) -> np.ndarray:
    """uint8 array from a JFIF stream: (h, w) for one component,
    (h, w, 3) RGB otherwise.  Supports baseline sequential (SOF0/1)
    AND progressive (SOF2, Annex G) AND arithmetic-coded (SOF9
    sequential, SOF10 progressive — Annex D QM-coder + DAC
    conditioning) AND lossless (SOF3, Annex H DPCM) frames, multiple
    DQT/DHT segments, 8-bit quant tables, restart intervals, and any
    1-2x sampling factors (4:4:4 / 4:2:2 / 4:2:0 — chroma is
    replicated on upsample).  Hierarchical/differential frames raise
    NotImplementedError naming the gap; malformed input raises
    ValueError (dead-letter contract).

    Reference anchor: payloads ride Beam pipelines as opaque bytes
    (sdks/java/core/.../coders/ByteArrayCoder.java); the decode itself
    implements the public T.81 spec."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, tuple] = {}
    dac: dict[tuple, object] = {}
    frame = None
    progressive = False
    arithmetic = False
    lossless = False
    restart = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes —
        # skip them instead of misreading 0xFF as the marker code
        while payload[pos + 1] == 0xFF:
            pos += 1
            if pos + 4 > len(payload):
                raise ValueError("truncated JPEG segment")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                      # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq == 0:
                    tbl = np.frombuffer(
                        body[b + 1:b + 65], np.uint8).astype(np.int32)
                    b += 65
                else:
                    tbl = np.frombuffer(
                        body[b + 1:b + 129], ">u2").astype(np.int32)
                    b += 129
                full = np.zeros((8, 8), np.int32)
                full[_ZZ_ROW, _ZZ_COL] = tbl
                qt[tq] = full
        elif marker == 0xC4:                    # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                huff[(tc, th)] = _huff_lut(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/1 baseline, SOF2 progressive, SOF3 lossless,
            # SOF9/10 arithmetic
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = (fh, fw, comps)
            progressive = marker in (0xC2, 0xCA)
            arithmetic = marker in (0xC9, 0xCA)
            lossless = marker == 0xC3
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"hierarchical/differential JPEG frame (SOF marker "
                f"0xFF{marker:02X}) — DESCOPED (SURVEY §8: effectively "
                f"extinct in real corpora; dead-letter these payloads)")
        elif marker == 0xCC:                    # DAC conditioning
            if len(body) % 2:
                raise ValueError("malformed DAC segment length")
            b = 0
            while b < len(body):
                tc, tb = body[b] >> 4, body[b] & 0xF
                cs = body[b + 1]
                if tc == 0:
                    dl, du = cs & 0xF, cs >> 4
                    if dl > du:
                        raise ValueError("invalid DAC DC conditioning"
                                         f" (L={dl} > U={du})")
                    dac[(0, tb)] = (dl, du)
                else:
                    if not 1 <= cs <= 63:
                        raise ValueError(f"invalid DAC AC Kx {cs}")
                    dac[(1, tb)] = cs
                b += 2
        elif marker == 0xDD:                    # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                    # SOS -> entropy data
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if progressive:
                # hand the WHOLE scan sequence (this SOS onward) to
                # the Annex G loop; tables/DRI may change between scans
                return _decode_progressive(payload, pos, frame, qt,
                                           huff, [restart],
                                           arithmetic=arithmetic,
                                           dac=dac)
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i:3 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0xF)
            scan_start = pos + 2 + ln
            if lossless:
                ss_sel = body[1 + 2 * ns]
                al_pt = body[3 + 2 * ns] & 0xF
                if not 1 <= ss_sel <= 7:
                    raise ValueError(
                        f"invalid lossless predictor {ss_sel}")
                luts = {}
                for cs, (td, _ta) in sel.items():
                    t = huff.get((0, td))
                    if t is None:
                        raise ValueError(
                            "JPEG scan references missing table")
                    luts[cs] = t
                return _decode_scan_lossless(payload, scan_start,
                                             frame, luts, ss_sel, al_pt)
            if arithmetic:
                return _decode_scan_arith(payload, scan_start, frame,
                                          sel, qt, dac, restart)
            return _decode_scan(payload, scan_start, frame, sel, qt,
                                huff, restart)
        pos += 2 + ln
    raise ValueError("JPEG stream has no scan data")


def _decode_scan(payload, pos, frame, sel, qt, huff, restart):
    """Entropy decode + dequant + IDCT.  The per-symbol loop is LUT-
    driven (``_huff_lut``: one list read per symbol instead of a
    bit-at-a-time tree walk) over precomputed 16-bit lookaheads
    (``_segment_val16``: one vectorized pass per restart segment), and
    ALL heavy math — inverse zigzag, dequantization, IDCT — runs as
    whole-image numpy batches after the scan, so the python loop
    touches only the variable-length symbol stream it cannot
    vectorize (VERDICT r5 item 6: ~5x on the 500-doc roundtrip)."""
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise NotImplementedError("sampling factors beyond 2x")
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    # split entropy data on RST/terminating markers, destuff 0xFF00,
    # skip 0xFF fill bytes (T.81 B.1.1.2 allows them before any marker)
    segments, cur = [], bytearray()
    while pos < len(payload):
        b = payload[pos]
        if b == 0xFF:
            nxt = payload[pos + 1] if pos + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                pos += 2
                continue
            if nxt == 0xFF:                     # fill byte
                pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:             # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                pos += 2
                continue
            break                               # EOI or next segment
        cur.append(b)
        pos += 1
    segments.append(bytes(cur))

    # per component: zigzag coefficient rows, one per 8x8 block, filled
    # by the scan loop and dequantized/IDCT'd in one batch afterwards
    per_comp = []
    for c in comps:
        if c["id"] not in sel:
            raise ValueError("scan references unknown component")
        td, ta = sel[c["id"]]
        dtab, atab = huff.get((0, td)), huff.get((1, ta))
        q = qt.get(c["tq"])
        if dtab is None or atab is None or q is None:
            raise ValueError("JPEG scan references missing table")
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        per_comp.append({
            "zz": [[0] * 64 for _ in range(bh * bw)],
            "bw": bw, "bh": bh, "q": q,
            "w": (fw * c["h"] + hmax - 1) // hmax,
            "h": (fh * c["v"] + vmax - 1) // vmax,
            "dsym": dtab[0], "dlen": dtab[1],
            "asym": atab[0], "alen": atab[1],
        })

    mcu_index = 0
    seg_i = 0
    val16, nbits = _segment_val16(segments[0])
    bpos = 0
    dc_pred = [0] * len(comps)
    n_mcus = mcus_x * mcus_y
    while mcu_index < n_mcus:
        if restart and mcu_index and mcu_index % restart == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing JPEG restart segment")
            val16, nbits = _segment_val16(segments[seg_i])
            bpos = 0
            dc_pred = [0] * len(comps)
        my, mx = divmod(mcu_index, mcus_x)
        for ci, c in enumerate(comps):
            pc = per_comp[ci]
            dsym, dlen = pc["dsym"], pc["dlen"]
            asym, alen = pc["asym"], pc["alen"]
            zz_rows, bw = pc["zz"], pc["bw"]
            dc = dc_pred[ci]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    idx = val16(bpos)
                    ln = dlen[idx]
                    if not ln:
                        raise ValueError("invalid JPEG huffman code")
                    size = dsym[idx]
                    bpos += ln
                    if size:
                        v = val16(bpos) >> (16 - size)
                        bpos += size
                        dc += v if v >= (1 << (size - 1)) \
                            else v - (1 << size) + 1
                    zz = zz_rows[(my * c["v"] + by) * bw + mx * c["h"] + bx]
                    zz[0] = dc
                    k = 1
                    while k < 64:
                        idx = val16(bpos)
                        ln = alen[idx]
                        if not ln:
                            raise ValueError("invalid JPEG huffman code")
                        rs = asym[idx]
                        bpos += ln
                        if rs == 0x00:          # EOB
                            break
                        if rs == 0xF0:          # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        sz = rs & 0xF
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        if sz:
                            v = val16(bpos) >> (16 - sz)
                            bpos += sz
                            zz[k] = v if v >= (1 << (sz - 1)) \
                                else v - (1 << sz) + 1
                        k += 1
                    if bpos > nbits:
                        raise ValueError("truncated JPEG entropy stream")
            dc_pred[ci] = dc
        mcu_index += 1

    return _coef_to_pixels(fh, fw, hmax, vmax, comps, per_comp)


def _coef_to_pixels(fh, fw, hmax, vmax, comps, per_comp) -> np.ndarray:
    """Batch inverse zigzag + dequant + IDCT + upsample + color —
    the shared back half of the sequential and progressive decoders.
    Each per_comp entry carries zz (nblocks x 64 rows), bh/bw (block
    grid), q (8x8 quant table) and h/w (visible component dims)."""
    planes = []
    for ci, c in enumerate(comps):
        pc = per_comp[ci]
        bh, bw = pc["bh"], pc["bw"]
        # batch inverse zigzag + dequant + IDCT over every block at once
        zz = np.asarray(pc["zz"], np.float64)            # (nblocks, 64)
        blk = np.zeros((bh * bw, 8, 8), np.float64)
        blk[:, _ZZ_ROW, _ZZ_COL] = zz
        coef = (blk * pc["q"]).reshape(bh, bw, 8, 8)
        sp = np.einsum("xu,nmuv,yv->nmxy", _DCT_C.T.copy(),
                       coef, _DCT_C.T.copy())
        img = sp.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        img = img[:pc["h"], :pc["w"]]
        img = np.repeat(np.repeat(img, vmax // c["v"], axis=0),
                        hmax // c["h"], axis=1)
        planes.append(img[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Lossless JPEG (T.81 SOF3, Annex H, r9): per-sample DPCM with the
# seven spec predictors + huffman coding of difference categories —
# no DCT, no quantization, BIT-exact round trips.  The scan header
# reuses Ss as the predictor selector and Al as the point transform
# (H.1); modulo-65536 difference arithmetic per H.1.2.1.  8-bit
# precision, non-subsampled components (the overwhelmingly common
# lossless configuration); other precisions raise the named gap.
# ---------------------------------------------------------------------------


def _lossless_predict(a: int, b: int, c: int, sel: int) -> int:
    """T.81 Table H.1 predictors (a=left, b=above, c=above-left)."""
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1                  # sel == 7


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 4,
                         point_transform: int = 0) -> bytes:
    """Lossless JFIF writer (T.81 SOF3): (h, w) gray or (h, w, 3) RGB
    uint8 — components are coded DIRECTLY (no color transform, no
    subsampling, no quantization), so ``decode_jpeg`` returns the
    exact input pixels.  ``predictor`` selects Table H.1 (1-7);
    ``point_transform`` (Al) drops that many low bits before
    prediction — the one deliberately lossy knob, with the exact
    closed form ``(v >> Al) << Al`` on decode."""
    a = np.asarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"lossless predictor must be 1-7, got {predictor}")
    if not 0 <= point_transform <= 7:
        raise ValueError(f"point transform must be 0-7, got "
                         f"{point_transform}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("zero-dimension image")
    planes = [a.astype(np.int64)] if gray else \
        [a[..., i].astype(np.int64) for i in range(3)]
    al = point_transform
    planes = [p >> al for p in planes]
    ncomp = len(planes)

    out = (b"\xff\xd8"
           + _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    sof_comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    out += _seg(0xFFC3, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    out += _seg(0xFFC4, _dht_body(0, 0, _HUFF_DC_LUMA))
    sos_comps = b"".join(bytes([i + 1, 0]) for i in range(ncomp))
    out += _seg(0xFFDA, bytes([ncomp]) + sos_comps
                + bytes([predictor, 0, al]))

    tbl = _huff_canonical(*_HUFF_DC_LUMA)
    wtr = _BitWriter()
    default = 1 << (8 - 1 - al)          # H.1.2.2 initial prediction
    for y in range(h):
        for x in range(w):
            for p in planes:
                v = int(p[y, x])
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(p[0, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, 0])
                else:
                    pred = _lossless_predict(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]), predictor)
                diff = (v - pred) & 0xFFFF          # modulo 65536
                if diff >= 0x8000:
                    diff -= 0x10000
                size = abs(diff).bit_length()
                code, ln = tbl[size]
                wtr.write(code, ln)
                if size:
                    wtr.write(diff if diff > 0
                              else diff + (1 << size) - 1, size)
    return out + wtr.flush() + b"\xff\xd9"


def _decode_scan_lossless(payload, pos, frame, sel, predictor, al):
    """Annex H lossless scan decode: huffman difference categories per
    sample, Table H.1 prediction with the first-row/column fallbacks,
    modulo-65536 reconstruction, ``<< Al`` output scaling."""
    fh, fw, comps = frame
    if not all(c["h"] == 1 and c["v"] == 1 for c in comps):
        raise NotImplementedError("subsampled lossless JPEG")
    huffs = []
    for c in comps:
        t = sel.get(c["id"])
        if t is None:
            raise ValueError("scan references unknown component")
        huffs.append(t)
    segments, _ = _split_entropy(payload, pos)
    if len(segments) != 1:
        raise NotImplementedError("lossless JPEG restart intervals")
    val16, nbits = _segment_val16(segments[0])
    bpos = 0
    planes = [np.zeros((fh, fw), np.int64) for _ in comps]
    default = 1 << (8 - 1 - al)
    for y in range(fh):
        for x in range(fw):
            for ci, p in enumerate(planes):
                dsym, dlen = huffs[ci]
                idx = val16(bpos)
                ln = dlen[idx]
                if not ln:
                    raise ValueError("invalid JPEG huffman code")
                size = dsym[idx]
                bpos += ln
                diff = 0
                if size:
                    v = val16(bpos) >> (16 - size)
                    bpos += size
                    diff = v if v >= (1 << (size - 1)) \
                        else v - (1 << size) + 1
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(p[0, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, 0])
                else:
                    pred = _lossless_predict(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]), predictor)
                p[y, x] = (pred + diff) & 0xFFFF
            if bpos > nbits:
                raise ValueError("truncated JPEG entropy stream")
    planes = [np.clip(p << al, 0, 255).astype(np.uint8) for p in planes]
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    return np.stack(planes, axis=-1)


# ---------------------------------------------------------------------------
# Arithmetic-coded JPEG (T.81 SOF9, Annexes D & F.1.4): the adaptive
# QM-coder replaces huffman as the entropy layer over the SAME
# quantized coefficients, so arithmetic round trips are bit-identical
# in pixel space to baseline round trips (pinned in tests).  The
# probability state machine is spec Table D.3; conditioning defaults
# (DC L=0/U=1, AC Kx=5) follow Table F.5 and are overridable via the
# DAC segment, which both sides implement.  0xFF bytes in the entropy
# segment are stuffed as FF 00 — the convention the huffman scans
# already use — so markers cannot be emulated and one splitter serves
# both entropy layers.  Decode-side data exhaustion feeds zero bytes
# per D.2.7 — the IN-SPEC way an arithmetic scan meets its terminating
# marker, so (unlike huffman scans) a truncated arithmetic segment
# legally decodes its final MCUs from zero data instead of raising;
# structural corruption (impossible magnitudes, AC run overflow,
# malformed DAC) still raises ValueError (dead-letter contract).
#
# VERIFICATION SCOPE (r9 review; FOREIGN fixture added r11): the
# arithmetic path is pinned by (a) hypothesis round-trips of the raw
# QM-coder, (b) cross-flavor pixel-equality fuzz vs the huffman path,
# (c) the value-oracled bench queries, and (d) a HAND-BUILT FOREIGN
# SOF9 stream (tests/test_codecs_foreign_arith.py): an independent
# encode-side implementation written from the T.81 flowcharts with
# its own Table D.3 copy, exercising a non-default DAC segment
# (L=2/U=4/Kx=3 on non-zero table ids), restart-cadence stat/coder
# resets, unsuppressed flush bytes and a stacked-0xFF-carry
# trajectory, decoded bit-exact against spec-derived pixels (plus a
# guard proving the DAC conditioning is load-bearing).  Remaining
# unverified foreign shapes are those genuinely outside T.81's
# sequential/progressive arithmetic profile for 8-bit frames (e.g.
# 12-bit precision raises NotImplementedError above) — no in-scope
# conditioning path is now pinned only against this repo's encoder.
# ---------------------------------------------------------------------------

#: T.81 Table D.3: (Qe, next-index-LPS, next-index-MPS, switch-MPS)
#: per estimation state; index 113 is the NON-adaptive ~0.5 bin the
#: F.1.4 model uses for AC sign decisions (Table F.5 note).
_QM_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),          # 113: fixed ~0.5, never adapts
)

#: statistics-bin byte layout: MPS sense in bit 7, Table D.3 index in
#: bits 0-6 (so "estimate after LPS with switch" is one XOR)
_QM_NL = [(nl | (sw << 7)) for _, nl, _, sw in _QM_TAB]
_QM_NM = [nm for _, _, nm, _ in _QM_TAB]
_QM_QE = [qe for qe, _, _, _ in _QM_TAB]

#: F.1.4 statistics areas: 64 DC bins (S0/SS/SP/SN per context class +
#: X/M ladders at 20/34) and 256 AC bins (3 per k + the two magnitude
#: ladders at 189/217) per conditioning table
_DC_STAT_BINS = 64
_AC_STAT_BINS = 256
_FIXED_BIN = 113 << 0               # index 113, MPS 0, never updated


class _QMEncoder:
    """Annex D QM-coder, encode side: 16-bit interval register A,
    code register C with 11-bit byte-out countdown, stacked-0xFF
    carry resolution, trailing-zero suppression, FF 00 stuffing."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buf = -1               # buffered byte a carry may still bump
        self.sc = 0                 # stacked 0xFF bytes
        self.zc = 0                 # pending 0x00 bytes (drop if trailing)
        self.out = bytearray()

    def _flush_zc(self):
        while self.zc:
            self.out.append(0)
            self.zc -= 1

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            # carry ripples into the buffered byte; stacked 0xFFs
            # become 0x00s (D.1.6)
            if self.buf >= 0:
                self._flush_zc()
                self.out.append(self.buf + 1)
                if self.buf + 1 == 0xFF:
                    self.out.append(0)
            self.zc += self.sc
            self.sc = 0
            self.buf = t & 0xFF
        elif t == 0xFF:
            self.sc += 1            # may still be bumped by a carry
        else:
            if self.buf == 0:
                self.zc += 1
            elif self.buf >= 0:
                self._flush_zc()
                self.out.append(self.buf)
            if self.sc:
                self._flush_zc()
                while self.sc:
                    self.out += b"\xff\x00"
                    self.sc -= 1
            self.buf = t
        self.c &= 0x7FFFF
        self.ct += 8

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        idx = sv & 0x7F
        qe = _QM_QE[idx]
        self.a -= qe
        if bit != (sv >> 7):
            # LPS; conditional exchange when the MPS interval shrank
            # below Qe (D.1.4)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) ^ _QM_NL[idx]
        else:
            if self.a >= 0x8000:
                return              # MPS with no renormalization
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) | _QM_NM[idx]
        while True:                 # RENORME (D.1.6)
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a >= 0x8000:
                break

    def flush(self) -> bytes:
        """D.1.8 termination: pick the code point with the most
        trailing zeros, emit what remains (trailing zeros dropped)."""
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:     # one final carry
            if self.buf >= 0:
                self._flush_zc()
                self.out.append(self.buf + 1)
                if self.buf + 1 == 0xFF:
                    self.out.append(0)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buf == 0:
                self.zc += 1
            elif self.buf >= 0:
                self._flush_zc()
                self.out.append(self.buf)
            if self.sc:
                self._flush_zc()
                while self.sc:
                    self.out += b"\xff\x00"
                    self.sc -= 1
        if self.c & 0x7FFF800:
            self._flush_zc()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0)
        return bytes(self.out)


class _QMDecoder:
    """Annex D QM-coder, decode side, over one destuffed entropy
    segment; a segment that runs dry feeds zero bytes (D.2.7 — the
    legal way an arithmetic scan meets its terminating marker)."""

    def __init__(self, seg: bytes):
        self.seg = seg
        self.p = 0
        self.c = 0
        self.a = 0
        self.ct = -16               # two initial bytes still to load

    def decode(self, st: bytearray, i: int) -> int:
        # renormalization & data input (D.2.6)
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                b = self.seg[self.p] if self.p < len(self.seg) else 0
                self.p += 1
                self.c = ((self.c << 8) | b) & 0xFFFFFFFF
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        self.a = 0x8000   # -> 0x10000 after the shift
            self.a <<= 1
        sv = st[i]
        idx = sv & 0x7F
        qe = _QM_QE[idx]
        self.a -= qe
        t = (self.a << self.ct) & 0xFFFFFFFF
        if self.c >= t:
            self.c -= t
            # upper subinterval: LPS unless conditionally exchanged
            if self.a < qe:
                self.a = qe
                st[i] = (sv & 0x80) | _QM_NM[idx]
            else:
                self.a = qe
                st[i] = (sv & 0x80) ^ _QM_NL[idx]
                sv ^= 0x80
        elif self.a < 0x8000:
            # lower subinterval needing renorm: MPS unless exchanged
            if self.a < qe:
                st[i] = (sv & 0x80) ^ _QM_NL[idx]
                sv ^= 0x80
            else:
                st[i] = (sv & 0x80) | _QM_NM[idx]
        return sv >> 7


def _arith_enc_dc(enc, dc_st, v: int, dc_pred: int, dc_ctx: list,
                  ci: int, dc_l: int, dc_u: int) -> int:
    """F.1.4.1 DC model, encode side: the difference ``v - dc_pred``
    under the 5-class previous-diff conditioning.  ``v`` is the
    (already point-transformed, for progressive scans) DC value;
    returns it as the new predictor."""
    diff = v - dc_pred
    st = dc_ctx[ci]
    if diff == 0:
        enc.encode(dc_st, st, 0)
        dc_ctx[ci] = 0
        return v
    enc.encode(dc_st, st, 1)
    if diff > 0:
        enc.encode(dc_st, st + 1, 0)
        st += 2                             # SP
        sign = 0
    else:
        diff = -diff
        enc.encode(dc_st, st + 1, 1)
        st += 3                             # SN
        sign = 1
    m = 0
    diff -= 1
    if diff:
        enc.encode(dc_st, st, 1)
        m = 1
        st = 20                             # X1 ladder
        v2 = diff
        while v2 >> 1:
            v2 >>= 1
            enc.encode(dc_st, st, 1)
            m <<= 1
            st += 1
    enc.encode(dc_st, st, 0)
    if m < (1 << dc_l) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << dc_u) >> 1:
        dc_ctx[ci] = 12 + 4 * sign          # large diff class
    else:
        dc_ctx[ci] = 4 + 4 * sign           # small diff class
    st += 14                                # M ladder
    while m >> 1:
        m >>= 1
        enc.encode(dc_st, st, 1 if (m & diff) else 0)
    return v


def _arith_dec_dc(dec, dc_st, dc_pred: int, dc_ctx: list, ci: int,
                  dc_l: int, dc_u: int) -> int:
    """Decode-side mirror of ``_arith_enc_dc``; returns the new
    (point-transformed) predictor."""
    st = dc_ctx[ci]
    if dec.decode(dc_st, st) == 0:
        dc_ctx[ci] = 0
        return dc_pred
    sign = dec.decode(dc_st, st + 1)
    st += 2 + sign
    m = dec.decode(dc_st, st)
    if m:
        st = 20
        while dec.decode(dc_st, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("corrupt arithmetic JPEG (DC)")
            st += 1
    if m < (1 << dc_l) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << dc_u) >> 1:
        dc_ctx[ci] = 12 + 4 * sign
    else:
        dc_ctx[ci] = 4 + 4 * sign
    v = m
    st += 14
    while m >> 1:
        m >>= 1
        if dec.decode(dc_st, st):
            v |= m
    v += 1
    return dc_pred + (-v if sign else v)


def _mag_shift(x: int, s: int) -> int:
    """Sign-magnitude point transform (T.81 G.1.2.1 for AC): shift the
    MAGNITUDE, keep the sign."""
    return -((-x) >> s) if x < 0 else x >> s


def _arith_enc_ac(enc, ac_st, fixed_st, zz, ss: int, se: int, al: int,
                  kx: int) -> None:
    """F.1.4.2 AC model over band [ss, se] at point transform ``al``
    (sequential scans are ss=1, se=63, al=0): per-k EOB decision, zero
    runs, fixed-bin sign, magnitude category + bits with the Kx ladder
    split."""
    ke = se
    while ke >= ss and _mag_shift(int(zz[ke]), al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ac_st, st, 0)                # not yet EOB
        while _mag_shift(int(zz[k]), al) == 0:
            enc.encode(ac_st, st + 1, 0)
            st += 3
            k += 1
        enc.encode(ac_st, st + 1, 1)
        v = _mag_shift(int(zz[k]), al)
        if v > 0:
            enc.encode(fixed_st, 0, 0)
        else:
            v = -v
            enc.encode(fixed_st, 0, 1)
        st += 2
        m = 0
        v -= 1
        if v:
            enc.encode(ac_st, st, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                enc.encode(ac_st, st, 1)
                m <<= 1
                v2 >>= 1
                st = 189 if k <= kx else 217    # X2 ladders
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(ac_st, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(ac_st, st, 0)
        st += 14
        while m >> 1:
            m >>= 1
            enc.encode(ac_st, st, 1 if (m & v) else 0)
        k += 1
    if k <= se:
        enc.encode(ac_st, 3 * (k - 1), 1)       # EOB decision


def _arith_dec_ac(dec, ac_st, fixed_st, zz, ss: int, se: int, al: int,
                  kx: int) -> None:
    """Decode-side mirror of ``_arith_enc_ac`` (F.2.4.2); decoded
    values land scaled back by ``<< al``."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(ac_st, st):
            break                               # EOB
        while dec.decode(ac_st, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic JPEG (AC run)")
        sign = dec.decode(fixed_st, 0)
        st += 2
        m = dec.decode(ac_st, st)
        if m:
            if dec.decode(ac_st, st):
                m <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(ac_st, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("corrupt arithmetic JPEG (AC)")
                    st += 1
        v = m
        st += 14
        while m >> 1:
            m >>= 1
            if dec.decode(ac_st, st):
                v |= m
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _arith_enc_ac_refine(enc, ac_st, fixed_st, zz, ss: int, se: int,
                         ah: int, al: int) -> None:
    """G.1.3.3 AC successive-approximation refinement, encode side:
    per coefficient either a correction bit (previously nonzero at
    precision ``ah``), a newly-nonzero insertion (+ fixed-bin sign),
    or a zero decision; EOB decisions only beyond the PREVIOUS scan's
    end-of-block index."""
    ke = se
    while ke >= ss and _mag_shift(int(zz[ke]), al) == 0:
        ke -= 1
    kex = se
    while kex >= ss and _mag_shift(int(zz[kex]), ah) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(ac_st, st, 0)            # not yet EOB
        while True:
            x = int(zz[k])
            t = (-x if x < 0 else x) >> al      # magnitude this scan
            if t:
                if t >> 1:                      # previously nonzero
                    enc.encode(ac_st, st + 2, t & 1)
                else:                           # newly nonzero
                    enc.encode(ac_st, st + 1, 1)
                    enc.encode(fixed_st, 0, 1 if x < 0 else 0)
                break
            enc.encode(ac_st, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(ac_st, 3 * (k - 1), 1)       # EOB decision


def _arith_dec_ac_refine(dec, ac_st, fixed_st, zz, ss: int, se: int,
                         al: int) -> None:
    """Decode-side mirror of ``_arith_enc_ac_refine`` (G.2.3): the
    previous-scan EOB index is recovered from the ACCUMULATED
    coefficients, so no side channel is needed."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex >= ss and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(ac_st, st):
                break                           # EOB
        while True:
            if zz[k]:
                if dec.decode(ac_st, st + 2):
                    zz[k] += p1 if zz[k] >= 0 else m1
                break
            if dec.decode(ac_st, st + 1):
                zz[k] = m1 if dec.decode(fixed_st, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic JPEG (AC refine)")
        k += 1


def _arith_encode_block(enc, dc_st, ac_st, fixed_st, zz, dc_pred: int,
                        dc_ctx: list, ci: int, dc_l: int, dc_u: int,
                        ac_kx: int) -> int:
    """F.1.4 SEQUENTIAL statistical model, encode side — the
    progressive primitives composed at full precision (DC + the whole
    1..63 band at al=0).  Returns the new DC value."""
    dc = _arith_enc_dc(enc, dc_st, int(zz[0]), dc_pred, dc_ctx, ci,
                       dc_l, dc_u)
    _arith_enc_ac(enc, ac_st, fixed_st, zz, 1, 63, 0, ac_kx)
    return dc


def _arith_decode_block(dec, dc_st, ac_st, fixed_st, zz, dc_pred: int,
                        dc_ctx: list, ci: int, dc_l: int, dc_u: int,
                        ac_kx: int) -> int:
    """Decode-side mirror of ``_arith_encode_block`` (F.2.4.1-2)."""
    dc = _arith_dec_dc(dec, dc_st, dc_pred, dc_ctx, ci, dc_l, dc_u)
    zz[0] = dc
    _arith_dec_ac(dec, ac_st, fixed_st, zz, 1, 63, 0, ac_kx)
    return dc


def encode_jpeg_arith(img: np.ndarray, subsampling: str = "444",
                      restart_interval: int = 0) -> bytes:
    """Arithmetic-coded JFIF writer (T.81 SOF9): the baseline
    encoder's quantized coefficients entropy-coded with the Annex D
    QM-coder under the F.1.4 sequential model — so decode output is
    pixel-identical to the huffman baseline's (pinned in
    tests/test_codecs.py), including the constant-tile closed form
    the `jpeg_arith_roundtrip` oracle uses.  Emits an explicit DAC
    segment with the Table F.5 defaults (DC L=0/U=1, AC Kx=5) so the
    decoder's conditioning parser is exercised; ``restart_interval``
    adds DRI + RSTn markers with full coder/statistics/DC resets."""
    zz_planes, samp, comp_q, mcus_x, mcus_y, h, w = \
        _jpeg_quantized_planes(img, subsampling)
    ncomp = len(zz_planes)

    out = (b"\xff\xd8"
           + _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
           + _seg(0xFFDB, bytes([0]) + bytes(
               _QT_LUMA[_ZZ_ROW, _ZZ_COL].astype(np.uint8))))
    if ncomp == 3:
        out += _seg(0xFFDB, bytes([1]) + bytes(
            _QT_CHROMA[_ZZ_ROW, _ZZ_COL].astype(np.uint8)))
    sof_comps = b"".join(
        bytes([i + 1, samp[i][0] << 4 | samp[i][1], comp_q[i]])
        for i in range(ncomp))
    out += _seg(0xFFC9, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    # DAC: Table F.5 defaults, one DC + one AC conditioning table per
    # quant-table class in use
    dac = b""
    for t in sorted(set(comp_q)):
        dac += bytes([0x00 | t, (1 << 4) | 0])   # DC: U=1, L=0
        dac += bytes([0x10 | t, 5])              # AC: Kx=5
    out += _seg(0xFFCC, dac)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos_comps = b"".join(
        bytes([i + 1, comp_q[i] * 0x11]) for i in range(ncomp))
    out += _seg(0xFFDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00")

    ntab = len(set(comp_q))

    def fresh():
        return (_QMEncoder(),
                [bytearray(_DC_STAT_BINS) for _ in range(ntab)],
                [bytearray(_AC_STAT_BINS) for _ in range(ntab)],
                bytearray([_FIXED_BIN]), [0] * ncomp, [0] * ncomp)

    enc, dc_sts, ac_sts, fixed_st, dc_ctx, dc_pred = fresh()
    scan_parts = []
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_index
                    and mcu_index % restart_interval == 0):
                scan_parts.append(enc.flush())
                scan_parts.append(bytes(
                    [0xFF, 0xD0 + (mcu_index // restart_interval - 1) % 8]))
                enc, dc_sts, ac_sts, fixed_st, dc_ctx, dc_pred = fresh()
            for ci, (hi, vi) in enumerate(samp):
                t = comp_q[ci]
                for by in range(vi):
                    for bx in range(hi):
                        dc_pred[ci] = _arith_encode_block(
                            enc, dc_sts[t], ac_sts[t], fixed_st,
                            zz_planes[ci][my * vi + by, mx * hi + bx],
                            dc_pred[ci], dc_ctx, ci, 0, 1, 5)
            mcu_index += 1
    scan_parts.append(enc.flush())
    return out + b"".join(scan_parts) + b"\xff\xd9"


def encode_jpeg_arith_progressive(img: np.ndarray,
                                  subsampling: str = "444",
                                  restart_interval: int = 0) -> bytes:
    """Arithmetic-coded PROGRESSIVE JFIF writer (T.81 SOF10): the
    huffman progressive encoder's exact scan script — interleaved DC
    first (Al=1), per-component AC bands 1-5 / 6-63 first (Al=1),
    interleaved DC refinement, per-component AC refinements — with the
    Annex D QM-coder under the G.1.3 progressive conditioning
    (F.1.4 DC/AC models on point-transformed values, fixed-bin DC
    correction bits, previous-EOB-indexed AC refinement).  Statistics
    and the coder reset per SCAN (and per restart segment), as the
    spec requires.  The quantized coefficients are the baseline
    encoder's, so decode output is pixel-identical to every other
    JPEG flavor's (the cross-flavor fuzz pin in tests)."""
    zz_planes, samp, comp_q, mcus_x, mcus_y, h, w = \
        _jpeg_quantized_planes(img, subsampling)
    ncomp = len(zz_planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = (b"\xff\xd8"
           + _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
           + _seg(0xFFDB, bytes([0]) + bytes(
               _QT_LUMA[_ZZ_ROW, _ZZ_COL].astype(np.uint8))))
    if ncomp == 3:
        out += _seg(0xFFDB, bytes([1]) + bytes(
            _QT_CHROMA[_ZZ_ROW, _ZZ_COL].astype(np.uint8)))
    sof_comps = b"".join(
        bytes([i + 1, samp[i][0] << 4 | samp[i][1], comp_q[i]])
        for i in range(ncomp))
    out += _seg(0xFFCA, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    dac = b""
    for t in sorted(set(comp_q)):
        dac += bytes([0x00 | t, (1 << 4) | 0])
        dac += bytes([0x10 | t, 5])
    out += _seg(0xFFCC, dac)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out = bytearray(out)

    def sos(comps_spec: bytes, ss: int, se: int, ah: int,
            al: int) -> bytes:
        n = len(comps_spec) // 2
        return _seg(0xFFDA, bytes([n]) + comps_spec
                    + bytes([ss, se, (ah << 4) | al]))

    def fresh():
        return (_QMEncoder(),
                [bytearray(_DC_STAT_BINS) for _ in range(2)],
                [bytearray(_AC_STAT_BINS) for _ in range(2)],
                bytearray([_FIXED_BIN]), [0] * ncomp, [0] * ncomp)

    def dc_scan(ah: int, al: int) -> bytes:
        buf = bytearray(sos(
            b"".join(bytes([i + 1, comp_q[i] << 4])
                     for i in range(ncomp)), 0, 0, ah, al))
        parts = []
        enc, dc_sts, _, fixed_st, dc_ctx, dc_pred = fresh()
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu \
                        and mcu % restart_interval == 0:
                    parts.append(enc.flush())
                    parts.append(bytes(
                        [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]))
                    enc, dc_sts, _, fixed_st, dc_ctx, dc_pred = fresh()
                for ci, (hi, vi) in enumerate(samp):
                    t = comp_q[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            v = int(zz_planes[ci][my * vi + by,
                                                  mx * hi + bx, 0])
                            if ah == 0:
                                dc_pred[ci] = _arith_enc_dc(
                                    enc, dc_sts[t], v >> al,
                                    dc_pred[ci], dc_ctx, ci, 0, 1)
                            else:
                                enc.encode(fixed_st, 0, (v >> al) & 1)
                mcu += 1
        parts.append(enc.flush())
        return bytes(buf) + b"".join(parts)

    def nblocks(ci):
        hi, vi = samp[ci]
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8, mcus_x * hi

    def ac_scan(ci, ss, se, ah, al) -> bytes:
        t = comp_q[ci]
        buf = bytearray(sos(bytes([ci + 1, t]), ss, se, ah, al))
        bh, bw, stride = nblocks(ci)
        plane = zz_planes[ci].reshape(-1, 64)
        parts = []
        enc, _, ac_sts, fixed_st, _, _ = fresh()
        blk = 0
        for by in range(bh):
            for bx in range(bw):
                if (restart_interval and blk
                        and blk % restart_interval == 0):
                    parts.append(enc.flush())
                    parts.append(bytes(
                        [0xFF, 0xD0 + (blk // restart_interval - 1) % 8]))
                    enc, _, ac_sts, fixed_st, _, _ = fresh()
                zz = plane[by * stride + bx]
                if ah == 0:
                    _arith_enc_ac(enc, ac_sts[t], fixed_st, zz,
                                  ss, se, al, 5)
                else:
                    _arith_enc_ac_refine(enc, ac_sts[t], fixed_st, zz,
                                         ss, se, ah, al)
                blk += 1
        parts.append(enc.flush())
        return bytes(buf) + b"".join(parts)

    out += dc_scan(0, 1)                         # DC first, Al=1
    for ci in range(ncomp):
        out += ac_scan(ci, 1, 5, 0, 1)
        out += ac_scan(ci, 6, 63, 0, 1)
    out += dc_scan(1, 0)                         # DC refinement
    for ci in range(ncomp):
        out += ac_scan(ci, 1, 5, 1, 0)
        out += ac_scan(ci, 6, 63, 1, 0)
    return bytes(out) + b"\xff\xd9"


def _decode_scan_arith(payload, pos, frame, sel, qt, dac, restart):
    """Arithmetic sequential scan decode: the `_decode_scan` shell
    (marker split + FF 00 destuffing are shared conventions) with the
    QM-coder + F.2.4 model replacing the huffman LUT loop; the back
    half is the shared `_coef_to_pixels`."""
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise NotImplementedError("sampling factors beyond 2x")
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    segments, cur = [], bytearray()
    while pos < len(payload):
        b = payload[pos]
        if b == 0xFF:
            nxt = payload[pos + 1] if pos + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                pos += 2
                continue
            break
        cur.append(b)
        pos += 1
    segments.append(bytes(cur))

    per_comp = []
    cond = []
    for c in comps:
        if c["id"] not in sel:
            raise ValueError("scan references unknown component")
        td, ta = sel[c["id"]]
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("JPEG scan references missing quant table")
        dl, du = dac.get((0, td), (0, 1))
        kx = dac.get((1, ta), 5)
        cond.append((td, ta, dl, du, kx))
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        per_comp.append({
            "zz": [[0] * 64 for _ in range(bh * bw)],
            "bw": bw, "bh": bh, "q": q,
            "w": (fw * c["h"] + hmax - 1) // hmax,
            "h": (fh * c["v"] + vmax - 1) // vmax,
        })

    ntab = 16                       # table ids are 4-bit

    def fresh(seg):
        return (_QMDecoder(seg),
                [bytearray(_DC_STAT_BINS) for _ in range(ntab)],
                [bytearray(_AC_STAT_BINS) for _ in range(ntab)],
                bytearray([_FIXED_BIN]), [0] * len(comps),
                [0] * len(comps))

    dec, dc_sts, ac_sts, fixed_st, dc_ctx, dc_pred = fresh(segments[0])
    seg_i = 0
    n_mcus = mcus_x * mcus_y
    mcu_index = 0
    while mcu_index < n_mcus:
        if restart and mcu_index and mcu_index % restart == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing JPEG restart segment")
            dec, dc_sts, ac_sts, fixed_st, dc_ctx, dc_pred = \
                fresh(segments[seg_i])
        my, mx = divmod(mcu_index, mcus_x)
        for ci, c in enumerate(comps):
            pc = per_comp[ci]
            td, ta, dl, du, kx = cond[ci]
            bw = pc["bw"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = pc["zz"][(my * c["v"] + by) * bw
                                  + mx * c["h"] + bx]
                    dc_pred[ci] = _arith_decode_block(
                        dec, dc_sts[td], ac_sts[ta], fixed_st, zz,
                        dc_pred[ci], dc_ctx, ci, dl, du, kx)
        mcu_index += 1
    return _coef_to_pixels(fh, fw, hmax, vmax, comps, per_comp)


# ---------------------------------------------------------------------------
# Progressive JPEG (T.81 SOF2, Annex G): spectral selection + successive
# approximation.  The encoder emits a libjpeg-style scan script (DC
# first at Al=1, per-component AC bands 1-5 / 6-63 at Al=1, then DC and
# AC refinement scans), which exercises the complete G.2 decode feature
# set — EOB-run coding, ZRL-with-correction-bits, newly-significant
# insertion — so the decoder's progressive path is pinned by exact
# roundtrip-vs-baseline tests, not just self-consistency.
# ---------------------------------------------------------------------------


#: AC huffman table for the progressive ENCODER: the Annex K baseline
#: tables define no EOBn (n>0) symbols, which progressive EOB-run
#: coding requires.  A flat 8-bit canonical table over all 176 legal
#: progressive AC symbols — EOB0..EOB14 (run<<4|0, run<15), ZRL
#: (0xF0), and run/size for size 1..10 — is valid (176*2^-8 < 1, and
#: the all-ones 8-bit code 0xFF stays unused per T.81 C.2) and costs
#: nothing we measure: test payloads, not crawl output.
_HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted([(r << 4) for r in range(15)] + [0xF0]
           + [(r << 4) | s for r in range(16) for s in range(1, 11)]))


def _flush_eobrun(w: "_BitWriter", ac_tbl, eobrun: int,
                  pending_bits: list) -> int:
    """Emit the EOBn symbol for ``eobrun`` blocks (G.1.2.3: RRRR is
    floor(log2(run)), followed by that many bits of run - 2^RRRR) and
    any buffered refinement correction bits; returns the reset run."""
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        code, ln = ac_tbl[r << 4]
        w.write(code, ln)
        if r:
            w.write(eobrun - (1 << r), r)
        for b in pending_bits:
            w.write(b, 1)
        pending_bits.clear()
    return 0


def _enc_ac_first(w, ac_tbl, zz, ss, se, al, eobrun, pending) -> int:
    """One block of an AC first scan (Ah=0): point-transformed band,
    run/size coding, trailing zeros joining the cross-block EOB run."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        v = -((-v) >> al) if v < 0 else v >> al
        if v == 0:
            r += 1
            continue
        eobrun = _flush_eobrun(w, ac_tbl, eobrun, pending)
        while r > 15:
            code, ln = ac_tbl[0xF0]
            w.write(code, ln)
            r -= 16
        size = abs(v).bit_length()
        code, ln = ac_tbl[(r << 4) | size]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        r = 0
    if r > 0:
        eobrun += 1
        if eobrun == 32767:
            eobrun = _flush_eobrun(w, ac_tbl, eobrun, pending)
    return eobrun


def _enc_ac_refine(w, ac_tbl, zz, ss, se, ah, al, eobrun,
                   pending) -> int:
    """One block of an AC refinement scan (G.1.2.3.2): history
    coefficients (nonzero at the previous precision) contribute one
    correction bit each, buffered and emitted after the next code;
    newly-significant coefficients are coded as run/1 + sign.

    Ordering mirrors libjpeg's jcphuff encode_mcu_AC_refine: the
    zero-run counts ZERO coefficients only (history coefficients are
    transparent to it), and when the run exceeds 15 at ANY nonzero
    coefficient — history or newly-significant — the needed ZRLs are
    emitted right there, each flushing only the correction bits
    buffered so far, so the decoder finds every correction bit
    interleaved inside the 16-zero span its walk covers.  ZRLs that
    would land after the block's last newly-significant coefficient
    fold into the cross-block EOB run instead (the ``k <= eob``
    guard)."""
    # index of the last NEWLY-significant coefficient in the band:
    # zero-runs past it fold into the EOB run, no ZRL needed
    eob = ss - 1
    for k in range(ss, se + 1):
        if (abs(int(zz[k])) >> al) == 1:
            eob = k
    block_bits: list = []
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            eobrun = _flush_eobrun(w, ac_tbl, eobrun, pending)
            code, ln = ac_tbl[0xF0]
            w.write(code, ln)
            r -= 16
            for b in block_bits:
                w.write(b, 1)
            block_bits = []
        if t > 1:                        # history: correction bit
            block_bits.append(t & 1)
            continue
        # newly significant at this precision (t == 1)
        eobrun = _flush_eobrun(w, ac_tbl, eobrun, pending)
        code, ln = ac_tbl[(r << 4) | 1]
        w.write(code, ln)
        w.write(1 if v > 0 else 0, 1)
        for b in block_bits:
            w.write(b, 1)
        block_bits = []
        r = 0
    if r > 0 or block_bits:
        eobrun += 1
        pending.extend(block_bits)
        if eobrun == 32767:
            eobrun = _flush_eobrun(w, ac_tbl, eobrun, pending)
    return eobrun


def encode_jpeg_progressive(img: np.ndarray, subsampling: str = "444",
                            restart_interval: int = 0) -> bytes:
    """Progressive JFIF writer (SOF2): same color/DCT/quantization
    front end as ``encode_jpeg`` — the two encoders produce IDENTICAL
    quantized coefficients, so a progressive payload decodes to
    EXACTLY the pixels of its baseline twin (the roundtrip pin in
    tests/test_codecs.py, and the same constant-tile closed form for
    the ``jpeg_progressive_roundtrip`` oracle).

    Scan script: interleaved DC first (Al=1), per-component AC bands
    1-5 and 6-63 first (Al=1), interleaved DC refinement, then
    per-component AC refinements — spectral selection AND successive
    approximation on every coefficient class.  ``restart_interval``
    (in MCUs for DC scans, blocks for the non-interleaved AC scans)
    resets DC predictors and flushes/reset EOB runs."""
    zz_planes, samp, comp_q, mcus_x, mcus_y, h, w = \
        _jpeg_quantized_planes(img, subsampling)
    ncomp = len(zz_planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    dc_tbls = [_huff_canonical(*_HUFF_DC_LUMA),
               _huff_canonical(*_HUFF_DC_CHROMA)]
    ac_prog = _huff_canonical(*_HUFF_AC_PROG)

    out = bytearray(_jpeg_header(h, w, samp, comp_q, 0xFFC2,
                                 restart_interval,
                                 ac_tables=[(0, _HUFF_AC_PROG)]))

    def sos(comps_spec: bytes, ss: int, se: int, ah: int,
            al: int) -> bytes:
        n = len(comps_spec) // 2
        return _seg(0xFFDA, bytes([n]) + comps_spec
                    + bytes([ss, se, (ah << 4) | al]))

    def rst(parts, n):
        parts.append(bytes([0xFF, 0xD0 + n % 8]))

    # ---- scan 1: DC first, interleaved, Al=1 ------------------------
    al = 1
    out += sos(b"".join(bytes([i + 1, (comp_q[i] and 1) << 4])
                        for i in range(ncomp)), 0, 0, 0, al)
    parts, wtr = [], _BitWriter()
    dc_pred = [0] * ncomp
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                parts.append(wtr.flush())
                rst(parts, mcu // restart_interval - 1)
                wtr = _BitWriter()
                dc_pred = [0] * ncomp
            for ci, (hi, vi) in enumerate(samp):
                tbl = dc_tbls[comp_q[ci] and 1]
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(zz_planes[ci][my * vi + by,
                                               mx * hi + bx, 0]) >> al
                        diff = dc - dc_pred[ci]
                        dc_pred[ci] = dc
                        size = abs(diff).bit_length()
                        code, ln = tbl[size]
                        wtr.write(code, ln)
                        if size:
                            wtr.write(diff if diff > 0
                                      else diff + (1 << size) - 1, size)
            mcu += 1
    parts.append(wtr.flush())
    out += b"".join(parts)

    # per-component non-interleaved block geometry: ceil of the
    # component's VISIBLE dims (T.81 A.2.2), not the padded MCU grid
    def nblocks(ci):
        hi, vi = samp[ci]
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8, mcus_x * hi

    def ac_scan(ci, ss, se, ah, al):
        buf = bytearray(sos(bytes([ci + 1, 0]), ss, se, ah, al))
        tbl = ac_prog
        bh, bw, stride = nblocks(ci)
        plane = zz_planes[ci].reshape(-1, 64)
        parts, wtr = [], _BitWriter()
        eobrun, pending = 0, []
        blk = 0
        for by in range(bh):
            for bx in range(bw):
                if (restart_interval and blk
                        and blk % restart_interval == 0):
                    eobrun = _flush_eobrun(wtr, tbl, eobrun, pending)
                    parts.append(wtr.flush())
                    rst(parts, blk // restart_interval - 1)
                    wtr = _BitWriter()
                zz = plane[by * stride + bx]
                if ah == 0:
                    eobrun = _enc_ac_first(wtr, tbl, zz, ss, se, al,
                                           eobrun, pending)
                else:
                    eobrun = _enc_ac_refine(wtr, tbl, zz, ss, se, ah,
                                            al, eobrun, pending)
                blk += 1
        eobrun = _flush_eobrun(wtr, tbl, eobrun, pending)
        parts.append(wtr.flush())
        return bytes(buf) + b"".join(parts)

    # ---- scans 2..: AC first, per component, two spectral bands -----
    for ci in range(ncomp):
        out += ac_scan(ci, 1, 5, 0, 1)
        out += ac_scan(ci, 6, 63, 0, 1)

    # ---- DC refinement: interleaved, raw bits, no huffman -----------
    out += sos(b"".join(bytes([i + 1, 0]) for i in range(ncomp)),
               0, 0, 1, 0)
    parts, wtr = [], _BitWriter()
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                parts.append(wtr.flush())
                rst(parts, mcu // restart_interval - 1)
                wtr = _BitWriter()
            for ci, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(zz_planes[ci][my * vi + by,
                                               mx * hi + bx, 0])
                        wtr.write(dc & 1, 1)
            mcu += 1
    parts.append(wtr.flush())
    out += b"".join(parts)

    # ---- AC refinement scans ----------------------------------------
    for ci in range(ncomp):
        out += ac_scan(ci, 1, 5, 1, 0)
        out += ac_scan(ci, 6, 63, 1, 0)

    return bytes(out) + b"\xff\xd9"


def _split_entropy(payload: bytes, pos: int):
    """Destuffed entropy segments (split on RSTn) starting at ``pos``;
    returns (segments, position of the terminating marker's 0xFF)."""
    segments, cur = [], bytearray()
    while pos < len(payload):
        b = payload[pos]
        if b == 0xFF:
            nxt = payload[pos + 1] if pos + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                pos += 2
                continue
            if nxt == 0xFF:                     # fill byte
                pos += 1
                continue
            if 0xD0 <= nxt <= 0xD7:             # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                pos += 2
                continue
            break                               # EOI or next segment
        cur.append(b)
        pos += 1
    segments.append(bytes(cur))
    return segments, pos


def _decode_progressive(payload, pos, frame, qt, huff, restart,
                        arithmetic=False, dac=None):
    """T.81 Annex G.2 progressive decode: accumulate coefficients
    across every scan (DC/AC first and refinement, interleaved or
    single-component, EOB runs, restart intervals, tables and DRI
    redefinable between scans), then reuse the sequential decoder's
    batch dequant/IDCT/upsample tail.  ``arithmetic`` (SOF10, r9)
    swaps the huffman bit reader for the QM-coder + G.1.3 progressive
    conditioning — statistics and coder reset per scan and per restart
    segment; ``dac`` carries the DAC conditioning (Table F.5 defaults
    when absent)."""
    dac = dac or {}
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise NotImplementedError("sampling factors beyond 2x")
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    per_comp = []
    for c in comps:
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        per_comp.append({
            "zz": [[0] * 64 for _ in range(bh * bw)],
            "bw": bw, "bh": bh,
            "w": (fw * c["h"] + hmax - 1) // hmax,
            "h": (fh * c["v"] + vmax - 1) // vmax,
        })

    def run_scan(sel, ss, se, ah, al, seg_start):
        segments, endpos = _split_entropy(payload, seg_start)
        scomps = [i for i, c in enumerate(comps) if c["id"] in sel]
        tabs = {}
        for i in scomps:
            td, ta = sel[comps[i]["id"]]
            if arithmetic:
                continue                         # ids = conditioning tables
            if ss == 0 and ah == 0:
                t = huff.get((0, td))
                if t is None:
                    raise ValueError("JPEG scan references missing table")
                tabs[i] = t
            elif ss > 0:
                t = huff.get((1, ta))
                if t is None:
                    raise ValueError("JPEG scan references missing table")
                tabs[i] = t

        # unit list: one entry per restart unit — an MCU's blocks when
        # interleaved, a single block (T.81 A.2.2 ceil-dims raster,
        # NOT the padded MCU grid) when non-interleaved
        interleaved = len(scomps) > 1
        units = []                       # one entry per MCU/block
        if interleaved:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    blocks = []
                    for i in scomps:
                        c = comps[i]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blocks.append((i, (my * c["v"] + by)
                                               * per_comp[i]["bw"]
                                               + mx * c["h"] + bx))
                    units.append(blocks)
        else:
            i = scomps[0]
            c = comps[i]
            cw = per_comp[i]["w"]
            ch = per_comp[i]["h"]
            bw, bh = (cw + 7) // 8, (ch + 7) // 8
            stride = per_comp[i]["bw"]
            for by in range(bh):
                for bx in range(bw):
                    units.append([(i, by * stride + bx)])

        if arithmetic:
            cond = {}
            for i in scomps:
                td, ta = sel[comps[i]["id"]]
                dl, du = dac.get((0, td), (0, 1))
                kx = dac.get((1, ta), 5)
                cond[i] = (td, ta, dl, du, kx)

            def fresh(seg):
                return (_QMDecoder(seg),
                        [bytearray(_DC_STAT_BINS) for _ in range(16)],
                        [bytearray(_AC_STAT_BINS) for _ in range(16)],
                        bytearray([_FIXED_BIN]),
                        {i: 0 for i in scomps}, [0] * len(comps))

            dec, dc_sts, ac_sts, fixed_st, dcp, dcc = fresh(segments[0])
            seg_i = 0
            for u, blocks in enumerate(units):
                if restart[0] and u and u % restart[0] == 0:
                    seg_i += 1
                    if seg_i >= len(segments):
                        raise ValueError("missing JPEG restart segment")
                    dec, dc_sts, ac_sts, fixed_st, dcp, dcc = \
                        fresh(segments[seg_i])
                for i, bidx in blocks:
                    zz = per_comp[i]["zz"][bidx]
                    td, ta, dl, du, kx = cond[i]
                    if ss == 0:
                        if ah == 0:
                            dcp[i] = _arith_dec_dc(
                                dec, dc_sts[td], dcp[i], dcc, i, dl, du)
                            zz[0] = dcp[i] << al
                        elif dec.decode(fixed_st, 0):
                            zz[0] |= 1 << al     # DC correction bit
                    elif ah == 0:
                        _arith_dec_ac(dec, ac_sts[ta], fixed_st, zz,
                                      ss, se, al, kx)
                    else:
                        _arith_dec_ac_refine(dec, ac_sts[ta], fixed_st,
                                             zz, ss, se, al)
            return endpos

        seg_i = 0
        val16, nbits = _segment_val16(segments[0])
        bpos = 0
        dc_pred = {i: 0 for i in scomps}
        eobrun = 0

        def bit():
            nonlocal bpos
            v = (val16(bpos) >> 15) & 1
            bpos += 1
            return v

        def huffsym(sym, ln_t):
            nonlocal bpos
            idx = val16(bpos)
            ln = ln_t[idx]
            if not ln:
                raise ValueError("invalid JPEG huffman code")
            bpos += ln
            return sym[idx]

        def recv_ext(s):
            nonlocal bpos
            v = val16(bpos) >> (16 - s)
            bpos += s
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

        for u, blocks in enumerate(units):
            if restart[0] and u and u % restart[0] == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                val16, nbits = _segment_val16(segments[seg_i])
                bpos = 0
                dc_pred = {i: 0 for i in scomps}
                eobrun = 0
            for i, bidx in blocks:
                zz = per_comp[i]["zz"][bidx]
                if ss == 0:                      # DC scan
                    if ah == 0:
                        sym, lnt = tabs[i]
                        size = huffsym(sym, lnt)
                        diff = recv_ext(size) if size else 0
                        dc_pred[i] += diff
                        zz[0] = dc_pred[i] << al
                    else:                        # DC refinement
                        if bit():
                            zz[0] |= 1 << al
                    continue
                # AC scans are single-component by construction
                sym, lnt = tabs[i]
                if ah == 0:                      # AC first
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = huffsym(sym, lnt)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    v = val16(bpos) >> (16 - r)
                                    bpos += r
                                    eobrun += v
                                break
                            k += 16              # ZRL
                            continue
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = recv_ext(s) << al
                        k += 1
                else:                            # AC refinement (G.2)
                    p1, m1 = 1 << al, -1 << al
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = huffsym(sym, lnt)
                            r, s = rs >> 4, rs & 0xF
                            newval = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        v = val16(bpos) >> (16 - r)
                                        bpos += r
                                        eobrun += v
                                    break
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "bad refinement magnitude")
                                newval = p1 if bit() else m1
                            while k <= se:
                                if zz[k] != 0:
                                    if bit() and (zz[k] & p1) == 0:
                                        zz[k] += p1 if zz[k] >= 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval:
                                if k > se:
                                    raise ValueError(
                                        "JPEG AC index overflow")
                                zz[k] = newval
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if zz[k] != 0:
                                if bit() and (zz[k] & p1) == 0:
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            k += 1
                        eobrun -= 1
                if bpos > nbits:
                    raise ValueError("truncated JPEG entropy stream")
        return endpos

    # ---- marker loop over the scan sequence ---------------------------
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        while payload[pos + 1] == 0xFF:          # fill bytes
            pos += 1
            if pos + 2 > len(payload):
                raise ValueError("truncated JPEG segment")
        marker = payload[pos + 1]
        if marker == 0xD9:                       # EOI
            break
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xC4:                       # DHT between scans
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                huff[(tc, th)] = _huff_lut(bits, list(
                    body[b + 17:b + 17 + n]))
                b += 17 + n
        elif marker == 0xDB:                     # DQT between scans
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq == 0:
                    tbl = np.frombuffer(
                        body[b + 1:b + 65], np.uint8).astype(np.int32)
                    b += 65
                else:
                    tbl = np.frombuffer(
                        body[b + 1:b + 129], ">u2").astype(np.int32)
                    b += 129
                full = np.zeros((8, 8), np.int32)
                full[_ZZ_ROW, _ZZ_COL] = tbl
                qt[tq] = full
        elif marker == 0xDD:                     # DRI between scans
            restart[0] = struct.unpack(">H", body[:2])[0]
        elif marker == 0xCC and arithmetic:      # DAC between scans
            if len(body) % 2:
                raise ValueError("malformed DAC segment length")
            for b in range(0, len(body), 2):
                tc, tb, cs = body[b] >> 4, body[b] & 0xF, body[b + 1]
                if tc == 0:
                    dl, du = cs & 0xF, cs >> 4
                    if dl > du:
                        raise ValueError("invalid DAC DC conditioning"
                                         f" (L={dl} > U={du})")
                    dac[(0, tb)] = (dl, du)
                else:
                    if not 1 <= cs <= 63:
                        raise ValueError(f"invalid DAC AC Kx {cs}")
                    dac[(1, tb)] = cs
        elif marker == 0xDA:                     # SOS
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i:3 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0xF)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            aa = body[3 + 2 * ns]
            if ss > 0 and ns != 1:
                raise ValueError("interleaved progressive AC scan")
            # T.81 G.1: a progressive DC scan is exactly Ss=Se=0; a
            # baseline-shaped scan header (0..63) inside an SOF2 frame
            # is malformed, not quietly DC-only
            if (ss == 0) != (se == 0) or se > 63 or ss > se:
                raise ValueError(
                    "invalid progressive spectral selection "
                    f"(Ss={ss}, Se={se})")
            pos = run_scan(sel, ss, se, aa >> 4, aa & 0xF,
                           pos + 2 + ln)
            continue
        pos += 2 + ln

    for c, pc in zip(comps, per_comp):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("JPEG frame references missing quant table")
        pc["q"] = q
    return _coef_to_pixels(fh, fw, hmax, vmax, comps, per_comp)


# ------------------------------------------------------------ AVI/MJPEG
#
# Classic AVI 1.0 RIFF container (public spec: MSDN "AVI RIFF File
# Reference" / OpenDML) carrying Motion-JPEG: every frame is an
# independent baseline JFIF image, so the REAL JPEG codec above does
# all the pixel work and the container layer is pure struct — the
# same no-media-libs standard as WAV/FLAC/PNG.  This makes the video
# modality real end-to-end (container walk + per-frame decode);
# inter-frame codecs (H.264 etc.) stay DESCOPED per SURVEY §8.

def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    """Chunk header + data + the spec's even-byte pad."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def encode_avi_mjpeg(frames: "list[np.ndarray]", fps: int = 10,
                     subsampling: str = "444") -> bytes:
    """MJPEG AVI writer: each frame ((h, w) gray or (h, w, 3) RGB
    uint8, all the same size) is JPEG-encoded (the deterministic
    baseline writer above — constant tiles keep their closed-form
    oracle) and wrapped in '00dc' chunks inside RIFF/hdrl/movi with a
    standard idx1 index (AVIIF_KEYFRAME on every frame — MJPEG has no
    inter frames)."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all AVI frames must share one size")
    jpegs = [encode_jpeg(f, subsampling=subsampling) for f in frames]
    n = len(jpegs)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max(map(len, jpegs)), w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHH8I", 0, 0, 0, 0, 1, fps, 0, n,
                          max(map(len, jpegs)), 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_chunk(b"LIST", b"hdrl"
                       + _riff_chunk(b"avih", avih)
                       + _riff_chunk(b"LIST", b"strl"
                                     + _riff_chunk(b"strh", strh)
                                     + _riff_chunk(b"strf", strf)))

    movi_body = b"movi"
    idx = b""
    for j in jpegs:
        # idx1 offsets are relative to the first byte of 'movi'
        # (the fourcc itself sits at offset 0 -> first chunk at 4)
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(j))
        movi_body += _riff_chunk(b"00dc", j)
    movi = _riff_chunk(b"LIST", movi_body)
    idx1 = _riff_chunk(b"idx1", idx)

    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_avi_mjpeg(payload: bytes) -> "tuple[float, list[np.ndarray]]":
    """MJPEG AVI reader: RIFF walk (JUNK and unknown chunks skipped,
    'rec ' groupings flattened — both appear in real interleaved
    files), strh validation, per-frame JPEG decode.  Returns
    (fps, frames).  A 'vids' stream with any non-MJPG handler raises
    NotImplementedError naming the DESCOPED gap (H.264 and other
    inter-frame codecs: no in-container oracle; decode belongs to an
    ffmpeg-equipped cluster image)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF file")

    def walk(buf, pos, end):
        """Yield (fourcc, list_type_or_None, body_start, body_end)."""
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            body = pos + 8
            if fourcc == b"LIST":
                yield fourcc, buf[body:body + 4], body + 4, body + size
            else:
                yield fourcc, None, body, body + size
            pos = body + size + (size % 2)

    fps = 0.0
    handler_ok = False
    frames: list[np.ndarray] = []

    def scan_movi(start, end):
        for fcc, lt, b0, b1 in walk(payload, start, end):
            if fcc == b"LIST" and lt == b"rec ":
                scan_movi(b0, b1)
            elif fcc[2:4] in (b"dc", b"db"):
                if payload[b0:b0 + 3] != b"\xff\xd8\xff":
                    # a real '00db' can carry an uncompressed DIB —
                    # that's a different pixel format, not MJPEG
                    raise NotImplementedError(
                        "AVI frame chunk is not a JPEG stream "
                        "(uncompressed-DIB frames are not MJPEG; "
                        "convert on an ffmpeg-equipped image)")
                frames.append(decode_jpeg(payload[b0:b1]))

    for fcc, lt, b0, b1 in walk(payload, 12, len(payload)):
        if fcc == b"LIST" and lt == b"hdrl":
            for f2, l2, c0, c1 in walk(payload, b0, b1):
                if f2 == b"avih":
                    uspf = struct.unpack_from("<I", payload, c0)[0]
                    if uspf:
                        fps = 1_000_000 / uspf
                elif f2 == b"LIST" and l2 == b"strl":
                    for f3, _, d0, d1 in walk(payload, c0, c1):
                        if f3 != b"strh":
                            continue
                        ftype = payload[d0:d0 + 4]
                        hdl = payload[d0 + 4:d0 + 8]
                        if ftype != b"vids":
                            continue
                        # MJPG plus its common fourcc aliases (dmb1 is
                        # Matrox/QuickTime MJPEG-A in AVI, MJPA the
                        # QuickTime name); zeros = unset, sniff frames.
                        if hdl.upper() not in (b"MJPG", b"DMB1", b"MJPA",
                                               b"\x00\x00\x00\x00"):
                            raise NotImplementedError(
                                f"AVI video handler {hdl!r} is not an"
                                " MJPEG variant; only intra-frame MJPEG"
                                " (MJPG/dmb1/MJPA) decodes natively —"
                                " other codecs (H.264, DIB, ...) are"
                                " DESCOPED (SURVEY §8 — no in-container"
                                " oracle; needs ffmpeg on the cluster"
                                " image)")
                        handler_ok = True
                        scale, rate = struct.unpack_from(
                            "<II", payload, d0 + 20)
                        if scale:
                            fps = rate / scale
        elif fcc == b"LIST" and lt == b"movi":
            scan_movi(b0, b1)

    if not handler_ok:
        raise ValueError("AVI has no 'vids' stream header")
    return fps, frames
