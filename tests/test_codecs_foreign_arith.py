"""FOREIGN arithmetic-JPEG conformance fixture (VERDICT r10 item 1).

The repo's SOF9/SOF10 path was pinned only against its own encoder —
a conditioning-model deviation from T.81 F.1.4 that is self-consistent
between encoder and decoder would mis-decode FOREIGN streams while
every in-repo gate stayed green.  No external arithmetic JPEG exists
in this container (stock libjpeg ships without D_ARITH_CODING_SUPPORT),
so this test HAND-ASSEMBLES one the way tests/test_codecs.py:1137 did
for FLAC LPC: an INDEPENDENT encode-side implementation written
directly from the public T.81 spec (Annex D QM-coder flowcharts +
the F.1.4 sequential statistical model), carrying its OWN copy of
Table D.3 (spec column order Qe/NMPS/NLPS/SW — a transcription typo in
either table would break the cross-decode), its own zigzag walk and
its own A.3.3 IDCT.  The assembled stream deliberately uses shapes the
repo encoder NEVER emits:

* a non-default DAC segment (DC L=2/U=4, AC Kx=3) on non-zero table
  ids (Td=1, Ta=2) — a decoder that fell back to the F.5 defaults or
  ignored table ids would mis-classify DC conditioning and pick the
  wrong AC magnitude ladder;
* a DRI/RSTn restart cadence (statistics, predictors AND the QM coder
  must reset per segment);
* flush bytes WITHOUT trailing-zero suppression (legal per D.2.7 —
  the repo encoder always suppresses);
* a deterministically-searched coefficient trajectory whose entropy
  stream exercises BOTH stacked-0xFF-carry resolution (stacked FFs
  become 00s when a carry ripples, D.1.6) and plain stacked-FF
  emission with FF 00 stuffing.

Expected pixels are derived spec-side (inverse zigzag -> dequant ->
A.3.3 float IDCT + level shift, identity quant table) and the repo's
``decode_jpeg`` must reproduce them bit-exactly.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from apache_beam_spark.multimodal.codecs import decode_jpeg

# T.81 Table D.3 in the spec's own column order: (Qe, NMPS, NLPS,
# Switch).  State 113 is the fixed ~0.5 bin (F.1.4.4.1.1 note) handled
# by code_fixed below.
_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

_DC_L, _DC_U, _AC_KX = 2, 4, 3          # NON-default DAC conditioning


class SpecArithEncoder:
    """T.81 Annex D QM-coder, encode side, written from the flowcharts
    (INITENC D.1.1, CODE0/CODE1 + conditional exchange D.1.3-4,
    RENORME D.1.6, BYTEOUT with FF stacking D.1.6, FLUSH D.1.8) —
    independent bookkeeping from the engine implementation (dict
    stats bins, explicit stack counter, NO trailing-zero
    suppression)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buf = None
        self.stack = 0              # pending 0xFF bytes
        self.out = bytearray()
        self.saw_carry_over_stack = False
        self.saw_plain_stack = False

    def _emit(self, b):
        self.out.append(b)
        if b == 0xFF:               # B.1.1.5 byte stuffing
            self.out.append(0x00)

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            # carry ripples into the buffered byte; stacked 0xFFs
            # resolve to 0x00 (D.1.6)
            assert self.buf is not None, "carry before first byte"
            self._emit(self.buf + 1)
            if self.stack:
                self.saw_carry_over_stack = True
            while self.stack:
                self._emit(0x00)
                self.stack -= 1
            self.buf = t & 0xFF
        elif t == 0xFF:
            self.stack += 1
        else:
            if self.buf is not None:
                self._emit(self.buf)
            if self.stack:
                self.saw_plain_stack = True
            while self.stack:
                self._emit(0xFF)    # _emit stuffs the 0x00
                self.stack -= 1
            self.buf = t
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self):
        while True:
            self.a = (self.a << 1) & 0x1FFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def code(self, bins: dict, i: int, d: int) -> None:
        s = bins.setdefault(i, [0, 0])      # [Table D.3 index, MPS]
        idx, mps = s
        qe, nmps, nlps, sw = _TAB[idx]
        self.a -= qe
        if d == mps:                         # CODEMPS
            if self.a & 0x8000:
                return
            if self.a < qe:                  # conditional exchange
                self.c += self.a
                self.a = qe
            s[0] = nmps
        else:                                # CODELPS
            if self.a >= qe:                 # no exchange: top interval
                self.c += self.a
                self.a = qe
            if sw:
                s[1] = 1 - mps
            s[0] = nlps
        self._renorm()

    def code_fixed(self, d: int) -> None:
        """The non-adapting ~0.5 state (AC signs, F.1.4.4.1.1)."""
        qe = 0x5A1D
        self.a -= qe
        if d == 0:
            if self.a & 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
        else:
            if self.a >= qe:
                self.c += self.a
                self.a = qe
        self._renorm()

    def flush(self) -> bytes:
        """D.1.8: choose the code point with trailing zeros, then
        write BOTH remaining bytes (no trailing-zero suppression —
        legal, and a shape the engine's encoder never produces)."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            assert self.buf is not None
            self._emit(self.buf + 1)
            if self.stack:
                self.saw_carry_over_stack = True
            while self.stack:
                self._emit(0x00)
                self.stack -= 1
        else:
            if self.buf is not None:
                self._emit(self.buf)
            if self.stack:
                self.saw_plain_stack = True
            while self.stack:
                self._emit(0xFF)
                self.stack -= 1
        self._emit((self.c >> 19) & 0xFF)
        self._emit((self.c >> 11) & 0xFF)
        return bytes(self.out)


def _enc_dc(e, bins, v, pred, cls, sign_hist):
    """F.1.4.1 DC difference model under (L, U) conditioning; returns
    (new predictor, next conditioning class)."""
    diff = v - pred
    st = cls
    if diff == 0:
        e.code(bins, st, 0)
        return v, 0
    e.code(bins, st, 1)
    sign = 0 if diff > 0 else 1
    e.code(bins, st + 1, sign)
    st += 2 + sign                           # SP / SN
    d = (diff if diff > 0 else -diff) - 1
    m = 0
    if d:
        e.code(bins, st, 1)
        m = 1
        v2 = d
        st = 20                              # X1 ladder
        while v2 >> 1:
            v2 >>= 1
            e.code(bins, st, 1)
            m <<= 1
            st += 1
    e.code(bins, st, 0)
    if m < (1 << _DC_L) >> 1:
        ncls = 0
    elif m > (1 << _DC_U) >> 1:
        ncls = 12 + 4 * sign
    else:
        ncls = 4 + 4 * sign
    st += 14                                 # M bins
    m2 = m
    while m2 >> 1:
        m2 >>= 1
        e.code(bins, st, 1 if (m2 & d) else 0)
    return v, ncls


def _enc_ac(e, bins, zz):
    """F.1.4.2 sequential AC model (band 1..63, Al=0) under Kx."""
    ke = 63
    while ke >= 1 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        st = 3 * (k - 1)
        e.code(bins, st, 0)                  # not EOB
        while zz[k] == 0:
            e.code(bins, st + 1, 0)
            st += 3
            k += 1
        e.code(bins, st + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        e.code_fixed(sign)
        v = -v if v < 0 else v
        st += 2
        d = v - 1
        m = 0
        if d:
            e.code(bins, st, 1)
            m = 1
            v2 = d
            if v2 >> 1:
                e.code(bins, st, 1)
                m <<= 1
                v2 >>= 1
                st = 189 if k <= _AC_KX else 217   # X2 ladders
                while v2 >> 1:
                    v2 >>= 1
                    e.code(bins, st, 1)
                    m <<= 1
                    st += 1
        e.code(bins, st, 0)
        st += 14
        m2 = m
        while m2 >> 1:
            m2 >>= 1
            e.code(bins, st, 1 if (m2 & d) else 0)
        k += 1
    if k <= 63:
        e.code(bins, 3 * (k - 1), 1)         # EOB


def _encode_segment(blocks):
    """One restart segment: fresh QM coder, statistics, predictor and
    conditioning class (E.2.4 / F.1.4)."""
    e = SpecArithEncoder()
    dc_bins: dict = {}
    ac_bins: dict = {}
    pred, cls = 0, 0
    for zz in blocks:
        pred, cls = _enc_dc(e, dc_bins, int(zz[0]), pred, cls, None)
        _enc_ac(e, ac_bins, zz)
    return e.flush(), e


def _zigzag():
    """Spec Figure A.6 walk, derived independently."""
    pos, r, c = [], 0, 0
    for _ in range(64):
        pos.append((r, c))
        if (r + c) % 2 == 0:
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return pos


def _expected_pixels(blocks):
    """Inverse zigzag -> identity dequant -> A.3.3 IDCT -> +128 level
    shift, assembled to the 16x16 frame.  Returns (uint8 image, min
    distance of any pre-round value to a .5 boundary — the seed search
    rejects round-ambiguous trajectories)."""
    zz = _zigzag()
    x = np.arange(8)
    u = np.arange(8)
    cu = np.where(u == 0, 1.0 / math.sqrt(2.0), 1.0)
    m = 0.5 * cu[None, :] * np.cos(
        (2 * x[:, None] + 1) * u[None, :] * np.pi / 16.0)
    img = np.zeros((16, 16), np.float64)
    for b, coefs in enumerate(blocks):
        mat = np.zeros((8, 8), np.float64)
        for i, (r, c) in enumerate(zz):
            mat[r, c] = coefs[i]
        sp = m @ mat @ m.T + 128.0
        by, bx = divmod(b, 2)
        img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = sp
    frac = np.abs(img - np.floor(img) - 0.5)
    return (np.clip(np.round(img), 0, 255).astype(np.uint8),
            float(frac.min()))


def _build_stream(seg1: bytes, seg2: bytes, dac: bool = True) -> bytes:
    out = bytearray(b"\xff\xd8")                      # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67)        # DQT: identity
    out += bytes([0x00]) + bytes([1] * 64)
    out += b"\xff\xc9" + struct.pack(">H", 11)        # SOF9
    out += struct.pack(">BHHB", 8, 16, 16, 1)
    out += bytes([1, 0x11, 0])                         # id 1, 1x1, Tq 0
    if dac:
        out += b"\xff\xcc" + struct.pack(">H", 6)     # DAC
        out += bytes([0x01, (_DC_U << 4) | _DC_L])     # Tc0/Tb1: U,L
        out += bytes([0x12, _AC_KX])                   # Tc1/Tb2: Kx
    out += b"\xff\xdd" + struct.pack(">H", 4)         # DRI = 2 MCUs
    out += struct.pack(">H", 2)
    out += b"\xff\xda" + struct.pack(">H", 8)         # SOS
    out += bytes([1, 1, 0x12, 0, 63, 0])               # Td=1 Ta=2
    out += seg1
    out += b"\xff\xd0"                                # RST0
    out += seg2
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


def _lcg_blocks(seed):
    """Deterministic coefficient trajectory for the seed search."""
    s = seed
    def nxt():
        nonlocal s
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        return s
    blocks = []
    for _ in range(4):
        zzv = [0] * 64
        zzv[0] = (nxt() % 241) - 120
        for pos in (1, 2, 3, 5, 8, 13, 17, 24, 30, 41, 47, 55, 63):
            r = nxt()
            if r % 3:
                v = (r % 31) - 15
                zzv[pos] = v if v else 7
        blocks.append(zzv)
    return blocks


def _find_fixture():
    """First seed whose two entropy segments exercise BOTH
    stacked-FF-carry and plain stacked-FF emission, with round-safe
    expected pixels.  Purely deterministic."""
    for seed in range(1, 20000):
        blocks = _lcg_blocks(seed)
        seg1, e1 = _encode_segment(blocks[:2])
        seg2, e2 = _encode_segment(blocks[2:])
        carry = e1.saw_carry_over_stack or e2.saw_carry_over_stack
        plain = e1.saw_plain_stack or e2.saw_plain_stack
        if not (carry and plain):
            continue
        expected, margin = _expected_pixels(blocks)
        if margin < 1e-6:
            continue
        return seed, blocks, seg1, seg2, expected
    raise AssertionError("no fixture seed found")


def test_foreign_sof9_stream_decodes_bit_exact():
    seed, blocks, seg1, seg2, expected = _find_fixture()
    # pin the searched trajectory: a change in the spec-side encoder
    # (or its Table D.3 copy) moves the seed and must be re-reviewed
    assert seed == 547, f"spec-side encoder changed (seed now {seed})"
    stream = _build_stream(seg1, seg2)
    got = decode_jpeg(stream)
    assert got.shape == (16, 16)
    assert got.dtype == np.uint8
    assert np.array_equal(got, expected), (
        "engine decode of the hand-built foreign SOF9 stream diverges "
        "from spec-derived pixels")


def test_dac_conditioning_is_load_bearing():
    """Vacuousness guard: the fixture was ENCODED under the
    non-default DAC conditioning, so a decoder that ignored the DAC
    segment (falling back to the F.5 defaults L=0/U=1/Kx=5) must NOT
    reproduce the expected pixels — proving the main test genuinely
    exercises the DAC path rather than passing by accident."""
    import pytest

    _, _, seg1, seg2, expected = _find_fixture()
    no_dac = _build_stream(seg1, seg2, dac=False)
    try:
        got = decode_jpeg(no_dac)
    except ValueError:
        return  # mis-conditioned decode tripping structure checks: fine
    assert not np.array_equal(got, expected), (
        "decode without the DAC segment matched — the fixture does "
        "not exercise conditioning")


# ---------------------------------------------------------------------------
# FOREIGN SOF10 (progressive arithmetic) fixture: the G.1.3 successive-
# approximation conditioning — DC-first at Al=1, per-band AC-first at
# Al=1, fixed-bin DC correction bits, previously-EOB-indexed AC
# refinement with newly-significant insertion — hand-encoded with the
# same independent spec-side QM coder and decoded bit-exact.  The
# coefficient set is chosen (not searched) to cover every refinement
# decision class: |v|=1 (invisible at Al=1, NEWLY significant in the
# refinement scan), |v|=2 (correction bit 0), |v|=3 (correction bit 1),
# odd/even DC (the fixed-bin DC correction both ways), negatives, and
# magnitudes that walk BOTH Kx ladders (k <= Kx and k > Kx).
# ---------------------------------------------------------------------------


def _mag_shift(x: int, s: int) -> int:
    """T.81 G.1.2.1 AC point transform: shift the MAGNITUDE."""
    return -((-x) >> s) if x < 0 else x >> s


def _enc_ac_band(e, bins, zz, ss, se, al):
    """F.1.4.2 AC-first model over [ss, se] at point transform al."""
    ke = se
    while ke >= ss and _mag_shift(int(zz[ke]), al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        e.code(bins, st, 0)
        while _mag_shift(int(zz[k]), al) == 0:
            e.code(bins, st + 1, 0)
            st += 3
            k += 1
        e.code(bins, st + 1, 1)
        v = _mag_shift(int(zz[k]), al)
        sign = 1 if v < 0 else 0
        e.code_fixed(sign)
        v = -v if v < 0 else v
        st += 2
        d = v - 1
        m = 0
        if d:
            e.code(bins, st, 1)
            m = 1
            v2 = d
            if v2 >> 1:
                e.code(bins, st, 1)
                m <<= 1
                v2 >>= 1
                st = 189 if k <= _AC_KX else 217
                while v2 >> 1:
                    v2 >>= 1
                    e.code(bins, st, 1)
                    m <<= 1
                    st += 1
        e.code(bins, st, 0)
        st += 14
        m2 = m
        while m2 >> 1:
            m2 >>= 1
            e.code(bins, st, 1 if (m2 & d) else 0)
        k += 1
    if k <= se:
        e.code(bins, 3 * (k - 1), 1)


def _enc_ac_refine(e, bins, zz, ss, se, ah, al):
    """G.1.3.3 AC successive-approximation refinement: correction bit
    for previously-significant coefficients, fixed-bin sign for newly
    significant ones, EOB decisions only beyond the previous scan's
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
            e.code(bins, st, 0)
        while True:
            x = int(zz[k])
            t = (-x if x < 0 else x) >> al
            if t:
                if t >> 1:                       # previously nonzero
                    e.code(bins, st + 2, t & 1)
                else:                            # newly significant
                    e.code(bins, st + 1, 1)
                    e.code_fixed(1 if x < 0 else 0)
                break
            e.code(bins, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        e.code(bins, 3 * (k - 1), 1)


#: 4 blocks covering the refinement decision classes (see header note)
_PROG_BLOCKS = []


def _prog_blocks():
    if _PROG_BLOCKS:
        return _PROG_BLOCKS
    b0 = [0] * 64
    b0[0] = 37                                   # odd DC: correction 1
    b0[1] = 1                                    # newly significant
    b0[2] = -2                                   # correction bit 0
    b0[3] = 9                                    # k <= Kx ladder walk
    b0[7] = 3                                    # correction bit 1
    b0[9] = -12                                  # k > Kx ladder walk
    b0[63] = -1                                  # refine insertion at band end
    b1 = [0] * 64
    b1[0] = -22                                  # even DC, negative
    b1[5] = -3
    b1[6] = 2
    b1[13] = 1                                   # 6-63 band insertion
    b2 = [0] * 64
    b2[0] = 4                                    # small diff class
    b2[4] = 5
    b3 = [0] * 64
    b3[0] = 101                                  # large diff class
    b3[30] = -7
    b3[55] = 1
    _PROG_BLOCKS.extend([b0, b1, b2, b3])
    return _PROG_BLOCKS


def _sof10_scan(blocks, kind, ss, se, ah, al):
    """One progressive scan's entropy bytes: fresh coder + statistics
    per scan, as the spec requires."""
    e = SpecArithEncoder()
    bins: dict = {}
    if kind == "dc_first":
        pred, cls = 0, 0
        for zz in blocks:
            pred, cls = _enc_dc(e, bins, int(zz[0]) >> al, pred, cls,
                                None)
    elif kind == "dc_refine":
        for zz in blocks:
            e.code_fixed((int(zz[0]) >> al) & 1)
    elif kind == "ac_first":
        for zz in blocks:
            _enc_ac_band(e, bins, zz, ss, se, al)
    else:                                        # ac_refine
        for zz in blocks:
            _enc_ac_refine(e, bins, zz, ss, se, ah, al)
    return e.flush()


def _build_sof10_stream(blocks) -> bytes:
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67)
    out += bytes([0x00]) + bytes([1] * 64)
    out += b"\xff\xca" + struct.pack(">H", 11)   # SOF10
    out += struct.pack(">BHHB", 8, 16, 16, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xcc" + struct.pack(">H", 6)    # non-default DAC
    out += bytes([0x01, (_DC_U << 4) | _DC_L])
    out += bytes([0x12, _AC_KX])

    def sos(ss, se, ah, al, tt):
        return (b"\xff\xda" + struct.pack(">H", 8)
                + bytes([1, 1, tt, ss, se, (ah << 4) | al]))

    # libjpeg-style scan script: DC first (Al=1), AC bands 1-5 / 6-63
    # first (Al=1), DC refinement, AC refinements
    out += sos(0, 0, 0, 1, 0x10)                 # Td=1
    out += _sof10_scan(blocks, "dc_first", 0, 0, 0, 1)
    out += sos(1, 5, 0, 1, 0x02)                 # Ta=2
    out += _sof10_scan(blocks, "ac_first", 1, 5, 0, 1)
    out += sos(6, 63, 0, 1, 0x02)
    out += _sof10_scan(blocks, "ac_first", 6, 63, 0, 1)
    out += sos(0, 0, 1, 0, 0x10)
    out += _sof10_scan(blocks, "dc_refine", 0, 0, 1, 0)
    out += sos(1, 5, 1, 0, 0x02)
    out += _sof10_scan(blocks, "ac_refine", 1, 5, 1, 0)
    out += sos(6, 63, 1, 0, 0x02)
    out += _sof10_scan(blocks, "ac_refine", 6, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def test_foreign_sof10_progressive_decodes_bit_exact():
    blocks = _prog_blocks()
    expected, margin = _expected_pixels(blocks)
    assert margin > 1e-6, "round-ambiguous fixture coefficients"
    got = decode_jpeg(_build_sof10_stream(blocks))
    assert got.shape == (16, 16)
    assert np.array_equal(got, expected), (
        "engine decode of the hand-built foreign SOF10 progressive "
        "stream diverges from spec-derived pixels")


def test_foreign_sof10_dac_is_load_bearing():
    """Same vacuousness guard as SOF9: decoding the SOF10 fixture with
    the DAC segment stripped (default L=0/U=1/Kx=5 conditioning) must
    not reproduce the expected pixels."""
    import pytest

    blocks = _prog_blocks()
    expected, _ = _expected_pixels(blocks)
    stream = bytearray(_build_sof10_stream(blocks))
    i = bytes(stream).index(b"\xff\xcc")
    del stream[i:i + 8]                          # drop the DAC segment
    try:
        got = decode_jpeg(bytes(stream))
    except ValueError:
        return
    assert not np.array_equal(got, expected)
