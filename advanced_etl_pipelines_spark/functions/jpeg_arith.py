"""Arithmetic-coded JPEG (SOF9, extended sequential DCT) — pure numpy.

Round-5 VERDICT item 3, the largest remaining codec seam: baseline and
progressive Huffman JPEG decode landed in rounds 2-3/5
(``jpeg.py`` / ``jpeg_progressive.py``); this module adds the QM
arithmetic entropy coder from the same public spec, ITU-T T.81:

* Annex D — the binary arithmetic coder itself: the 113-state
  Qe probability-estimation machine (Table D.3, public spec
  constants, transcribed like the PNG CRC polynomial or the IMA step
  table; ``tests/test_multimodal.py::test_qe_table_structural_invariants``
  checks the transcription against spec-derivable structure and the
  printed fast-attack/exchange-head values, and pins fingerprints so
  any single-row edit fails — mutation-verified),
  conditional MPS/LPS exchange, renormalization, byte-oriented
  carry handling with 0xFF00 byte stuffing (the interop convention the
  reference implementations use, so entropy segments stay marker-free
  exactly like the Huffman scans).
* Annex F.1.4 / F.2.4 — the DCT statistical models: per-component DC
  conditioning contexts classified by the previous diff against the
  DAC segment's (L, U) bounds, per-zigzag-index AC EOB/run contexts,
  the low/high AC magnitude-category split at Kx, and the shared
  magnitude-bit bins.

An arithmetic-coded file carries byte-for-byte the SAME quantized
coefficients as its Huffman twin — entropy coding is lossless — so a
correct decode here is pixel-IDENTICAL to ``jpeg.decode_jpeg`` of the
baseline encode of the same image: the parity property the tests pin
(the same discipline as the progressive decoder).  The encoder exists
so the repo can mint its own SOF9 fixtures (PIL is not installed
here); the decoder is validated by baseline parity, not just
round-trip, so an encoder bug cannot self-cancel outside the shared
state table.

Supports 8-bit and 12-bit precision (level shift 1 << (P-1)),
grayscale/YCbCr with sampling factors up to 2x2, and restart markers
(coder + statistics fully reinitialized per spec).  Progressive
arithmetic (SOF10) lives in ``jpeg_arith_progressive``, composed from
this module's decision trees (band/Al-parameterized) and the
progressive scan scheduler.
"""

from __future__ import annotations

import struct

import numpy as np

from advanced_etl_pipelines_spark.functions.jpeg import (
    QUANT_CHROM,
    QUANT_LUM,
    ZIGZAG,
    _D,
    _scale_quant,
)

# T.81 Table D.3: (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS).
# Row 113 is the conventional FIXED bin (Qe ~0.5, self-transitions, no
# switch) used for AC sign decisions — including it as an ordinary row
# makes "never adapts" fall out of the table instead of special-casing.
_QE_TAB: list[tuple[int, int, int, int]] = [
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
    (0x5A1D, 113, 113, 0),  # 113: fixed ~0.5 bin (AC sign)
]

_FIXED_BIN = 113

# statistics-area sizes per table (T.81 Tables F.4/F.5 layouts)
_DC_STAT_BINS = 64
_AC_STAT_BINS = 256


class _ArithEncoder:
    """T.81 Annex D encoder, byte-oriented carry/stuffing handling.

    State bytes pack (state index | MPS << 7); ``encode(stats, i,
    bit)`` adapts the bin in place.  Output performs 0xFF00 byte
    stuffing so the scan stays marker-free.
    """

    def __init__(self) -> None:
        self.out = bytearray()
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buffer = -1  # pending byte (may still take a carry)
        self.sc = 0  # stacked 0xFF bytes (carry-sensitive)
        self.zc = 0  # pending 0x00 bytes (suppressed at flush)

    def _emit(self, byte: int) -> None:
        self.out.append(byte & 0xFF)

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        sv = stats[i]
        qe, nl, nm, switch = _QE_TAB[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if bit != mps:
            # LPS path (with conditional exchange)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if switch:
                mps ^= 1
            stats[i] = (mps << 7) | nl
        else:
            # MPS path
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | nm
        # renormalize + byte out
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                temp = self.c >> 19
                if temp > 0xFF:
                    # carry ripples into the pending byte and converts
                    # every stacked 0xFF to 0x00
                    if self.buffer >= 0:
                        while self.zc:
                            self._emit(0x00)
                            self.zc -= 1
                        self._emit(self.buffer + 1)
                        if self.buffer + 1 == 0xFF:
                            self._emit(0x00)
                    self.zc += self.sc
                    self.sc = 0
                    self.buffer = temp & 0xFF
                elif temp == 0xFF:
                    self.sc += 1  # stack: a later carry may turn it 0x00
                else:
                    if self.buffer == 0:
                        self.zc += 1
                    elif self.buffer >= 0:
                        while self.zc:
                            self._emit(0x00)
                            self.zc -= 1
                        self._emit(self.buffer)
                    if self.sc:
                        while self.zc:
                            self._emit(0x00)
                            self.zc -= 1
                        while self.sc:
                            self._emit(0xFF)
                            self._emit(0x00)
                            self.sc -= 1
                    self.buffer = temp
                self.c &= 0x7FFFF
                self.ct += 8
            if self.a >= 0x8000:
                break

    def flush(self) -> None:
        """T.81 D.1.8: terminate with the sparsest in-interval code
        point, then drain pending bytes (trailing 0x00s suppressed)."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                while self.zc:
                    self._emit(0x00)
                    self.zc -= 1
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                while self.zc:
                    self._emit(0x00)
                    self.zc -= 1
                self._emit(self.buffer)
            if self.sc:
                while self.zc:
                    self._emit(0x00)
                    self.zc -= 1
                while self.sc:
                    self._emit(0xFF)
                    self._emit(0x00)
                    self.sc -= 1
        if self.c & 0x7FFF800:
            while self.zc:
                self._emit(0x00)
                self.zc -= 1
            b = (self.c >> 19) & 0xFF
            self._emit(b)
            if b == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self._emit(b)
                if b == 0xFF:
                    self._emit(0x00)


class _ArithDecoder:
    """T.81 Annex D decoder over the file bytes starting at ``pos``.

    0xFF00 unstuffs to a 0xFF data byte; any real marker stops the
    feed (zeros are supplied from then on, the spec's convention for
    completing the final interval) and is left for the caller at
    ``marker_pos``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16  # forces the 2-byte initial fill
        self.hit_marker = False
        self.marker_pos = -1

    def _byte_in(self) -> int:
        d = self.data
        if self.hit_marker or self.pos >= len(d):
            return 0
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        # 0xFF: swallow fill 0xFFs, then stuffed-zero vs marker
        p = self.pos + 1
        while p < len(d) and d[p] == 0xFF:
            p += 1
        if p < len(d) and d[p] == 0x00:
            self.pos = p + 1
            return 0xFF
        self.hit_marker = True
        self.marker_pos = p - 1  # points at the 0xFF before the marker
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        # renormalize / feed
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = ((self.c << 8) | self._byte_in()) & 0xFFFFFFFF
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        self.a = 0x8000  # 2 initial bytes in: A = 0x10000
            self.a = (self.a << 1) & 0x1FFFF
        sv = stats[i]
        qe, nl, nm, switch = _QE_TAB[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        temp = (self.a << self.ct) & 0xFFFFFFFF
        if self.c >= temp:
            self.c -= temp
            # LPS branch (conditional exchange)
            if self.a < qe:
                bit = mps
                stats[i] = (mps << 7) | nm
            else:
                bit = mps ^ 1
                if switch:
                    mps ^= 1
                stats[i] = (mps << 7) | nl
            self.a = qe
        else:
            if self.a < 0x8000:
                # MPS branch with conditional exchange
                if self.a < qe:
                    bit = mps ^ 1
                    if switch:
                        mps ^= 1
                    stats[i] = (mps << 7) | nl
                else:
                    bit = mps
                    stats[i] = (mps << 7) | nm
            else:
                bit = mps
        return bit


# ------------------------------------------------------- DCT models


class _DCTArithModel:
    """Shared DC/AC statistical-model walk (T.81 F.1.4 encode /
    F.2.4 decode are mirror images; one class hosts both so the bin
    arithmetic can't drift between the two directions)."""

    def __init__(
        self,
        n_components: int,
        dc_cond: dict[int, tuple[int, int]],
        ac_cond: dict[int, int],
        dc_tbl: list[int],
        ac_tbl: list[int],
    ) -> None:
        self.dc_stats = {
            t: bytearray(_DC_STAT_BINS) for t in set(dc_tbl)
        }
        self.ac_stats = {
            t: bytearray(_AC_STAT_BINS) for t in set(ac_tbl)
        }
        self.fixed = bytearray([_FIXED_BIN])
        self.dc_context = [0] * n_components
        self.preds = [0] * n_components
        self.dc_cond = dc_cond
        self.ac_cond = ac_cond
        self.dc_tbl = dc_tbl
        self.ac_tbl = ac_tbl

    def reset(self) -> None:
        for st in self.dc_stats.values():
            st[:] = bytes(len(st))
        for st in self.ac_stats.values():
            st[:] = bytes(len(st))
        self.fixed[0] = _FIXED_BIN
        self.dc_context = [0] * len(self.dc_context)
        self.preds = [0] * len(self.preds)

    # ---- decode direction

    def decode_dc(self, dec: _ArithDecoder, ci: int) -> int:
        """One DC decision tree (T.81 F.2.4.1); accumulates the diff
        into ``preds[ci]`` and returns the new prediction.  In a
        progressive first scan the prediction lives in the >>Al domain
        (the caller shifts the stored coefficient back up)."""
        tbl = self.dc_tbl[ci]
        lo, hi = self.dc_cond[tbl]
        st = self.dc_stats[tbl]
        s0 = self.dc_context[ci]
        if dec.decode(st, s0) == 0:
            self.dc_context[ci] = 0
        else:
            sign = dec.decode(st, s0 + 1)
            sp = s0 + 2 + sign
            m = dec.decode(st, sp)
            if m:
                sp = 20  # X1
                while dec.decode(st, sp):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith DC magnitude overflow")
                    sp += 1
            if m < ((1 << lo) >> 1):
                self.dc_context[ci] = 0
            elif m > ((1 << hi) >> 1):
                self.dc_context[ci] = 12 + sign * 4
            else:
                self.dc_context[ci] = 4 + sign * 4
            v = m
            sp += 14  # magnitude-bit bins
            while m := m >> 1:
                if dec.decode(st, sp):
                    v |= m
            v += 1
            self.preds[ci] += -v if sign else v
        return self.preds[ci]

    def decode_ac_band(
        self,
        dec: _ArithDecoder,
        ci: int,
        zz: np.ndarray,
        ss: int = 1,
        se: int = 63,
        al: int = 0,
    ) -> None:
        """AC decisions over zigzag band [ss..se] (T.81 F.2.4.2 —
        also the body of a progressive FIRST scan, G.2: same walk with
        the decoded value left-shifted by Al)."""
        atbl = self.ac_tbl[ci]
        kx = self.ac_cond[atbl]
        ast = self.ac_stats[atbl]
        k = ss
        while k <= se:
            sp = 3 * (k - 1)
            if dec.decode(ast, sp):
                break  # EOB
            while dec.decode(ast, sp + 1) == 0:
                sp += 3
                k += 1
                if k > se:
                    raise ValueError("arith AC run overflow")
            sign = dec.decode(self.fixed, 0)
            sp += 2
            m = dec.decode(ast, sp)
            if m:
                if dec.decode(ast, sp):
                    m <<= 1
                    sp = 189 if k <= kx else 217
                    while dec.decode(ast, sp):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError("arith AC magnitude overflow")
                        sp += 1
            v = m
            sp += 14
            while m := m >> 1:
                if dec.decode(ast, sp):
                    v |= m
            v += 1
            zz[k] = (-v if sign else v) << al
            k += 1

    def decode_block(self, dec: _ArithDecoder, ci: int) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = self.decode_dc(dec, ci)
        self.decode_ac_band(dec, ci, zz, 1, 63)
        return zz

    # ---- encode direction

    def encode_dc(
        self, enc: _ArithEncoder, ci: int, dc_val: int, al: int = 0
    ) -> None:
        """DC decision tree, encode direction; ``al`` applies the DC
        point transform (ARITHMETIC shift, T.81 G.1.2.1) before the
        prediction diff."""
        tbl = self.dc_tbl[ci]
        lo, hi = self.dc_cond[tbl]
        st = self.dc_stats[tbl]
        s0 = self.dc_context[ci]
        t = int(dc_val) >> al
        diff = t - self.preds[ci]
        self.preds[ci] = t
        if diff == 0:
            enc.encode(st, s0, 0)
            self.dc_context[ci] = 0
        else:
            enc.encode(st, s0, 1)
            sign = 1 if diff < 0 else 0
            v = -diff if sign else diff
            enc.encode(st, s0 + 1, sign)
            sp = s0 + 2 + sign
            m = 0
            v -= 1
            if v:
                enc.encode(st, sp, 1)
                m = 1
                sp = 20
                v2 = v
                while v2 := v2 >> 1:
                    enc.encode(st, sp, 1)
                    m <<= 1
                    sp += 1
            enc.encode(st, sp, 0)
            if m < ((1 << lo) >> 1):
                self.dc_context[ci] = 0
            elif m > ((1 << hi) >> 1):
                self.dc_context[ci] = 12 + sign * 4
            else:
                self.dc_context[ci] = 4 + sign * 4
            sp += 14
            while m := m >> 1:
                enc.encode(st, sp, 1 if (m & v) else 0)

    def encode_ac_band(
        self,
        enc: _ArithEncoder,
        ci: int,
        zz: np.ndarray,
        ss: int = 1,
        se: int = 63,
        al: int = 0,
    ) -> None:
        """AC decisions over zigzag band [ss..se], encode direction;
        ``al`` applies the AC point transform (MAGNITUDE shift,
        T.81 G.1.2.2) so a progressive first scan codes the truncated
        coefficients exactly like a sequential scan codes full ones."""
        atbl = self.ac_tbl[ci]
        kx = self.ac_cond[atbl]
        ast = self.ac_stats[atbl]
        mags = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        ke = se
        while ke >= ss and mags[ke - ss] == 0:
            ke -= 1
        k = ss
        while k <= ke:
            sp = 3 * (k - 1)
            enc.encode(ast, sp, 0)  # not EOB yet
            while mags[k - ss] == 0:
                enc.encode(ast, sp + 1, 0)
                sp += 3
                k += 1
            enc.encode(ast, sp + 1, 1)
            v = mags[k - ss]
            enc.encode(self.fixed, 0, 1 if int(zz[k]) < 0 else 0)
            sp += 2
            m = 0
            v -= 1  # encoded magnitude vd = |coef| - 1
            if v:
                enc.encode(ast, sp, 1)
                m = 1
                v2 = v >> 1
                if v2:
                    enc.encode(ast, sp, 1)
                    m <<= 1
                    sp = 189 if k <= kx else 217
                    while v2 := v2 >> 1:
                        enc.encode(ast, sp, 1)
                        m <<= 1
                        sp += 1
            enc.encode(ast, sp, 0)
            sp += 14
            while m := m >> 1:
                enc.encode(ast, sp, 1 if (m & v) else 0)
            k += 1
        if k <= se:
            enc.encode(ast, 3 * (k - 1), 1)  # EOB

    def encode_block(
        self, enc: _ArithEncoder, ci: int, zz: np.ndarray
    ) -> None:
        self.encode_dc(enc, ci, int(zz[0]))
        self.encode_ac_band(enc, ci, zz, 1, 63)


# ------------------------------------------------------------ encoder


def encode_jpeg_arith(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """(H,W) grayscale or (H,W,3) RGB -> SOF9 arithmetic-coded JFIF.

    ``precision`` 8 (uint8 input) or 12 (uint16 input, 0..4095; quant
    tables scale x16 and ship as 16-bit DQT entries).  Default DAC
    conditioning (DC L=0/U=1, AC Kx=5), matching the spec defaults so
    a DAC-less decoder agrees."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    maxval = (1 << precision) - 1
    shift = 1 << (precision - 1)
    dt = np.uint8 if precision == 8 else np.uint16
    a = np.asarray(arr, dtype=dt)
    if a.max(initial=0) > maxval:
        raise ValueError(f"sample exceeds {precision}-bit range")
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qscale = 16 if precision == 12 else 1
    qlum = _scale_quant(QUANT_LUM, quality) * qscale
    qchrom = _scale_quant(QUANT_CHROM, quality) * qscale
    qlum2d = qlum.reshape(8, 8)
    qchrom2d = qchrom.reshape(8, 8)

    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + shift
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + shift
        if subsampling == "420":
            def down(p: np.ndarray) -> np.ndarray:
                ph, pw = (-p.shape[0]) % 2, (-p.shape[1]) % 2
                p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
                return (
                    p[0::2, 0::2] + p[0::2, 1::2]
                    + p[1::2, 0::2] + p[1::2, 1::2]
                ) / 4.0

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = [
        np.pad(
            p,
            (
                (0, mcus_y * 8 * sv - p.shape[0]),
                (0, mcus_x * 8 * sh - p.shape[1]),
            ),
            mode="edge",
        )
        for p, (sh, sv) in zip(planes, samp)
    ]

    nc = len(planes)
    dc_tbl = [0] + [1] * (nc - 1)
    ac_tbl = [0] + [1] * (nc - 1)
    dc_cond = {0: (0, 1), 1: (0, 1)}
    ac_cond = {0: 5, 1: 5}
    model = _DCTArithModel(nc, dc_cond, ac_cond, dc_tbl, ac_tbl)
    enc = _ArithEncoder()
    entropy = bytearray()
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                enc.flush()
                entropy += enc.out
                entropy += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                enc = _ArithEncoder()
                model.reset()
            mcu_count += 1
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                qt = qlum2d if ci == 0 else qchrom2d
                for by in range(sv):
                    for bx in range(sh):
                        r0 = (my * sv + by) * 8
                        c0 = (mx * sh + bx) * 8
                        block = p[r0 : r0 + 8, c0 : c0 + 8]
                        coef = _D @ (block - float(shift)) @ _D.T
                        zz = (
                            np.round(coef / qt)
                            .astype(np.int64)
                            .ravel()[ZIGZAG]
                        )
                        model.encode_block(enc, ci, zz)
    enc.flush()
    entropy += enc.out

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tid, q in ((0, qlum), (1, qchrom))[: 1 if gray else 2]:
        if precision == 12:
            out += b"\xff\xdb" + struct.pack(">H", 131)
            out += bytes([(1 << 4) | tid])
            out += b"".join(
                struct.pack(">H", int(x)) for x in q[ZIGZAG]
            )
        else:
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            out += bytes(int(x) for x in q[ZIGZAG])
    # SOF9: extended sequential, arithmetic
    out += b"\xff\xc9" + struct.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc
    )
    for ci in range(nc):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    # DAC: DC conditioning (L in low nibble, U in high) + AC Kx
    dac = b""
    for tid in range(1 if gray else 2):
        lo, hi = dc_cond[tid]
        dac += bytes([(0 << 4) | tid, (hi << 4) | lo])
        dac += bytes([(1 << 4) | tid, ac_cond[tid]])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        out += bytes([ci + 1, (tid << 4) | tid])
    out += b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------ decoder


def decode_arith(data: bytes) -> np.ndarray:
    """SOF9 arithmetic-coded JFIF bytes -> uint8/uint16 pixel array.
    Called from ``jpeg.decode_jpeg`` the way SOF2 routes to the
    progressive decoder; supports 8/12-bit precision, sampling up to
    2x2, restart markers (full coder + statistics reinit)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    comps: list[dict] = []
    h = w = 0
    precision = 8
    restart_interval = 0
    scan: list[dict] = []
    dc_cond = {t: (0, 1) for t in range(4)}
    ac_cond = {t: 5 for t in range(4)}

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if pos + seglen > len(data):
            raise ValueError("truncated JPEG segment")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq:
                    zz = np.frombuffer(
                        seg[i + 1 : i + 129], dtype=">u2"
                    ).astype(np.int32)
                    i += 129
                else:
                    zz = np.frombuffer(
                        seg[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.int32)
                    i += 65
                nat = np.empty(64, dtype=np.int32)
                nat[ZIGZAG] = zz
                quant[tq] = nat.reshape(8, 8)
        elif marker == 0xC9:
            precision = seg[0]
            if precision not in (8, 12):
                raise NotImplementedError(
                    f"{precision}-bit precision not supported"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker == 0xCC:  # DAC
            i = 0
            while i + 1 < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                val = seg[i + 1]
                if cls == 0:
                    dc_cond[tid] = (val & 0xF, val >> 4)
                else:
                    ac_cond[tid] = val
                i += 2
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for si in range(ns):
                cid, tids = seg[1 + 2 * si : 3 + 2 * si]
                comp = next(c for c in comps if c["id"] == cid)
                scan.append(
                    {"comp": comp, "dc": tids >> 4, "ac": tids & 0xF}
                )
            pos += seglen
            break
        pos += seglen
    if not scan:
        raise ValueError("no SOS marker found")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 not supported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        for c in comps
    }
    shift = float(1 << (precision - 1))
    maxval = (1 << precision) - 1

    nc = len(scan)
    model = _DCTArithModel(
        nc,
        dc_cond,
        ac_cond,
        [sc["dc"] for sc in scan],
        [sc["ac"] for sc in scan],
    )
    dec = _ArithDecoder(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                # align past the RSTn marker, reinit coder + statistics
                p = dec.marker_pos if dec.hit_marker else dec.pos
                while p + 1 < len(data) and not (
                    data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
                ):
                    p += 1
                if p + 1 >= len(data):
                    raise ValueError("expected restart marker")
                dec = _ArithDecoder(data, p + 2)
                model.reset()
            mcu_count += 1
            for ci, sc in enumerate(scan):
                c = sc["comp"]
                qt = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = model.decode_block(dec, ci)
                        nat = np.zeros(64, dtype=np.float64)
                        nat[ZIGZAG] = zz
                        block = (
                            _D.T @ (nat.reshape(8, 8) * qt) @ _D + shift
                        )
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][
                            r0 : r0 + 8, c0 : c0 + 8
                        ] = block

    out_dt = np.uint8 if precision == 8 else np.uint16
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, maxval).astype(out_dt)
    y, cb, cr = full[0], full[1] - shift, full[2] - shift
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, maxval).astype(out_dt)
