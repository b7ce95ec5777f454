"""Progressive JPEG (SOF2) — pure-numpy codec (round-3 VERDICT item 6).

Progressive files carry the same quantized DCT coefficients as baseline
ones, delivered across MULTIPLE scans: spectral selection (each scan
covers a zigzag band [Ss..Se] of one component, DC scans may interleave
all components) and successive approximation (first pass sends
coefficients truncated to bits >= Al; refinement passes with Ah = Al+1
send one magnitude bit each).  Decoding therefore accumulates into
per-component coefficient grids and runs dequantize + IDCT once at EOI
— which is why any correct progressive decode is pixel-identical to
the baseline decode of the same coefficients (the parity property the
tests pin).

Algorithms follow the public spec, ITU-T T.81 sections G.1.2.2-G.1.2.3
(successive-approximation Huffman coding), with the well-documented
EOB-run conventions: in FIRST scans an EOB(r) symbol ends the current
block and skips the band in the next (1<<r)-1 + bits(r) blocks; in
REFINEMENT scans it covers (1<<r) + bits(r) blocks INCLUDING the rest
of the current one, whose already-nonzero coefficients still consume
one correction bit each.

Shares every primitive (zigzag, DCT matrix, quant scaling, canonical
Huffman, bit IO) with the baseline codec in ``jpeg.py``; the encoder
exists so the repo can mint its own progressive fixtures (PIL is not
installed here) — the decode path is validated by baseline-parity, not
just round-trip, so an encoder bug cannot self-cancel.
"""

from __future__ import annotations

import struct

import numpy as np

from advanced_etl_pipelines_spark.functions.jpeg import (
    AC_CHROM_BITS,
    AC_CHROM_VALS,
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_CHROM_BITS,
    DC_CHROM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    QUANT_CHROM,
    QUANT_LUM,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _build_codes,
    _build_decode,
    _category,
    _D,
    _extend,
    _huff_decode,
    _scale_quant,
)

# --------------------------------------------------------------- decoder


class _PBitReader(_BitReader):
    """Bit reader whose entropy segment may end at ANY marker (a
    progressive file has DHT/SOS/EOI markers between scans; the caller
    decodes an exact block count, so hitting a marker only ever happens
    while draining final-block padding)."""

    def _load(self) -> None:  # noqa: D102 — see class docstring
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8


def _comp_blocks(geom, c) -> tuple[int, int]:
    """Non-interleaved block-grid dims for one component (T.81 B.2.3:
    ceil of the component's OWN sample dims over 8, not the MCU grid)."""
    comp_w = -(-geom["w"] * c["h"] // geom["hmax"])
    comp_h = -(-geom["h"] * c["v"] // geom["vmax"])
    return -(-comp_h // 8), -(-comp_w // 8)


def _dc_block_order(scomps, geom):
    """(scan-comp, block-row, block-col) visit order of a DC scan:
    interleaved MCU order for ns > 1, the component's own grid for
    ns = 1 — with MCU/block boundaries for restart-interval counting."""
    if len(scomps) == 1:
        c = scomps[0]["comp"]
        bh_, bw_ = _comp_blocks(geom, c)
        for iy in range(bh_):
            for ix in range(bw_):
                yield scomps[0], iy, ix, True
    else:
        for my in range(geom["mcus_y"]):
            for mx in range(geom["mcus_x"]):
                first = True
                for sc in scomps:
                    c = sc["comp"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            yield sc, my * c["v"] + by, mx * c["h"] + bx, first
                            first = False


def _decode_dc_scan(br, scomps, huff, coeffs, geom, ah, al, ri):
    """DC scan (Ss=Se=0).  First pass (Ah=0) Huffman-decodes diffs in
    the >>Al domain; a refinement pass reads one raw bit per block (no
    Huffman coding at all)."""
    preds = {sc["comp"]["id"]: 0 for sc in scomps}
    n = 0
    for sc, by, bx, new_mcu in _dc_block_order(scomps, geom):
        if new_mcu:
            if ri and n and n % ri == 0:
                br.align_restart()
                preds = {s["comp"]["id"]: 0 for s in scomps}
            n += 1
        blk = coeffs[sc["comp"]["id"]][by, bx]
        if ah == 0:
            tbl = huff.get((0, sc["dc"]))
            if tbl is None:
                raise ValueError("missing DC Huffman table")
            s = _huff_decode(br, tbl)
            diff = _extend(br.bits(s), s) if s else 0
            preds[sc["comp"]["id"]] += diff
            blk[0] = preds[sc["comp"]["id"]] << al
        else:
            if br.bits(1):
                blk[0] |= 1 << al


def _decode_ac_scan(br, sc, huff, coeffs, geom, ss, se, ah, al, ri):
    """AC scan — always a single component, non-interleaved, over the
    component's own block grid (T.81 B.2.3)."""
    c = sc["comp"]
    act = huff.get((1, sc["ac"]))
    if act is None:
        raise ValueError("missing AC Huffman table")
    grid = coeffs[c["id"]]
    bh_, bw_ = _comp_blocks(geom, c)
    p1, m1 = 1 << al, -1 << al
    eobrun = 0
    n = 0
    for iy in range(bh_):
        for ix in range(bw_):
            if ri and n and n % ri == 0:
                br.align_restart()
                eobrun = 0
            n += 1
            blk = grid[iy, ix]
            if ah == 0:
                # ---- first pass (G.1.2.2)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _huff_decode(br, act)
                    r, s = sym >> 4, sym & 0xF
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow")
                    blk[k] = _extend(br.bits(s), s) << al
                    k += 1
            else:
                # ---- refinement pass (G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _huff_decode(br, act)
                        r, s = sym >> 4, sym & 0xF
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # ZRL: pass 16 zero-history coefficients
                        else:
                            if s != 1:
                                raise ValueError(
                                    "bad refinement AC symbol"
                                )
                            newval = p1 if br.bits(1) else m1
                        while k <= se:
                            if blk[k]:
                                if br.bits(1) and not (blk[k] & p1):
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun:
                    # rest of this block's band: correction bits only
                    while k <= se:
                        if blk[k]:
                            if br.bits(1) and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1


def decode_progressive(data: bytes) -> np.ndarray:
    """Progressive JFIF bytes -> uint8 (H,W) or (H,W,3) — accumulate
    every scan into coefficient grids, then dequantize + IDCT once."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    coeffs: dict[int, np.ndarray] = {}
    geom: dict[str, int] = {}
    precision = 8
    ri = 0
    saw_scan = False

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue  # length-less markers
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
                if pq:  # 16-bit entries (the 12-bit-precision form)
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
        elif marker == 0xC2:
            precision = seg[0]
            if precision not in (8, 12):
                raise NotImplementedError(
                    "only 8/12-bit precision supported"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError(
                    "sampling factors above 2 not supported"
                )
            geom = {
                "h": h,
                "w": w,
                "hmax": hmax,
                "vmax": vmax,
                "mcus_x": -(-w // (8 * hmax)),
                "mcus_y": -(-h // (8 * vmax)),
            }
            for c in comps:
                coeffs[c["id"]] = np.zeros(
                    (
                        geom["mcus_y"] * c["v"],
                        geom["mcus_x"] * c["h"],
                        64,
                    ),
                    dtype=np.int64,
                )
        elif marker in (0xC0, 0xC1):
            raise ValueError(
                "baseline SOF in decode_progressive — use decode_jpeg"
            )
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                huff[(cls, tid)] = _build_decode(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = seg[0]
            scomps = []
            for si in range(ns):
                cid, tids = seg[1 + 2 * si : 3 + 2 * si]
                comp = next(c for c in comps if c["id"] == cid)
                scomps.append(
                    {"comp": comp, "dc": tids >> 4, "ac": tids & 0xF}
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            br = _PBitReader(data, pos + seglen)
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                _decode_dc_scan(br, scomps, huff, coeffs, geom, ah, al, ri)
            else:
                if ns != 1:
                    raise ValueError("interleaved AC scan is illegal")
                _decode_ac_scan(
                    br, scomps[0], huff, coeffs, geom, ss, se, ah, al, ri
                )
            saw_scan = True
            # resume marker parsing after the entropy data: the bit
            # reader stops AT the terminating marker's 0xFF (or on it
            # after draining padding); trailing RSTn are skipped by the
            # length-less branch above
            pos = br.pos
            while pos < len(data) and data[pos] != 0xFF:
                pos += 1
            continue
        pos += seglen

    if not saw_scan:
        raise ValueError("no SOS marker found")
    return _assemble_image(comps, coeffs, geom, quant, precision)


def _assemble_image(comps, coeffs, geom, quant, precision):
    """Dequantize + IDCT + upsample accumulated coefficient grids (the
    shared tail of every multi-scan decode — progressive Huffman here,
    progressive arithmetic in ``jpeg_arith_progressive``)."""
    h, w = geom["h"], geom["w"]
    hmax, vmax = geom["hmax"], geom["vmax"]
    shift = float(1 << (precision - 1))
    maxval = (1 << precision) - 1
    out_dt = np.uint8 if precision == 8 else np.uint16
    full = []
    for c in comps:
        grid = coeffs[c["id"]]
        by, bx = grid.shape[:2]
        qt = quant[c["tq"]]
        plane = np.zeros((by * 8, bx * 8), dtype=np.float64)
        for iy in range(by):
            for ix in range(bx):
                nat = np.zeros(64, dtype=np.float64)
                nat[ZIGZAG] = grid[iy, ix]
                plane[iy * 8 : iy * 8 + 8, ix * 8 : ix * 8 + 8] = (
                    _D.T @ (nat.reshape(8, 8) * qt) @ _D + shift
                )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, maxval).astype(out_dt)
    y, cb, cr = full[0], full[1] - shift, full[2] - shift
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, maxval).astype(out_dt)


# --------------------------------------------------------------- encoder


def _quantized_grids(arr, quality, subsampling, precision=8):
    """Color-convert, subsample, pad, DCT, quantize — the same
    coefficients ``encode_jpeg`` produces, but kept as per-component
    zigzag grids so the scan script can slice them."""
    shift = float(1 << (precision - 1))
    a = np.asarray(arr, dtype=np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and a.max(initial=0) > 4095:
        raise ValueError("sample exceeds 12-bit range")
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

            def down(p):
                ph = np.pad(
                    p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                    mode="edge",
                )
                return (
                    ph[0::2, 0::2] + ph[0::2, 1::2]
                    + ph[1::2, 0::2] + ph[1::2, 1::2]
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
    comps, grids = [], {}
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        padded = np.pad(
            p,
            (
                (0, mcus_y * 8 * sv - p.shape[0]),
                (0, mcus_x * 8 * sh - p.shape[1]),
            ),
            mode="edge",
        )
        qt = (qlum if ci == 0 else qchrom).reshape(8, 8)
        by, bx = mcus_y * sv, mcus_x * sh
        grid = np.zeros((by, bx, 64), dtype=np.int64)
        for iy in range(by):
            for ix in range(bx):
                block = padded[iy * 8 : iy * 8 + 8, ix * 8 : ix * 8 + 8]
                coef = _D @ (block - shift) @ _D.T
                grid[iy, ix] = np.round(coef / qt).astype(
                    np.int64
                ).ravel()[ZIGZAG]
        comps.append({"id": ci + 1, "h": sh, "v": sv, "tq": 0 if ci == 0 else 1})
        grids[ci + 1] = grid
    geom = {
        "h": h, "w": w, "hmax": hmax, "vmax": vmax,
        "mcus_x": mcus_x, "mcus_y": mcus_y,
    }
    return comps, grids, geom, qlum, qchrom, gray


def _emit_value(bwr, codes, r, s, v):
    code, length = codes[(r << 4) | s]
    bwr.write(code, length)
    if s:
        bwr.write(v if v >= 0 else v + (1 << s) - 1, s)


def _emit_dc_first(bwr, scomps, grids, geom, dc_codes, al):
    preds = {sc["comp"]["id"]: 0 for sc in scomps}
    for sc, by, bx, _new in _dc_block_order(scomps, geom):
        cid = sc["comp"]["id"]
        t = int(grids[cid][by, bx][0]) >> al  # DC uses ARITHMETIC shift
        diff = t - preds[cid]
        preds[cid] = t
        s = _category(diff)
        code, length = dc_codes[cid][s]
        bwr.write(code, length)
        if s:
            bwr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _emit_dc_refine(bwr, scomps, grids, geom, al):
    for sc, by, bx, _new in _dc_block_order(scomps, geom):
        bwr.write((int(grids[sc["comp"]["id"]][by, bx][0]) >> al) & 1, 1)


def _emit_ac_first(bwr, grid, geom, c, ac, ss, se, al):
    bh_, bw_ = _comp_blocks(geom, c)
    for iy in range(bh_):
        for ix in range(bw_):
            blk = grid[iy, ix]
            r = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = abs(v) >> al  # AC uses MAGNITUDE shift
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    _emit_value(bwr, ac, 15, 0, 0)  # ZRL
                    r -= 16
                s = _category(t)
                _emit_value(bwr, ac, r, s, t if v > 0 else -t)
                r = 0
            if r:
                _emit_value(bwr, ac, 0, 0, 0)  # EOB, run of 1


def _emit_ac_refine(bwr, grid, geom, c, ac, ss, se, al):
    """T.81 G.1.2.3 encoder side: already-significant coefficients each
    contribute one buffered magnitude bit (flushed right after the next
    Huffman symbol, matching the decoder's read order); a
    newly-significant coefficient (magnitude bit pattern == 1 at this
    Al) is coded as Huffman symbol (run<<4)|1 plus a raw SIGN bit
    (1 = positive) — NOT the baseline value-bits encoding.  Runs only
    count zero-HISTORY positions; trailing content after the last new
    significance folds into an EOB whose correction bits follow it."""
    bh_, bw_ = _comp_blocks(geom, c)
    for iy in range(bh_):
        for ix in range(bw_):
            blk = grid[iy, ix]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob = -1  # index of the last NEWLY-significant coefficient
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i
            r = 0
            pending: list[int] = []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    code, length = ac[0xF0]  # ZRL
                    bwr.write(code, length)
                    for bit in pending:
                        bwr.write(bit, 1)
                    pending = []
                    r -= 16
                if t > 1:
                    # already significant: buffer its correction bit
                    pending.append(t & 1)
                    continue
                # newly significant: run + sign + buffered corrections
                code, length = ac[(r << 4) | 1]
                bwr.write(code, length)
                bwr.write(1 if int(blk[ss + i]) > 0 else 0, 1)
                for bit in pending:
                    bwr.write(bit, 1)
                pending = []
                r = 0
            if r > 0 or pending:
                code, length = ac[0x00]  # EOB (run of 1 block)
                bwr.write(code, length)
                for bit in pending:
                    bwr.write(bit, 1)


_STD_TABLES = {
    "dc_lum": (DC_LUM_BITS, DC_LUM_VALS),
    "ac_lum": (AC_LUM_BITS, AC_LUM_VALS),
    "dc_chrom": (DC_CHROM_BITS, DC_CHROM_VALS),
    "ac_chrom": (AC_CHROM_BITS, AC_CHROM_VALS),
}

# Flat 12-bit progressive tables (round-6, matching the baseline
# DC12/AC12 rationale): Annex K's AC sizes stop at 10, below the 12-bit
# coefficient range.  The progressive AC alphabet additionally needs
# EOBn symbols (r<<4)|0 for r 0..14 — so the flat table is every
# (run<<4)|size for size 0..14, 240 symbols at length 8 (Kraft-valid,
# all-ones code unused).
from advanced_etl_pipelines_spark.functions.jpeg import (  # noqa: E402
    DC12_BITS,
    DC12_VALS,
)

ACP12_VALS = [(r << 4) | s for r in range(16) for s in range(15)]
ACP12_BITS = [0, 0, 0, 0, 0, 0, 0, len(ACP12_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
_STD_TABLES_12 = {
    "dc_lum": (DC12_BITS, DC12_VALS),
    "ac_lum": (ACP12_BITS, ACP12_VALS),
    "dc_chrom": (DC12_BITS, DC12_VALS),
    "ac_chrom": (ACP12_BITS, ACP12_VALS),
}


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    precision: int = 8,
) -> bytes:
    """(H,W) grayscale or (H,W,3) RGB -> progressive (SOF2) JFIF
    bytes.  Scan script (a condensed form of the common libjpeg one):
    DC first at Al=1; per component AC 1-5 and 6-63 first at Al=2; per
    component AC refinements Al=1 then Al=0; DC refinement last —
    exercising spectral selection AND successive approximation on both
    the DC and AC paths.  ``precision`` 12 takes uint16 input in
    0..4095 (16-bit DQT entries, flat DC12/ACP12 scan tables)."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    comps, grids, geom, qlum, qchrom, gray = _quantized_grids(
        arr, quality, subsampling, precision
    )
    h, w = geom["h"], geom["w"]
    nc = len(comps)
    tables = _STD_TABLES_12 if precision == 12 else _STD_TABLES
    dc_codes = {
        c["id"]: _build_codes(*tables["dc_lum" if i == 0 else "dc_chrom"])
        for i, c in enumerate(comps)
    }
    ac_codes = {
        c["id"]: _build_codes(*tables["ac_lum" if i == 0 else "ac_chrom"])
        for i, c in enumerate(comps)
    }

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tid, q in ((0, qlum), (1, qchrom))[: 1 if gray else 2]:
        if precision == 12:
            out += b"\xff\xdb" + struct.pack(">H", 131)
            out += bytes([(1 << 4) | tid])
            out += b"".join(struct.pack(">H", int(x)) for x in q[ZIGZAG])
        else:
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            out += bytes(int(x) for x in q[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc
    )
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    for key, (cls, tid) in (
        ("dc_lum", (0, 0)),
        ("ac_lum", (1, 0)),
        ("dc_chrom", (0, 1)),
        ("ac_chrom", (1, 1)),
    ):
        if gray and tid == 1:
            continue
        bits, vals = tables[key]
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes(
            [(cls << 4) | tid]
        ) + bytes(bits) + bytes(vals)

    def sos(scomps_spec, ss, se, ah, al, entropy: bytes) -> bytes:
        head = b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(scomps_spec), len(scomps_spec)
        )
        for cid, td, ta in scomps_spec:
            head += bytes([cid, (td << 4) | ta])
        head += bytes([ss, se, (ah << 4) | al])
        return head + entropy

    all_sc = [
        {"comp": c, "dc": 0 if i == 0 else 1, "ac": 0 if i == 0 else 1}
        for i, c in enumerate(comps)
    ]

    # scan 1: DC first, Al=1, all components interleaved
    bwr = _BitWriter()
    _emit_dc_first(bwr, all_sc, grids, geom, dc_codes, 1)
    bwr.flush()
    out += sos(
        [(c["id"], 0 if i == 0 else 1, 0) for i, c in enumerate(comps)],
        0, 0, 0, 1, bytes(bwr.out),
    )
    # per component: AC first passes at Al=2, bands 1-5 and 6-63
    for i, c in enumerate(comps):
        ta = 0 if i == 0 else 1
        for ss, se in ((1, 5), (6, 63)):
            bwr = _BitWriter()
            _emit_ac_first(
                bwr, grids[c["id"]], geom, c, ac_codes[c["id"]], ss, se, 2
            )
            bwr.flush()
            out += sos([(c["id"], 0, ta)], ss, se, 0, 2, bytes(bwr.out))
    # per component: AC refinements Ah=2->Al=1, then Ah=1->Al=0
    for ah, al in ((2, 1), (1, 0)):
        for i, c in enumerate(comps):
            ta = 0 if i == 0 else 1
            bwr = _BitWriter()
            _emit_ac_refine(
                bwr, grids[c["id"]], geom, c, ac_codes[c["id"]], 1, 63, al
            )
            bwr.flush()
            out += sos([(c["id"], 0, ta)], 1, 63, ah, al, bytes(bwr.out))
    # final scan: DC refinement Ah=1 -> Al=0 (raw bits, no Huffman)
    bwr = _BitWriter()
    _emit_dc_refine(bwr, all_sc, grids, geom, 0)
    bwr.flush()
    out += sos(
        [(c["id"], 0, 0) for c in comps], 0, 0, 1, 0, bytes(bwr.out)
    )
    out += b"\xff\xd9"
    return bytes(out)
