"""Progressive arithmetic-coded JPEG (SOF10) — pure numpy.

Round-6 VERDICT item 1: the last entropy-coded JPEG mode, and a
composition of two modules that already exist — the progressive scan
scheduler (``jpeg_progressive``: spectral selection, successive
approximation, per-component block grids, the accumulate-then-IDCT
tail) and the QM arithmetic coder + DCT statistical models
(``jpeg_arith``: Annex D coder, Annex F DC/AC decision trees).  What
is genuinely new here is only what ITU-T T.81 Annex G.2 adds on top:

* FIRST scans (Ah = 0) reuse the sequential decision trees verbatim,
  over the band [Ss..Se] and in the point-transformed domain — DC
  diffs accumulate in the >>Al domain (arithmetic shift), AC values
  code their truncated magnitudes (|v| >> Al) and store << Al.  Unlike
  Huffman progressive there are NO EOB runs: every block codes its own
  EOB decision, the adaptive coder makes that cheap.
* DC REFINEMENT scans (G.2.2) code one raw correction bit per block
  with the FIXED (~0.5) bin — no statistics at all.
* AC REFINEMENT scans (G.2.3, Figure G.10) walk the band with three
  decisions per context group 3*(k-1): +0 the EOB decision (coded only
  once k passes EOBx, the end-of-block index established by PREVIOUS
  scans), +1 "newly nonzero here" for zero-history positions (followed
  by a fixed-bin sign), +2 the correction bit for already-significant
  coefficients.

Each scan carries its own statistics (reset at every SOS per G.1.1.2)
and its own coder interval (flushed at scan end), so one
``_DCTArithModel`` + one ``_ArithEncoder``/``_ArithDecoder`` pair is
minted per scan.  Restart markers reinitialize both, exactly like the
sequential module.

Validated the same way as every other codec seam in this repo: a
SOF10 file carries byte-for-byte the same quantized coefficients as
its baseline Huffman twin, so decode must be pixel-IDENTICAL to
``jpeg.decode_jpeg`` of the baseline encode — the encoder exists to
mint fixtures (PIL is not installed) and cannot self-cancel a decoder
bug outside the shared Qe table (which has its own structural
invariant test).
"""

from __future__ import annotations

import struct

import numpy as np

from advanced_etl_pipelines_spark.functions.jpeg import ZIGZAG
from advanced_etl_pipelines_spark.functions.jpeg_arith import (
    _ArithDecoder,
    _ArithEncoder,
    _DCTArithModel,
)
from advanced_etl_pipelines_spark.functions.jpeg_progressive import (
    _assemble_image,
    _comp_blocks,
    _dc_block_order,
    _quantized_grids,
)

# ---------------------------------------------------------- refinement
# (first scans need no new code: _DCTArithModel.decode_dc /
#  decode_ac_band / encode_dc / encode_ac_band already take ss/se/al)


def _decode_ac_refine_block(
    dec: _ArithDecoder,
    model: _DCTArithModel,
    ci: int,
    blk: np.ndarray,
    ss: int,
    se: int,
    al: int,
) -> None:
    """T.81 G.2.3 / Figure G.10, decode direction, one block."""
    ast = model.ac_stats[model.ac_tbl[ci]]
    p1, m1 = 1 << al, -1 << al
    # EOBx: end-of-block index established by previous scans (down to
    # 0 — a lower-band coefficient still counts, per Annex G)
    kex = se
    while kex > 0 and blk[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        sp = 3 * (k - 1)
        if k > kex and dec.decode(ast, sp):
            break  # EOB
        while True:
            if blk[k]:
                # previously significant: one correction bit
                if dec.decode(ast, sp + 2):
                    blk[k] += m1 if blk[k] < 0 else p1
                break
            if dec.decode(ast, sp + 1):
                # newly significant: fixed-bin sign
                blk[k] = m1 if dec.decode(model.fixed, 0) else p1
                break
            sp += 3
            k += 1
            if k > se:
                raise ValueError("arith AC refinement run overflow")
        k += 1


def _encode_ac_refine_block(
    enc: _ArithEncoder,
    model: _DCTArithModel,
    ci: int,
    blk: np.ndarray,
    ss: int,
    se: int,
    al: int,
) -> None:
    """T.81 G.1.3.3 / Figure G.10, encode direction, one block.  The
    grid holds FULL coefficients; history is what survives >> (Al+1)
    (= the previous scan's point transform, Ah = Al + 1)."""
    ast = model.ac_stats[model.ac_tbl[ci]]
    mags = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    ke = se
    while ke >= ss and mags[ke - ss] == 0:
        ke -= 1
    kex = ke
    while kex > 0 and (abs(int(blk[kex])) >> (al + 1)) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        sp = 3 * (k - 1)
        if k > kex:
            enc.encode(ast, sp, 0)  # not EOB yet
        while True:
            t = mags[k - ss]
            if t:
                if t >> 1:  # previously significant: correction bit
                    enc.encode(ast, sp + 2, t & 1)
                else:  # newly significant: decision + fixed-bin sign
                    enc.encode(ast, sp + 1, 1)
                    enc.encode(
                        model.fixed, 0, 1 if int(blk[k]) < 0 else 0
                    )
                break
            enc.encode(ast, sp + 1, 0)
            sp += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(ast, 3 * (k - 1), 1)  # EOB


# ------------------------------------------------------------- decoder


def _realign_restart(data: bytes, dec: _ArithDecoder) -> _ArithDecoder:
    """Skip to just past the next RSTn and mint a fresh coder (the
    sequential module's restart discipline)."""
    p = dec.marker_pos if dec.hit_marker else dec.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
    ):
        p += 1
    if p + 1 >= len(data):
        raise ValueError("expected restart marker")
    return _ArithDecoder(data, p + 2)


def _decode_scan(
    data: bytes,
    pos: int,
    scomps: list[dict],
    coeffs: dict[int, np.ndarray],
    geom: dict[str, int],
    dc_cond: dict[int, tuple[int, int]],
    ac_cond: dict[int, int],
    ss: int,
    se: int,
    ah: int,
    al: int,
    ri: int,
) -> int:
    """Decode one SOS's entropy data; returns the offset of the 0xFF
    that starts the next marker.  Fresh statistics + coder per scan
    (T.81 G.1.1.2); restarts reinit both."""
    model = _DCTArithModel(
        len(scomps),
        dc_cond,
        ac_cond,
        [sc["dc"] for sc in scomps],
        [sc["ac"] for sc in scomps],
    )
    dec = _ArithDecoder(data, pos)
    n = 0
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        for sc, by, bx, new_mcu in _dc_block_order(scomps, geom):
            if new_mcu:
                if ri and n and n % ri == 0:
                    dec = _realign_restart(data, dec)
                    model.reset()
                n += 1
            ci = scomps.index(sc)
            blk = coeffs[sc["comp"]["id"]][by, bx]
            if ah == 0:
                blk[0] = model.decode_dc(dec, ci) << al
            else:
                if dec.decode(model.fixed, 0):
                    blk[0] |= 1 << al
    else:
        if len(scomps) != 1:
            raise ValueError("interleaved AC scan is illegal")
        c = scomps[0]["comp"]
        grid = coeffs[c["id"]]
        bh_, bw_ = _comp_blocks(geom, c)
        for iy in range(bh_):
            for ix in range(bw_):
                if ri and n and n % ri == 0:
                    dec = _realign_restart(data, dec)
                    model.reset()
                n += 1
                blk = grid[iy, ix]
                if ah == 0:
                    model.decode_ac_band(dec, 0, blk, ss, se, al)
                else:
                    _decode_ac_refine_block(
                        dec, model, 0, blk, ss, se, al
                    )
    # find the scan-terminating marker: inside entropy data a 0xFF is
    # always stuffed (0xFF00), so the first 0xFF followed by a nonzero
    # byte is the next marker
    p = dec.marker_pos if dec.hit_marker else dec.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] != 0x00
    ):
        p += 1
    return p


def decode_arith_progressive(data: bytes) -> np.ndarray:
    """SOF10 JFIF bytes -> uint8/uint16 pixel array.  Routed from
    ``jpeg.decode_jpeg`` like SOF2/SOF9; supports 8/12-bit precision,
    sampling up to 2x2, restart markers."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    comps: list[dict] = []
    coeffs: dict[int, np.ndarray] = {}
    geom: dict[str, int] = {}
    precision = 8
    ri = 0
    saw_scan = False
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
                if pq:  # 16-bit entries (12-bit precision)
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
        elif marker == 0xCA:
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
                    (geom["mcus_y"] * c["v"], geom["mcus_x"] * c["h"], 64),
                    dtype=np.int64,
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
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF10")
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
            pos = _decode_scan(
                data,
                pos + seglen,
                scomps,
                coeffs,
                geom,
                dc_cond,
                ac_cond,
                ss,
                se,
                ahal >> 4,
                ahal & 0xF,
                ri,
            )
            saw_scan = True
            continue
        pos += seglen

    if not saw_scan:
        raise ValueError("no SOS marker found")
    return _assemble_image(comps, coeffs, geom, quant, precision)


# ------------------------------------------------------------- encoder


def encode_jpeg_arith_progressive(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """(H,W) grayscale or (H,W,3) RGB -> SOF10 JFIF bytes.

    Same scan script as the Huffman progressive encoder (DC first at
    Al=1; per component AC bands 1-5 / 6-63 first at Al=2; AC
    refinements Al=2->1->0; DC refinement last) so both successive
    approximation and spectral selection exercise every refinement
    path.  Default DAC conditioning (DC L=0/U=1, AC Kx=5)."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    comps, grids, geom, qlum, qchrom, gray = _quantized_grids(
        arr, quality, subsampling, precision
    )
    h, w = geom["h"], geom["w"]
    nc = len(comps)
    dc_cond = {0: (0, 1), 1: (0, 1)}
    ac_cond = {0: 5, 1: 5}

    def scan_entropy(scomps, ss, se, ah, al) -> bytes:
        """Run one scan through a fresh model + coder (restart-aware)."""
        model = _DCTArithModel(
            len(scomps),
            dc_cond,
            ac_cond,
            [sc["dc"] for sc in scomps],
            [sc["ac"] for sc in scomps],
        )
        enc = _ArithEncoder()
        out = bytearray()
        n = 0
        rst = 0

        def maybe_restart() -> None:
            nonlocal enc, rst
            if restart_interval and n and n % restart_interval == 0:
                enc.flush()
                out.extend(enc.out)
                out.extend(bytes([0xFF, 0xD0 + rst % 8]))
                rst += 1
                enc = _ArithEncoder()
                model.reset()

        if ss == 0:
            for sc, by, bx, new_mcu in _dc_block_order(scomps, geom):
                if new_mcu:
                    maybe_restart()
                    n += 1
                ci = scomps.index(sc)
                blk = grids[sc["comp"]["id"]][by, bx]
                if ah == 0:
                    model.encode_dc(enc, ci, int(blk[0]), al)
                else:
                    enc.encode(
                        model.fixed, 0, (int(blk[0]) >> al) & 1
                    )
        else:
            c = scomps[0]["comp"]
            grid = grids[c["id"]]
            bh_, bw_ = _comp_blocks(geom, c)
            for iy in range(bh_):
                for ix in range(bw_):
                    maybe_restart()
                    n += 1
                    blk = grid[iy, ix]
                    if ah == 0:
                        model.encode_ac_band(enc, 0, blk, ss, se, al)
                    else:
                        _encode_ac_refine_block(
                            enc, model, 0, blk, ss, se, al
                        )
        enc.flush()
        out.extend(enc.out)
        return bytes(out)

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
    # SOF10: progressive, arithmetic
    out += b"\xff\xca" + struct.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc
    )
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    dac = b""
    for tid in range(1 if gray else 2):
        lo, hi = dc_cond[tid]
        dac += bytes([(0 << 4) | tid, (hi << 4) | lo])
        dac += bytes([(1 << 4) | tid, ac_cond[tid]])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

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
    out += sos(
        [(c["id"], 0 if i == 0 else 1, 0) for i, c in enumerate(comps)],
        0, 0, 0, 1,
        scan_entropy(all_sc, 0, 0, 0, 1),
    )
    # per component: AC first passes at Al=2, bands 1-5 and 6-63
    for i, c in enumerate(comps):
        ta = 0 if i == 0 else 1
        sc = [{"comp": c, "dc": 0, "ac": ta}]
        for ss_, se_ in ((1, 5), (6, 63)):
            out += sos(
                [(c["id"], 0, ta)], ss_, se_, 0, 2,
                scan_entropy(sc, ss_, se_, 0, 2),
            )
    # per component: AC refinements Ah=2->Al=1, then Ah=1->Al=0
    for ah, al in ((2, 1), (1, 0)):
        for i, c in enumerate(comps):
            ta = 0 if i == 0 else 1
            sc = [{"comp": c, "dc": 0, "ac": ta}]
            out += sos(
                [(c["id"], 0, ta)], 1, 63, ah, al,
                scan_entropy(sc, 1, 63, ah, al),
            )
    # final scan: DC refinement Ah=1 -> Al=0 (fixed-bin bits)
    out += sos(
        [(c["id"], 0, 0) for c in comps], 0, 0, 1, 0,
        scan_entropy(all_sc, 0, 0, 1, 0),
    )
    out += b"\xff\xd9"
    return bytes(out)
