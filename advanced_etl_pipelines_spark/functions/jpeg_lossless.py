"""Lossless JPEG (SOF3) — pure numpy/stdlib, ITU-T T.81 Annex H.

The last sequential member of the codec family (rounds 2-6 landed
baseline, progressive, arithmetic and 12-bit DCT JPEG): SOF3 files
carry no DCT at all — each sample is predicted from its decoded
neighbors (the seven Annex H.1.2.1 predictors over Ra=left, Rb=above,
Rc=above-left) and the prediction ERROR is entropy-coded with the
same DC-style Huffman categories as baseline DC diffs, plus the
category-16 convention (diff = 32768, no magnitude bits).  Decode is
therefore EXACT: the strongest possible parity oracle —
``decode(encode(x)) == x`` bit-for-bit for any input, any precision
2..16, any predictor.

Scope (what the format's real users — DNG/medical-imaging files —
overwhelmingly use, and what the in-repo encoder mints for fixtures):
non-subsampled components (all sampling factors 1; interleaved MCU =
one sample per component), precision 2..16, predictors 1-7, point
transform Pt >= 0, restart markers.  Subsampled lossless raises
loudly.

Routed from ``jpeg.decode_jpeg`` on marker 0xC3, the same way SOF2 ->
jpeg_progressive and SOF9 -> jpeg_arith.
"""

from __future__ import annotations

import struct

import numpy as np

from advanced_etl_pipelines_spark.functions.jpeg import (
    _BitReader,
    _BitWriter,
    _build_codes,
    _build_decode,
    _category,
    _extend,
    _huff_decode,
)

# Flat canonical table over the 17 lossless DC categories (0..16):
# 16 codes at length 5 + category 16 at length 6 keeps Kraft-validity
# with the all-ones code unused at both lengths.
DCL_BITS = [0, 0, 0, 0, 16, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DCL_VALS = list(range(17))


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def encode_jpeg_lossless(
    arr: np.ndarray,
    predictor: int = 4,
    precision: int | None = None,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """(H,W) or (H,W,C<=4) integer array -> SOF3 lossless JFIF bytes.

    ``precision`` defaults to the smallest width holding the data
    (min 2).  Components are stored non-subsampled; with C > 1 samples
    interleave one-per-component per MCU, the layout our decoder (and
    the common single-scan DNG shape) uses."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] > 4:
        raise ValueError(f"unsupported array shape {arr.shape}")
    if a.min() < 0:
        raise ValueError("lossless JPEG samples must be non-negative")
    if precision is None:
        precision = max(2, int(a.max()).bit_length())
    if not 2 <= precision <= 16:
        raise ValueError("precision must be in 2..16")
    if int(a.max()) >> precision:
        raise ValueError(f"sample exceeds {precision}-bit range")
    h, w, nc = a.shape
    pt = point_transform
    s = (a.astype(np.int64) >> pt) if pt else a.astype(np.int64)

    codes = _build_codes(DCL_BITS, DCL_VALS)
    bw = _BitWriter()
    default = 1 << (precision - pt - 1)
    preds_reset = True
    first_line = True  # T.81 H.1.2.2 (ADVICE r6): Ra prediction for
    # the ENTIRE first line of the scan and of each restart interval
    mcu = 0
    restart_at = restart_interval or 0
    last_restart_mcu = 0
    for y in range(h):
        for x in range(w):
            if (
                restart_at
                and mcu
                and mcu % restart_at == 0
                and mcu != last_restart_mcu
            ):
                bw.marker(0xD0 + (mcu // restart_at - 1) % 8)
                preds_reset = True
                first_line = True
                last_restart_mcu = mcu
            for c in range(nc):
                if preds_reset:
                    px = default
                elif first_line:
                    px = int(s[y, x - 1, c])  # Ra
                elif x == 0:
                    px = int(s[y - 1, x, c])  # row start: Rb
                else:
                    px = _predict(
                        int(s[y, x - 1, c]),
                        int(s[y - 1, x, c]),
                        int(s[y - 1, x - 1, c]),
                        predictor,
                    )
                diff = (int(s[y, x, c]) - px) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000  # modulo-65536 arithmetic per spec
                if diff == -32768 or diff == 32768:
                    cat = 16
                else:
                    cat = _category(diff)
                code, length = codes[cat]
                bw.write(code, length)
                if 0 < cat < 16:
                    bw.write(
                        diff if diff >= 0 else diff + (1 << cat) - 1, cat
                    )
            preds_reset = False
            if x == w - 1:
                first_line = False  # the interval's first line ends here
            mcu += 1
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + struct.pack(
        ">HBHHB", 8 + 3 * nc, precision, h, w, nc
    )
    for c in range(nc):
        out += bytes([c + 1, 0x11, 0])  # sampling 1x1, no quant table
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(DCL_VALS))
    out += bytes([0x00]) + bytes(DCL_BITS) + bytes(DCL_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x00])
    out += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, Ah/Al=0/Pt
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_lossless(data: bytes) -> np.ndarray:
    """SOF3 bytes -> integer pixel array, EXACT (uint8/uint16 by
    precision; shape (H,W) for one component, (H,W,C) otherwise)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    huff: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    precision = 8
    restart_interval = 0
    scan: list[dict] = []
    predictor = point_transform = 0

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
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xC3:
            precision = seg[0]
            if not 2 <= precision <= 16:
                raise ValueError(f"invalid precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid, hv, _tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless JPEG not supported"
                    )
                comps.append({"id": cid})
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if cls == 0:
                    huff[tid] = _build_decode(bits, vals)
                i += 17 + n
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for si in range(ns):
                cid, tids = seg[1 + 2 * si : 3 + 2 * si]
                comp = next(c for c in comps if c["id"] == cid)
                scan.append({"comp": comp, "dc": tids >> 4})
            predictor = seg[1 + 2 * ns]
            point_transform = seg[3 + 2 * ns] & 0xF
            pos += seglen
            break
        pos += seglen
    if not scan:
        raise ValueError("no SOS marker found")
    if len(scan) != len(comps):
        # ADVICE r6: a multi-scan (non-interleaved) lossless file would
        # silently decode only its first scan — raise instead, per the
        # strict-decode contract
        raise NotImplementedError(
            "multi-scan lossless JPEG not supported"
        )

    nc = len(scan)
    out = np.zeros((h, w, nc), dtype=np.int64)
    br = _BitReader(data, pos)
    default = 1 << (precision - point_transform - 1)
    preds_reset = True
    first_line = True  # H.1.2.2: Ra for the whole first line of the
    # scan and of each restart interval (ADVICE r6)
    mcu = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_restart()
                preds_reset = True
                first_line = True
            for ci, sc in enumerate(scan):
                table = huff.get(sc["dc"])
                if table is None:
                    raise ValueError("scan references missing table")
                cat = _huff_decode(br, table)
                if cat == 16:
                    diff = 32768
                elif cat:
                    diff = _extend(br.bits(cat), cat)
                else:
                    diff = 0
                if preds_reset:
                    px = default
                elif first_line:
                    px = int(out[y, x - 1, ci])  # Ra
                elif x == 0:
                    px = int(out[y - 1, x, ci])
                else:
                    px = _predict(
                        int(out[y, x - 1, ci]),
                        int(out[y - 1, x, ci]),
                        int(out[y - 1, x - 1, ci]),
                        predictor,
                    )
                val = (px + diff) & 0xFFFF  # modulo-65536 per spec
                out[y, x, ci] = val
            preds_reset = False
            if x == w - 1:
                first_line = False
            mcu += 1

    if point_transform:
        out <<= point_transform
    dt = np.uint8 if precision <= 8 else np.uint16
    out = out.astype(dt)
    return out[:, :, 0] if nc == 1 else out
