"""Pure-stdlib PNG codec (zlib + struct — no PIL/imageio dependency).

Why this exists: the multimodal operators (operators/multimodal.py) keep
a "real codec" seam, and the report sink (pipelines/report.py) renders
charts; this container ships no image library, so both bind to this
minimal, fully public implementation of the PNG spec (RFC 2083):
8-bit greyscale / RGB / RGBA, non-interlaced, all five scanline filters
on decode, filters 0-2 on encode.  A real deployment can swap PIL in at
the same call sites; the bytes produced here are standard PNGs any
viewer opens.

Implementation notes:
* decode defilters row-by-row; SUB uses a per-channel cumulative sum,
  UP/NONE are whole-row numpy ops, AVERAGE/PAETH fall back to a scalar
  loop (correct first — those filters are rare in our own encodes, and
  fixture images are small).
* encoder picks the caller's filter for every row; default NONE keeps
  encode vectorized end-to-end.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}  # greyscale, RGB, RGBA


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (H,W) | (H,W,3) | (H,W,4) -> PNG bytes.

    ``filter_type`` applies to every scanline: 0 NONE, 1 SUB, 2 UP
    (SUB/UP exist mostly so tests can exercise the decoder's defilter
    paths with self-produced files)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    if filter_type not in (0, 1, 2):
        raise ValueError("encoder supports filters 0 (none), 1 (sub), 2 (up)")
    h, w = a.shape[:2]
    flat = a.reshape(h, w * channels)
    lines = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # SUB: minus pixel to the left
            left = np.zeros_like(row)
            left[channels:] = row[:-channels]
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        else:  # UP: minus pixel above
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        lines.append(filter_type)
        lines.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )


def png_meta(data: bytes) -> tuple[int, int, int, int]:
    """Fast header probe: (width, height, bit_depth, color_type) from
    IHDR without decompressing pixel data."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR":
        raise ValueError("corrupt PNG (IHDR not first chunk)")
    w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
    return w, h, depth, ctype


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W) greyscale or (H,W,C) color.

    Supports bit depth 8, color types 0/2/6, non-interlaced — the
    subset this engine itself produces.  Anything else raises
    NotImplementedError (the honest seam: palette/16-bit/interlaced
    inputs need a full codec such as PIL)."""
    w, h, depth, ctype = png_meta(data)
    if depth != 8 or ctype not in _COLOR_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {ctype} needs a full codec"
        )
    channels = _COLOR_CHANNELS[ctype]
    # walk chunks, concatenating IDAT; interlace flag lives in IHDR byte 28
    if data[28] != 0:
        raise NotImplementedError("interlaced PNG needs a full codec")
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype_b = data[pos + 4 : pos + 8]
        if ctype_b == b"IDAT":
            idat.extend(data[pos + 8 : pos + 8 + length])
        if ctype_b == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG (scanline payload size mismatch)")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ft == 0:  # NONE
            rec = line.copy()
        elif ft == 1:  # SUB: per-channel cumulative sum, mod 256
            rec = (
                np.cumsum(
                    line.reshape(w, channels).astype(np.uint32), axis=0
                )
                % 256
            ).astype(np.uint8).reshape(stride)
        elif ft == 2:  # UP
            rec = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif ft in (3, 4):  # AVERAGE / PAETH: scalar recurrence
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - channels]) if x >= channels else 0
                up = int(prev[x])
                ul = int(prev[x - channels]) if x >= channels else 0
                if ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, channels)


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index gather — the vectorized
    core behind resize_media's real-codec path."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return arr[ys][:, xs]
