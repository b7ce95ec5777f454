"""Minimal pure-numpy raster charts, written as PNG via functions/png.py.

The reference ships six matplotlib/seaborn figures
(`ETL_Multi_Lvl_API/etl_analysis.py:266-343`,
`ETL_Weather_API/etl_analysis.py:132-156`); this container has no
matplotlib, so the report sink (pipelines/report.py) rasterizes the
same shapes — histogram, stacked bar, multi-series line, heatmap —
directly into pixel arrays.  Scope is deliberately small: axes frame,
tick marks, series colors; no text labels (a font engine is out of
scope — chart identity lives in the file name, values in the feeding
CSV/aggregate).

Everything here is driver-side rendering of ALREADY-AGGREGATED frames
(bounded rows: bins, days, cities) — the 100 TB story is that the
aggregation ran distributed first and only the plot-ready rows reach
the driver, exactly the boundary the reference's sampled scatter gets
wrong (it samples raw rows "for performance"; we aggregate instead).
"""

from __future__ import annotations

import numpy as np

from advanced_etl_pipelines_spark.functions.png import encode_png

# Okabe-Ito colorblind-safe palette (public domain)
PALETTE = [
    (0, 114, 178),
    (230, 159, 0),
    (0, 158, 115),
    (204, 121, 167),
    (86, 180, 233),
    (213, 94, 0),
    (240, 228, 66),
    (0, 0, 0),
]
BG = (255, 255, 255)
AXIS = (40, 40, 40)
MARGIN = 28


def _canvas(w: int, h: int) -> np.ndarray:
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = BG
    return img


def _frame(img: np.ndarray) -> tuple[int, int, int, int]:
    """Draw the axes frame; return the plot area (x0, y0, x1, y1)."""
    h, w = img.shape[:2]
    x0, y0, x1, y1 = MARGIN, MARGIN // 2, w - MARGIN // 2, h - MARGIN
    img[y1, x0 : x1 + 1] = AXIS  # x axis
    img[y0 : y1 + 1, x0] = AXIS  # y axis
    return x0, y0, x1, y1


def _ticks(img, x0, y0, x1, y1, nx=5, ny=4) -> None:
    for t in range(nx + 1):
        x = x0 + (x1 - x0) * t // nx
        img[y1 + 1 : y1 + 4, x] = AXIS
    for t in range(ny + 1):
        y = y1 - (y1 - y0) * t // ny
        img[y, x0 - 3 : x0] = AXIS


def render_bars(
    values: np.ndarray, w: int = 480, h: int = 300
) -> bytes:
    """Bar / stacked-bar chart.  ``values``: (n_bars,) or
    (n_bars, n_series) — 2-D stacks series bottom-up (the risk-flags
    chart shape)."""
    v = np.atleast_2d(np.asarray(values, dtype=np.float64))
    if v.shape[0] == 1 and np.asarray(values).ndim == 1:
        v = v.T
    n_bars, n_series = v.shape
    v = np.nan_to_num(v, nan=0.0)
    img = _canvas(w, h)
    x0, y0, x1, y1 = _frame(img)
    _ticks(img, x0, y0, x1, y1)
    top = float(v.sum(axis=1).max()) or 1.0
    span = x1 - x0
    slot = span / max(n_bars, 1)
    bar_w = max(int(slot * 0.7), 1)
    for b in range(n_bars):
        bx = x0 + 1 + int(b * slot + slot * 0.15)
        base = y1
        for s in range(n_series):
            bh = int((y1 - y0 - 2) * v[b, s] / top)
            if bh <= 0:
                continue
            color = PALETTE[s % len(PALETTE)]
            img[base - bh : base, bx : min(bx + bar_w, x1)] = color
            base -= bh
    return encode_png(img)


def render_lines(
    series: list[tuple[np.ndarray, np.ndarray]], w: int = 560, h: int = 300
) -> bytes:
    """Multi-series line chart.  ``series``: list of (xs, ys) float
    arrays sharing one coordinate space (the hourly-trends shape)."""
    img = _canvas(w, h)
    x0, y0, x1, y1 = _frame(img)
    _ticks(img, x0, y0, x1, y1)
    all_x = np.concatenate([np.asarray(xs, dtype=np.float64) for xs, _ in series])
    all_y = np.concatenate([np.asarray(ys, dtype=np.float64) for _, ys in series])
    all_x, all_y = all_x[~np.isnan(all_x)], all_y[~np.isnan(all_y)]
    xlo, xhi = (all_x.min(), all_x.max()) if all_x.size else (0.0, 1.0)
    ylo, yhi = (all_y.min(), all_y.max()) if all_y.size else (0.0, 1.0)
    xspan = (xhi - xlo) or 1.0
    yspan = (yhi - ylo) or 1.0

    def px(xv: float) -> int:
        return x0 + 1 + int((x1 - x0 - 2) * (xv - xlo) / xspan)

    def py(yv: float) -> int:
        return y1 - 1 - int((y1 - y0 - 2) * (yv - ylo) / yspan)

    for si, (xs, ys) in enumerate(series):
        color = PALETTE[si % len(PALETTE)]
        pts = [
            (px(float(x)), py(float(y)))
            for x, y in zip(xs, ys)
            if not (np.isnan(float(x)) or np.isnan(float(y)))
        ]
        for (ax, ay), (bx, by) in zip(pts, pts[1:]):
            n = max(abs(bx - ax), abs(by - ay), 1)
            for t in range(n + 1):
                xx = ax + (bx - ax) * t // n
                yy = ay + (by - ay) * t // n
                img[yy, xx] = color
        for cx, cy in pts:  # point markers
            img[max(cy - 1, 0) : cy + 2, max(cx - 1, 0) : cx + 2] = color
    return encode_png(img)


def render_heatmap(grid: np.ndarray, w: int = 420, h: int = 340) -> bytes:
    """2-D density heatmap (the scale-safe replacement for the
    reference's sampled scatter): cell value -> sequential blue ramp."""
    g = np.asarray(grid, dtype=np.float64)
    g = np.nan_to_num(g, nan=0.0)
    top = g.max() or 1.0
    img = _canvas(w, h)
    x0, y0, x1, y1 = _frame(img)
    ny, nx = g.shape
    cw = (x1 - x0 - 2) / nx
    ch = (y1 - y0 - 2) / ny
    for iy in range(ny):
        for ix in range(nx):
            frac = g[iy, ix] / top
            # white -> deep blue ramp
            col = (
                int(255 - 215 * frac),
                int(255 - 141 * frac),
                int(255 - 77 * frac),
            )
            ax, bx = x0 + 1 + int(ix * cw), x0 + 1 + int((ix + 1) * cw)
            # row 0 at the bottom (y axis grows upward)
            ay = y1 - 1 - int((iy + 1) * ch)
            by = y1 - 1 - int(iy * ch)
            img[ay:by, ax:bx] = col
    return encode_png(img)
