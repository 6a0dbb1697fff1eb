"""Plan-time tile geometry analysis for the Pallas remap kernel.

Splits the output into [TH, TW] tiles and, per tile and per output row,
derives the input-window footprint (y/x spans including interpolation tap
support).  Tiles whose footprint fits the kernel's fixed window class are
"regular"; the rest ("wide": pole neighborhoods where a cubemap tile's
equirect footprint spans large x ranges, seam-crossing tiles, and the
degenerate pole rows) fall back to the XLA gather path (SURVEY §7 "hard
parts": gather locality, pole/seam tiles).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..sampling import SampleSpec, _TAPS


@dataclasses.dataclass(frozen=True)
class TileGeometry:
    """Per-tile footprint stats over the padded input coordinate system."""

    th: int
    tw: int
    n_ty: int
    n_tx: int
    taps: int
    pad_y: int  # input rows added on top (wrap padding)
    pad_x: int  # input cols added on the right
    y_min: np.ndarray  # [n_ty, n_tx] first input row needed (padded coords)
    y_span: np.ndarray  # [n_ty, n_tx] rows needed (incl. taps)
    x_min: np.ndarray  # [n_ty, n_tx]
    x_span: np.ndarray  # [n_ty, n_tx]
    row_y_span: np.ndarray  # [n_ty, n_tx] max per-output-row y span
    valid_frac: float


def analyze_tiles(spec: SampleSpec, th: int, tw: int) -> TileGeometry:
    T = _TAPS[spec.interp]
    H, W = spec.in_h, spec.in_w
    out_h, out_w = spec.base_y.shape
    pad_y, pad_x = T, T

    # padded-coordinate first-tap indices; base_y in [-T.., H+..] after the
    # plan's wrap/clamp they are in [0, H) (wrap) — undo nothing, just pad.
    by = spec.base_y.astype(np.int64) + pad_y
    bx = spec.base_x.astype(np.int64)

    n_ty = -(-out_h // th)
    n_tx = -(-out_w // tw)
    y_min = np.zeros((n_ty, n_tx), np.int64)
    y_span = np.zeros((n_ty, n_tx), np.int64)
    x_min = np.zeros((n_ty, n_tx), np.int64)
    x_span = np.zeros((n_ty, n_tx), np.int64)
    row_y_span = np.zeros((n_ty, n_tx), np.int64)

    def circular_min_span(vals: np.ndarray, n: int):
        """Smallest window start/extent covering `vals` on a ring of size n
        (seam-crossing tiles have a small circular footprint even though
        their wrapped min/max spans the whole axis)."""
        u = np.unique(vals)
        if u.size == 1:
            return int(u[0]), 1
        gaps = np.diff(u)
        wrap_gap = u[0] + n - u[-1]
        k = int(np.argmax(gaps)) if gaps.size and gaps.max() > wrap_gap else -1
        if k >= 0 and gaps[k] > wrap_gap:
            start = int(u[k + 1])
            extent = int(u[k] + n - u[k + 1] + 1)
        else:
            start = int(u[0])
            extent = int(u[-1] - u[0] + 1)
        return start, extent

    for i in range(n_ty):
        ys = slice(i * th, min((i + 1) * th, out_h))
        for j in range(n_tx):
            xs = slice(j * tw, min((j + 1) * tw, out_w))
            tb = by[ys, xs]
            tx_ = bx[ys, xs]
            y_min[i, j] = tb.min()
            y_span[i, j] = tb.max() - tb.min() + T
            xs0, xext = circular_min_span(tx_.reshape(-1), W)
            x_min[i, j] = xs0
            x_span[i, j] = xext + T - 1
            row_y_span[i, j] = (tb.max(axis=1) - tb.min(axis=1)).max() + T

    valid_frac = 1.0 if spec.valid is None else float(spec.valid.mean())
    return TileGeometry(
        th=th,
        tw=tw,
        n_ty=n_ty,
        n_tx=n_tx,
        taps=T,
        pad_y=pad_y,
        pad_x=pad_x,
        y_min=y_min,
        y_span=y_span,
        x_min=x_min,
        x_span=x_span,
        row_y_span=row_y_span,
        valid_frac=valid_frac,
    )


def classify(
    geo: TileGeometry, win_h: int, win_w: int, row_win: int
) -> Tuple[np.ndarray, dict]:
    """Regular-tile mask: footprint fits the [win_h, win_w] window AND every
    output row's y-span fits the per-row [row_win] sub-window."""
    ok = (
        (geo.y_span <= win_h)
        & (geo.x_span <= win_w)
        & (geo.row_y_span <= row_win)
    )
    stats = {
        "tiles": int(ok.size),
        "regular": int(ok.sum()),
        "wide": int((~ok).sum()),
        "wide_frac": float((~ok).mean()),
        "y_span_p99": int(np.percentile(geo.y_span, 99)),
        "x_span_p99": int(np.percentile(geo.x_span, 99)),
        "row_y_span_p99": int(np.percentile(geo.row_y_span, 99)),
        "x_span_max": int(geo.x_span.max()),
        "y_span_max": int(geo.y_span.max()),
    }
    return ok, stats
