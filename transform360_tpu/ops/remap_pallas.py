"""Fused Pallas remap kernel — the production ``cv::remap`` replacement.

XLA's general gather streams at ~2.4 GB/s on TPU (measured, v5e), which
caps a 4K cubic remap at ~7 fps/chip per plane.  This kernel instead
exploits the two fast data-movement engines the hardware does have:

* **DMA**: the static warp footprint of each output tile is a small input
  window; windows are fetched HBM→VMEM with double-buffered async copies
  at full bandwidth.
* **Intra-vreg shuffles**: Mosaic's ``tpu.dynamic_gather`` permutes within
  128 lanes.  Per 128-lane group of (pixel, x-tap) requests, one
  lane-gather x-aligns a small row sub-window for the WHOLE batch at once
  (frames stacked in sublanes), and the y-interpolation is a single
  multiply by a per-group combined weight matrix plus one reduction —
  no transposes, no per-frame loops, no second gather.

Structure: output is processed in [8, 128] **supertiles** (the minimal
TPU-aligned output block), each made of four [8, 32] subtiles with their
own DMA'd input window; each 128-lane request group additionally selects
an 8-aligned row sub-window (group_h rows) so vector ops touch only the
rows that group samples.  Plan-time classification (done inline in
:func:`build_pallas_remap`): subtile footprints that fit the regular class
(window 96x256, group_h 48) use a 2-chunk x-gather; up to 128x640/64
uses 5 chunks; the tall-group class 128x640/96 serves the narrow
majority of pole-face tiles (wide y-span, ordinary x-extent) with the
same 5 chunks; the polar class 128x1152/96 (genuinely wide cubemap
top/bottom-face tiles, measured 37% of the batch-1 luma remap when they
ran on the XLA gather) uses 9; anything wider still (degenerate pole
tiles — <<1%) falls back to the XLA gather on just those subtiles and
is patched into the output.

The kernel is layout-agnostic: all projection/stereo/border logic lives in
the plan's per-lane index/weight arrays (built from the same 1/32-quantized
:class:`~transform360_tpu.sampling.SampleSpec` as the XLA path), so every
(input layout, output layout, stereo, rotation, off-center) combination —
and OpenCV interpolation parity — comes along for free.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Interpolation
from .staging import staged
from ..sampling import SampleSpec, _TAPS, _tap_weights

TH, TW = 8, 32      # subtile (rows, cols); TP = 256 pixels
SUB = 4             # subtiles per supertile -> output block [8, 128]
TP = TH * TW
LANES = 128

# window classes (win_h, win_w): win_h <= 128 (y lane-gather after
# transpose), win_w a multiple of 128 (x-gather chunks).  Window origins
# are quantized to (8, 128) so the HBM DMA slices are tile-aligned (Mosaic
# requires provably aligned dynamic memref slices); the quantization slack
# (7, 127) comes out of the usable span.
Y_ALIGN, X_ALIGN = 8, 128
# (win_h, win_w, group_h): group_h is the per-output-row-group sub-window
# height — every vector op in the kernel touches only group_h rows.
# Each class must dominate the previous one in ALL THREE dims: supertile
# class = max over its four subtiles, so a subtile classified R/W must
# still fit the window of any higher class its supertile lands in.
CLASS_R = (96, 256, 48)
CLASS_W = (128, 640, 64)
# Tall-group class: CLASS_W's width with CLASS_P's group height.  Most
# "polar" tiles are polar in group span only (flagship luma: 75% of the
# P-classified supertiles have x_ext <= 513, chroma 100%) — they were
# paying the 1152-wide 9-chunk x-gather for a y-span problem.  This
# class serves them with the 5-chunk body instead.
CLASS_T = (128, 640, 96)
# Polar class: covers the cubemap top/bottom-face tiles that previously
# fell back to the XLA gather (flagship: 376 luma + 88 chroma subtiles,
# measured ~27% of the batch-1 frame).  They fail CLASS_W on group span
# (g_span up to 89 > 57) and x-extent (up to 913 > 513), not on raw
# window size.  Rare (~10% of supertiles); its window scratch is
# double-buffered wherever VMEM allows (batch <= 4 — the batch range
# the window path actually serves) and serial single-buffered at
# batch 8, where 9.4 MB of double-buffered 128x1152 windows would
# crowd the ~16 MB VMEM (see _class_nbuf).
CLASS_P = (128, 1152, 96)


@dataclasses.dataclass(frozen=True)
class RemapClass:
    win_h: int
    win_w: int
    gh: int         # per-group row sub-window height
    n: int          # number of supertiles
    # meta [2 + 2*SUB, n] i32 (transposed: SMEM pads the minor dim to
    # 128): oy, ox, (y0, x0) per subtile — the values the pipeline needs
    # ahead of the current step (index maps + next-window DMA)
    meta: np.ndarray
    # gy0 [n, 1, SUB*PG] i32: per-(subtile, group) row sub-window offsets
    # (multiples of 8), delivered as a per-step blocked SMEM input so the
    # scalar-prefetch array stays small for big plans (the trailing dims
    # are block-complete, as Pallas requires for blocked SMEM)
    gy0: np.ndarray
    lx: np.ndarray  # [n, SUB, PG, 128] i32 window-relative first-tap col
    ly: np.ndarray  # [n, SUB, PG, 128] i32 GROUP-window-relative first-tap row
    wx: np.ndarray  # [n, SUB, PG, 128] f32 x-tap weight (0 for dead lanes)
    fy: np.ndarray  # [n, SUB, PG, 128] f32 y fraction
    addb: np.ndarray  # [n, SUB, PG, 128] f32 additive transparent-fill bias


@dataclasses.dataclass(frozen=True)
class PallasRemapPlan:
    interp: Interpolation
    taps: int
    pg: int
    in_h: int
    in_w: int
    pad_y: int
    pad_x: int
    hp: int
    wp: int
    out_h: int
    out_w: int
    out_hp: int
    out_wp: int
    fill: float
    wrap: bool
    classes: Tuple[RemapClass, ...]
    # XLA fallback subtiles
    fb_rows: Optional[np.ndarray]  # [nf] subtile row index
    fb_cols: Optional[np.ndarray]  # [nf] subtile col index
    fb_base_y: Optional[np.ndarray]  # [nf, TH, TW] (unpadded input coords)
    fb_base_x: Optional[np.ndarray]
    fb_frac_y: Optional[np.ndarray]
    fb_frac_x: Optional[np.ndarray]
    fb_valid: Optional[np.ndarray]


def _circular_origin(vals: np.ndarray, n: int):
    """Smallest-window origin/extent covering `vals` on a ring of size n."""
    u = np.unique(vals)
    if u.size == 1:
        return int(u[0]), 1
    gaps = np.diff(u)
    wrap_gap = int(u[0]) + n - int(u[-1])
    k = int(np.argmax(gaps)) if gaps.size else -1
    if k >= 0 and gaps[k] > wrap_gap:
        return int(u[k + 1]), int(u[k]) + n - int(u[k + 1]) + 1
    return int(u[0]), int(u[-1] - u[0] + 1)


def pallas_eligible(spec: SampleSpec) -> bool:
    """Whether this plan's sizes fit the kernel backends (cheap; used by
    the pipeline to route WITHOUT building the full window plan, which is
    by far the most expensive plan stage)."""
    out_h, out_w = spec.base_y.shape
    return not (out_h < TH or out_w < TW * SUB or spec.in_w < CLASS_R[1])


def build_pallas_remap(spec: SampleSpec, fill: float) -> Optional["PallasRemapPlan"]:
    T = _TAPS[spec.interp]
    H, W = spec.in_h, spec.in_w
    out_h, out_w = spec.base_y.shape
    if not pallas_eligible(spec):
        return None  # tiny planes: the XLA path is fine there
    pg = (TP * T) // LANES
    px_per_group = LANES // T

    pad_y = T
    hp = -(-(H + 2 * pad_y) // Y_ALIGN) * Y_ALIGN  # extra rows are inert

    out_hp = -(-out_h // TH) * TH
    out_wp = -(-out_w // (TW * SUB)) * (TW * SUB)
    n_ty, n_tx = out_hp // TH, out_wp // TW  # subtile grid

    def pad2(a):
        return np.pad(a, ((0, out_hp - out_h), (0, out_wp - out_w)), mode="edge")

    by_p = pad2(spec.base_y.astype(np.int64)) + pad_y
    bx_p = pad2(spec.base_x.astype(np.int64))
    fy_p = pad2(spec.frac_y)
    fx_p = pad2(spec.frac_x)
    valid_p = None if spec.valid is None else pad2(spec.valid)

    wx_all = np.stack(
        _tap_weights(spec.interp, fx_p.astype(np.float64), np), axis=-1
    ).astype(np.float32)  # [out_hp, out_wp, T]

    # --- classify subtiles -------------------------------------------------
    sub_class = np.zeros((n_ty, n_tx), np.int8)  # 0=R 1=W 2=T 3=P 4=fallback
    sub_y0 = np.zeros((n_ty, n_tx), np.int64)
    sub_x0 = np.zeros((n_ty, n_tx), np.int64)
    px_rows = (np.arange(pg)[:, None] * px_per_group
               + np.arange(px_per_group)[None, :])  # pixel ids per group
    px_rows = np.minimum(px_rows, TP - 1)
    for ti in range(n_ty):
        for tj in range(n_tx):
            tb_y = by_p[ti * TH : (ti + 1) * TH, tj * TW : (tj + 1) * TW]
            tb_x = bx_p[ti * TH : (ti + 1) * TH, tj * TW : (tj + 1) * TW]
            y0 = int(tb_y.min())
            y_ext = int(tb_y.max()) - y0 + T
            if spec.wrap:
                x0, xe = _circular_origin(tb_x.reshape(-1), W)
            else:
                # clamp mode (barrel): bases may be negative (taps clamp to
                # the image edge, matched by the plane's replicate padding)
                x0 = max(0, int(tb_x.min()))
                xe = int(tb_x.max()) - x0 + 1
            x_ext = xe + T - 1
            # per-group (output-row-group) y-span must fit the group window
            tby_f = tb_y.reshape(-1)[px_rows]  # [pg, px_per_group]
            g_span = int((tby_f.max(axis=1) - tby_f.min(axis=1)).max()) + T
            for c, dims in enumerate((CLASS_R, CLASS_W, CLASS_T, CLASS_P)):
                # dims[0] <= hp: the window must fit the padded plane, or
                # the build-time origin clamp would go negative (short
                # inputs, e.g. the chroma of a 192-row equirect)
                if (dims[0] <= hp
                        and y_ext <= dims[0] - (Y_ALIGN - 1)
                        and x_ext <= dims[1] - (X_ALIGN - 1)
                        and g_span <= dims[2] - (Y_ALIGN - 1)):
                    break
            else:
                c = 4
            sub_class[ti, tj] = c
            # quantize window origins to the DMA tiling
            sub_y0[ti, tj] = (y0 // Y_ALIGN) * Y_ALIGN
            sub_x0[ti, tj] = (x0 // X_ALIGN) * X_ALIGN

    # supertile class = max of its subtile classes (fallback subtiles are
    # computed with clamped windows and later overwritten)
    n_sx = n_tx // SUB
    entries = {0: [], 1: [], 2: [], 3: []}
    fb_tiles = []
    for ti in range(n_ty):
        for sj in range(n_sx):
            cls = 0
            for s in range(SUB):
                c = sub_class[ti, sj * SUB + s]
                if c == 4:
                    fb_tiles.append((ti, sj * SUB + s))
                else:
                    cls = max(cls, int(c))
            entries[cls].append((ti, sj))

    # x-pad follows the widest class actually present (min CLASS_W, so
    # plans that predate CLASS_P keep their padded plane byte-identical)
    widest = CLASS_P[1] if entries[3] else CLASS_W[1]
    wp = -(-(W + widest) // X_ALIGN) * X_ALIGN
    pad_x = wp - W

    # tx-major lane order: lane = tx*px_per_group + px, so the in-kernel
    # tap reduction is a sum of contiguous static lane slices (no lane-split
    # reshapes, which Mosaic cannot lower)
    lane_px = np.arange(LANES) % px_per_group
    lane_tx = np.arange(LANES) // px_per_group

    def build_class(cls_id, cls_dims) -> Optional[RemapClass]:
        ents = entries[cls_id]
        if not ents:
            return None
        wh, ww, gh = cls_dims
        n = len(ents)
        meta = np.zeros((n, 2 + 2 * SUB), np.int32)
        gy0s = np.zeros((n, 1, SUB * pg), np.int32)
        shp = (n, SUB, pg, LANES)
        lx = np.zeros(shp, np.int32)
        ly = np.zeros(shp, np.int32)
        wx = np.zeros(shp, np.float32)
        fyl = np.zeros(shp, np.float32)
        addb = np.zeros(shp, np.float32)
        for k, (ti, sj) in enumerate(ents):
            meta[k, 0] = ti
            meta[k, 1] = sj
            for s in range(SUB):
                tj = sj * SUB + s
                y0 = int(np.clip(sub_y0[ti, tj], 0, hp - wh))
                x0 = int(min(sub_x0[ti, tj], wp - ww))
                assert y0 % Y_ALIGN == 0 and x0 % X_ALIGN == 0
                meta[k, 2 + 2 * s] = y0
                meta[k, 3 + 2 * s] = x0
                ys = slice(ti * TH, (ti + 1) * TH)
                xs = slice(tj * TW, (tj + 1) * TW)
                tb_y = by_p[ys, xs].reshape(-1)
                tb_x = bx_p[ys, xs].reshape(-1)
                tfy = fy_p[ys, xs].reshape(-1)
                twx = wx_all[ys, xs].reshape(TP, T)
                tva = None if valid_p is None else valid_p[ys, xs].reshape(-1)
                if spec.wrap:
                    txw = np.where(tb_x < x0, tb_x + W, tb_x) - x0
                else:
                    txw = tb_x - x0  # may go negative; clipped below = clamp
                for g in range(pg):
                    px = g * px_per_group + lane_px
                    pxc = np.minimum(px, TP - 1)
                    lx[k, s, g] = np.clip(txw[pxc] + lane_tx, 0, ww - 1)
                    lyw = np.clip(tb_y[pxc] - y0, 0, wh - T)
                    gy0 = int(np.clip((lyw.min() // Y_ALIGN) * Y_ALIGN,
                                      0, wh - gh))
                    gy0s[k, 0, s * pg + g] = gy0
                    ly[k, s, g] = np.clip(lyw - gy0, 0, gh - T)
                    fyl[k, s, g] = tfy[pxc]
                    w = twx[pxc, lane_tx]
                    if tva is not None:
                        addb[k, s, g] = np.where(
                            (~tva[pxc]) & (lane_tx == 0), fill, 0.0
                        )
                        w = np.where(tva[pxc], w, 0.0)
                    wx[k, s, g] = w
        return RemapClass(wh, ww, gh, n, meta.T.copy(), gy0s, lx, ly, wx, fyl, addb)

    built = tuple(
        c
        for c in (build_class(0, CLASS_R), build_class(1, CLASS_W),
                  build_class(2, CLASS_T), build_class(3, CLASS_P))
        if c is not None
    )

    if fb_tiles:
        def gather_tiles(a):
            return np.stack(
                [
                    a[ti * TH : (ti + 1) * TH, tj * TW : (tj + 1) * TW]
                    for ti, tj in fb_tiles
                ]
            )
        fb = dict(
            fb_rows=np.array([t[0] for t in fb_tiles], np.int32),
            fb_cols=np.array([t[1] for t in fb_tiles], np.int32),
            fb_base_y=gather_tiles(by_p - pad_y).astype(np.int32),
            fb_base_x=gather_tiles(bx_p).astype(np.int32),
            fb_frac_y=gather_tiles(fy_p).astype(np.float32),
            fb_frac_x=gather_tiles(fx_p).astype(np.float32),
            fb_valid=None if valid_p is None else gather_tiles(valid_p),
        )
    else:
        fb = dict(
            fb_rows=None, fb_cols=None, fb_base_y=None, fb_base_x=None,
            fb_frac_y=None, fb_frac_x=None, fb_valid=None,
        )

    return PallasRemapPlan(
        interp=spec.interp,
        taps=T,
        pg=pg,
        in_h=H,
        in_w=W,
        pad_y=pad_y,
        pad_x=pad_x,
        hp=hp,
        wp=wp,
        out_h=out_h,
        out_w=out_w,
        out_hp=out_hp,
        out_wp=out_wp,
        fill=fill,
        wrap=spec.wrap,
        classes=built,
        **fb,
    )


def pad_plane(plan: PallasRemapPlan, x: jnp.ndarray) -> jnp.ndarray:
    """Pad a uint8 [B, H, W] plane with wrap (or clamp) borders so every
    kernel window and fallback tap is in-bounds."""
    py, px = plan.pad_y, plan.pad_x
    if plan.wrap:
        top = x[:, -py:, :]
        bot = x[:, :py, :]
    else:
        top = jnp.repeat(x[:, :1, :], py, axis=1)
        bot = jnp.repeat(x[:, -1:, :], py, axis=1)
    x = jnp.concatenate([top, x, bot], axis=1)
    if x.shape[1] < plan.hp:  # DMA-tiling round-up rows (inert, never sampled)
        x = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], plan.hp - x.shape[1], x.shape[2]), x.dtype)],
            axis=1,
        )
    if plan.wrap:
        reps = -(-px // x.shape[2])  # wrap pad may exceed the plane width
        right = jnp.concatenate([x] * reps, axis=2)[:, :, :px]
    else:
        right = jnp.repeat(x[:, :, -1:], px, axis=2)
    return jnp.concatenate([x, right], axis=2)


def _wy_weights(interp: Interpolation, f, t_iota):
    """Per-lane y-tap weights w(t, f) on [LANES, T] arrays (OpenCV kernels,
    see sampling.py)."""
    if interp == Interpolation.NEAREST:
        return jnp.ones_like(f)
    if interp == Interpolation.LINEAR:
        return jnp.where(t_iota == 0, 1.0 - f, f)
    if interp == Interpolation.CUBIC:
        A = -0.75
        w0 = ((A * (f + 1) - 5 * A) * (f + 1) + 8 * A) * (f + 1) - 4 * A
        w1 = ((A + 2) * f - (A + 3)) * f * f + 1
        g = 1.0 - f
        w2 = ((A + 2) * g - (A + 3)) * g * g + 1
        w3 = 1.0 - w0 - w1 - w2
        return jnp.where(
            t_iota == 0,
            w0,
            jnp.where(t_iota == 1, w1, jnp.where(t_iota == 2, w2, w3)),
        )
    # LANCZOS4 (select-chain over tap index; no table gathers in-kernel)
    s45 = 0.70710678118654752440084436210485
    cs = [(1, 0), (-s45, -s45), (0, 1), (s45, -s45),
          (-1, 0), (s45, s45), (0, -1), (-s45, s45)]
    y0 = -(f + 3.0) * (math.pi * 0.25)
    s0 = jnp.sin(y0)
    c0 = jnp.cos(y0)
    tf = t_iota.astype(jnp.float32)
    y = -(f + 3.0 - tf) * (math.pi * 0.25)
    denom = jnp.where(y * y == 0.0, 1.0, y * y)
    a = jnp.full_like(f, cs[7][0]) + jnp.zeros_like(tf)
    b = jnp.full_like(f, cs[7][1]) + jnp.zeros_like(tf)
    for k in range(6, -1, -1):
        a = jnp.where(t_iota == k, cs[k][0], a)
        b = jnp.where(t_iota == k, cs[k][1], b)
    w = (a * s0 + b * c0) / denom
    total = jnp.sum(w, axis=-1, keepdims=True)
    w = w / total
    exact = f < 1e-7
    return jnp.where(exact, jnp.where(t_iota == 3, 1.0, 0.0), w)


def _class_nbuf(cls: RemapClass, batch: int) -> int:
    """Window-scratch buffer count: double-buffer whenever the scratch
    fits the VMEM budget.  The polar class's 128x1152 windows exceed it
    at batch 8 (9.4 MB, see CLASS_P note above) and fall back to serial
    single-buffered DMA there; at the batch-1..4 latencies the window
    path actually serves, even the polar scratch is small (1.2-4.7 MB)
    and the four per-step window copies overlap the previous body."""
    if SUB * batch * cls.win_h * cls.win_w * 2 <= 6 * 1024 * 1024:
        return 2
    return 1


def _make_kernel(plan: PallasRemapPlan, cls: RemapClass, batch: int):
    T = plan.taps
    PG = plan.pg
    wh, ww, gh = cls.win_h, cls.win_w, cls.gh
    px_per_group = LANES // T
    n_chunks = ww // LANES
    interp = plan.interp
    n = cls.n
    nbuf = _class_nbuf(cls, batch)

    def kernel(meta_ref, gy0_ref, lx_ref, ly_ref, wx_ref, fy_ref, addb_ref,
               src_ref, out_ref, win, sems):
        i = pl.program_id(0)

        def dma(slot, t, s):
            return pltpu.make_async_copy(
                src_ref.at[
                    :,
                    pl.ds(pl.multiple_of(meta_ref[2 + 2 * s, t], Y_ALIGN), wh),
                    pl.ds(pl.multiple_of(meta_ref[3 + 2 * s, t], X_ALIGN), ww),
                ],
                win.at[slot, s],
                sems.at[slot, s],
            )

        if nbuf == 1:
            # serial DMA↔compute: the in-order core issues these starts
            # after the previous step's vector reads of `win`, so reusing
            # the single slot is race-free; the exposed latency is noise
            # for the rare class this serves (see _class_nbuf)
            slot = 0
            for s in range(SUB):
                dma(0, i, s).start()
        else:
            @pl.when(i == 0)
            def _():
                for s in range(SUB):
                    dma(0, 0, s).start()

            @pl.when(i + 1 < n)
            def _():
                for s in range(SUB):
                    dma((i + 1) % 2, i + 1, s).start()

            slot = i % 2
        for s in range(SUB):
            dma(slot, i, s).wait()

        t_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, T), 1)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (gh, LANES), 0)
        results = {}  # (s, g) -> [B, px_per_group]
        for s in range(SUB):
            for g in range(PG):
                # Per group: slice a [gh, ww] row sub-window (offset from
                # the plan, 8-aligned), build a combined y-weight matrix
                # W2 [gh, 128] (W2[r, lane] = wy_t * wx at r == ly+t), and
                # process ALL frames at once: the x-gather operand stacks
                # the batch in sublanes [B*gh, 128], the y-interp is one
                # multiply + one reduction over the gh axis.  No transpose,
                # no per-frame loop, no second gather.
                lx = lx_ref[0, s, g]
                ly = ly_ref[0, s, g]
                wxv = wx_ref[0, s, g]
                fyv = fy_ref[0, s, g]
                addv = addb_ref[0, s, g]
                wy = _wy_weights(interp, fyv[:, None], t_iota)  # [128, T]
                wyx = wy * wxv[:, None]  # [128, T]
                w2 = None
                for t in range(T):
                    m = (r_iota == (ly[None, :] + t)).astype(jnp.float32)
                    term = m * wyx[:, t][None, :]
                    w2 = term if w2 is None else w2 + term
                if n_chunks > 1:
                    chunk = lx // LANES
                    within = lx % LANES
                else:
                    chunk = None
                    within = lx
                idxx = jnp.broadcast_to(within[None, :], (batch * gh, LANES))
                r0 = pl.multiple_of(gy0_ref[0, 0, s * PG + g], Y_ALIGN)
                ws = win[slot, s, :, pl.ds(r0, gh), :]  # [B, gh, ww] u8
                wf = ws.astype(jnp.int32).astype(jnp.float32)
                if n_chunks == 1:
                    op = wf.reshape(batch * gh, ww)
                    xa = jnp.take_along_axis(op, idxx, axis=1)
                else:
                    xa = None
                    for c in range(n_chunks):
                        op = wf[:, :, c * LANES : (c + 1) * LANES].reshape(
                            batch * gh, LANES
                        )
                        xac = jnp.take_along_axis(op, idxx, axis=1)
                        xa = xac if xa is None else jnp.where(
                            (chunk == c)[None, :], xac, xa
                        )
                xa3 = xa.reshape(batch, gh, LANES)
                resq = jnp.sum(xa3 * w2[None], axis=1) + addv[None]  # [B,128]
                if T > 1:
                    # lanes are tx-major: the tap reduction is a sum of
                    # contiguous static lane slices
                    racc = resq[:, 0:px_per_group]
                    for t in range(1, T):
                        racc = racc + resq[
                            :, t * px_per_group : (t + 1) * px_per_group
                        ]
                    resq = racc
                results[(s, g)] = resq  # [B, px_per_group]
        # assemble [B, TH, TW*SUB] from static lane slices of the groups
        out_rows = []
        for r in range(TH):
            pieces = []
            for s in range(SUB):
                start = r * TW
                while start < (r + 1) * TW:
                    g = start // px_per_group
                    off = start % px_per_group
                    take = min(px_per_group - off, (r + 1) * TW - start)
                    pieces.append(results[(s, g)][:, off : off + take])
                    start += take
            out_rows.append(jnp.concatenate(pieces, axis=1)[:, None, :])
        tile = jnp.concatenate(out_rows, axis=1)  # [B, TH, TW*SUB]
        tile = jnp.clip(jnp.floor(tile + 0.5), 0.0, 255.0)
        # Mosaic has no direct f32->u8 cast; hop through int32.
        out_ref[...] = tile.astype(jnp.int32).astype(jnp.uint8)

    return kernel


def _run_class(plan, cls: RemapClass, padded, prev_out, interpret):
    batch = padded.shape[0]
    PG = plan.pg

    def tile_spec():
        return pl.BlockSpec(
            (1, SUB, PG, LANES), lambda i, m: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec((1, 1, SUB * PG), lambda i, m: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ] + [tile_spec() for _ in range(5)] + [
        pl.BlockSpec(memory_space=pl.ANY)
    ]
    args = [
        staged(cls.meta),
        staged(cls.gy0),
        staged(cls.lx),
        staged(cls.ly),
        staged(cls.wx),
        staged(cls.fy),
        staged(cls.addb),
        padded,
    ]
    kernel = _make_kernel(plan, cls, batch)
    kwargs = {}
    if prev_out is not None:
        args.append(prev_out)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        kwargs["input_output_aliases"] = {8: 0}

        def kfn(meta_ref, gy0_ref, lx_ref, ly_ref, wx_ref, fy_ref, addb_ref,
                src_ref, prev_ref, out_ref, win, sems):
            del prev_ref
            kernel(meta_ref, gy0_ref, lx_ref, ly_ref, wx_ref, fy_ref,
                   addb_ref, src_ref, out_ref, win, sems)
    else:
        kfn = kernel

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cls.n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (batch, TH, TW * SUB),
            lambda i, m: (0, m[0, i], m[1, i]),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (_class_nbuf(cls, batch), SUB, batch, cls.win_h, cls.win_w),
                jnp.uint8,
            ),
            pltpu.SemaphoreType.DMA((_class_nbuf(cls, batch), SUB)),
        ],
    )
    return pl.pallas_call(
        kfn,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct(
            (batch, plan.out_hp, plan.out_wp), jnp.uint8
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        **kwargs,
    )(*args)


def _run_fallback(plan: PallasRemapPlan, padded: jnp.ndarray, out: jnp.ndarray):
    """XLA gather for leftover subtiles, patched in with block updates."""
    if plan.fb_rows is None:
        return out
    T = plan.taps
    B = padded.shape[0]
    flat = padded.reshape(B, plan.hp * plan.wp)
    nf = plan.fb_rows.shape[0]
    by = staged(plan.fb_base_y).reshape(-1) + plan.pad_y
    bx = staged(plan.fb_base_x).reshape(-1)
    wy = _tap_weights(plan.interp, staged(plan.fb_frac_y).reshape(-1))
    wx = _tap_weights(plan.interp, staged(plan.fb_frac_x).reshape(-1))
    acc = None
    W, wp = plan.in_w, plan.wp
    for ty in range(T):
        row = (by + ty) * wp
        for tx in range(T):
            xx = bx + tx
            if plan.wrap:
                xx = jnp.where(xx >= W, xx - W, xx)
            else:
                xx = jnp.clip(xx, 0, W - 1)
            g = jnp.take_along_axis(flat, (row + xx)[None, :], axis=1)
            g = g.astype(jnp.float32)
            term = g if T == 1 else (wy[ty] * wx[tx])[None, :] * g
            acc = term if acc is None else acc + term
    if plan.fb_valid is not None:
        acc = jnp.where(
            staged(plan.fb_valid).reshape(-1)[None, :],
            acc,
            jnp.float32(plan.fill),
        )
    vals = jnp.clip(jnp.floor(acc + 0.5), 0, 255).astype(jnp.uint8)
    vals = vals.reshape(B, nf, TH, TW)
    for k in range(nf):
        out = jax.lax.dynamic_update_slice(
            out,
            vals[:, k],
            (0, int(plan.fb_rows[k]) * TH, int(plan.fb_cols[k]) * TW),
        )
    return out


# Per-invocation batch cap: window scratch is [2, SUB, B, win_h, win_w]
# uint8 and must fit VMEM alongside the kernel's working set.
MAX_KERNEL_BATCH = 8


def remap_pallas(
    plan: PallasRemapPlan, plane_u8: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Remap a uint8 [B, H, W] plane → uint8 [B, out_h, out_w]."""
    B = plane_u8.shape[0]
    if B > MAX_KERNEL_BATCH:
        parts = [
            remap_pallas(plan, plane_u8[k : k + MAX_KERNEL_BATCH], interpret)
            for k in range(0, B, MAX_KERNEL_BATCH)
        ]
        return jnp.concatenate(parts, axis=0)
    padded = pad_plane(plan, plane_u8)
    out = None
    for cls in plan.classes:
        out = _run_class(plan, cls, padded, out, interpret)
    if out is None:
        out = jnp.full(
            (plane_u8.shape[0], plan.out_hp, plan.out_wp),
            int(plan.fill),
            jnp.uint8,
        )
    out = _run_fallback(plan, padded, out)
    return out[:, : plan.out_h, : plan.out_w]
