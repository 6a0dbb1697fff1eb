"""Lane-batched Pallas prefilter — the large-batch blur path.

The XLA prefilter (:mod:`..filtering`) is HBM-bound: each of up to ~13
x-taps re-reads the full f32 plane, so a 4K luma blur costs ~0.75 ms/frame
at batch 128.  This kernel keeps the plane uint8 in HBM, converts once in
VMEM, and runs both 1-D convolutions on in-register data, with the frame
batch in the 128 vector lanes ([H, W, B] layout — the same layout the
lane remap kernel consumes, so the blurred plane feeds it directly).

Border semantics match the reference's non-isolated ``cv::sepFilter2D``
ROIs (``VideoFrameTransform.cpp:189-197``): taps read *real neighbor
pixels* across band/tile/eye seams and replicate only at true plane edges
(the wrapper pads the plane in HBM with edge rows/cols).  Results round
half-up to uint8 like ``pipeline._round_u8``; the x convolution runs
first, matching the XLA path's accumulation order.

Coverage (after the round-2 rewrite): mono and TB/LR stereo, any number
of horizontal segments (as long as each 256-column kernel tile's taps are
uniform — per-column tap variation only arises with ``adjust_kernel`` +
off-center/rotation), band boundaries need NOT be 8-row-aligned (partial
blocks use masked row writes).  Work tiles are grouped into classes by
bucketed tap lengths; all classes run in ONE ``pallas_call`` whose kernel
branches on a per-step class id, so multi-band output blocks compose
correctly.  Falls back to the XLA path (``build_blur_lane`` returns None)
when H is not a multiple of 8, a tile needs per-column taps, or kernels
exceed the window budget.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import StereoFormat
from ..filtering import BlurPlan
from .staging import staged

TH = 8          # output tile rows
TW = 256        # output tile cols
LANES = 128
MAX_CLASSES = 12
MAX_WINDOW_BYTES = 4 * 1024 * 1024  # double-buffered DMA window budget


@dataclasses.dataclass(frozen=True)
class BlurClassGeom:
    """One kernel-length class (static loop bounds for a kernel branch)."""

    lx: int  # bucketed x tap count (2*rx+1, rx a multiple of 8)
    ly: int  # bucketed y tap count


@dataclasses.dataclass(frozen=True)
class BlurLanePlan:
    H: int
    W: int
    Wt: int              # W rounded up to TW
    rxq_g: int           # global x halo (max class rx; multiple of 8)
    ry_g: int            # global y halo (max class ry)
    n_ty: int
    n_tx: int
    n_tiles: int         # output blocks
    n_work: int          # work tiles (>= n_tiles: partial bands add tiles)
    classes: Tuple[BlurClassGeom, ...]
    meta: np.ndarray     # i32 [6, n_work]: out_id, win_row, win_col, a, b, cid
    tapsx: np.ndarray    # f32 [n_work, 8, LXg] centered x taps (row 0 only;
                         # the 8-row pad satisfies Mosaic's SMEM block rule)
    tapsy: np.ndarray    # f32 [n_work, 8, LYg]
    zero_w_from: int     # zero columns >= this (odd LR dims), or W


def _bucket(n: int, steps: Tuple[int, ...]) -> Optional[int]:
    for s in steps:
        if n <= s:
            return s
    return None


def _center_pad(taps: np.ndarray, length: int) -> np.ndarray:
    out = np.zeros(length, np.float32)
    off = (length - taps.shape[0]) // 2
    out[off : off + taps.shape[0]] = taps
    return out


def build_blur_lane(
    bp: Optional[BlurPlan], H: int, W: int
) -> Optional[BlurLanePlan]:
    if bp is None:
        return None
    if H % TH or H < TH or W < TW:
        return None

    # Global band raster: TB stacks the per-eye bands by rows; LR eyes sit
    # side by side (columns), sharing the band rows.  Parity with
    # filtering.apply_blur's eye offsets (filterPlane, :630-691).
    if bp.stereo == StereoFormat.TB:
        gbands = [
            (off + band.top, band.height, band)
            for off in (0, bp.eye_h)
            for band in bp.bands
        ]
    else:
        gbands = [(band.top, band.height, band) for band in bp.bands]
    if sum(h for _, h, _ in gbands) != H:
        return None  # odd TB leftover row: XLA fallback

    # columns covered by the eyes; the rest (odd LR leftover) stays zero
    w_cov = 2 * bp.eye_w if bp.stereo == StereoFormat.LR else W
    w_cov = min(w_cov, W)

    def eye_cols(c0: int, c1: int) -> np.ndarray:
        idx = np.arange(c0, c1)
        if bp.stereo == StereoFormat.LR:
            idx = np.where(idx >= bp.eye_w, idx - bp.eye_w, idx)
        return np.clip(idx, 0, bp.eye_w - 1)

    n_tx = -(-W // TW)
    Wt = n_tx * TW
    n_ty = H // TH

    # tap-length buckets (in-kernel offsets are static, so no alignment
    # constraint — buckets only trade class count against zero-tap MACs)
    x_buckets = tuple(
        2 * r + 1 for r in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 120)
    )
    y_buckets = tuple(2 * r + 1 for r in (1, 2, 3, 4, 6, 8, 16))

    # enumerate work tiles: (global band, 8-row block, x tile)
    work = []  # (out_id, a, b, class_id, kx_pad, ky_pad)
    class_keys = {}
    for gt, height, band in gbands:
        gb = gt + height
        if gb > H:
            return None
        lxb = _bucket(band.kx.shape[1], x_buckets)
        lyb = _bucket(band.ky.shape[1], y_buckets)
        if lxb is None or lyb is None:
            return None
        for tb in range(gt // TH, -(-gb // TH)):
            b0 = tb * TH
            a = max(gt, b0) - b0
            b = min(gb, b0 + TH) - b0
            for tj in range(n_tx):
                # taps for this tile's covered columns; require uniformity
                c0, c1 = tj * TW, min(tj * TW + TW, w_cov)
                cols = eye_cols(c0, c1) if c1 > c0 else eye_cols(w_cov - 1, w_cov)
                kxs = band.kx_col[:, cols]
                kys = band.ky_col[:, cols]
                if (kxs != kxs[:, :1]).any() or (kys != kys[:, :1]).any():
                    return None  # per-column taps: XLA fallback
                key = (lxb, lyb)
                class_keys.setdefault(key, len(class_keys))
                work.append(
                    (
                        tb * n_tx + tj,
                        a,
                        b,
                        class_keys[key],
                        _center_pad(kxs[:, 0], lxb),
                        _center_pad(kys[:, 0], lyb),
                    )
                )
    if len(class_keys) > MAX_CLASSES:
        return None

    classes = [None] * len(class_keys)
    for (lxb, lyb), cid in class_keys.items():
        classes[cid] = BlurClassGeom(lx=lxb, ly=lyb)

    # global x halo rounded to 8 so DMA column offsets (tj*TW) and the
    # padded plane's sublane extents stay tile-friendly
    rxq_g = -(-max((c.lx - 1) // 2 for c in classes) // 8) * 8
    ry_g = max((c.ly - 1) // 2 for c in classes)
    win_bytes = 2 * (TH + 2 * ry_g) * (TW + 2 * rxq_g) * LANES
    if win_bytes > MAX_WINDOW_BYTES:
        return None
    zero_w_from = w_cov

    # sort so tiles sharing an output block are consecutive (the block
    # stays resident in VMEM between steps; masked row writes compose)
    work.sort(key=lambda t: t[0])
    lxg = max(c.lx for c in classes)
    lyg = max(c.ly for c in classes)
    n_work = len(work)
    meta = np.zeros((6, n_work), np.int32)
    tapsx = np.zeros((n_work, 8, lxg), np.float32)
    tapsy = np.zeros((n_work, 8, lyg), np.float32)
    for i, (oid, a, b, cid, kx, ky) in enumerate(work):
        tb, tj = divmod(oid, n_tx)
        meta[:, i] = (oid, tb * TH, tj * TW, a, b, cid)
        tapsx[i, 0, (lxg - len(kx)) // 2 : (lxg - len(kx)) // 2 + len(kx)] = kx
        tapsy[i, 0, (lyg - len(ky)) // 2 : (lyg - len(ky)) // 2 + len(ky)] = ky

    # a block's rows must be fully covered by its tiles' [a, b) ranges
    cover = {}
    for oid, a, b, *_ in work:
        cover[oid] = cover.get(oid, 0) + (b - a)
    assert all(v == TH for v in cover.values()), "row coverage gap"

    return BlurLanePlan(
        H=H,
        W=W,
        Wt=Wt,
        rxq_g=rxq_g,
        ry_g=ry_g,
        n_ty=n_ty,
        n_tx=n_tx,
        n_tiles=n_ty * n_tx,
        n_work=n_work,
        classes=tuple(classes),
        meta=meta,
        tapsx=tapsx,
        tapsy=tapsy,
        zero_w_from=zero_w_from,
    )


def _make_kernel(plan: BlurLanePlan):
    wh = TH + 2 * plan.ry_g
    ww = TW + 2 * plan.rxq_g
    n = plan.n_work
    lxg = plan.tapsx.shape[2]
    lyg = plan.tapsy.shape[2]

    def kernel(meta_ref, tx_ref, ty_ref, src_ref, out_ref, win, sems):
        i = pl.program_id(0)

        def dma(slot, t):
            return pltpu.make_async_copy(
                src_ref.at[
                    pl.ds(meta_ref[1, t], wh),
                    pl.ds(pl.multiple_of(meta_ref[2, t], 8), ww),
                    :,
                ],
                win.at[slot],
                sems.at[slot],
            )

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            dma((i + 1) % 2, i + 1).start()

        slot = i % 2
        dma(slot, i).wait()

        a = meta_ref[3, i]
        b = meta_ref[4, i]
        cid = meta_ref[5, i]

        rows_idx = jax.lax.broadcasted_iota(jnp.int32, (TH, TW, LANES), 0)
        mask = (rows_idx >= a) & (rows_idx < b)

        for k, cls in enumerate(plan.classes):
            rx = (cls.lx - 1) // 2
            ry = (cls.ly - 1) // 2
            off0 = plan.rxq_g - rx  # static, window col of first tap
            row0 = plan.ry_g - ry   # static, window row offset

            @pl.when(cid == k)
            def _(cls=cls, rx=rx, ry=ry, off0=off0, row0=row0):
                kxs = [tx_ref[0, 0, (lxg - cls.lx) // 2 + u] for u in range(cls.lx)]
                kys = [ty_ref[0, 0, (lyg - cls.ly) // 2 + v] for v in range(cls.ly)]
                # x-convolve each needed row once (rows are shared across
                # the y-taps of adjacent output rows), then y-convolve.
                xrows = []
                for j in range(TH + cls.ly - 1):
                    v = win[slot, pl.ds(row0 + j, 1), :, :]  # (1, ww, B) u8
                    vf = v.astype(jnp.int32).astype(jnp.float32)
                    acc = None
                    for u in range(cls.lx):
                        term = kxs[u] * vf[:, off0 + u : off0 + u + TW, :]
                        acc = term if acc is None else acc + term
                    xrows.append(acc)  # (1, TW, B) f32
                rows = []
                for r in range(TH):
                    acc = None
                    for dy in range(cls.ly):
                        term = kys[dy] * xrows[r + dy]
                        acc = term if acc is None else acc + term
                    rows.append(acc)
                blk = jnp.concatenate(rows, axis=0)  # (TH, TW, B)
                blk = jnp.clip(jnp.floor(blk + 0.5), 0.0, 255.0)
                blk = blk.astype(jnp.int32).astype(jnp.uint8)
                out_ref[0] = jnp.where(mask, blk, out_ref[0])

    return kernel


def blur_lane(
    plan: BlurLanePlan, x: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Blur + round a uint8 plane in lane layout: [H, W, 128] -> same."""
    assert x.shape == (plan.H, plan.W, LANES), x.shape
    padded = jnp.pad(
        x,
        (
            (plan.ry_g, plan.ry_g),
            (plan.rxq_g, plan.rxq_g + plan.Wt - plan.W),
            (0, 0),
        ),
        mode="edge",
    )
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.n_work,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, plan.tapsx.shape[2]),
                lambda i, m: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 8, plan.tapsy.shape[2]),
                lambda i, m: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, TW, LANES),
            lambda i, m: (m[0, i], 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, TH + 2 * plan.ry_g, TW + 2 * plan.rxq_g, LANES),
                jnp.uint8,
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(plan),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((plan.n_tiles, TH, TW, LANES), jnp.uint8),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        staged(plan.meta),
        staged(plan.tapsx),
        staged(plan.tapsy),
        padded,
    )
    out = out.reshape(plan.n_ty, plan.n_tx, TH, TW, LANES)
    out = jnp.transpose(out, (0, 2, 1, 3, 4))
    out = out.reshape(plan.H, plan.Wt, LANES)
    out = out[:, : plan.W, :]
    if plan.zero_w_from < plan.W:
        # odd LR dims: the reference's zero-initialized destination leaves
        # the uncovered final column zero (filterPlane, :625)
        col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        out = jnp.where(col >= plan.zero_w_from, jnp.uint8(0), out)
    return out
