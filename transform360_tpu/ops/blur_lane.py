"""Lane-batched Pallas prefilter — the large-batch blur path.

The XLA prefilter (:mod:`..filtering`) is HBM-bound: each of up to ~13
x-taps re-reads the full f32 plane, so a 4K luma blur costs ~0.75 ms/frame
at batch 128.  This kernel keeps the plane uint8 in HBM, converts once in
VMEM, and runs both 1-D convolutions on in-register data, with the frame
batch in the 128 vector lanes ([H, W, B] layout — the same layout the
lane remap kernel consumes, so the blurred plane feeds it directly).

MXU design (x-convolution as matmul): the horizontal convolution runs on
the systolic array as a dense ``(TW, WWP) @ (WWP, B)`` matmul per output
row, where the ``(TW, WWP)`` operand is a banded Toeplitz matrix holding
the segment's x taps (one matrix per distinct tap vector, stored in an
HBM bank and pipelined in via its own BlockSpec).  This makes the per-step
cost *independent of tap length* — the adaptive 32-band config's ~87-tap
polar kernels (σ_X = σ_Y/cos(lat), VideoFrameTransform.cpp:219) cost the
same as the default 13-tap ones — and supports per-column taps natively
(column t of the matrix can hold any tap vector), so ``adjust_kernel``
with off-center/rotation no longer falls back to the XLA path.  The
vertical convolution stays on the VPU with per-work-tile taps read from
SMEM, positioned in global window coordinates (static tap-loop bound
``2*ry_g+1``; zero-padded taps are free of branching).

The v1/v2 approach (unrolled VPU taps with a per-step class-id branch)
lost badly on many-class plans: Mosaic executes every class branch on
every step, so the adaptive config paid the *sum* of all class tap
lengths per step (~136 ms/pass measured vs ~24 ms for the default plan).

Work decomposition: each 8-row × 256-col output block is covered by one
work item per (latitude band × blur segment) it intersects; items write
disjoint row/column ranges of the block with masked writes, so band
boundaries need not be 8-row-aligned and blur-segment boundaries need
not align with the 256-col kernel tiles (e.g. chroma planes, whose
segment width is half the luma's).

Border semantics match the reference's non-isolated ``cv::sepFilter2D``
ROIs (``VideoFrameTransform.cpp:189-197``): taps read *real neighbor
pixels* across band/tile/eye seams and replicate only at true plane edges
(the wrapper pads the plane in HBM with edge rows/cols).  Results round
half-up to uint8 like ``pipeline._round_u8``.  The vertical convolution
runs first here (the XLA path runs horizontal first); the orders differ
only in f32 summation rounding, ~1e-6 relative.  Falls back to the XLA
path (``build_blur_lane`` returns None) when H is not a multiple of 8 or
kernel/window sizes exceed the VMEM budgets.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

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
MAX_VMEM_BYTES = 12 * 1024 * 1024   # window + f32 copy + matrices + out
MAX_MX_BANK_BYTES = 768 * 1024 * 1024  # HBM budget for the tap-matrix bank
MAX_WORK = 32768                    # scalar-prefetch meta budget

# f32 matmul precision for the x-convolution ("default" = one bf16 pass,
# ~0.08 u8 LSB RMSE from operand rounding; "high" = manual 3-dot bf16
# hi/lo split, ~2^-16 relative (Mosaic does not accept
# lax.Precision.HIGH on dots, so the split is done by hand); "highest" =
# lax HIGHEST, ~f32-exact, ~2x the "high" cost).  Measured per-pass cost
# at 4K luma: 16.3 / ~22 / 30.2 ms.
_PRECISIONS = ("default", "high", "highest")


@dataclasses.dataclass(frozen=True)
class BlurLanePlan:
    H: int
    W: int
    Wt: int              # W rounded up to TW
    rxq_g: int           # global x halo (max rx rounded up to 8)
    ry_g: int            # global y halo (max ry)
    wwp: int             # window cols: TW + 2*rxq_g rounded up to 128
    n_ty: int
    n_tx: int
    n_tiles: int         # output blocks
    n_work: int          # work items (>= n_tiles: band/segment splits)
    meta: np.ndarray     # i32 [8, n_work]: out_id, win_row, win_col,
                         #                  a, b, ca, cb, mx_idx
    tapsy: np.ndarray    # f32 [n_work, 8, LYW] window-positioned y taps
                         # (row 0 only; the 8-row pad satisfies Mosaic's
                         # SMEM block rule)
    mx_bank: np.ndarray  # f32 [n_mx, TW, wwp] banded x-tap matrices
    zero_w_from: int     # zero columns >= this (odd LR dims), or W
    precision: str       # x-matmul precision key (see _PRECISION)


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

    n_tx = -(-W // TW)
    Wt = n_tx * TW
    n_ty = H // TH

    rx_g = max((b.kx.shape[1] - 1) // 2 for _, _, b in gbands)
    ry_g = max((b.ky.shape[1] - 1) // 2 for _, _, b in gbands)
    lyw = 2 * ry_g + 1
    if lyw > LANES:
        return None  # giant vertical kernels: XLA fallback
    rxq_g = -(-rx_g // 8) * 8
    wwp = -(-(TW + 2 * rxq_g) // LANES) * LANES
    wh = TH + 2 * ry_g

    vmem = (
        2 * wh * wwp * LANES          # double-buffered u8 window
        + wh * wwp * LANES * 4        # f32 window copy
        + 2 * TW * wwp * 4            # pipelined tap matrices
        + TH * wwp * LANES * 4        # y-conv rows (register pressure)
        + 2 * TH * TW * LANES         # pipelined out blocks
    )
    if vmem > MAX_VMEM_BYTES:
        return None

    # per-output-column blur segment of a band (eye-folded for LR)
    def seg_of(band, c: int) -> int:
        c = min(c, w_cov - 1)
        ec = c - bp.eye_w if (bp.stereo == StereoFormat.LR and c >= bp.eye_w) else c
        ec = min(max(ec, 0), bp.eye_w - 1)
        return min(ec // bp.tile_w, band.kx.shape[0] - 1)

    mx_keys: Dict[Tuple[int, bytes], int] = {}
    mx_specs: List[Tuple[int, np.ndarray]] = []  # (rx, taps)

    def mx_index(band, seg: int) -> int:
        kx = band.kx[seg]
        rx = (kx.shape[0] - 1) // 2
        key = (rx, kx.tobytes())
        idx = mx_keys.get(key)
        if idx is None:
            idx = len(mx_specs)
            mx_keys[key] = idx
            mx_specs.append((rx, kx))
        return idx

    # enumerate work items: (band, 8-row block, x tile, segment col-run)
    work = []  # (out_id, a, b, ca, cb, mx_idx, kyw)
    for gt, height, band in gbands:
        gb = gt + height
        if gb > H:
            return None
        ry = (band.ky.shape[1] - 1) // 2
        for tb in range(gt // TH, -(-gb // TH)):
            b0 = tb * TH
            a = max(gt, b0) - b0
            b = min(gb, b0 + TH) - b0
            for tj in range(n_tx):
                c0 = tj * TW
                ca = 0
                while ca < TW:
                    seg = seg_of(band, c0 + ca)
                    cb = ca + 1
                    while cb < TW and seg_of(band, c0 + cb) == seg:
                        cb += 1
                    kyw = np.zeros(lyw, np.float32)
                    kyw[ry_g - ry : ry_g + ry + 1] = band.ky[seg]
                    work.append(
                        (
                            tb * n_tx + tj,
                            a,
                            b,
                            ca,
                            cb,
                            mx_index(band, seg),
                            kyw,
                        )
                    )
                    ca = cb
    if len(work) > MAX_WORK:
        return None
    n_mx = len(mx_specs)
    if n_mx * TW * wwp * 4 > MAX_MX_BANK_BYTES:
        return None

    # sort so items sharing an output block are consecutive (the block
    # stays resident in VMEM between steps; masked writes compose)
    work.sort(key=lambda t: t[0])
    n_work = len(work)
    meta = np.zeros((8, n_work), np.int32)
    tapsy = np.zeros((n_work, 8, lyw), np.float32)
    for i, (oid, a, b, ca, cb, mxi, kyw) in enumerate(work):
        tb, tj = divmod(oid, n_tx)
        meta[:, i] = (oid, tb * TH, tj * TW, a, b, ca, cb, mxi)
        tapsy[i, 0] = kyw

    # banded Toeplitz tap matrices: row t holds the segment's x taps at
    # window columns [t + rxq_g - rx, t + rxq_g + rx]
    mx_bank = np.zeros((max(n_mx, 1), TW, wwp), np.float32)
    rows = np.arange(TW)[:, None]
    for m, (rx, kx) in enumerate(mx_specs):
        cols = rxq_g - rx + rows + np.arange(2 * rx + 1)[None, :]
        mx_bank[m, rows, cols] = kx[None, :]

    # an output block's area must be exactly covered by its items
    cover: Dict[int, int] = {}
    for oid, a, b, ca, cb, *_ in work:
        cover[oid] = cover.get(oid, 0) + (b - a) * (cb - ca)
    assert all(v == TH * TW for v in cover.values()), "block coverage gap"

    return BlurLanePlan(
        H=H,
        W=W,
        Wt=Wt,
        rxq_g=rxq_g,
        ry_g=ry_g,
        wwp=wwp,
        n_ty=n_ty,
        n_tx=n_tx,
        n_tiles=n_ty * n_tx,
        n_work=n_work,
        meta=meta,
        tapsy=tapsy,
        mx_bank=mx_bank,
        zero_w_from=w_cov,
        # bf16x3 ("high") is the default: the vertical pass feeds the
        # x-matmul NON-integer f32 rows, so a single bf16 dot rounds its
        # row operand at ~2^-9 relative and costs ~4 dB of real-chip PSNR
        # (53.5 dB worst vs 57.7 with the split; both above the 50 dB
        # bar).  "default" remains the fast knob (~6 ms less per 4K pass,
        # +7% flagship throughput) for callers that accept 53 dB.
        precision=_env_precision(),
    )


def _env_precision() -> str:
    p = os.environ.get("TRANSFORM360_BLUR_PRECISION", "high")
    if p not in _PRECISIONS:
        raise ValueError(
            f"TRANSFORM360_BLUR_PRECISION={p!r}: must be one of {_PRECISIONS}"
        )
    return p


def _make_kernel(plan: BlurLanePlan):
    wh = TH + 2 * plan.ry_g
    wwp = plan.wwp
    n = plan.n_work
    lyw = plan.tapsy.shape[2]
    assert plan.precision in _PRECISIONS, plan.precision

    def _dot(a_op, b_op, precision=None):
        return jax.lax.dot_general(
            a_op,
            b_op,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )

    def mx_split(mx):
        """Per-step preparation of the x-tap matrix operand(s)."""
        if plan.precision == "highest":
            return (mx,)
        mh = mx.astype(jnp.bfloat16)
        if plan.precision == "default":
            return (mh,)
        ml = (mx - mh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (mh, ml)

    def xdot(mxp, row):
        if plan.precision == "highest":
            return _dot(mxp[0], row, jax.lax.Precision.HIGHEST)
        if plan.precision == "default":
            return _dot(mxp[0], row.astype(jnp.bfloat16))
        # manual bf16x3: both operands split into hi + lo bf16, the
        # lo*lo term dropped (~2^-16 relative; Mosaic does not accept
        # lax.Precision.HIGH on dots, hence the hand-rolled split)
        mh, ml = mxp
        rh = row.astype(jnp.bfloat16)
        rl = (row - rh.astype(jnp.float32)).astype(jnp.bfloat16)
        return _dot(mh, rh) + _dot(mh, rl) + _dot(ml, rh)

    def kernel(meta_ref, ty_ref, mx_ref, src_ref, out_ref, win, winf, sems):
        i = pl.program_id(0)

        def dma(slot, t):
            return pltpu.make_async_copy(
                src_ref.at[
                    pl.ds(meta_ref[1, t], wh),
                    pl.ds(pl.multiple_of(meta_ref[2, t], 8), wwp),
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

        # u8 -> f32 via i32 (Mosaic has no direct u8 -> f32 cast)
        winf[:] = win[slot].astype(jnp.int32).astype(jnp.float32)

        # vertical pass (VPU): static global-halo tap loop; zero taps of
        # shorter kernels cost FMAs but no branches
        rows = []
        for r in range(TH):
            acc = None
            for d in range(lyw):
                term = ty_ref[0, 0, d] * winf[r + d]
                acc = term if acc is None else acc + term
            rows.append(acc)  # (wwp, B) f32

        # horizontal pass (MXU): banded tap matrix per work item
        mxp = mx_split(mx_ref[0])  # (TW, wwp) operand(s)
        outs = []
        for r in range(TH):
            outs.append(xdot(mxp, rows[r])[None])
        blk = jnp.concatenate(outs, axis=0)  # (TH, TW, B)
        blk = jnp.clip(jnp.floor(blk + 0.5), 0.0, 255.0)
        blk = blk.astype(jnp.int32).astype(jnp.uint8)

        a = meta_ref[3, i]
        b = meta_ref[4, i]
        ca = meta_ref[5, i]
        cb = meta_ref[6, i]
        rows_idx = jax.lax.broadcasted_iota(jnp.int32, (TH, TW, LANES), 0)
        cols_idx = jax.lax.broadcasted_iota(jnp.int32, (TH, TW, LANES), 1)
        mask = (rows_idx >= a) & (rows_idx < b) & (cols_idx >= ca) & (cols_idx < cb)
        out_ref[0] = jnp.where(mask, blk, out_ref[0])

    return kernel


def blur_lane(
    plan: BlurLanePlan, x: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Blur + round a uint8 plane in lane layout: [H, W, 128] -> same."""
    assert x.shape == (plan.H, plan.W, LANES), x.shape
    ww = TW + 2 * plan.rxq_g
    padded = jnp.pad(
        x,
        (
            (plan.ry_g, plan.ry_g),
            (plan.rxq_g, plan.rxq_g + (plan.Wt - plan.W) + (plan.wwp - ww)),
            (0, 0),
        ),
        mode="edge",
    )
    wh = TH + 2 * plan.ry_g
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.n_work,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, plan.tapsy.shape[2]),
                lambda i, m: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, TW, plan.wwp),
                lambda i, m: (m[7, i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, TW, LANES),
            lambda i, m: (m[0, i], 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wh, plan.wwp, LANES), jnp.uint8),
            pltpu.VMEM((wh, plan.wwp, LANES), jnp.float32),
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
        staged(plan.tapsy),
        staged(plan.mx_bank),
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
