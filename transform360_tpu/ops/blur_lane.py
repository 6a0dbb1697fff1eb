"""Lane-batched Pallas prefilter — the large-batch blur path.

The XLA prefilter (:mod:`..filtering`) is HBM-bound: each of up to ~13
x-taps re-reads the full f32 plane, so a 4K luma blur costs ~0.75 ms/frame
at batch 128.  This kernel keeps the plane uint8 in HBM, converts once in
VMEM, and runs both 1-D convolutions on in-register data, with the frame
batch in the 128 vector lanes ([H, W, B] layout — the same layout the
lane remap kernel consumes, so the blurred plane feeds it directly).

Parity: per-band taps and the per-segment BORDER_REPLICATE semantics are
preserved exactly — y taps clamp to the band's row range (the reference
filters each latitude band independently, ``VideoFrameTransform.cpp:
173-204``), x taps replicate at the plane edges (one horizontal segment),
and the result is rounded half-up to uint8 like ``_round_u8``.  The x
convolution runs first, matching the XLA path's accumulation order.

Scope (falls back to the XLA path otherwise): mono, one horizontal
segment, band boundaries 8-row-aligned, and at most 8 distinct
(kx, ky) kernel classes.  The 32x15-segment adaptive configs use the
XLA path; the default 5-band config is covered.
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
MAX_CLASSES = 8


@dataclasses.dataclass(frozen=True)
class BlurClass:
    kx: np.ndarray     # [LX] f32 (embedded as literals)
    ky: np.ndarray     # [LY] f32
    rxq: int           # ceil8((LX-1)//2): window x halo
    win_h: int         # TH + 2*ry
    n: int
    meta: np.ndarray   # [6, n] i32: tile_id, y0, x0, r0, top, bot1


@dataclasses.dataclass(frozen=True)
class BlurLanePlan:
    H: int
    W: int
    Wt: int            # W rounded up to TW
    rxq_g: int         # global x pad (max class rxq)
    n_ty: int
    n_tx: int
    n_tiles: int
    classes: Tuple[BlurClass, ...]


def build_blur_lane(bp: Optional[BlurPlan], H: int, W: int) -> Optional[BlurLanePlan]:
    if bp is None:
        return None
    if bp.stereo != StereoFormat.MONO or bp.n_tiles != 1:
        return None
    if H % TH or H < TH or W < TW:
        return None
    # group bands by identical taps
    groups = {}
    for band in bp.bands:
        if band.top % TH or band.height % TH:
            return None
        key = (band.kx.tobytes(), band.ky.tobytes())
        groups.setdefault(key, (band.kx[0], band.ky[0], []))[2].append(band)
    if len(groups) > MAX_CLASSES:
        return None
    if sum(b.height for b in bp.bands) != H or bp.bands[0].top != 0:
        return None

    n_tx = -(-W // TW)
    Wt = n_tx * TW
    n_ty = H // TH
    rxq_g = 0
    parsed = []
    for kx, ky, bands in groups.values():
        LX, LY = len(kx), len(ky)
        rx, ry = (LX - 1) // 2, (LY - 1) // 2
        rxq = -(-rx // 8) * 8
        win_h = TH + 2 * ry
        if any(b.height < win_h for b in bands):
            return None
        if rxq > 120:
            return None
        rxq_g = max(rxq_g, rxq)
        parsed.append((kx, ky, rx, ry, rxq, win_h, bands))

    classes = []
    for kx, ky, rx, ry, rxq, win_h, bands in parsed:
        metas = []
        for band in bands:
            top, bot = band.top, band.top + band.height
            for ti in range(top // TH, bot // TH):
                r0 = ti * TH
                y0 = min(max(r0 - ry, top), bot - win_h)
                for tj in range(n_tx):
                    x0 = rxq_g + tj * TW - rxq
                    metas.append(
                        (ti * n_tx + tj, y0, x0, r0, top, bot - 1)
                    )
        meta = np.array(metas, np.int32).T.copy()
        classes.append(
            BlurClass(
                kx=kx.astype(np.float32),
                ky=ky.astype(np.float32),
                rxq=rxq,
                win_h=win_h,
                n=meta.shape[1],
                meta=meta,
            )
        )
    return BlurLanePlan(
        H=H, W=W, Wt=Wt, rxq_g=rxq_g,
        n_ty=n_ty, n_tx=n_tx, n_tiles=n_ty * n_tx,
        classes=tuple(classes),
    )


def _make_blur_kernel(cls: BlurClass):
    kx = [float(v) for v in cls.kx]
    ky = [float(v) for v in cls.ky]
    LX, LY = len(kx), len(ky)
    rx, ry = (LX - 1) // 2, (LY - 1) // 2
    ww = TW + 2 * cls.rxq
    wh = cls.win_h
    n = cls.n

    def kernel(meta_ref, src_ref, out_ref, win, sems):
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

        y0 = meta_ref[1, i]
        r0 = meta_ref[3, i]
        top = meta_ref[4, i]
        bot1 = meta_ref[5, i]

        # x-convolve each needed row once (rows are shared across the
        # y-taps of adjacent output rows), then y-convolve the results.
        xrows = []
        for j in range(TH + LY - 1):
            idx = jnp.clip(r0 + j - ry, top, bot1) - y0
            v = win[slot, pl.ds(idx, 1), :, :]           # (1, ww, B) u8
            vf = v.astype(jnp.int32).astype(jnp.float32)
            acc = None
            off0 = cls.rxq - rx
            for u in range(LX):
                term = kx[u] * vf[:, off0 + u : off0 + u + TW, :]
                acc = term if acc is None else acc + term
            xrows.append(acc)                             # (1, TW, B)
        rows = []
        for r in range(TH):
            acc = None
            for dy in range(LY):
                term = ky[dy] * xrows[r + dy]
                acc = term if acc is None else acc + term
            rows.append(acc)
        blk = jnp.concatenate(rows, axis=0)               # (TH, TW, B)
        blk = jnp.clip(jnp.floor(blk + 0.5), 0.0, 255.0)
        out_ref[0] = blk.astype(jnp.int32).astype(jnp.uint8)

    return kernel


def _run_blur_class(plan, cls: BlurClass, padded, prev_out, interpret):
    kernel = _make_blur_kernel(cls)
    args = [staged(cls.meta), padded]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    kwargs = {}
    if prev_out is not None:
        args.append(prev_out)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        kwargs["input_output_aliases"] = {2: 0}

        def kfn(meta_ref, src_ref, prev_ref, out_ref, win, sems):
            del prev_ref
            kernel(meta_ref, src_ref, out_ref, win, sems)
    else:
        kfn = kernel

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cls.n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, TH, TW, LANES),
            lambda i, m: (m[0, i], 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cls.win_h, TW + 2 * cls.rxq, LANES), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kfn,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct(
            (plan.n_tiles, TH, TW, LANES), jnp.uint8
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        **kwargs,
    )(*args)


def blur_lane(
    plan: BlurLanePlan, x: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Blur + round a uint8 plane in lane layout: [H, W, 128] -> same."""
    assert x.shape == (plan.H, plan.W, LANES), x.shape
    left = jnp.repeat(x[:, :1, :], plan.rxq_g, axis=1)
    right = jnp.repeat(x[:, -1:, :], plan.rxq_g + plan.Wt - plan.W, axis=1)
    padded = jnp.concatenate([left, x, right], axis=1)
    out = None
    for cls in plan.classes:
        out = _run_blur_class(plan, cls, padded, out, interpret)
    out = out.reshape(plan.n_ty, plan.n_tx, TH, TW, LANES)
    out = jnp.transpose(out, (0, 2, 1, 3, 4))
    out = out.reshape(plan.H, plan.Wt, LANES)
    return out[:, : plan.W, :]
