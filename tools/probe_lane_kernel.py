"""Probe for the lane-batched remap kernel design (batch in lanes).

Mosaic bans dynamic sublane indexes not provably 8-aligned, so the design
is: per pixel, load ONE aligned (T, 16, B) window slice (x quantized to 8;
a single dynamic slice measures ~9x faster than T separate per-tap
dynamic slices — 3.7 vs 33.4 cyc/px — because per-tap dynamic address
generation dominates), combine y-taps with scalar weights over static
subslices, then contract the 16 sublanes against a precomputed
per-(fracx, offset) weight vector from a [256, 16, 1] table indexed on
the (unconstrained) outer dim.  Outputs are assembled 8 pixels per loop
step so stores are sublane-aligned.

Usage: python tools/probe_lane_kernel.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 1024          # pixels per tile (8 x 128 output block)
T = 4              # taps per axis (cubic)
WH, WW, B = 32, 128, 128
XW = 16            # aligned x-window sublanes per load


def make_kernel(n):
    def kernel(idx_ref, wy_ref, wt_ref, win_ref, out_ref):
        def body(o, carry):
            rows = []
            for s in range(8):
                px = o * 8 + s
                ly = idx_ref[0, 0, px]
                lxq = pl.multiple_of(idx_ref[0, 1, px], 8)
                code = idx_ref[0, 2, px]
                v = win_ref[pl.ds(ly, T), pl.ds(lxq, XW), :]
                vf = v.astype(jnp.int32).astype(jnp.float32)
                acc16 = None
                for t in range(T):
                    term = wy_ref[0, t, px] * vf[t : t + 1]
                    acc16 = term if acc16 is None else acc16 + term
                wv = wt_ref[pl.ds(code, 1), :, :]  # (1, XW, 1)
                xa = jnp.sum(acc16 * wv, axis=1)   # (1, B)
                rows.append(xa)
            blk = jnp.concatenate(rows, axis=0)    # (8, B)
            blk = jnp.clip(jnp.floor(blk + 0.5), 0.0, 255.0)
            out_ref[0, pl.ds(o, 1), :, :] = (
                blk.astype(jnp.int32).astype(jnp.uint8)[None]
            )
            return carry

        jax.lax.fori_loop(0, TP // 8, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, TP), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, TP), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((256, XW, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WH, WW, B), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TP // 8, 8, B), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, TP // 8, 8, B), jnp.uint8),
    )


def main():
    rng = np.random.default_rng(0)
    n = 8
    ly = rng.integers(0, WH - T, (n, TP)).astype(np.int32)
    lx = rng.integers(0, WW - XW, (n, TP)).astype(np.int32)
    lxq = (lx // 8) * 8
    off = lx - lxq
    fxi = rng.integers(0, 32, (n, TP)).astype(np.int32)  # 1/32 frac index
    code = fxi * 8 + off
    idx = np.stack([ly, lxq, code], axis=1).astype(np.int32)
    wy = rng.uniform(0.0, 0.5, (n, T, TP)).astype(np.float32)
    # weight table: wx taps for each (fracx index, offset) at sublane off+u
    wxt = rng.uniform(0.0, 0.5, (32, T)).astype(np.float32)
    wt = np.zeros((256, XW, 1), np.float32)
    for f in range(32):
        for o in range(8):
            wt[f * 8 + o, o : o + T, 0] = wxt[f]
    win = rng.integers(0, 256, (WH, WW, B), dtype=np.uint8)

    fn = jax.jit(make_kernel(n))
    out = np.asarray(jax.block_until_ready(fn(idx, wy, wt, win)))

    ref = np.zeros((n, TP, B), np.float32)
    for t in range(T):
        for u in range(T):
            w = wy[:, t, :] * wxt[fxi, u]
            ref += w[:, :, None] * win[ly + t, lx + u, :]
    ref = np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)
    got = out.reshape(n, TP, B)
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    # float accumulation order differs from numpy: allow rare .5-tie offs
    ok = diff.max() <= 1 and (diff > 0).mean() < 1e-4
    print("correct:", ok, "| max diff", int(diff.max()),
          "| frac off", float((diff > 0).mean()))
    if not ok:
        return

    def make_chain(k):
        kern = make_kernel(n)

        @jax.jit
        def chain(idx, wy, wt, win):
            for _ in range(k):
                o = kern(idx, wy, wt, win)
                win = win + o[0, 0, 0, 0]
            return win

        return chain

    def fence(r):
        # host-read fence: block_until_ready is not a reliable completion
        # fence on tunneled backends (see utils/profiling.py)
        return float(jnp.asarray(r).reshape(-1)[0])

    k1, k2 = 2, 34
    c1, c2 = make_chain(k1), make_chain(k2)
    fence(c1(idx, wy, wt, win))
    fence(c2(idx, wy, wt, win))

    def run(c, s):
        t0 = time.perf_counter()
        fence(c(idx, wy + np.float32(s * 1e-6), wt, win))
        return time.perf_counter() - t0

    t1 = min(run(c1, s) for s in (1, 2, 3))
    t2 = min(run(c2, s) for s in (4, 5, 6))
    per_call = (t2 - t1) / (k2 - k1)
    per_tile = per_call / n
    cycles_px = per_tile / TP * 940e6
    print(
        f"per-call {per_call*1e3:.3f} ms, per-tile {per_tile*1e6:.2f} us, "
        f"~{cycles_px:.1f} cyc/px"
    )


if __name__ == "__main__":
    main()
