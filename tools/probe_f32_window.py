"""A/B probe: per-pixel u8 window slices vs a pre-unpacked f32 window.

The lane remap body (ops/remap_lane.py) pays, per output pixel, one
dynamic (T, XW, B) u8 slice plus an i32->f32 unpack (~40% of the
measured ~20 cyc/px body).  Each window element is touched by ~7 pixel
slices (median flagship window (30, 80) feeding 256 px x (T x XW)
footprints), so unpacking the whole window ONCE into an f32 VMEM
scratch right after the DMA, then slicing f32, trades 256 per-pixel
unpacks for one window-sized unpack.

Open question this probe answers on real hardware: does a dynamic
(T, XW, B) f32 slice cost meaningfully more than the u8 slice (4x the
bytes, same address generation)?  If slices bill per-vreg moved, the
win evaporates; if address generation dominates (as the fused-tap-slice
experiment showed), the unpack saving is real.

Usage: python tools/probe_f32_window.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 1024          # pixels per tile (8 x 128 output block)
T = 4              # taps per axis (cubic)
WH, WW, B = 32, 128, 128
XW = 16


def make_kernel(n, preunpack):
    def body_u8(idx_ref, wy_ref, wt_ref, win_ref, out_ref):
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
                wv = wt_ref[pl.ds(code, 1), :, :]
                xa = jnp.sum(acc16 * wv, axis=1)
                rows.append(xa)
            blk = jnp.concatenate(rows, axis=0)
            blk = jnp.clip(jnp.floor(blk + 0.5), 0.0, 255.0)
            out_ref[0, pl.ds(o, 1), :, :] = (
                blk.astype(jnp.int32).astype(jnp.uint8)[None]
            )
            return carry

        jax.lax.fori_loop(0, TP // 8, body, 0)

    def body_f32(idx_ref, wy_ref, wt_ref, win_ref, out_ref, wf32):
        # one whole-window unpack (amortized over 1024 px)
        wf32[...] = win_ref[...].astype(jnp.int32).astype(jnp.float32)

        def body(o, carry):
            rows = []
            for s in range(8):
                px = o * 8 + s
                ly = idx_ref[0, 0, px]
                lxq = pl.multiple_of(idx_ref[0, 1, px], 8)
                code = idx_ref[0, 2, px]
                vf = wf32[pl.ds(ly, T), pl.ds(lxq, XW), :]
                acc16 = None
                for t in range(T):
                    term = wy_ref[0, t, px] * vf[t : t + 1]
                    acc16 = term if acc16 is None else acc16 + term
                wv = wt_ref[pl.ds(code, 1), :, :]
                xa = jnp.sum(acc16 * wv, axis=1)
                rows.append(xa)
            blk = jnp.concatenate(rows, axis=0)
            blk = jnp.clip(jnp.floor(blk + 0.5), 0.0, 255.0)
            out_ref[0, pl.ds(o, 1), :, :] = (
                blk.astype(jnp.int32).astype(jnp.uint8)[None]
            )
            return carry

        jax.lax.fori_loop(0, TP // 8, body, 0)

    scratch = [pltpu.VMEM((WH, WW, B), jnp.float32)] if preunpack else []
    return pl.pallas_call(
        body_f32 if preunpack else body_u8,
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
        scratch_shapes=scratch,
    )


def main():
    rng = np.random.default_rng(0)
    n = 8
    ly = rng.integers(0, WH - T, (n, TP)).astype(np.int32)
    lx = rng.integers(0, WW - XW, (n, TP)).astype(np.int32)
    lxq = (lx // 8) * 8
    off = lx - lxq
    fxi = rng.integers(0, 32, (n, TP)).astype(np.int32)
    code = fxi * 8 + off
    idx = np.stack([ly, lxq, code], axis=1).astype(np.int32)
    wy = rng.uniform(0.0, 0.5, (n, T, TP)).astype(np.float32)
    wxt = rng.uniform(0.0, 0.5, (32, T)).astype(np.float32)
    wt = np.zeros((256, XW, 1), np.float32)
    for f in range(32):
        for o in range(8):
            wt[f * 8 + o, o : o + T, 0] = wxt[f]
    win = rng.integers(0, 256, (WH, WW, B), dtype=np.uint8)

    outs = {}
    for name, pre in (("u8-slice", False), ("f32-preunpack", True)):
        fn = jax.jit(make_kernel(n, pre))
        outs[name] = np.asarray(jax.block_until_ready(fn(idx, wy, wt, win)))
    same = bool((outs["u8-slice"] == outs["f32-preunpack"]).all())
    print("outputs identical:", same)

    def fence(r):
        return float(jnp.asarray(r).reshape(-1)[0])

    for name, pre in (("u8-slice", False), ("f32-preunpack", True)):
        kern = make_kernel(n, pre)

        def make_chain(k):
            @jax.jit
            def chain(idx, wy, wt, win):
                for _ in range(k):
                    o = kern(idx, wy, wt, win)
                    win = win + o[0, 0, 0, 0]
                return win

            return chain

        k1, k2 = 2, 34
        c1, c2 = make_chain(k1), make_chain(k2)
        fence(c1(idx, wy, wt, win))
        fence(c2(idx, wy, wt, win))

        def run(c, s):
            t0 = time.perf_counter()
            fence(c(idx, wy + np.float32(s * 1e-6), wt, win))
            return time.perf_counter() - t0

        best = min(
            (run(c2, s) - run(c1, s)) / (k2 - k1) for s in range(1, 4)
        )
        per_px = best / (n * TP)
        print(
            f"{name:>14}: {best*1e6:8.2f} us/call  "
            f"{per_px*1e9:6.2f} ns/px  (~{per_px*940e6*1e0:.2f} cyc/px @940MHz)"
        )


if __name__ == "__main__":
    main()
