"""Sweep: remap body cost vs pixels-per-window and window dtype.

probe_f32_window.py showed 19.5 -> 5.0 cyc/px from pre-unpacking the
window to f32 — but at 1024 px per (32, 128) window.  The production
kernel runs 256 px per (32, 96)-median window, where the measured pass
was flat: the once-per-tile whole-window unpack costs what the per-pixel
unpacks saved.  This sweep separates the two contributions by measuring
tile sizes 256 / 512 / 1024 / 2048 px against window sizes and dtypes:

  u8    — per-pixel (T, XW, B) u8 slice + unpack (production body)
  f32   — whole-window unpack to f32 scratch, f32 per-pixel slices
  bf16  — whole-window unpack to bf16 (u8 values are exact in bf16;
          half the scratch write traffic and half the VMEM)

Usage: python tools/probe_unpack_amortization.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 4
B = 128
XW = 16


def make_kernel(n, tp, wh, ww, mode):
    def inner(idx_ref, wy_ref, wt_ref, win_ref, out_ref, *scr):
        if mode != "u8":
            dt = jnp.float32 if mode == "f32" else jnp.bfloat16
            scr[0][...] = win_ref[...].astype(jnp.int32).astype(dt)

        def body(o, carry):
            rows = []
            for s in range(8):
                px = o * 8 + s
                ly = idx_ref[0, 0, px]
                lxq = pl.multiple_of(idx_ref[0, 1, px], 8)
                code = idx_ref[0, 2, px]
                if mode == "u8":
                    v = win_ref[pl.ds(ly, T), pl.ds(lxq, XW), :]
                    vf = v.astype(jnp.int32).astype(jnp.float32)
                else:
                    vf = scr[0][pl.ds(ly, T), pl.ds(lxq, XW), :]
                    if mode == "bf16":
                        vf = vf.astype(jnp.float32)
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

        jax.lax.fori_loop(0, tp // 8, body, 0)

    scratch = []
    if mode == "f32":
        scratch = [pltpu.VMEM((wh, ww, B), jnp.float32)]
    elif mode == "bf16":
        scratch = [pltpu.VMEM((wh, ww, B), jnp.bfloat16)]
    return pl.pallas_call(
        inner,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, tp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, tp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((256, XW, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, ww, B), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp // 8, 8, B), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, tp // 8, 8, B), jnp.uint8),
        scratch_shapes=scratch,
    )


def fence(r):
    return float(jnp.asarray(r).reshape(-1)[0])


def measure(n, tp, wh, ww, mode):
    rng = np.random.default_rng(0)
    ly = rng.integers(0, wh - T, (n, tp)).astype(np.int32)
    lx = rng.integers(0, ww - XW, (n, tp)).astype(np.int32)
    lxq = (lx // 8) * 8
    off = lx - lxq
    fxi = rng.integers(0, 32, (n, tp)).astype(np.int32)
    idx = np.stack([ly, lxq, fxi * 8 + off], axis=1).astype(np.int32)
    wy = rng.uniform(0.0, 0.5, (n, T, tp)).astype(np.float32)
    wxt = rng.uniform(0.0, 0.5, (32, T)).astype(np.float32)
    wt = np.zeros((256, XW, 1), np.float32)
    for f in range(32):
        for o in range(8):
            wt[f * 8 + o, o : o + T, 0] = wxt[f]
    win = rng.integers(0, 256, (wh, ww, B), dtype=np.uint8)

    kern = make_kernel(n, tp, wh, ww, mode)

    def make_chain(k):
        @jax.jit
        def chain(idx, wy, wt, win):
            def link(_, w):
                o = kern(idx, wy, wt, w)
                return w + o[0, 0, 0, 0]

            return jax.lax.fori_loop(0, k, link, win)

        return chain

    # enough in-jit iterations that kernel time >> tunnel dispatch noise
    k1, k2 = 50, 450
    c1, c2 = make_chain(k1), make_chain(k2)
    fence(c1(idx, wy, wt, win))
    fence(c2(idx, wy, wt, win))

    def run(c, s):
        t0 = time.perf_counter()
        fence(c(idx, wy + np.float32(s * 1e-6), wt, win))
        return time.perf_counter() - t0

    best = min((run(c2, s) - run(c1, s)) / (k2 - k1) for s in range(1, 4))
    return best / (n * tp)


def main():
    print(f"{'window':>12} {'px/win':>7} | " +
          " ".join(f"{m:>10}" for m in ("u8", "f32", "bf16")))
    for wh, ww in ((32, 96), (88, 192)):
        for tp in (256, 1024):
            n = max(1, 32768 // tp)
            vals = []
            for mode in ("u8", "f32", "bf16"):
                try:
                    per_px = measure(n, tp, wh, ww, mode)
                    vals.append(f"{per_px*940e6*1e0:7.2f}cyc")
                except Exception as e:  # noqa: BLE001
                    vals.append("   err")
            print(f"{f'({wh},{ww})':>12} {tp:7d} | " +
                  " ".join(f"{v:>10}" for v in vals))


if __name__ == "__main__":
    main()
