"""Probe: pair-packed lane remap body for half-occupancy batches.

At batch <= 64 the lane remap kernel wastes half of every vreg (frames
live in the 128 vector lanes; the pass costs the same at any occupancy).
This probe measures a candidate fix: duplicate the 64 frames into lanes
64..127 and process TWO output tiles per loop step — tile A served by
lanes 0..63, tile B by lanes 64..127:

* two dynamic (T, XW, B) window slices (one per tile; unavoidable — the
  slice origin differs per tile),
* per-half y-tap accumulation with scalar weights (same FMA count as two
  plain pixels),
* ONE lane-select merge of the two accumulators, then a SHARED
  x-contraction, round, clip and store.

Shared work is therefore the contraction + epilogue (~40% of the plain
body) minus the merge/selects.  The probe reports plain-body and
pair-body cycles/px so the tradeoff is a measurement, not a guess.

Usage: python tools/probe_lane_pair.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 256           # pixels per tile (the production 8 x 32 output tile)
T = 4              # taps per axis (cubic)
WH, WW, B = 32, 96, 128
XW = 16


def make_plain(n):
    """Production-shaped body: one tile per grid step, 128 lanes."""

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


def make_pair(n_pairs):
    """Pair-packed body: grid step i serves tiles 2i (lanes 0..63) and
    2i+1 (lanes 64..127).  idx/wy carry both tiles' pixel metadata
    ([1, 6, TP] / [1, 2*T, TP]: first half tile A, second tile B)."""

    def kernel(idx_ref, wy_ref, wt_ref, win_ref, out_ref):
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, XW, B), 2) < (B // 2)
        )

        def body(o, carry):
            rows = []
            for s in range(8):
                px = o * 8 + s
                acc = []
                for h in range(2):  # per-half tile A / tile B
                    ly = idx_ref[0, 3 * h + 0, px]
                    lxq = pl.multiple_of(idx_ref[0, 3 * h + 1, px], 8)
                    v = win_ref[pl.ds(ly, T), pl.ds(lxq, XW), :]
                    vf = v.astype(jnp.int32).astype(jnp.float32)
                    a = None
                    for t in range(T):
                        term = wy_ref[0, h * T + t, px] * vf[t : t + 1]
                        a = term if a is None else a + term
                    acc.append(a)
                acc16 = jnp.where(mask, acc[0], acc[1])
                wva = wt_ref[pl.ds(idx_ref[0, 2, px], 1), :, :]
                wvb = wt_ref[pl.ds(idx_ref[0, 5, px], 1), :, :]
                wv = jnp.where(mask, wva, wvb)
                xa = jnp.sum(acc16 * wv, axis=1)
                rows.append(xa)
            blk = jnp.concatenate(rows, axis=0)
            blk = jnp.clip(jnp.floor(blk + 0.5), 0.0, 255.0)
            out_ref[0, pl.ds(o, 1), :, :] = (
                blk.astype(jnp.int32).astype(jnp.uint8)[None]
            )
            return carry

        jax.lax.fori_loop(0, TP // 8, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((1, 6, TP), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2 * T, TP), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((256, XW, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WH, WW, B), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TP // 8, 8, B), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pairs, TP // 8, 8, B), jnp.uint8),
    )


def fence(r):
    return float(jnp.asarray(r).reshape(-1)[0])


def bench(fn, args, n_tiles_equiv):
    def make_chain(k):
        @jax.jit
        def chain(idx, wy, wt, win):
            for _ in range(k):
                o = fn(idx, wy, wt, win)
                win = win + o[0, 0, 0, 0]
            return win

        return chain

    k1, k2 = 2, 34
    c1, c2 = make_chain(k1), make_chain(k2)
    idx, wy, wt, win = args
    fence(c1(idx, wy, wt, win))
    fence(c2(idx, wy, wt, win))

    def run(c, s):
        t0 = time.perf_counter()
        fence(c(idx, wy + np.float32(s * 1e-6), wt, win))
        return time.perf_counter() - t0

    t1 = min(run(c1, s) for s in (1, 2, 3))
    t2 = min(run(c2, s) for s in (4, 5, 6))
    per_call = (t2 - t1) / (k2 - k1)
    per_tile = per_call / n_tiles_equiv
    return per_tile / TP * 940e6  # cycles per output px per tile


def main():
    rng = np.random.default_rng(0)
    n = 16  # plain tiles (= 8 pairs)

    ly = rng.integers(0, WH - T, (n, TP)).astype(np.int32)
    lx = rng.integers(0, WW - XW, (n, TP)).astype(np.int32)
    lxq = (lx // 8) * 8
    code = rng.integers(0, 32, (n, TP)).astype(np.int32) * 8 + (lx - lxq)
    idx = np.stack([ly, lxq, code], axis=1).astype(np.int32)
    wy = rng.uniform(0.0, 0.5, (n, T, TP)).astype(np.float32)
    wxt = rng.uniform(0.0, 0.5, (32, T)).astype(np.float32)
    wt = np.zeros((256, XW, 1), np.float32)
    for f in range(32):
        for o in range(8):
            wt[f * 8 + o, o : o + T, 0] = wxt[f]
    win = rng.integers(0, 256, (WH, WW, B), dtype=np.uint8)

    # pair layout: idx rows [lyA, lxqA, codeA, lyB, lxqB, codeB]
    idx_p = np.concatenate(
        [idx[0::2], idx[1::2]], axis=1
    )  # [n/2, 6, TP]
    wy_p = np.concatenate([wy[0::2], wy[1::2]], axis=1)  # [n/2, 2T, TP]

    plain = jax.jit(make_plain(n))
    pair = jax.jit(make_pair(n // 2))

    out_plain = np.asarray(jax.block_until_ready(plain(idx, wy, wt, win)))
    out_pair = np.asarray(jax.block_until_ready(pair(idx_p, wy_p, wt, win)))
    # pair tile k: lanes 0..63 = tile 2k (frames 0..63), 64..127 = tile 2k+1
    a = out_pair[:, :, :, : B // 2]
    b = out_pair[:, :, :, B // 2 :]
    ref_a = out_plain[0::2, :, :, : B // 2]
    ref_b = out_plain[1::2, :, :, B // 2 :]
    ok = np.array_equal(a, ref_a) and np.array_equal(b, ref_b)
    print("pair == plain per half:", ok)
    if not ok:
        da = np.abs(a.astype(int) - ref_a.astype(int)).max()
        db = np.abs(b.astype(int) - ref_b.astype(int)).max()
        print("max diff", da, db)
        return

    cyc_plain = bench(plain, (idx, wy, wt, win), n)
    # pair pass serves n plain-tiles' worth of output in n/2 steps but
    # only for 64 real frames; normalize per produced (tile, 64-frame)
    # unit: a plain pass at 64 occupancy ALSO costs cyc_plain per tile.
    cyc_pair = bench(pair, (idx_p, wy_p, wt, win), n // 2)
    print(f"plain body: {cyc_plain:.2f} cyc/px/tile (any occupancy)")
    print(f"pair  body: {cyc_pair:.2f} cyc/px/pair-step "
          f"(= 2 tiles at 64 occupancy)")
    print(f"batch-64 speedup if adopted: {2 * cyc_plain / cyc_pair:.2f}x "
          f"(pair-step vs 2 plain steps)")


if __name__ == "__main__":
    main()
