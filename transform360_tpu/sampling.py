"""Warp resampling — the TPU-native replacement for ``cv::remap``.

The reference resamples each plane with ``cv::remap`` using the cached warp
map, OpenCV interpolation codes, and BORDER_WRAP (BORDER_TRANSPARENT with
pre-filled Y=0/UV=128 for barrel layouts), optionally followed by a
``cv::resize`` INTER_AREA downscale when supersampling
(``VideoFrameTransform.cpp:706-794``).

Architecture:

* Plan time (:func:`make_sample_spec`, host numpy): the static warp map is
  quantized to OpenCV's 1/32-pixel fixed-point grid (``INTER_BITS == 5`` —
  cv::convertMaps rounds ``map*32``), split into integer base indices and
  fractional parts, and border handling (wrap / clamp+mask) is resolved.
  This spec drives BOTH execution backends.
* :func:`remap_const` / :func:`remap_traced`: the portable XLA backend —
  one gather per tap over ``[B, H*W]`` planes.  Correct everywhere, but
  XLA's TPU gather streams at only ~2.4 GB/s (measured, v5e), so on TPU
  this path serves tiny planes and cross-checking only.
* The production TPU backend is the Pallas window-gather kernel
  (:mod:`transform360_tpu.ops.remap_pallas`), built from the same spec.
* INTER_AREA downscale becomes two plan-time matrices applied as matmuls
  (MXU) — see :func:`area_matrix`.

Interpolation kernels match OpenCV's: bilinear, bicubic a=-0.75, and the
8-tap Lanczos4 (transcribed from OpenCV ``interpolateLanczos4``), so output
parity vs the reference pipeline holds to the fixed-point table rounding.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import Interpolation

INTER_BITS = 5  # OpenCV fixed-point fraction bits for remap
INTER_TAB_SIZE = 1 << INTER_BITS

_TAPS = {
    Interpolation.NEAREST: 1,
    Interpolation.LINEAR: 2,
    Interpolation.CUBIC: 4,
    Interpolation.LANCZOS4: 8,
}

# Tap offset of the first tap relative to floor(coord):
_FIRST_TAP = {
    Interpolation.NEAREST: 0,
    Interpolation.LINEAR: 0,
    Interpolation.CUBIC: -1,
    Interpolation.LANCZOS4: -3,
}


@dataclasses.dataclass(frozen=True)
class SampleSpec:
    """Plan-time resampling arrays for one plane class.

    ``base_y``/``base_x`` are the *first-tap* indices (already offset for
    the kernel support and border-resolved is left to runtime); ``frac_*``
    are the 1/32-quantized fractional positions in [0, 1).  ``valid`` is
    None for wrapping layouts, else the transparent-border mask.
    """

    base_y: np.ndarray  # int32 [H', W']
    base_x: np.ndarray  # int32 [H', W']
    frac_y: np.ndarray  # float32 [H', W']
    frac_x: np.ndarray  # float32 [H', W']
    valid: Optional[np.ndarray]  # bool [H', W'] or None
    in_w: int
    in_h: int
    interp: Interpolation
    wrap: bool  # True: BORDER_WRAP; False: clamp taps + transparent fill


def make_sample_spec(
    warp: np.ndarray,
    in_w: int,
    in_h: int,
    interp: Interpolation,
    wrap: bool,
) -> SampleSpec:
    """Build the spec from a float32 warp map [H', W', 2] (x, y channels).

    Quantization parity with cv::convertMaps: coordinates are rounded to
    1/32 px (``rint(map * 32)``); NEAREST rounds to the integer grid
    directly.
    """
    map_x = np.asarray(warp[..., 0], np.float64)
    map_y = np.asarray(warp[..., 1], np.float64)

    valid = None
    if not wrap:
        # Unmapped barrel pixels carry the outside marker outX=-1 →
        # map_x == -in_w - 0.5 (VideoFrameTransform.cpp:1304-1307, :544).
        valid = map_x > -1.0

    if interp == Interpolation.NEAREST:
        base_x = np.rint(map_x).astype(np.int64)
        base_y = np.rint(map_y).astype(np.int64)
        frac_x = np.zeros(map_x.shape, np.float32)
        frac_y = np.zeros(map_y.shape, np.float32)
    else:
        sx = np.rint(map_x * INTER_TAB_SIZE).astype(np.int64)
        sy = np.rint(map_y * INTER_TAB_SIZE).astype(np.int64)
        base_x = sx >> INTER_BITS
        base_y = sy >> INTER_BITS
        frac_x = ((sx & (INTER_TAB_SIZE - 1)) / INTER_TAB_SIZE).astype(np.float32)
        frac_y = ((sy & (INTER_TAB_SIZE - 1)) / INTER_TAB_SIZE).astype(np.float32)

    if not wrap:
        # BORDER_TRANSPARENT skip parity (measured against cv::remap; see
        # docs/parity.md): the destination pixel keeps its pre-fill unless
        # the anchor is in range — nearest: rounded coord in [0, n-1];
        # linear/cubic: floor in [-1, n-1] (any footprint overlap);
        # lanczos4: floor in [0, n-1].  base_* here is the anchor.
        lo = -1 if interp in (Interpolation.LINEAR, Interpolation.CUBIC) else 0
        valid = (
            valid
            & (base_x >= lo)
            & (base_x <= in_w - 1)
            & (base_y >= lo)
            & (base_y <= in_h - 1)
        )

    first = _FIRST_TAP[interp]
    base_x = base_x + first
    base_y = base_y + first

    if wrap:
        # Resolve the wrap on the base index at plan time; runtime taps
        # only need (base + u) % n which we fold via precomputed modulo.
        base_x = np.mod(base_x, in_w)
        base_y = np.mod(base_y, in_h)
    else:
        # clamp so that all taps stay addressable; invalid pixels are
        # masked to the fill value at the end.
        base_x = np.clip(base_x, -(_TAPS[interp] - 1), in_w - 1)
        base_y = np.clip(base_y, -(_TAPS[interp] - 1), in_h - 1)

    return SampleSpec(
        base_y=base_y.astype(np.int32),
        base_x=base_x.astype(np.int32),
        frac_y=frac_y,
        frac_x=frac_x,
        valid=valid,
        in_w=in_w,
        in_h=in_h,
        interp=interp,
        wrap=wrap,
    )


def reflect101(idx, n: int, xp=np):
    """OpenCV ``borderInterpolate(..., BORDER_REFLECT_101)``: -1 -> 1,
    n -> n-2.  This is how cv::remap resolves the outer taps of partially-
    inside footprints under BORDER_TRANSPARENT (borderType1 fallback).
    Closed form of OpenCV's reflect loop (period ``2n-2``), valid for taps
    arbitrarily far out of range — an 8-tap lanczos footprint on a plane
    narrower than 5 px overshoots by more than ``n-1``."""
    if n == 1:
        return xp.zeros_like(idx)
    period = 2 * n - 2
    r = xp.abs(idx) % period
    return xp.where(r >= n, period - r, r)


# ---------------------------------------------------------------------------
# Interpolation weights (computed in-jit from fractions; all match OpenCV)
# ---------------------------------------------------------------------------


def _weights_linear(f, xp):
    return [1.0 - f, f]


def _weights_cubic(f, xp):
    """OpenCV interpolateCubic, A = -0.75."""
    A = -0.75
    w0 = ((A * (f + 1) - 5 * A) * (f + 1) + 8 * A) * (f + 1) - 4 * A
    w1 = ((A + 2) * f - (A + 3)) * f * f + 1
    g = 1.0 - f
    w2 = ((A + 2) * g - (A + 3)) * g * g + 1
    w3 = 1.0 - w0 - w1 - w2
    return [w0, w1, w2, w3]


_S45 = 0.70710678118654752440084436210485
_LANCZOS_CS = (
    (1, 0),
    (-_S45, -_S45),
    (0, 1),
    (_S45, -_S45),
    (-1, 0),
    (_S45, _S45),
    (0, -1),
    (-_S45, _S45),
)


def _weights_lanczos4(f, xp):
    """OpenCV interpolateLanczos4: 8 taps via the sin/cos phase trick,
    normalized to sum 1; degenerate f≈0 falls back to the center tap."""
    y0 = -(f + 3.0) * (math.pi * 0.25)
    s0 = xp.sin(y0)
    c0 = xp.cos(y0)
    ws = []
    for k in range(8):
        y = -(f + 3.0 - k) * (math.pi * 0.25)
        denom = y * y
        if xp is np:
            denom = np.where(denom == 0.0, 1.0, denom)  # masked below at f≈0
        ws.append((_LANCZOS_CS[k][0] * s0 + _LANCZOS_CS[k][1] * c0) / denom)
    total = sum(ws[1:], ws[0])
    ws = [w / total for w in ws]
    # f == 0 exactly → y for k=3 is 0 → NaN; OpenCV special-cases it.
    exact = f < 1e-7
    out = []
    for k in range(8):
        center = xp.where(exact, 1.0 if k == 3 else 0.0, ws[k])
        out.append(center)
    return out


def _tap_weights(interp: Interpolation, f, xp=jnp):
    if interp == Interpolation.NEAREST:
        return [xp.ones_like(f)]
    if interp == Interpolation.LINEAR:
        return _weights_linear(f, xp)
    if interp == Interpolation.CUBIC:
        return _weights_cubic(f, xp)
    if interp == Interpolation.LANCZOS4:
        return _weights_lanczos4(f, xp)
    raise ValueError(interp)


def tap_arrays(spec: SampleSpec):
    """Plan-time (numpy) per-tap flat indices and combined weights.

    Returns ``(idx_list, weight_list, valid_flat, add)``:
    ``idx_list[t]``: int32 [N] flat index into the [H*W] plane, fully
    border-resolved; ``weight_list[t]``: float32 [N] combined ``wy*wx``
    tap weight (None for NEAREST); ``valid_flat``: bool [N] transparent-
    border mask or None; ``add``: float32 [N] additive term or None.

    Non-wrap border semantics (measured against cv::remap with
    BORDER_TRANSPARENT on a pre-filled destination, the reference's setup
    — VideoFrameTransform.cpp:743-762): linear/cubic taps that fall
    outside the source contribute the *fill* value (weight zeroed, fill
    moved into ``add``); lanczos4 resolves outside taps via
    BORDER_REFLECT_101.  These become XLA literals in the plan-
    specialized executor — the key to the fast gather path.
    """
    H, W = spec.in_h, spec.in_w
    T = _TAPS[spec.interp]
    by = spec.base_y.astype(np.int64).reshape(-1)
    bx = spec.base_x.astype(np.int64).reshape(-1)
    wy = _tap_weights(spec.interp, spec.frac_y.reshape(-1).astype(np.float64), np)
    wx = _tap_weights(spec.interp, spec.frac_x.reshape(-1).astype(np.float64), np)
    fill_w = None  # accumulated outside-tap weight (fill applied by caller)
    lanczos = spec.interp == Interpolation.LANCZOS4
    idx_list, weight_list = [], []
    for ty in range(T):
        yy = by + ty
        if spec.wrap:
            yy_r = np.mod(yy, H)
        elif lanczos:
            yy_r = reflect101(yy, H)
        else:
            yy_r = np.clip(yy, 0, H - 1)
        for tx in range(T):
            xx = bx + tx
            if spec.wrap:
                xx_r = np.mod(xx, W)
            elif lanczos:
                xx_r = reflect101(xx, W)
            else:
                xx_r = np.clip(xx, 0, W - 1)
            idx_list.append((yy_r * W + xx_r).astype(np.int32))
            if spec.interp == Interpolation.NEAREST:
                weight_list = None
            else:
                w = (wy[ty] * wx[tx]).astype(np.float32)
                if not spec.wrap and not lanczos:
                    outside = (yy < 0) | (yy >= H) | (xx < 0) | (xx >= W)
                    if outside.any():
                        fill_w = (
                            w * outside
                            if fill_w is None
                            else fill_w + w * outside
                        )
                        w = np.where(outside, np.float32(0), w)
                weight_list.append(w)
    valid = None if spec.valid is None else spec.valid.reshape(-1)
    add = None if fill_w is None else fill_w.astype(np.float32)
    return idx_list, weight_list, valid, add


def const_budget_bytes(spec: SampleSpec) -> int:
    """HLO-literal footprint of the constant-specialized remap."""
    n = spec.base_y.size
    t2 = _TAPS[spec.interp] ** 2
    per_tap = 4 + (0 if spec.interp == Interpolation.NEAREST else 4)
    return n * t2 * per_tap


def partial_fixup(spec: SampleSpec, fill: float):
    """Correction set for kernel backends whose gather windows clamp
    outside taps: the (few) valid output pixels whose footprint is not
    fully inside the source need the exact BORDER_TRANSPARENT semantics
    (outside taps = fill for linear/cubic, REFLECT_101 for lanczos4 —
    see tap_arrays).  Returns ``(pos, idx, w, add)`` — flat output
    positions [P], border-resolved tap indices [T², P], weights [T², P]
    (outside taps zeroed for linear/cubic), additive fill term [P] — or
    None when nothing needs fixing."""
    if spec.wrap or spec.valid is None or spec.interp == Interpolation.NEAREST:
        return None
    T = _TAPS[spec.interp]
    H, W = spec.in_h, spec.in_w
    by = spec.base_y.astype(np.int64).reshape(-1)
    bx = spec.base_x.astype(np.int64).reshape(-1)
    inside = (by >= 0) & (by + T <= H) & (bx >= 0) & (bx + T <= W)
    pos = np.nonzero(spec.valid.reshape(-1) & ~inside)[0].astype(np.int32)
    if pos.size == 0:
        return None
    idx_list, weight_list, _, add = tap_arrays(spec)
    idx = np.stack([i[pos] for i in idx_list])
    w = np.stack([wl[pos] for wl in weight_list])
    a = (
        (add[pos] * np.float32(fill)).astype(np.float32)
        if add is not None
        else np.zeros(pos.size, np.float32)
    )
    return pos, idx, w, a


def fixup_values(fix, flat_u8: jnp.ndarray) -> jnp.ndarray:
    """Exact f32 values [B, P] for the partial-footprint pixels;
    ``flat_u8`` [B, H*W] must be the same (blurred) plane the remap
    consumed.  All fix arrays are tiny plan constants."""
    pos, idx, w, a = fix
    acc = jnp.asarray(a)[None, :]
    for t in range(idx.shape[0]):
        g = jnp.take(flat_u8, jnp.asarray(idx[t]), axis=1).astype(jnp.float32)
        acc = acc + jnp.asarray(w[t])[None, :] * g
    return acc


# Above this, fall back to traced indices instead of embedding literals
# (compile memory / executable size guard; lanczos4 at 4K would be ~0.8 GB).
MAX_CONST_BYTES = 320 * 1024 * 1024


def remap_const(spec: SampleSpec, flat_u8: jnp.ndarray, fill: float) -> jnp.ndarray:
    """XLA remap: ``flat_u8`` [B, H*W] uint8 → float32 [B, N].

    Tap indices and combined weights enter the graph as literals (numpy at
    trace time).  This is the portable general path — correct everywhere
    but gather-bound on TPU (XLA's gather streams at ~2.4 GB/s there); the
    production TPU path is the Pallas kernel in ops/remap_pallas.py, which
    uses the same spec.  This path serves CPU execution, tiny planes, and
    cross-checking.
    """
    idx_list, weight_list, valid, add = tap_arrays(spec)
    acc = None
    for t, idx in enumerate(idx_list):
        g = jnp.take(flat_u8, jnp.asarray(idx), axis=1).astype(jnp.float32)
        term = g if weight_list is None else jnp.asarray(weight_list[t])[None, :] * g
        acc = term if acc is None else acc + term
    if add is not None:
        acc = acc + (jnp.asarray(add) * jnp.float32(fill))[None, :]
    if valid is not None:
        acc = jnp.where(jnp.asarray(valid)[None, :], acc, jnp.float32(fill))
    return acc


def remap_traced(
    spec: SampleSpec,
    flat_u8: jnp.ndarray,
    base_y,
    base_x,
    frac_y,
    frac_x,
    valid,
    fill: float,
) -> jnp.ndarray:
    """General fallback with traced index arrays (same math, slow gather).

    Used when the constant footprint exceeds :data:`MAX_CONST_BYTES`.
    ``base_*``/``frac_*``/``valid`` are device arrays of the spec fields.
    ``flat_u8`` [B, H*W] → float32 [B, N].
    """
    H, W = spec.in_h, spec.in_w
    T = _TAPS[spec.interp]
    lanczos = spec.interp == Interpolation.LANCZOS4
    wy = _tap_weights(spec.interp, frac_y.reshape(-1))
    wx = _tap_weights(spec.interp, frac_x.reshape(-1))
    by = base_y.reshape(-1)
    bx = base_x.reshape(-1)
    acc = None
    for ty in range(T):
        yy = by + ty
        if spec.wrap:
            yy_r = jnp.where(yy >= H, yy - H, yy)
        elif lanczos:
            yy_r = reflect101(yy, H, jnp)
        else:
            yy_r = jnp.clip(yy, 0, H - 1)
        row = yy_r * W
        for tx in range(T):
            xx = bx + tx
            if spec.wrap:
                xx_r = jnp.where(xx >= W, xx - W, xx)
            elif lanczos:
                xx_r = reflect101(xx, W, jnp)
            else:
                xx_r = jnp.clip(xx, 0, W - 1)
            g = jnp.take(flat_u8, row + xx_r, axis=1).astype(jnp.float32)
            if spec.interp == Interpolation.NEAREST:
                term = g
            else:
                w = wy[ty] * wx[tx]
                if not spec.wrap and not lanczos:
                    # outside taps contribute the fill (see tap_arrays)
                    outside = (yy < 0) | (yy >= H) | (xx < 0) | (xx >= W)
                    g = jnp.where(outside[None, :], jnp.float32(fill), g)
                term = w[None, :] * g
            acc = term if acc is None else acc + term
    if valid is not None:
        acc = jnp.where(valid.reshape(-1)[None, :], acc, jnp.float32(fill))
    return acc


# ---------------------------------------------------------------------------
# INTER_AREA downscale as plan-time matrices (supersampling epilogue,
# VideoFrameTransform.cpp:735-777)
# ---------------------------------------------------------------------------


def area_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Row matrix M [n_out, n_in] such that ``out = M @ in`` equals
    cv::resize INTER_AREA along one axis.

    Downscale (n_in >= n_out): box integral with fractional edge weights.
    Upscale: OpenCV falls back to bilinear for INTER_AREA enlargement; we
    build the matching bilinear matrix.
    """
    M = np.zeros((n_out, n_in), np.float32)
    if n_in >= n_out:
        scale = n_in / n_out
        for i in range(n_out):
            lo = i * scale
            hi = (i + 1) * scale
            j0 = int(math.floor(lo))
            j1 = int(math.ceil(hi))
            for j in range(j0, min(j1, n_in)):
                w = min(hi, j + 1) - max(lo, j)
                M[i, j] = w / scale
    else:
        # Enlargement: OpenCV's INTER_AREA upscale branch computes its own
        # (non-centered) linear coefficients:
        #   sx = floor(dx*scale); fx = (dx+1) - (sx+1)*inv_scale;
        #   fx = fx <= 0 ? 0 : fx - floor(fx)
        scale = n_in / n_out
        inv_scale = n_out / n_in
        for i in range(n_out):
            j0 = int(math.floor(i * scale))
            f = (i + 1) - (j0 + 1) * inv_scale
            f = 0.0 if f <= 0 else f - math.floor(f)
            if j0 >= n_in - 1:
                M[i, n_in - 1] = 1.0
            else:
                M[i, j0] = 1.0 - f
                M[i, j0 + 1] = f
    return M


def apply_area_resize(img: jnp.ndarray, row_m, col_m) -> jnp.ndarray:
    """INTER_AREA as two MXU matmuls: img [B, H', W'] → [B, out_h, out_w]."""
    h = jnp.einsum("ih,bhw->biw", row_m, img, preferred_element_type=jnp.float32)
    return jnp.einsum("jw,biw->bij", col_m, h, preferred_element_type=jnp.float32)
