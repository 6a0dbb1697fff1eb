"""Single-frame latency sharding: output row-bands across devices.

The batch mesh (:mod:`.mesh`) scales THROUGHPUT; it does nothing for the
latency of one frame — the reference's own answer to that is a pthread
per prefilter segment within the frame (``VideoFrameTransform.cpp:592-604``).
The TPU-native analog: split the OUTPUT rows of one frame into bands, one
per device.  Every plan array (warp bases, fractions, masks, INTER_AREA
rows) is indexed by output pixel, so a row slice of the spec IS a valid
smaller plan; each device transforms its band independently against a
replicated input — no collectives, the transfer is one small input
broadcast plus tiny band outputs back.

Trade-off (v1): the adaptive prefilter is input-space, so every device
blurs the full input plane — duplicated work that bounds the speedup at
``(blur + remap/N) / (blur + remap)``.  Worth it exactly when latency,
not chip-seconds, is the constraint (live streaming at batch 1).

Composition (round 4):

- **bands x frames grid** (:func:`transform_frame_banded_async`): with
  more local devices than bands, device group ``g`` serves frame
  ``k % G`` — up to ``G = n_devices // n_bands`` frames in flight, each
  at banded latency.  The CLI drives this when ``--devices`` exceeds
  ``--latency-bands``.
- **multi-host band groups** (``bands_slice``): under
  ``jax.distributed`` each process runs a contiguous group of the
  global bands on its own devices and holds its own row slice of the
  output; :func:`local_band_range` places the groups.  No collectives —
  each host decodes its own input copy (the "broadcast" is the ingest
  fan-out) and emits its rows.
- **input broadcast model** (:func:`broadcast_ms`): the per-frame cost
  of replicating the input to every band device, modeled from link
  bandwidths — the term the single-chip band projections must add.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from .. import pipeline
from ..ops.staging import stage_program
from ..plan import PlanePlan, TransformPlan, _LazyWindowPlan


def _slice_plane(pp: PlanePlan, y0: int, y1: int) -> PlanePlan:
    """Row band [y0, y1) of a plane plan's OUTPUT (final, post-resize)."""
    spec = pp.spec
    if pp.area_row is not None:
        # supersampled plan: the band's scaled rows are the (contiguous)
        # support of its INTER_AREA rows
        sub = pp.area_row[y0:y1]
        used = np.flatnonzero(sub.any(axis=0))
        s0, s1 = int(used[0]), int(used[-1]) + 1
        area_row = np.ascontiguousarray(sub[:, s0:s1])
    else:
        s0, s1 = y0, y1
        area_row = None
    spec = dataclasses.replace(
        spec,
        base_y=spec.base_y[s0:s1],
        base_x=spec.base_x[s0:s1],
        frac_y=spec.frac_y[s0:s1],
        frac_x=spec.frac_x[s0:s1],
        valid=None if spec.valid is None else spec.valid[s0:s1],
    )
    return dataclasses.replace(
        pp,
        key=f"{pp.key}|band{y0}-{y1}",
        spec=spec,
        pallas=_LazyWindowPlan(spec, float(pp.fill)),
        out_h=y1 - y0,
        scaled_h=s1 - s0,
        area_row=area_row,
    )


_BAND_CACHE: Dict[Tuple, Tuple[TransformPlan, ...]] = {}

# Relative supertile costs of the batch-1 window-gather kernel, fitted
# ON CHIP against the SHIPPED kernels (2026-08-20, post-CLASS_T) from
# the class-peel chain probe (tools/probe_fb_cost.py).  The 8-band
# uniform profile can no longer identify per-class costs on its own —
# post-CLASS_T the flagship's uniform bands collapse to two distinct
# class compositions (tools/fit_band_cost.py, NOTES.md round 5) — so the
# constants come from the peel's marginal costs pooled over luma + 2x
# chroma: R 14.3 us/supertile (17.857/1240 luma, 4.379/312 chroma), W
# marginal 16.7 us, T marginal 22.9 us, P marginal 28.2 us.  Validation:
# the pooled model predicts the measured uniform profile's
# heavy-vs-light band delta to ~3% (predicted 0.61 ms vs measured
# 0.59 ms, tools/probe_latency_bands.py 2026-08-20).  The fallback
# subtile ratio is carried from the round-3 fit; the flagship plan has
# zero fallback subtiles since CLASS_P.
_COST_REGULAR = 1.0
_COST_WIDE = 1.17
_COST_TALL = 1.61
_COST_POLAR = 1.98
_COST_FB_SUBTILE = 1.93


def plan_row_costs(plan: TransformPlan) -> Optional[np.ndarray]:
    """Model-based [luma out_h] per-row cost of the batch-1 remap path.

    Counts each plane's window-gather supertiles per output row (chroma
    rows mapped through the subsampling ratio; U and V each run the
    chroma plan) weighted by the fitted class costs above, so
    :func:`band_plans` can place cost-balanced edges WITHOUT a
    measurement pass.  HISTORICAL NOTE (2026-08-20): this model was
    built for the ~2x equator/pole imbalance of the pre-CLASS_P
    kernels; the shipped CLASS_P/CLASS_T kernels flattened the profile
    to ~1.2x and UNIFORM edges now measure better at every band count
    (docs/perf.md "Latency sharding") — the CLI defaults to uniform and
    this model stays for configs whose plans are genuinely imbalanced
    (e.g. off-center projections).

    Triggers the plan's deferred window-plan build (seconds at 4K,
    one-time, memoized on the plan).  Returns None when a plane has no
    window-gather plan (tiny planes on the XLA path): callers fall back
    to uniform bands.
    """
    from ..ops.remap_pallas import CLASS_P, CLASS_R, CLASS_T

    rows = np.zeros(plan.luma.out_h)

    def add(pp: PlanePlan, r: int, weight: float) -> bool:
        wp = pp.pallas.get()
        if wp is None:
            return False
        unit = 8 * r  # luma rows covered by one supertile row
        buckets = np.zeros(-(-plan.luma.out_h // unit) + 16)
        for cls in wp.classes:
            dims = (cls.win_h, cls.win_w, cls.gh)
            if dims == CLASS_R:
                c = _COST_REGULAR
            elif dims == CLASS_P:
                c = _COST_POLAR
            elif dims == CLASS_T:
                c = _COST_TALL
            else:
                c = _COST_WIDE
            np.add.at(buckets, cls.meta[0].astype(int), weight * c)
        if wp.fb_rows is not None:
            np.add.at(
                buckets, wp.fb_rows.astype(int), weight * _COST_FB_SUBTILE
            )
        rows[:] += np.repeat(buckets / unit, unit)[: plan.luma.out_h]
        return True

    ok = add(plan.luma, 1, 1.0)
    if ok and plan.chroma is not None:
        r = max(1, plan.luma.out_h // plan.chroma.out_h)
        ok = add(plan.chroma, r, 2.0)
    return rows if ok else None


def _cost_edges(units: int, r: int, n: int, row_costs) -> List[int]:
    """Band edges (in luma rows, multiples of ``r``) at equal-cost
    quantiles of ``row_costs``; every band keeps at least one unit."""
    unit_cost = np.asarray(row_costs, np.float64)[: units * r]
    unit_cost = unit_cost.reshape(units, r).sum(axis=1)
    cum = np.concatenate([[0.0], np.cumsum(unit_cost)])
    targets = cum[-1] * np.arange(1, n) / n
    cuts = np.searchsorted(cum, targets)
    edges = [0]
    for c in cuts:
        edges.append(int(min(max(c, edges[-1] + 1), units - (n - len(edges)))))
    edges.append(units)
    return [e * r for e in edges]


def band_plans(
    plan: TransformPlan, n: int, row_costs=None
) -> Tuple[TransformPlan, ...]:
    """Split a frame plan into ``n`` output row-band plans.

    Luma band edges align to the chroma subsampling ratio so each band
    carries exact chroma rows.  ``n`` is clamped to the number of
    alignable rows.  ``row_costs`` (optional, [out_h] relative per-row
    costs — e.g. a measured per-band profile spread over its rows)
    places the edges at equal-cost quantiles instead of equal heights:
    frame latency is max(band), so balancing the costs lowers it toward
    sum/n.  Memoized per (plan, n, row_costs).
    """
    key = (
        plan.luma.key,
        None if plan.chroma is None else plan.chroma.key,
        n,
        None if row_costs is None else tuple(np.asarray(row_costs).tolist()),
    )
    hit = _BAND_CACHE.get(key)
    if hit is not None:
        return hit
    r = 1
    if plan.chroma is not None:
        r = max(1, plan.luma.out_h // plan.chroma.out_h)
    units = plan.luma.out_h // r
    n = max(1, min(n, units))
    if row_costs is not None:
        edges = _cost_edges(units, r, n, row_costs)
    else:
        edges = [int(e) * r for e in np.linspace(0, units, n + 1)]
    edges[-1] = plan.luma.out_h
    bands = []
    for y0, y1 in zip(edges[:-1], edges[1:]):
        chroma = None
        if plan.chroma is not None:
            chroma = _slice_plane(plan.chroma, y0 // r, y1 // r)
        bands.append(
            dataclasses.replace(
                plan,
                out_h=y1 - y0,
                luma=_slice_plane(plan.luma, y0, y1),
                chroma=chroma,
            )
        )
    out = tuple(bands)
    _BAND_CACHE[key] = out
    return out


_EXEC_CACHE: Dict[Tuple, Tuple] = {}


def _band_executor(pp: PlanePlan, device, x):
    """Per-(plane-band, device) staged executor; plan constants resident
    on that device (the shared pipeline executor pins them to the default
    device, which would force cross-device transfers here)."""
    use_pallas = pipeline._use_pallas(pp)
    key = (
        pp.key,
        use_pallas,
        pipeline.LANE_MIN_BATCH,
        pipeline.LANE_PACK_MAX,
        getattr(device, "id", device),
        tuple(x.shape),
    )
    ent = _EXEC_CACHE.get(key)
    if ent is None:
        program = pipeline._plane_program(pp, use_pallas)
        fn, consts = stage_program(
            program, jax.ShapeDtypeStruct(x.shape, x.dtype)
        )
        ent = (jax.jit(fn), jax.device_put(consts, device))
        _EXEC_CACHE[key] = ent
    return ent


def clear_band_caches() -> None:
    _BAND_CACHE.clear()
    _EXEC_CACHE.clear()


class BandedFrame:
    """In-flight banded frame: all bands dispatched, nothing gathered.

    ``gather()`` blocks on the device results and stitches the output
    planes; until then the host is free to dispatch other frames (the
    bands x frames grid in the CLI)."""

    def __init__(self, parts: List[List]):
        self._parts = parts

    def gather(self) -> Tuple[np.ndarray, ...]:
        return tuple(
            np.concatenate([np.asarray(o)[0] for o in outs], axis=0)
            for outs in self._parts
        )


def local_band_range(
    n_bands: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """Contiguous global-band group [b0, b1) owned by this process.

    Multi-host latency sharding: the global frame is banded ``n_bands``
    ways; process ``p`` of ``P`` runs bands ``[p*n/P, (p+1)*n/P)`` on its
    own devices and holds those output rows.  Remainder bands go to the
    leading processes (sizes differ by at most one).
    """
    p = jax.process_index() if process_index is None else process_index
    P = jax.process_count() if process_count is None else process_count
    if not 0 <= p < P:
        raise ValueError(f"process {p} outside [0, {P})")
    base, rem = divmod(n_bands, P)
    b0 = p * base + min(p, rem)
    return b0, b0 + base + (1 if p < rem else 0)


def transform_frame_banded_async(
    plan: TransformPlan,
    planes: Sequence,
    devices: Optional[Sequence] = None,
    n: Optional[int] = None,
    row_costs=None,
    bands_slice: Optional[Tuple[int, int]] = None,
) -> BandedFrame:
    """Dispatch ONE frame's output row-bands across devices; no blocking.

    ``planes``: uint8 [H, W] arrays (n_planes of them, like
    :func:`pipeline.transform_frame_planes`).

    ``row_costs``: per-row relative costs for cost-balanced band edges
    (see :func:`band_plans`); the string ``"auto"`` uses the fitted
    :func:`plan_row_costs` model (uniform bands when the model has no
    window plan to read).

    ``bands_slice``: run only global bands [b0, b1) — the multi-host
    mode, where each process owns a contiguous band group
    (:func:`local_band_range`) and its ``gather()`` returns that row
    slice of the frame.
    """
    if isinstance(row_costs, str):
        if row_costs != "auto":
            raise ValueError(f"row_costs: array or 'auto', got {row_costs!r}")
        row_costs = plan_row_costs(plan)
    if devices is None:
        devices = jax.devices()
    if n is None:
        n = len(devices)
    if len(planes) != plan.n_planes:
        raise ValueError(
            f"expected {plan.n_planes} plane(s) for {plan.pix_fmt}, got "
            f"{len(planes)}"
        )
    bands = band_plans(plan, n, row_costs=row_costs)
    if bands_slice is not None:
        b0, b1 = bands_slice
        if not 0 <= b0 < b1 <= len(bands):
            raise ValueError(
                f"bands_slice {bands_slice} outside [0, {len(bands)}]"
            )
        bands = bands[b0:b1]
    xs = [np.asarray(p)[None] for p in planes]

    parts: List[List] = [[] for _ in planes]
    for i, band in enumerate(bands):
        dev = devices[i % len(devices)]
        pps = [band.luma] + [band.chroma] * (len(planes) - 1)
        for j, (pp, x) in enumerate(zip(pps, xs)):
            xd = jax.device_put(x, dev)
            jfn, consts = _band_executor(pp, dev, xd)
            parts[j].append(jfn(xd, consts))
    return BandedFrame(parts)


def transform_frame_banded(
    plan: TransformPlan,
    planes: Sequence,
    devices: Optional[Sequence] = None,
    n: Optional[int] = None,
    row_costs=None,
    bands_slice: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, ...]:
    """Transform ONE frame with its output rows sharded over devices.

    Blocking form of :func:`transform_frame_banded_async`: returns uint8
    [oh, ow] numpy planes, byte-identical to the unsharded transform
    (the band-group row slice when ``bands_slice`` is given).  All bands
    dispatch asynchronously before any blocks, so wall latency is
    max(band) + transfers, not the sum.
    """
    return transform_frame_banded_async(
        plan, planes, devices, n, row_costs, bands_slice
    ).gather()


# Link-bandwidth model for the per-frame input broadcast (the term a
# single-chip per-band projection must add to max(band)).  Defaults are
# deliberately conservative v5e-class figures: host->device injection
# ~8 GB/s effective (PCIe Gen3-era per-host NIC/DMA floor), on-slice
# replication ~40 GB/s per ICI link (v5e 1D ring neighbor exchange;
# jax-ml.github.io/scaling-book "rooflines").  Override per deployment —
# and CALIBRATE per deployment: tools/probe_h2d.py measures the host
# term with a fenced scalar-digest read (2026-08-20 on the development
# tunnel: 12.44 MB in 341 ms = 0.036 GB/s — the HTTP tunnel, 200x below
# the PCIe-class default; a production host must re-run the probe).  The
# ICI term is unmeasurable with one chip and stays a model; perf.md
# quotes every banded projection with that caveat.
HOST_INJECT_GBPS = 8.0
ICI_GBPS = 40.0


def broadcast_ms(
    plan: TransformPlan,
    in_w: int,
    in_h: int,
    n_devices: int,
    host_gbps: float = HOST_INJECT_GBPS,
    ici_gbps: float = ICI_GBPS,
) -> float:
    """Modeled per-frame input-broadcast milliseconds to ``n_devices``.

    One host injects the uint8 planes once (``bytes / host_gbps``), then
    the slice replicates them neighbor-to-neighbor over ICI — a ring
    broadcast moves the full payload once per hop but pipelines, so the
    added wall time is ~``bytes / ici_gbps`` regardless of ``n``
    (scaling-book collective model).  Multi-host ingest (every process
    decodes its own copy) skips both terms — the fan-out happens in the
    data plane.
    """
    from ..config import chroma_dims

    cw, ch = chroma_dims(in_w, in_h, plan.pix_fmt)
    nbytes = in_w * in_h + (plan.n_planes - 1) * cw * ch
    ms = nbytes / (host_gbps * 1e6)
    if n_devices > 1:
        ms += nbytes / (ici_gbps * 1e6)
    return ms
