"""fast_trace: one entry point for the fused-kernel production tier.

Routes any step method to its Pallas kernel — ``kernels/fused.py`` for the
Taylor/curvature/window families, ``kernels/golden.py`` for the golden/
Newton families — and falls back to the scan engine for configurations the
kernels don't cover (grid media, float64, history mode).  This is what a
user reaches for when the job is "a million rays, final state only, as fast
as the chip goes"; ``trace`` remains the reference-parity tier.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu import config
from raytracing_tpu.engine.trace import _outside, trace
from raytracing_tpu.kernels.fused import (
    FUSED_FIELDS, FUSED_OPS, fused_trace_final, fused_trace_final_strat)
from raytracing_tpu.kernels.golden import GOLDEN_OPS, golden_trace_final
from raytracing_tpu.kernels.fused import fused_trace_final_custom
from raytracing_tpu.media.c1 import C1GridMedium, C1StratifiedMedium
from raytracing_tpu.media.hermite import HermiteGridMedium
from raytracing_tpu.media.medium import AnalyticMedium, CustomMedium
from raytracing_tpu.media.samples import compact_for_trace
from raytracing_tpu.media.spline import GridMedium, StratifiedGridMedium
from raytracing_tpu.ops.registry import canonical

# GridMedium -> HermiteGridMedium conversions, cached by table identity (the
# node-form build costs ~1 s of host einsums per medium).  LRU-bounded: the
# node form is ~10x Z, and serving builds a fresh GridMedium per request —
# an unbounded cache would retain every medium a client ever posted.
_HERMITE_CACHE: dict = {}
_HERMITE_CACHE_MAX = 4


def _as_hermite(medium: GridMedium) -> HermiteGridMedium:
    key = id(medium.Z)
    hit = _HERMITE_CACHE.pop(key, None)
    # the cached entry keeps a strong reference to the key object, so an id
    # reuse after GC cannot alias a different medium
    if hit is None or hit[0] is not medium.Z:
        from raytracing_tpu.media.hermite import build_hermite_medium

        hit = (medium.Z, build_hermite_medium(medium))
    _HERMITE_CACHE[key] = hit  # (re)insert at the recent end
    while len(_HERMITE_CACHE) > _HERMITE_CACHE_MAX:
        _HERMITE_CACHE.pop(next(iter(_HERMITE_CACHE)))
    return hit[1]


#: one-shot kernels above this trip count route through bounded segments
#: (Mosaic compile time scales with the fori_loop trip count)
SEGMENT_THRESHOLD = 6000


class FastResult(NamedTuple):
    pos: Any         # (R, 2) final positions
    traveltime: Any  # (R,)
    dist_sim: Any    # (R,)  (None on the golden path)
    active: Any      # (R,) bool: still inside the box
    engine: str      # "fused" | "golden" | "scan"
    mom_count: Any = None   # Welford p_x tracker (stats=True, stratified)
    mom_mean: Any = None
    mom_m2: Any = None


def tight_block_rays(rays: int) -> int:
    """Tile-block size for a DISPERSED user fan of ``rays`` rays.

    Tiled-window blocks must stay spatially tight: an oversize block's
    bbox can exceed every window class and fall back to the far slower
    supercell/scan path after paying the escalation-ladder compiles.
    Mosaic floors TPU blocks at 1024 rays (8 sublanes x 128 lanes);
    interpret-mode CPU accepts a single 128-lane row, so there the block
    scales with the fan density.
    """
    if jax.default_backend() != "cpu":
        return 1024
    return min(1024, max(128, int(rays) // 32))


def supports(op_name: str, medium) -> bool:
    """True when a fused kernel covers this (op, medium) pairing."""
    op = canonical(op_name)
    if isinstance(medium, (StratifiedGridMedium, C1StratifiedMedium)):
        return op in FUSED_OPS or op in GOLDEN_OPS
    if isinstance(medium, (HermiteGridMedium, GridMedium, C1GridMedium)):
        return op in FUSED_OPS or op in GOLDEN_OPS
    if isinstance(medium, CustomMedium):
        return op in FUSED_OPS or op in GOLDEN_OPS
    return (isinstance(medium, AnalyticMedium)
            and medium.field in FUSED_FIELDS
            and (op in FUSED_OPS or op in GOLDEN_OPS))


def fast_trace(op_name: str, scen: config.ScenarioConfig, medium, *,
               delta_s, pos0, theta0, steps: int | None = None,
               divisor: int | None = None, n_turns: int = config.N_TURNS,
               block_rays: int = 4096, interpret: bool | None = None,
               precision: str = "standard", stats: bool = False
               ) -> FastResult:
    """Metrics-only trace through the fastest available path.

    ``stats=True`` (stratified media only — where p_x is an exact
    invariant) rides the kernels' Welford momentum tracker and fills
    ``mom_count/mom_mean/mom_m2`` on the result: full-batch conservation
    CV at kernel speed, the reference's vert acceptance quantity
    (RT_bench.py:1352-1360) for user media.

    ``pos0`` (R, 2) / ``theta0`` (R,) are padded to a block multiple
    automatically (rays are independent; the padding is discarded).
    ``interpret`` defaults to True on CPU backends, where Pallas TPU
    kernels cannot lower natively.

    ``precision="high"`` routes to the double-word float32 RK4 kernel
    (kernels/df.py — ~1e-7/turn trajectories in pure f32; requires op12 and
    a df-supported analytic field; no boundary mask or traveltime).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # every kernel family lays rays out in 128-wide lanes; a sub-lane or
    # ragged block reaches the kernels as an empty (0, 128) reshape
    block_rays = max(128, -(-int(block_rays) // 128) * 128)
    op = canonical(op_name)
    # trim stratified tables to their reachable, nontrivial window — fewer
    # 128-lane gather chunks in the kernels (media/samples.compact_for_trace)
    medium = compact_for_trace(medium, scen.box, delta_s)

    # validate BEFORE any early-return path (df32, grid-tiled, supercell):
    # otherwise stats=True on a 2-D grid medium would silently return a
    # result with mom_* = None instead of the contracted ValueError
    if stats and not isinstance(medium, (StratifiedGridMedium,
                                         C1StratifiedMedium)):
        raise ValueError("stats=True needs a stratified (x-independent) "
                         "medium — p_x is only an invariant there; got "
                         f"{type(medium).__name__}")

    if precision == "high":
        from raytracing_tpu.kernels.df import DF_FIELDS, df_trace

        if op != "op12":
            raise ValueError("precision='high' uses the df32 RK4 kernel; "
                             f"pass op12 (got {op!r})")
        if not (isinstance(medium, AnalyticMedium)
                and medium.field in DF_FIELDS):
            raise ValueError(f"df32 kernel supports analytic {DF_FIELDS}")
        if steps is None:
            steps = scen.max_size(float(delta_s), divisor, n_turns) - 1
        r = len(theta0)
        pad = (-r) % block_rays
        pos0 = jnp.asarray(pos0, jnp.float32)
        theta0 = jnp.asarray(theta0, jnp.float32)
        if pad:
            pos0 = jnp.concatenate([pos0, jnp.tile(pos0[-1:], (pad, 1))])
            theta0 = jnp.concatenate([theta0, jnp.tile(theta0[-1:], pad)])
        pos = df_trace(pos0, theta0, jnp.float32(delta_s), steps=int(steps),
                       field=medium.field, block_rays=block_rays,
                       interpret=interpret)
        return FastResult(pos=pos[:r], traveltime=None, dist_sim=None,
                          active=np.ones(r, bool), engine="df32")
    if precision != "standard":
        raise ValueError(f"precision must be 'standard' or 'high', got {precision!r}")
    if steps is None:
        steps = scen.max_size(float(delta_s), divisor, n_turns) - 1

    if isinstance(medium, GridMedium):
        # the Hermite node form is the same spline with a kernel-friendly
        # layout — 2-D grid media route through it automatically
        medium = _as_hermite(medium)

    if (isinstance(medium, (HermiteGridMedium, C1GridMedium))
            and (op in FUSED_OPS or op in GOLDEN_OPS)):
        from raytracing_tpu.engine.segmented import grid_trace, grid_trace_tiled

        # production path: block-shared tile kernel (works at ANY delta_s,
        # covers the golden/anisotropic family too).  Sorted ray blocks
        # share one node window in VMEM; refreshes are coherent per-block
        # slices.  Tile blocks are capped at 1024 rays to keep block
        # bounding boxes tight.
        tb = min(block_rays, 1024)
        r = len(theta0)
        pad = (-r) % tb
        tpos = jnp.asarray(pos0, jnp.float32)
        tth = jnp.asarray(theta0, jnp.float32)
        if pad:
            tpos = jnp.concatenate([tpos, jnp.tile(tpos[-1:], (pad, 1))])
            tth = jnp.concatenate([tth, jnp.tile(tth[-1:], pad)])
        # size pre-check: grid_trace_tiled needs at least its smallest
        # (11, 11)-cell window; user grids from grid_medium_from_samples can
        # be smaller and must keep their supercell/scan path (ADVICE r2 #2)
        if medium.nx - 1 >= 11 and medium.ny - 1 >= 11:
            try:
                g = grid_trace_tiled(op, tpos, tth, jnp.float32(delta_s),
                                     medium, steps=int(steps),
                                     box=tuple(scen.box), block_rays=tb,
                                     interpret=interpret,
                                     gamma=float(scen.gamma))
                return FastResult(pos=g.pos[:r], traveltime=g.traveltime[:r],
                                  dist_sim=g.dist_sim[:r],
                                  active=g.active[:r], engine="grid-tiled")
            except RuntimeError:
                pass  # batch too dispersed for tiling -> supercell / scan

        cell = min(1.0 / medium.inv_hx, 1.0 / medium.inv_hy)
        if (op in FUSED_OPS and float(delta_s) < 0.9 * cell
                and isinstance(medium, HermiteGridMedium)):
            # supercell fallback is parity-form only; C1 media fall
            # through to the scan tier (n_and_grad works everywhere)
            pad = (-r) % block_rays
            pos0 = jnp.asarray(pos0, jnp.float32)
            theta0 = jnp.asarray(theta0, jnp.float32)
            if pad:
                pos0 = jnp.concatenate([pos0, jnp.tile(pos0[-1:], (pad, 1))])
                theta0 = jnp.concatenate([theta0, jnp.tile(theta0[-1:], pad)])
            g = grid_trace(op, pos0, theta0, jnp.float32(delta_s), medium,
                           steps=int(steps), box=tuple(scen.box),
                           block_rays=block_rays, interpret=interpret)
            return FastResult(pos=g.pos[:r], traveltime=g.traveltime[:r],
                              dist_sim=g.dist_sim[:r], active=g.active[:r],
                              engine="grid-supercell")
        # coarse steps break the supercell invariant -> scan fallback below

    # Past the Mosaic compile threshold, fused and golden ops chain bounded
    # segments (below); custom-media kernels have no segmented variant, so
    # for them the scan engine (compile independent of trip count) is the
    # safe path.  The reference's workloads never get there (largest golden
    # config is ~3300 steps).
    too_long = int(steps) > SEGMENT_THRESHOLD
    seg_eligible = ((op in FUSED_OPS or op in GOLDEN_OPS)
                    and (isinstance(medium, (StratifiedGridMedium,
                                             C1StratifiedMedium))
                         or (isinstance(medium, AnalyticMedium)
                             and medium.field in FUSED_FIELDS)))

    if (not supports(op, medium)
            or isinstance(medium, (HermiteGridMedium, C1GridMedium))
            or (too_long and not seg_eligible)):
        if stats:
            raise ValueError(f"stats=True has no kernel path for {op!r} on "
                             f"{type(medium).__name__} (scan fallback)")
        res = trace(op, scen, medium, delta_s=float(delta_s), divisor=divisor,
                    n_turns=n_turns, mode="metrics", dtype=np.float32,
                    max_size=steps + 1, pos0=pos0, theta0=theta0)
        # FastResult.active means "still inside the box"; the scan engine's
        # final.active means "still integrating" (False once the padded scan
        # completes), so derive the box mask from the frozen positions.
        return FastResult(pos=res.final.pos, traveltime=res.final.traveltime,
                          dist_sim=res.final.dist_sim,
                          active=~_outside(res.final.pos, tuple(scen.box)),
                          engine="scan")

    r = len(theta0)
    pad = (-r) % block_rays
    pos0 = jnp.asarray(pos0, jnp.float32)
    theta0 = jnp.asarray(theta0, jnp.float32)
    if pad:
        pos0 = jnp.concatenate([pos0, jnp.tile(pos0[-1:], (pad, 1))])
        theta0 = jnp.concatenate([theta0, jnp.tile(theta0[-1:], pad)])

    # Mosaic compile time scales with the kernel trip count; beyond a few
    # thousand steps the one-shot kernels become compile hazards, so long
    # traces chain bounded segments instead (identical results, tested).
    #
    # Exit scenarios (the interface/vert fans leave the box midway,
    # RT_bench.py:878-879's data-dependent break) also take the segmented
    # tier BY DEFAULT, with the batch sorted by launch angle so rays that
    # exit together share kernel blocks and all-frozen blocks bypass the
    # step loop on device (segmented_trace(skip_frozen=True) — 2-3x on
    # boundary-exit workloads).  Per-ray results do not depend on block
    # membership, and the sort is undone, so skipping changes nothing but
    # the wasted lane work.
    exit_scen = scen.is_interface or scen.name == "vert"
    if (too_long or exit_scen) and seg_eligible:
        from raytracing_tpu.engine.segmented import segmented_trace

        inv = None
        if exit_scen:
            perm = jnp.argsort(theta0)
            inv = jnp.argsort(perm)
            pos0, theta0 = pos0[perm], theta0[perm]
        strat = isinstance(medium, (StratifiedGridMedium, C1StratifiedMedium))
        f = segmented_trace(
            op, pos0, theta0, jnp.float32(delta_s), steps=int(steps),
            box=tuple(scen.box),
            field=None if strat else scen.field,
            medium=medium if strat else None,
            segment=max(1, min(int(steps),
                               1024 if op in FUSED_OPS else 256)),
            block_rays=block_rays, interpret=interpret,
            gamma=float(scen.gamma), skip_frozen=exit_scen,
            with_stats=stats)

        def undo(a):
            if a is None:
                return None
            return (a if inv is None else a[inv])[:r]

        eng = "golden" if op in GOLDEN_OPS else "fused"
        eng += "-strat" if strat else ""
        eng += "-seg-skip" if exit_scen else "-seg"
        return FastResult(pos=undo(f.pos), traveltime=undo(f.traveltime),
                          dist_sim=undo(f.dist_sim), active=undo(f.active),
                          engine=eng, mom_count=undo(f.mom_count),
                          mom_mean=undo(f.mom_mean), mom_m2=undo(f.mom_m2))

    mom = (None, None, None)
    if isinstance(medium, (StratifiedGridMedium, C1StratifiedMedium)) \
            and op in GOLDEN_OPS:
        g = golden_trace_final(
            pos0, theta0, jnp.float32(delta_s), jnp.float32(scen.gamma),
            field=scen.field, op=op, steps=int(steps), box=tuple(scen.box),
            block_rays=block_rays, interpret=interpret, medium=medium,
            with_stats=stats)
        pos, tt, dsim, act = g.pos, g.traveltime, g.dist_sim, g.active
        if stats:
            mom = (g.mom_count, g.mom_mean, g.mom_m2)
        eng = "golden-strat"
    elif isinstance(medium, (StratifiedGridMedium, C1StratifiedMedium)):
        f = fused_trace_final_strat(
            pos0, theta0, jnp.float32(delta_s), medium, op=op,
            steps=int(steps), box=tuple(scen.box), block_rays=block_rays,
            interpret=interpret, with_stats=stats)
        pos, tt, dsim, act = f.pos, f.traveltime, f.dist_sim, f.active
        if stats:
            mom = (f.mom_count, f.mom_mean, f.mom_m2)
        eng = "fused-strat"
    elif isinstance(medium, CustomMedium) and op in GOLDEN_OPS:
        g = golden_trace_final(
            pos0, theta0, jnp.float32(delta_s), jnp.float32(scen.gamma),
            field=scen.field, op=op, steps=int(steps), box=tuple(scen.box),
            block_rays=block_rays, interpret=interpret, medium=medium)
        pos, tt, dsim, act = g.pos, g.traveltime, g.dist_sim, g.active
        eng = "golden-custom"
    elif isinstance(medium, CustomMedium):
        f = fused_trace_final_custom(
            pos0, theta0, jnp.float32(delta_s), medium=medium, op=op,
            steps=int(steps), box=tuple(scen.box), block_rays=block_rays,
            interpret=interpret)
        pos, tt, dsim, act = f.pos, f.traveltime, f.dist_sim, f.active
        eng = "fused-custom"
    elif op in GOLDEN_OPS:
        g = golden_trace_final(
            pos0, theta0, jnp.float32(delta_s), jnp.float32(scen.gamma),
            field=scen.field, op=op, steps=int(steps), box=tuple(scen.box),
            block_rays=block_rays, interpret=interpret)
        pos, tt, dsim, act = g.pos, g.traveltime, g.dist_sim, g.active
        eng = "golden"
    else:
        f = fused_trace_final(
            pos0, theta0, jnp.float32(delta_s), field=scen.field, op=op,
            steps=int(steps), box=tuple(scen.box), block_rays=block_rays,
            interpret=interpret)
        pos, tt, dsim, act = f.pos, f.traveltime, f.dist_sim, f.active
        eng = "fused"
    return FastResult(pos=pos[:r], traveltime=tt[:r],
                      dist_sim=dsim[:r] if dsim is not None else None,
                      active=act[:r], engine=eng,
                      mom_count=None if mom[0] is None else mom[0][:r],
                      mom_mean=None if mom[1] is None else mom[1][:r],
                      mom_m2=None if mom[2] is None else mom[2][:r])


def fast_dynamic(op_name: str, scen: config.ScenarioConfig, medium, *,
                 delta_s, pos0, theta0, steps: int | None = None,
                 divisor: int | None = None, n_turns: int = config.N_TURNS,
                 block_rays: int = 4096, interpret: bool | None = None):
    """Metrics-only DYNAMIC trace through the fastest available path.

    The dynamic twin of :func:`fast_trace`: routes to the fused dynamic
    kernel (kernels/dynamic.py — hand-derived paraxial tangents, ~6x the
    scan tier on-chip) for the analytic fields and the sampled stratified
    families, and falls back to the scan tier's exact jvp
    (engine/dynamic.trace_dynamic) everywhere else (history mode callers
    use trace_dynamic directly); 2-D grid media large enough for an 11x11
    node window route to the tiled-window dynamic kernel.  Returns
    ``(DynFinal, engine)`` with engine in {"dynamic-kernel",
    "dynamic-kernel-strat", "dynamic-kernel-tiled", "dynamic-scan"}.

    Golden/Newton ops are rejected by the kernels and meaningless on the
    scan tier too (their tangent is zero a.e., engine/dynamic.py "Solver
    caveat") — they fall through to the scan fallback so callers get the
    same well-defined (if useless) jvp the scan tier gives.
    """
    from raytracing_tpu.engine.dynamic import trace_dynamic
    from raytracing_tpu.kernels.dynamic import (
        DYN_FUSED_FIELDS, DYN_FUSED_OPS, DynFinal, dynamic_trace_final,
        dynamic_trace_final_strat)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    block_rays = max(128, -(-int(block_rays) // 128) * 128)
    op = canonical(op_name)
    medium = compact_for_trace(medium, scen.box, delta_s)
    if steps is None:
        steps = scen.max_size(float(delta_s), divisor, n_turns) - 1

    kernel = None
    if op in DYN_FUSED_OPS:
        if (isinstance(medium, AnalyticMedium)
                and medium.field in DYN_FUSED_FIELDS):
            kernel, eng = (
                lambda p, t: dynamic_trace_final(
                    p, t, jnp.float32(delta_s), field=medium.field, op=op,
                    steps=int(steps), box=tuple(scen.box),
                    block_rays=block_rays, interpret=interpret),
                "dynamic-kernel")
        elif isinstance(medium, (StratifiedGridMedium, C1StratifiedMedium)):
            kernel, eng = (
                lambda p, t: dynamic_trace_final_strat(
                    p, t, jnp.float32(delta_s), medium, op=op,
                    steps=int(steps), box=tuple(scen.box),
                    block_rays=block_rays, interpret=interpret),
                "dynamic-kernel-strat")
        else:
            med2 = medium
            if isinstance(med2, GridMedium):
                med2 = _as_hermite(med2)
            if (isinstance(med2, (HermiteGridMedium, C1GridMedium))
                    and med2.nx - 1 >= 11 and med2.ny - 1 >= 11):
                # tiled-window dynamic kernel: paraxial tangents over the
                # 2-D parity tables (segmented.grid_trace_dynamic_tiled);
                # blocks capped at 1024 rays like the kinematic tier
                from raytracing_tpu.engine.segmented import \
                    grid_trace_dynamic_tiled

                tb = min(block_rays, 1024)
                kernel, eng = (
                    lambda p, t, tb=tb, med2=med2: grid_trace_dynamic_tiled(
                        op, p, t, jnp.float32(delta_s), med2,
                        steps=int(steps), box=tuple(scen.box),
                        block_rays=tb, interpret=interpret),
                    "dynamic-kernel-tiled")
    if kernel is not None:
        r = len(theta0)
        pad = (-r) % block_rays
        pos0 = jnp.asarray(pos0, jnp.float32)
        theta0 = jnp.asarray(theta0, jnp.float32)
        if pad:
            pos0 = jnp.concatenate([pos0, jnp.tile(pos0[-1:], (pad, 1))])
            theta0 = jnp.concatenate([theta0, jnp.tile(theta0[-1:], pad)])
        try:
            res = kernel(pos0, theta0)
        except RuntimeError:
            res = None   # batch too dispersed for tiling -> scan tier
        if res is not None:
            if pad:
                res = DynFinal(*(v[:r] for v in res))
            return res, eng
        pos0, theta0 = pos0[:r], theta0[:r]

    d = trace_dynamic(op, scen, medium, delta_s=float(delta_s),
                      mode="metrics", dtype=np.float32,
                      pos0=jnp.asarray(pos0, jnp.float32),
                      theta0=jnp.asarray(theta0, jnp.float32),
                      max_size=int(steps) + 1,
                      step_limit=int(steps))
    tangent = jnp.stack([jnp.cos(d.angle), jnp.sin(d.angle)], axis=-1)
    # "active" = still inside the box, matching the kernel tier: exit_step
    # alone is ambiguous (a ray exiting exactly at step i == steps also
    # carries exit_step == steps), so test containment of the final
    # position (frozen at the exit point for exited rays).
    bx = jnp.asarray(tuple(scen.box), jnp.float32)
    active = ((d.pos[:, 0] >= bx[0]) & (d.pos[:, 0] <= bx[1])
              & (d.pos[:, 1] >= bx[2]) & (d.pos[:, 1] <= bx[3]))
    return (DynFinal(pos=d.pos, tangent=tangent, n=d.n,
                     traveltime=d.traveltime, dist_sim=d.dist_sim,
                     active=active, q=d.q,
                     dtheta=d.dtheta, kmah=d.kmah),
            "dynamic-scan")


#: scan fallback trip-count bound on the TPU backend for LARGE-table
#: media: compiling scan+gather-over-large-table programs with many
#: steps has wedged the single-lane remote compile helper for 40 min -
#: 4.5 h (CLAUDE.md hazards).  Bounded trips are measured safe
#: (benchmarks/grid3_scan_probe.py runs 24 steps); beyond this, refuse
#: loudly instead of silently compiling the hazard class.
GRID3_SCAN_TPU_MAX_STEPS = 256


def _guard_grid3_scan_fallback(medium, steps, interpret):
    """Refuse the grid3 scan fallback where it would wedge the chip.

    Reached only when the tiled-window ladder rejected the batch as too
    dispersed; on the TPU backend a long scan+gather trace over the
    tri-Hermite table is the documented compile-wedge class, so fail
    with guidance rather than hang the remote helper for hours.
    """
    from raytracing_tpu.media.grid3 import C1Grid3Medium

    if (not interpret and jax.default_backend() == "tpu"
            and isinstance(medium, C1Grid3Medium)
            and int(steps) > GRID3_SCAN_TPU_MAX_STEPS):
        raise RuntimeError(
            f"batch too dispersed for 3-D tiling, and the scan fallback "
            f"over a sampled grid3 medium at {steps} steps is the "
            f"scan+gather compile-wedge class on the TPU backend "
            f"(bound: {GRID3_SCAN_TPU_MAX_STEPS}).  Pre-sort the batch "
            f"into spatially compact chunks, trace in <= "
            f"{GRID3_SCAN_TPU_MAX_STEPS}-step pieces, or run on CPU.")


def fast_dynamic3(method: str, medium, *, pos0, dir0, delta_s, steps: int,
                  box, block_rays: int = 1024,
                  interpret: bool | None = None):
    """Metrics-only 3-D DYNAMIC trace through the fastest available path.

    Routes to the fused 3-D dynamic kernel (kernels/dynamic3d.py —
    hand-derived two-tangent recurrences with the frame-free
    ``det Q = (dpa x dpb) . u``) for the analytic fields, to the
    tiled-window dynamic kernel (engine/tiled3.grid3_trace_dynamic_tiled
    — the same tangents over VMEM windows of the tri-Hermite table) for
    sampled C1Grid3Medium, and falls back to the scan tier's exact jvp
    (engine/dynamic3d.trace_dynamic3) everywhere else — Custom3D /
    Stratified3D media, dispersed batches the window ladder rejects,
    history callers.  Returns ``(Dyn3Final, engine)`` with engine in
    {"dynamic3-kernel", "dynamic3-kernel-tiled", "dynamic3-scan"}.
    """
    from raytracing_tpu.engine.dynamic3d import trace_dynamic3
    from raytracing_tpu.engine.trace3d import canonical3
    from raytracing_tpu.kernels.dynamic3d import (DYN3_FUSED_FIELDS,
                                                  DYN3_FUSED_OPS, Dyn3Final,
                                                  dynamic3d_trace_final)
    from raytracing_tpu.media.fields3d import Analytic3D
    from raytracing_tpu.media.grid3 import C1Grid3Medium

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    block_rays = max(128, -(-int(block_rays) // 128) * 128)
    method = canonical3(method)
    if box is None or len(tuple(box)) != 6:
        raise ValueError(f"fast_dynamic3 needs a 6-face box, got {box!r}")

    kernel = None
    eng = None
    if method in DYN3_FUSED_OPS:
        if (isinstance(medium, Analytic3D)
                and medium.field in DYN3_FUSED_FIELDS):
            kernel, eng = (
                lambda p, d: dynamic3d_trace_final(
                    p, d, jnp.float32(delta_s), field=medium.field,
                    op=method, steps=int(steps), box=tuple(box),
                    block_rays=block_rays, interpret=interpret),
                "dynamic3-kernel")
        elif (isinstance(medium, C1Grid3Medium)
                and medium.nx - 1 >= 5 and medium.ny - 1 >= 5
                and medium.nz - 1 >= 5):
            from raytracing_tpu.engine.tiled3 import \
                grid3_trace_dynamic_tiled

            tb = min(block_rays, 1024)
            kernel, eng = (
                lambda p, d, tb=tb: grid3_trace_dynamic_tiled(
                    method, p, d, jnp.float32(delta_s), medium,
                    steps=int(steps), box=tuple(box), block_rays=tb,
                    interpret=interpret),
                "dynamic3-kernel-tiled")
    if kernel is not None:
        r = len(dir0)
        bk = block_rays if eng == "dynamic3-kernel" else min(block_rays,
                                                             1024)
        pad = (-r) % bk
        pos0 = jnp.asarray(pos0, jnp.float32)
        dir0 = jnp.asarray(dir0, jnp.float32)
        if pad:
            pos0 = jnp.concatenate([pos0, jnp.tile(pos0[-1:], (pad, 1))])
            dir0 = jnp.concatenate([dir0, jnp.tile(dir0[-1:], (pad, 1))])
        try:
            res = kernel(pos0, dir0)
        except RuntimeError as e:
            if "dispersed" not in str(e):
                raise    # OOM / XLA failures are not a routing decision
            res = None   # batch too dispersed for 3-D tiling -> scan tier
        if res is not None:
            if pad:
                res = Dyn3Final(*(v[:r] for v in res))
            return res, eng
        pos0, dir0 = pos0[:r], dir0[:r]
        _guard_grid3_scan_fallback(medium, steps, interpret)

    d = trace_dynamic3(method, medium, pos0=pos0, dir0=dir0,
                       delta_s=float(delta_s), steps=int(steps),
                       box=tuple(box), mode="metrics", dtype=np.float32)
    # "active" = never left the box (kernel semantics): containment of the
    # final position, not the budget-folding scan flag
    bx = jnp.asarray(tuple(box), jnp.float32)
    active = ((d.pos[:, 0] >= bx[0]) & (d.pos[:, 0] <= bx[1])
              & (d.pos[:, 1] >= bx[2]) & (d.pos[:, 1] <= bx[3])
              & (d.pos[:, 2] >= bx[4]) & (d.pos[:, 2] <= bx[5]))
    return (Dyn3Final(pos=d.pos, tangent=d.unitv,
                      traveltime=d.traveltime, dist_sim=d.dist_sim,
                      active=active, detq=d.detq, kmah=d.kmah, n=d.n,
                      min_absdet=d.min_absdet,
                      min_absdet_step=d.min_absdet_step),
            "dynamic3-scan")


def fast_trace3(method: str, medium, *, pos0, dir0, delta_s, steps: int,
                box, block_rays: int = 4096,
                interpret: bool | None = None):
    """Metrics-only 3-D trace through the fastest available path.

    The 3-D twin of :func:`fast_trace`: routes (method, medium) to the
    fused 3-D kernel (kernels/fused3d.py — measured 6.3 G vs the 1.3 G
    3-D scan tier on-chip, benchmarks/logs_r4/07) when the vector op and
    the analytic field are in its coverage, to the tiled-window kernel
    (engine/tiled3.grid3_trace_tiled) for sampled tri-Hermite
    C1Grid3Medium — the production sample->fit->trace path,
    RT_bench.py:412-464 — and falls back to the scan tier
    (engine/trace3d.trace3d, mode="metrics") for everything else —
    Custom3D / Stratified3D media, dispersed batches the tiling ladder
    rejects, history/stats callers.  Returns ``(Fused3Final, engine)``
    with engine in {"fused3d", "grid3-tiled", "scan3d"}.
    """
    from raytracing_tpu.engine.trace3d import canonical3, trace3d
    from raytracing_tpu.kernels.fused3d import (
        FUSED3_FIELDS, FUSED3_OPS, Fused3Final, fused3d_trace_final)
    from raytracing_tpu.media.fields3d import Analytic3D
    from raytracing_tpu.media.grid3 import C1Grid3Medium

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    block_rays = max(128, -(-int(block_rays) // 128) * 128)
    method = canonical3(method)
    if box is None or len(tuple(box)) != 6:
        raise ValueError(f"fast_trace3 needs a 6-face box, got {box!r}")

    kernel = None
    eng = None
    if method in FUSED3_OPS:
        if (isinstance(medium, Analytic3D)
                and medium.field in FUSED3_FIELDS):
            kernel, eng = (
                lambda p, d: fused3d_trace_final(
                    p, d, jnp.float32(delta_s), field=medium.field,
                    op=method, steps=int(steps), box=tuple(box),
                    block_rays=block_rays, interpret=interpret),
                "fused3d")
        elif (isinstance(medium, C1Grid3Medium)
                and medium.nx - 1 >= 5 and medium.ny - 1 >= 5
                and medium.nz - 1 >= 5):
            from raytracing_tpu.engine.tiled3 import grid3_trace_tiled

            tb = min(block_rays, 1024)
            kernel, eng = (
                lambda p, d, tb=tb: grid3_trace_tiled(
                    method, p, d, jnp.float32(delta_s), medium,
                    steps=int(steps), box=tuple(box), block_rays=tb,
                    interpret=interpret),
                "grid3-tiled")
    if kernel is not None:
        r = len(dir0)
        bk = block_rays if eng == "fused3d" else min(block_rays, 1024)
        pad = (-r) % bk
        pos0 = jnp.asarray(pos0, jnp.float32)
        dir0 = jnp.asarray(dir0, jnp.float32)
        if pad:
            pos0 = jnp.concatenate([pos0, jnp.tile(pos0[-1:], (pad, 1))])
            dir0 = jnp.concatenate([dir0, jnp.tile(dir0[-1:], (pad, 1))])
        try:
            res = kernel(pos0, dir0)
        except RuntimeError as e:
            if "dispersed" not in str(e):
                raise    # OOM / XLA failures are not a routing decision
            res = None   # batch too dispersed for 3-D tiling -> scan tier
        if res is not None:
            if pad:
                res = Fused3Final(*(v[:r] for v in res))
            return res, eng
        pos0, dir0 = pos0[:r], dir0[:r]
        _guard_grid3_scan_fallback(medium, steps, interpret)

    t = trace3d(method, medium, pos0=pos0, dir0=dir0,
                delta_s=float(delta_s), steps=int(steps), box=tuple(box),
                mode="metrics", dtype=np.float32)
    st = t.final
    # "active" = never left the box, matching the kernel tiers: the scan's
    # own flag also folds in step-budget exhaustion (False for every ray at
    # i == step_limit), so test containment of the final position instead.
    bx = jnp.asarray(tuple(box), jnp.float32)
    active = ((st.pos[:, 0] >= bx[0]) & (st.pos[:, 0] <= bx[1])
              & (st.pos[:, 1] >= bx[2]) & (st.pos[:, 1] <= bx[3])
              & (st.pos[:, 2] >= bx[4]) & (st.pos[:, 2] <= bx[5]))
    return (Fused3Final(pos=st.pos, tangent=st.unitv,
                        traveltime=st.traveltime, dist_sim=st.dist_sim,
                        active=active),
            "scan3d")


def fast_trace_sharded(op_name: str, scen: config.ScenarioConfig, medium, *,
                       delta_s, pos0, theta0, mesh, steps: int,
                       block_rays: int = 4096,
                       interpret: bool | None = None,
                       stats: bool = False) -> FastResult:
    """Fused-kernel tracing with the ray batch sharded across ``mesh``.

    Each device runs the Pallas kernel on its local shard under
    ``shard_map`` — the multi-chip production path (kernels x mesh).  The
    batch must divide by (device count x block_rays).

    ``stats=True`` (stratified media only, same contract as
    :func:`fast_trace`) rides the kernels' Welford momentum tracker on
    every shard — the per-ray aggregates come back sharded like the rest
    of the result, so the reference's conservation bar
    (RT_bench.py:1352-1360) is assertable on multi-chip runs too.
    """
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    op = canonical(op_name)
    if stats and not isinstance(medium, (StratifiedGridMedium,
                                         C1StratifiedMedium)):
        raise ValueError("stats=True needs a stratified (x-independent) "
                         "medium — p_x is only an invariant there; got "
                         f"{type(medium).__name__}")

    if isinstance(medium, GridMedium):
        medium = _as_hermite(medium)
    if isinstance(medium, (HermiteGridMedium, C1GridMedium)):
        # the tiled window kernel handles its own mesh sharding (rows
        # sharded, windows shard-local, flag pmax'd per round)
        if op not in FUSED_OPS and op not in GOLDEN_OPS:
            raise ValueError(f"2-D grid media cover {FUSED_OPS} and "
                             f"{tuple(GOLDEN_OPS)}, got {op!r}")
        from raytracing_tpu.engine.segmented import grid_trace_tiled

        g = grid_trace_tiled(
            op, jnp.asarray(pos0, jnp.float32),
            jnp.asarray(theta0, jnp.float32), jnp.float32(delta_s), medium,
            steps=int(steps), box=tuple(scen.box),
            block_rays=min(block_rays, 1024), interpret=interpret,
            gamma=float(scen.gamma), mesh=mesh)
        return FastResult(pos=g.pos, traveltime=g.traveltime,
                          dist_sim=g.dist_sim, active=g.active,
                          engine="grid-tiled-sharded")

    # only media this function actually dispatches on — the wider supports()
    # set would silently trace the wrong field here
    sharded_ok = (isinstance(medium, (StratifiedGridMedium,
                                      C1StratifiedMedium, CustomMedium))
                  or (isinstance(medium, AnalyticMedium)
                      and medium.field in FUSED_FIELDS))
    golden = op in GOLDEN_OPS
    if not (sharded_ok and (op in FUSED_OPS or golden)):
        raise ValueError(
            f"fast_trace_sharded covers the fused and golden ops on "
            f"analytic/stratified/custom media and the full op set on "
            f"2-D grid media; got {op!r} on {type(medium).__name__}")
    use_strat = isinstance(medium, (StratifiedGridMedium, C1StratifiedMedium))
    use_custom = isinstance(medium, CustomMedium)
    medium = compact_for_trace(medium, scen.box, delta_s)
    n_dev = mesh.devices.size
    r = len(theta0)
    if r % (n_dev * block_rays):
        raise ValueError(f"ray count {r} must divide by devices*block "
                         f"({n_dev}*{block_rays})")
    axes = mesh.axis_names
    pos0 = jax.device_put(jnp.asarray(pos0, jnp.float32),
                          jax.NamedSharding(mesh, P(axes)))
    theta0 = jax.device_put(jnp.asarray(theta0, jnp.float32),
                            jax.NamedSharding(mesh, P(axes)))

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axes), P(axes)), out_specs=P(axes),
                       check_vma=False)  # pallas out_shapes carry no vma
    def run(p, t):
        # the medium pytree is closed over -> replicated to every device
        if golden:
            # the golden/momentum family (incl. the reference's headline
            # anisotropic ops) shards exactly like the fused kernels: rays
            # are independent, tables/fields replicate
            return golden_trace_final(
                p, t, jnp.float32(delta_s), jnp.float32(scen.gamma),
                field=scen.field, op=op, steps=int(steps),
                box=tuple(scen.box), block_rays=block_rays,
                interpret=interpret, with_stats=stats,
                medium=medium if (use_strat or use_custom) else None)
        if use_strat:
            return fused_trace_final_strat(
                p, t, jnp.float32(delta_s), medium, op=op, steps=int(steps),
                box=tuple(scen.box), block_rays=block_rays,
                interpret=interpret, with_stats=stats)
        if use_custom:
            return fused_trace_final_custom(
                p, t, jnp.float32(delta_s), medium=medium, op=op,
                steps=int(steps), box=tuple(scen.box),
                block_rays=block_rays, interpret=interpret)
        return fused_trace_final(p, t, jnp.float32(delta_s),
                                 field=medium.field,
                                 op=op, steps=int(steps), box=tuple(scen.box),
                                 block_rays=block_rays, interpret=interpret)

    f = run(pos0, theta0)
    eng = (("golden" if golden else "fused")
           + ("-strat" if use_strat else "-custom" if use_custom else "")
           + "-sharded")
    return FastResult(pos=f.pos, traveltime=f.traveltime, dist_sim=f.dist_sim,
                      active=f.active, engine=eng,
                      mom_count=f.mom_count if stats else None,
                      mom_mean=f.mom_mean if stats else None,
                      mom_m2=f.mom_m2 if stats else None)
