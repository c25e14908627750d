"""Segmented fused tracing: bounded-compile kernels + live-ray compaction.

Two problems share one mechanism:

1. **Mosaic compile time scales with the kernel's fori_loop trip count** —
   the RK4/df-family bodies take minutes at benchmark trip counts
   (ARCHITECTURE.md).  Chaining a *resumable* kernel (``_make_kernel(...,
   resume=True)``) from an outer ``lax.fori_loop`` bounds the in-kernel trip
   count to ``segment`` steps: one bounded compile serves any trajectory
   length, with the full integration state (Kahan compensations, op7
   window, Welford stats) riding between launches in HBM — amortized
   traffic ~26 B / ray / segment, negligible for segment >= 128.

2. **Frozen lanes waste throughput** (SURVEY §7 hard part #3): interface /
   vert rays exit the box early (RT_bench.py:878-879 breaks out; the fused
   kernels only mask).  Between segments the host compacts surviving rays
   to the front and continues on the smaller prefix, so reported work
   approaches *live-ray* throughput instead of lane throughput.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tpu.kernels.fused import (FUSED_OPS, LANES, FusedFinal,
                                          _make_kernel, strat_tables)
from raytracing_tpu.media.spline import StratifiedGridMedium


@functools.partial(jax.jit, static_argnames=(
    "field", "op", "segment", "box", "block_rays", "interpret", "stats",
    "strat", "nch", "n_state"))
def _run_segments(state, tables, delta_s, limit, offset0, n_seg, *,
                  field, op, segment, box, block_rays, interpret, stats,
                  strat, nch, n_state):
    """Chain ``n_seg`` resumable kernel launches under one jit."""
    r = state[0].shape[0] * LANES
    rows = block_rays // LANES
    shape2 = state[0].shape
    zero = jnp.zeros(shape2, jnp.float32)
    from raytracing_tpu.config import gold_tol
    kernel = _make_kernel(field, op, segment, box, gold_tol(np.float32),
                          strat=strat, stats=stats, resume=True)
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    in_specs = ([blk] * n_state + [blk, pl.BlockSpec(memory_space=pltpu.SMEM)])
    if tables is not None:
        in_specs = [pl.BlockSpec((6, nch, rows, LANES),
                                 lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)] + in_specs
    call = pl.pallas_call(
        kernel,
        grid=(r // block_rays,),
        in_specs=in_specs,
        out_specs=[blk] * n_state,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * n_state,
        cost_estimate=pl.CostEstimate(
            flops=(80 + 30 * (nch or 0)) * r * segment,
            bytes_accessed=2 * n_state * 4 * r,
            transcendentals=3 * r * segment),
        interpret=interpret,
    )

    def seg_body(k, st):
        ds_vec = jnp.stack([delta_s, limit,
                            offset0 + k.astype(jnp.float32) * segment])
        args = st + (zero, ds_vec)
        if tables is not None:
            args = (tables,) + args
        return tuple(call(*args))

    return jax.lax.fori_loop(0, n_seg, seg_body, tuple(state))


def segmented_trace(op: str, pos0, theta0, delta_s, *, steps: int, box,
                    field: str | None = None, medium=None, segment: int = 256,
                    block_rays: int = 4096, interpret: bool = False,
                    with_stats: bool = False, compact: bool = False,
                    compact_every: int = 4,
                    compact_threshold: float = 0.75) -> FusedFinal:
    """Fused trace in bounded-compile segments, optionally compacting.

    ``compact=True`` checks the live fraction every ``compact_every``
    segments and, when it drops below ``compact_threshold``, gathers the
    surviving rays to a smaller padded batch (frozen rays' final states are
    banked and re-scattered at the end).  Results are identical to the
    one-shot kernel; only the wasted lane work changes.
    """
    if op not in FUSED_OPS:
        raise ValueError(f"segmented trace supports ops {FUSED_OPS}, got {op!r}")
    use_strat = isinstance(medium, StratifiedGridMedium)
    if not use_strat and field is None:
        raise ValueError("pass field= (analytic) or medium= (stratified)")
    r = pos0.shape[0]
    if r % block_rays:
        raise ValueError(f"rays {r} not a multiple of block {block_rays}")
    rows = block_rays // LANES
    window = op == "op7"
    n_state = 9 + (3 if with_stats else 0) + (4 if window else 0)

    # initial full state, device-resident (r,) components; all host<->device
    # traffic below is index arrays at compaction events only — the tunnel
    # makes bulk state round-trips (~70 MB) cost seconds
    pos0 = jnp.asarray(pos0, jnp.float32)
    theta0 = jnp.asarray(theta0, jnp.float32)
    x = pos0[:, 0]
    y = pos0[:, 1]
    ux = jnp.cos(theta0)
    uy = jnp.sin(theta0)
    zeros = jnp.zeros(r, jnp.float32)
    ones = jnp.ones(r, jnp.float32)
    comps = [x, y, ux, uy, zeros, zeros, zeros, zeros, ones]
    if with_stats:
        if use_strat:
            n0 = medium.n(x, y).astype(jnp.float32)
        else:
            from raytracing_tpu.media.fields import FIELDS
            n0 = FIELDS[field][0](x, y).astype(jnp.float32)
        comps += [ones, n0 * ux, zeros]
    if window:
        comps += [x, y, x, y]

    tables = strat = None
    nch = 0
    if use_strat:
        tables, strat, nch = strat_tables(medium, rows)

    n_seg_total = -(-steps // segment)
    limit = jnp.float32(steps)
    orig_idx = np.arange(r)              # current batch -> original ray slot
    banked = None                        # device (r,) result arrays, lazy
    done_segs = 0
    state = tuple(c.reshape(-1, LANES) for c in comps)

    while done_segs < n_seg_total:
        if compact:
            n_run = min(compact_every, n_seg_total - done_segs)
        else:
            n_run = n_seg_total - done_segs
        state = _run_segments(
            state, tables, jnp.float32(delta_s), limit,
            jnp.float32(done_segs * segment), jnp.int32(n_run),
            field=field or "stratified", op=op, segment=segment,
            box=tuple(box), block_rays=block_rays, interpret=interpret,
            stats=with_stats, strat=strat, nch=nch, n_state=n_state)
        done_segs += n_run
        if not compact or done_segs >= n_seg_total:
            continue
        act = np.asarray(state[8].reshape(-1)) > 0.5   # 1 byte/ray download
        # orig_idx == -1 marks padding duplicates: never bank or keep them
        act &= orig_idx >= 0
        live = act.sum() / max(len(orig_idx), 1)
        if live >= compact_threshold:
            continue
        if banked is None:
            banked = [jnp.zeros(r, jnp.float32) for _ in range(n_state)]
        # bank frozen rays' final state on device (host only sees indices)
        frozen = (~act) & (orig_idx >= 0)
        cur_f = jnp.asarray(np.nonzero(frozen)[0], jnp.int32)
        dst_f = jnp.asarray(orig_idx[frozen], jnp.int32)
        flat = [s.reshape(-1) for s in state]
        banked = [b.at[dst_f].set(f[cur_f]) for b, f in zip(banked, flat)]
        alive_idx = np.nonzero(act)[0]
        if len(alive_idx) == 0:
            orig_idx = orig_idx[:0]
            state = None
            break
        n_alive = len(alive_idx)
        n_pad = -(-n_alive // block_rays) * block_rays
        sel = np.concatenate([alive_idx,
                              np.full(n_pad - n_alive, alive_idx[-1])])
        sel_d = jnp.asarray(sel, jnp.int32)
        comps = [f[sel_d] for f in flat]
        # padding lanes are duplicates: freeze them so they neither move
        # nor get banked (they are re-banked from the true lane)
        comps[8] = comps[8].at[n_alive:].set(0.0)
        orig_idx = np.concatenate(
            [orig_idx[alive_idx], np.full(n_pad - n_alive, -1)])
        state = tuple(c.reshape(-1, LANES) for c in comps)

    if banked is None:
        out = [s.reshape(-1) for s in state]      # no compaction happened
    else:
        out = banked
        if state is not None:
            keep = orig_idx >= 0
            src = jnp.asarray(np.nonzero(keep)[0], jnp.int32)
            dst = jnp.asarray(orig_idx[keep], jnp.int32)
            flat = [s.reshape(-1) for s in state]
            out = [b.at[dst].set(f[src]) for b, f in zip(out, flat)]

    res = FusedFinal(
        pos=jnp.stack([out[0], out[1]], axis=-1),
        tangent=jnp.stack([out[2], out[3]], axis=-1),
        traveltime=out[6], dist_sim=out[7], active=out[8] > 0.5)
    if with_stats:
        res = res._replace(mom_count=out[9], mom_mean=out[10], mom_m2=out[11])
    return res


# -- 2-D grid media: supercell Hermite kernel --------------------------------
_NODE_OFFS_CACHE: dict = {}


@functools.partial(jax.jit, static_argnames=(
    "op", "segment", "box", "block_rays", "interpret", "meta", "stats",
    "n_state"))
def _grid_run_segments(state, nodes, delta_s, limit, n_seg, *, op, segment,
                       box, block_rays, interpret, meta, stats=False,
                       n_state=9):
    """Chain supercell kernel launches; refresh node blocks between them.

    Each iteration (all inside ONE jit): compute every ray's 4x4 Hermite
    node block base from its current position, gather the 16 nodes x 9
    channels from HBM with an XLA gather, and launch the kernel for
    ``segment`` steps — sized so no ray can leave its block
    (segment * delta_s < cell pitch).  This replaces the reference's three
    FITPACK evaluations per step (RT_bench.py:141-156) with one block
    gather per ~cell-crossing.
    """
    x0, y0, inv_hx, inv_hy, nx, ny = meta
    r = state[0].shape[0] * LANES
    rows = block_rays // LANES
    shape2 = state[0].shape
    zero = jnp.zeros(shape2, jnp.float32)
    from raytracing_tpu.config import gold_tol
    kernel = _make_kernel("hermite", op, segment, box, gold_tol(np.float32),
                          resume=True, supercell=meta, stats=stats)
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    nodes_spec = pl.BlockSpec((144, rows, LANES), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(r // block_rays,),
        in_specs=[nodes_spec, blk, blk] + [blk] * n_state
                 + [blk, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[blk] * n_state,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * n_state,
        cost_estimate=pl.CostEstimate(
            flops=500 * r * segment,
            bytes_accessed=(144 + 2 * 9) * 4 * r,
            transcendentals=3 * r * segment),
        interpret=interpret,
    )
    offs = np.add.outer(np.arange(4) * nx, np.arange(4)).reshape(-1)
    offs = jnp.asarray(offs, jnp.int32)          # 16 node offsets

    def seg_body(k, st):
        x, y = st[0].reshape(-1), st[1].reshape(-1)
        fx = jnp.clip((x - x0) * inv_hx, 0.0, float(nx - 1))
        fy = jnp.clip((y - y0) * inv_hy, 0.0, float(ny - 1))
        ix = jnp.minimum(jnp.floor(fx), float(nx - 2)).astype(jnp.int32)
        iy = jnp.minimum(jnp.floor(fy), float(ny - 2)).astype(jnp.int32)
        bix = jnp.clip(ix - 1, 0, nx - 4)
        biy = jnp.clip(iy - 1, 0, ny - 4)
        flat = biy * nx + bix                            # (r,)
        gath = jnp.take(nodes, flat[:, None] + offs[None, :],
                        axis=0)                          # (r, 16, 9)
        tbl = jnp.transpose(gath, (1, 2, 0)).reshape(144, r // LANES, LANES)
        ds_vec = jnp.stack([delta_s, limit,
                            k.astype(jnp.float32) * segment])
        args = (tbl, bix.astype(jnp.float32).reshape(shape2),
                biy.astype(jnp.float32).reshape(shape2)) + st + (zero, ds_vec)
        return tuple(call(*args))

    return jax.lax.fori_loop(0, n_seg, seg_body, tuple(state))


def grid_trace(op: str, pos0, theta0, delta_s, medium, *, steps: int, box,
               segment: int | None = None, block_rays: int = 4096,
               interpret: bool = False, with_stats: bool = False) -> FusedFinal:
    """Kernel-speed tracing through a 2-D sampled-spline medium.

    ``medium`` is a :class:`media.hermite.HermiteGridMedium` (build once via
    ``build_hermite_medium(build_grid_medium(...))``).  The segment length
    defaults to the largest step count that keeps every ray inside its 4x4
    node block (0.9 * cell / delta_s, capped at 48 for bounded compiles).
    Covers every fused op incl. op7 (window in the segment state) and the
    Welford momentum tracker (``with_stats``).
    """
    from raytracing_tpu.media.hermite import HermiteGridMedium

    if not isinstance(medium, HermiteGridMedium):
        raise ValueError("grid_trace needs a HermiteGridMedium, got "
                         f"{type(medium).__name__}")
    if op not in FUSED_OPS:
        raise ValueError(f"grid_trace supports {FUSED_OPS}, got {op!r}")
    r = pos0.shape[0]
    if r % block_rays:
        raise ValueError(f"rays {r} not a multiple of block {block_rays}")
    cell = min(1.0 / medium.inv_hx, 1.0 / medium.inv_hy)
    if segment is None:
        segment = max(1, min(48, int(0.9 * cell / float(delta_s))))
    if segment * float(delta_s) >= cell:
        raise ValueError(f"segment {segment} x delta_s {delta_s} exceeds the "
                         f"cell pitch {cell}; rays could leave their block")
    n_seg = -(-steps // segment)
    window = op == "op7"
    n_state = 9 + (3 if with_stats else 0) + (4 if window else 0)

    pos0 = jnp.asarray(pos0, jnp.float32)
    theta0 = jnp.asarray(theta0, jnp.float32)
    x = pos0[:, 0]
    y = pos0[:, 1]
    ux = jnp.cos(theta0)
    uy = jnp.sin(theta0)
    zeros = jnp.zeros(r, jnp.float32)
    comps = [x, y, ux, uy, zeros, zeros, zeros, zeros,
             jnp.ones(r, jnp.float32)]
    if with_stats:
        n0 = medium.n(x, y).astype(jnp.float32)
        comps += [jnp.ones(r, jnp.float32), n0 * ux, zeros]
    if window:
        comps += [x, y, x, y]
    state = tuple(c.reshape(-1, LANES) for c in comps)
    meta = (float(medium.x0), float(medium.y0), float(medium.inv_hx),
            float(medium.inv_hy), int(medium.nx), int(medium.ny))
    state = _grid_run_segments(
        state, jnp.asarray(medium.nodes, jnp.float32), jnp.float32(delta_s),
        jnp.float32(steps), jnp.int32(n_seg), op=op, segment=segment,
        box=tuple(box), block_rays=block_rays, interpret=interpret,
        meta=meta, stats=with_stats, n_state=n_state)
    out = [s.reshape(-1) for s in state]
    res = FusedFinal(
        pos=jnp.stack([out[0], out[1]], axis=-1),
        tangent=jnp.stack([out[2], out[3]], axis=-1),
        traveltime=out[6], dist_sim=out[7], active=out[8] > 0.5)
    if with_stats:
        res = res._replace(mom_count=out[9], mom_mean=out[10],
                           mom_m2=out[11])
    return res
