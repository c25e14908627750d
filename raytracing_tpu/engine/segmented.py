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
from raytracing_tpu.kernels.golden import GOLDEN_OPS
from raytracing_tpu.kernels.golden import _make_kernel as _make_golden_kernel
from raytracing_tpu.kernels.golden import golden_scalars
from raytracing_tpu.media.spline import StratifiedGridMedium


def _fingerprint(*arrays) -> str:
    """sha1 over dtype/shape/bytes of each array — checkpoint identity for
    medium tables and launch fans (a resume adopts the saved carry, so a
    silently different medium/fan would hybridize two traces)."""
    import hashlib

    h = hashlib.sha1()
    for a in arrays:
        a = np.asarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def _state_layout(op: str, with_stats: bool) -> tuple[int, int]:
    """(n_state, act_idx) of the kernels' resume-state layout.

    The ONE home for the layout the segmented/tiled/supercell tiers and
    the checkpoint format share; see :func:`_initial_comps` for the
    component order.
    """
    if op in GOLDEN_OPS:
        return 8 + (3 if with_stats else 0), 7
    return 9 + (3 if with_stats else 0) + (4 if op == "op7" else 0), 8


def _initial_comps(op: str, pos0, theta0, *, with_stats: bool,
                   n0_fn=None, gamma: float = 1.0) -> list:
    """Initial (r,)-component list in the kernels' resume layout.

    golden: (x, y, cx, cy, ang, tt, dsim, active) [+ Welford(count,mean,m2)]
    fused:  (x, y, ux, uy, cx, cy, tt, dsim, active) [+ Welford]
            [+ op7 window (x, y, x, y)]

    ``n0_fn(x, y)`` supplies the launch-point index, needed only when
    ``with_stats`` seeds the Welford momentum tracker.
    """
    x, y = pos0[:, 0], pos0[:, 1]
    r = x.shape[0]
    zeros = jnp.zeros(r, jnp.float32)
    ones = jnp.ones(r, jnp.float32)
    n0 = n0_fn(x, y).astype(jnp.float32) if with_stats else None
    if op in GOLDEN_OPS:
        comps = [x, y, zeros, zeros, theta0, zeros, zeros, ones]
        if with_stats:
            from raytracing_tpu.kernels.golden import init_mom_x

            comps += [ones, init_mom_x(op, n0, theta0, gamma), zeros]
        return comps
    ux = jnp.cos(theta0)
    uy = jnp.sin(theta0)
    comps = [x, y, ux, uy, zeros, zeros, zeros, zeros, ones]
    if with_stats:
        comps += [ones, n0 * ux, zeros]
    if op == "op7":
        comps += [x, y, x, y]
    return comps


def _final_from_state(op: str, out, with_stats: bool) -> FusedFinal:
    """FusedFinal from flat (r,) state components (layout above)."""
    if op in GOLDEN_OPS:
        ang = out[4]
        res = FusedFinal(
            pos=jnp.stack([out[0], out[1]], axis=-1),
            tangent=jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1),
            traveltime=out[5], dist_sim=out[6], active=out[7] > 0.5)
        if with_stats:
            res = res._replace(mom_count=out[8], mom_mean=out[9],
                               mom_m2=out[10])
        return res
    res = FusedFinal(
        pos=jnp.stack([out[0], out[1]], axis=-1),
        tangent=jnp.stack([out[2], out[3]], axis=-1),
        traveltime=out[6], dist_sim=out[7], active=out[8] > 0.5)
    if with_stats:
        res = res._replace(mom_count=out[9], mom_mean=out[10],
                           mom_m2=out[11])
    return res


@functools.partial(jax.jit, static_argnames=(
    "field", "op", "segment", "box", "block_rays", "interpret", "stats",
    "strat", "nch", "n_state", "skip", "gold_schedule"))
def _run_segments(state, tables, delta_s, limit, offset0, n_seg,
                  gamma=1.0, *, field, op, segment, box, block_rays,
                  interpret, stats, strat, nch, n_state, skip=False,
                  gold_schedule=None):
    """Chain ``n_seg`` resumable kernel launches under one jit.

    ``skip=True`` computes a per-block liveness table before every launch
    (one reduction over the active mask) and hands it to the kernel, which
    bypasses the step loop for blocks whose every lane has frozen
    (``_make_kernel(skip=True)``) — the device-side equivalent of the
    reference's data-dependent loop break (RT_bench.py:878-879), no host
    round-trips.  Effective when launch batches are ordered so rays that
    exit together share blocks.
    """
    r = state[0].shape[0] * LANES
    rows = block_rays // LANES
    nblocks = r // block_rays
    shape2 = state[0].shape
    zero = jnp.zeros(shape2, jnp.float32)
    from raytracing_tpu.config import gold_tol
    from raytracing_tpu.kernels.golden import golden_schedule
    golden = op in GOLDEN_OPS
    if golden:
        iters, polish = gold_schedule or golden_schedule()
        kernel = _make_golden_kernel(
            field, op, segment, box, iters, gold_tol(np.float32),
            strat=strat, stats=stats, resume=True, skip=skip, polish=polish)
    else:
        kernel = _make_kernel(field, op, segment, box, gold_tol(np.float32),
                              strat=strat, stats=stats, resume=True,
                              skip=skip)
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    in_specs = ([blk] * n_state + [blk, pl.BlockSpec(memory_space=pltpu.SMEM)])
    if skip:
        # full (nblocks,) liveness table in SMEM; indexed by program_id
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
    if tables is not None:
        in_specs = [pl.BlockSpec((tables.shape[0], nch, rows, LANES),
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

    act_idx = 7 if golden else 8   # `active` slot in the resume state

    def seg_body(k, st):
        offset = offset0 + k.astype(jnp.float32) * segment
        if golden:
            ds_vec = golden_scalars(delta_s, gamma, limit, offset, iters)
        else:
            ds_vec = jnp.stack([delta_s, limit, offset])
        args = st + (zero, ds_vec)
        if skip:
            live = jnp.max(st[act_idx].reshape(nblocks, block_rays), axis=1)
            args = (live,) + args
        if tables is not None:
            args = (tables,) + args
        return tuple(call(*args))

    return jax.lax.fori_loop(0, n_seg, seg_body, tuple(state))


def segmented_trace(op: str, pos0, theta0, delta_s, *, steps: int, box,
                    field: str | None = None, medium=None, segment: int = 256,
                    block_rays: int = 4096, interpret: bool = False,
                    with_stats: bool = False, compact: bool = False,
                    compact_every: int = 4,
                    compact_threshold: float = 0.75,
                    skip_frozen: bool = False,
                    gamma: float = 1.0,
                    checkpoint: str | None = None,
                    checkpoint_every: int = 64,
                    gold_schedule: tuple | None = None) -> FusedFinal:
    """Fused trace in bounded-compile segments, optionally compacting.

    ``compact=True`` checks the live fraction every ``compact_every``
    segments and, when it drops below ``compact_threshold``, gathers the
    surviving rays to a smaller padded batch (frozen rays' final states are
    banked and re-scattered at the end).  Results are identical to the
    one-shot kernel; only the wasted lane work changes.

    ``skip_frozen=True`` instead skips whole kernel blocks whose every
    lane has exited (per-block liveness table + ``pl.when`` bypass — see
    ``_run_segments``).  Unlike ``compact`` this never leaves the device,
    so it pays no tunnel sync; it needs the launch batch ordered so rays
    that exit together share blocks (e.g. the interface fan sorted by
    launch angle).  The two compose.

    ``gold_schedule=(iters, polish)`` overrides the golden-family bracket
    schedule (kernels.golden.golden_schedule); ``(16, 0)`` is the pure-f32
    reference-parity bracket, under which segmented results remain
    bit-identical to the one-shot golden kernel.  The default polished
    schedule derives the tangent by rotation, which each segment start
    resets to cos/sin of the carried angle — so a re-segmented run agrees
    with one-shot only to ~1e-5 (checkpoint resume of the SAME segmentation
    stays bit-identical).

    ``checkpoint=`` persists the full resumable state every
    ``checkpoint_every`` segments (utils.checkpoint.TraceCheckpoint): a
    preempted run restarted with the same arguments resumes from the last
    saved segment bit-identically.  Incompatible with ``compact`` (the
    banked-ray side state is not captured).
    """
    golden = op in GOLDEN_OPS
    if not golden and op not in FUSED_OPS:
        raise ValueError(f"segmented trace supports ops {FUSED_OPS} and "
                         f"{tuple(GOLDEN_OPS)}, got {op!r}")
    if segment < 1 or compact_every < 1 or checkpoint_every < 1:
        # a zero cadence would make the host loop spin without progress
        raise ValueError("segment, compact_every and checkpoint_every must "
                         f"be >= 1, got {segment}/{compact_every}/"
                         f"{checkpoint_every}")
    from raytracing_tpu.media.c1 import C1StratifiedMedium

    use_strat = isinstance(medium, (StratifiedGridMedium, C1StratifiedMedium))
    if not use_strat and field is None:
        raise ValueError("pass field= (analytic) or medium= (stratified)")
    r = pos0.shape[0]
    if r % block_rays:
        raise ValueError(f"rays {r} not a multiple of block {block_rays}")
    rows = block_rays // LANES
    n_state, act_idx = _state_layout(op, with_stats)

    # initial full state, device-resident (r,) components; all host<->device
    # traffic below is index arrays at compaction events only — the tunnel
    # makes bulk state round-trips (~70 MB) cost seconds
    pos0 = jnp.asarray(pos0, jnp.float32)
    theta0 = jnp.asarray(theta0, jnp.float32)
    if use_strat:
        n0_fn = medium.n
    else:
        from raytracing_tpu.media.fields import FIELDS
        n0_fn = FIELDS[field][0]
    comps = _initial_comps(op, pos0, theta0, with_stats=with_stats,
                           n0_fn=n0_fn, gamma=gamma)

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

    store = None
    if checkpoint is not None:
        if compact:
            raise ValueError("checkpoint does not compose with compact "
                             "(banked-ray side state is not captured)")
        from raytracing_tpu.utils.checkpoint import TraceCheckpoint

        # identity = everything that must match for the carry to continue
        # the same physics — including the box, the medium's actual tables
        # and the launch fan (the saved carry replaces pos0/theta0 on
        # resume, so a mismatch would silently hybridize two traces).
        # Total `steps` is progress, not identity: a resumed run may
        # extend the horizon while no saved segment was limit-clamped.
        store = TraceCheckpoint(checkpoint, meta={
            "op": op, "rays": int(r), "delta_s": float(delta_s),
            "segment": int(segment), "n_state": int(n_state),
            "field": field or "stratified", "gamma": float(gamma),
            "box": [float(v) for v in box],
            "medium_sha1": (_fingerprint(*jax.tree_util.tree_leaves(medium))
                            if use_strat else None),
            "launch_sha1": _fingerprint(pos0, theta0),
            "skip_frozen": bool(skip_frozen),
            "gold_schedule": list(gold_schedule) if gold_schedule else None})
        resumed = store.load()
        if resumed is not None:
            arrays, done_steps0, horizon0 = resumed
            if done_steps0 > horizon0:
                # the saved final segment was limit-clamped at horizon0: the
                # carry holds the state at exactly horizon0 and can neither
                # be advanced (steps horizon0..done were masked, not
                # integrated) nor rolled back
                if steps != horizon0:
                    raise ValueError(
                        f"checkpoint {checkpoint} holds a COMPLETED "
                        f"{horizon0}-step trace; it cannot resume with "
                        f"steps={steps} — re-trace from scratch")
            elif steps < done_steps0:
                raise ValueError(
                    f"checkpoint {checkpoint} has already integrated "
                    f"{done_steps0} steps; it cannot resume with the "
                    f"shorter horizon steps={steps}")
            state = tuple(jnp.asarray(a).reshape(-1, LANES) for a in arrays)
            done_segs = done_steps0 // segment

    while done_segs < n_seg_total:
        if compact:
            n_run = min(compact_every, n_seg_total - done_segs)
        elif store is not None:
            n_run = min(checkpoint_every, n_seg_total - done_segs)
        else:
            n_run = n_seg_total - done_segs
        state = _run_segments(
            state, tables, jnp.float32(delta_s), limit,
            jnp.float32(done_segs * segment), jnp.int32(n_run),
            jnp.float32(gamma),
            field=field or "stratified", op=op, segment=segment,
            box=tuple(box), block_rays=block_rays, interpret=interpret,
            stats=with_stats, strat=strat, nch=nch, n_state=n_state,
            skip=skip_frozen, gold_schedule=gold_schedule)
        done_segs += n_run
        if store is not None:
            store.save([np.asarray(s.reshape(-1)) for s in state],
                       done_segs * segment, steps)
        if not compact or done_segs >= n_seg_total:
            continue
        # 1 byte/ray download
        act = np.asarray(state[act_idx].reshape(-1)) > 0.5
        # orig_idx == -1 marks padding duplicates: never bank or keep them
        act &= orig_idx >= 0
        # live fraction over REAL rays — counting padding lanes in the
        # denominator would re-trigger no-op compactions forever on a
        # padding-dominated batch
        n_real = int((orig_idx >= 0).sum())
        live = act.sum() / max(n_real, 1)
        frozen = (~act) & (orig_idx >= 0)
        if live >= compact_threshold or not frozen.any():
            continue
        if banked is None:
            banked = [jnp.zeros(r, jnp.float32) for _ in range(n_state)]
        # bank frozen rays' final state on device (host only sees indices)
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
        comps[act_idx] = comps[act_idx].at[n_alive:].set(0.0)
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

    return _final_from_state(op, out, with_stats)


# -- 2-D grid media: block-shared tile kernel ---------------------------------


def _morton_key(ix, iy):
    """Interleave 16-bit cell indices into a Z-order (Morton) sort key.

    Sorting rays by this key makes consecutive kernel blocks spatially
    compact in BOTH axes, so each block's node window stays small — the
    property the tiled kernel's containment contract depends on.

    The combined key is built in uint32: part(iy) occupies odd bits up to
    bit 31, so shifting it in a SIGNED word would set the sign bit for
    grids taller than 32768 cells and silently misorder the argsort
    (ADVICE r2 #4).  uint32 — not int64 — because with jax_enable_x64 off
    (the production default) an astype(int64) silently truncates back to
    int32, reintroducing the overflow.
    """
    def part(v):
        v = jnp.bitwise_and(v, jnp.int32(0x0000FFFF))
        v = jnp.bitwise_and(jnp.bitwise_or(v, jnp.left_shift(v, 8)),
                            jnp.int32(0x00FF00FF))
        v = jnp.bitwise_and(jnp.bitwise_or(v, jnp.left_shift(v, 4)),
                            jnp.int32(0x0F0F0F0F))
        v = jnp.bitwise_and(jnp.bitwise_or(v, jnp.left_shift(v, 2)),
                            jnp.int32(0x33333333))
        v = jnp.bitwise_and(jnp.bitwise_or(v, jnp.left_shift(v, 1)),
                            jnp.int32(0x55555555))
        return v

    return jnp.bitwise_or(part(ix).astype(jnp.uint32),
                          jnp.left_shift(part(iy).astype(jnp.uint32), 1))


def _cells(x, y, meta):
    x0, y0, inv_hx, inv_hy, nx, ny = meta[:6]
    fx = jnp.clip((x - x0) * inv_hx, 0.0, float(nx - 1))
    fy = jnp.clip((y - y0) * inv_hy, 0.0, float(ny - 1))
    ix = jnp.minimum(jnp.floor(fx), float(nx - 2))
    iy = jnp.minimum(jnp.floor(fy), float(ny - 2))
    return ix, iy


@functools.partial(jax.jit, static_argnames=("meta",))
def _sort_perm(x, y, meta):
    """Ray permutation ordering the batch along a Morton curve of cells."""
    ix, iy = _cells(x, y, meta)
    key = _morton_key(ix.astype(jnp.int32), iy.astype(jnp.int32))
    return jnp.argsort(key)


def _cells36(nodes3d):
    """Per-CELL packed node table, built once per jitted round.

    (ny, nx, CH) nodes -> ((ny-1)*(nx-1), 4*CH) rows: every cell carries
    its own 4 corner nodes x CH channels at channel index ``ch * 4 +
    corner`` with corners (00, +x, +y, +xy) — exactly the layout
    ``kernels.fused._tile_nag`` gathers from.  CH = 9 for the parity
    Hermite form (36 floats/cell), 4 for the consistent-gradient C1 form
    (16 floats/cell, media/c1.py).  Window refreshes then reduce to ONE
    flat row gather (the cell's contiguous floats) instead of a vmapped
    ``dynamic_slice`` + corner stacking per window — the
    slice/stack/transpose pipeline was ~20 ms per refresh at 1M rays in
    per-row mode, the flat gather ~1 ms.
    """
    ch = nodes3d.shape[-1]
    return jnp.stack(
        [nodes3d[:-1, :-1], nodes3d[:-1, 1:],
         nodes3d[1:, :-1], nodes3d[1:, 1:]],
        axis=-1).reshape(-1, 4 * ch)


def _window_ids(bix, biy, th, tw, n_lanes, ncx):
    """Flat cell ids of each window's row-major lane layout.

    ``bix``/``biy`` are (G,) window bases; returns (G, n_lanes) int32 into
    the ``_cells36`` table.  Lanes past th*tw (chunk padding) clamp to the
    window's last row — real, finite cells that the kernel never selects
    (the containment contract keeps every local index < th*tw).  ``th``/
    ``tw`` may be python ints (one shape for every group) or (G,) int32
    vectors (per-group oriented shapes — see :func:`_window_bases`).
    """
    j = jnp.arange(n_lanes, dtype=jnp.int32)[None, :]
    thv = jnp.asarray(th, jnp.int32).reshape(-1, 1)
    twv = jnp.asarray(tw, jnp.int32).reshape(-1, 1)
    jy = jnp.minimum(j // twv, thv - 1)
    jx = j % twv
    return (biy[:, None] + jy) * ncx + (bix[:, None] + jx)


def _cells_packed(nodes3d, pack):
    """:func:`_cells36` re-rowed to ``pack`` x-consecutive cells per row.

    The refresh gather is latency-bound on short rows (TPU row-gather:
    36-float rows 7.9 GB/s, 144-float 13.3, 576-float 19.9 —
    benchmarks/refresh_probe.py / ARCHITECTURE "refresh economics"), so
    packing P cells per gather row recovers bandwidth at the cost of
    snapping window x-bases to P-cell alignment (:func:`_window_bases`
    ``pack``).  The x-axis is zero-padded to a multiple of ``pack`` so
    every grid row reshapes cleanly; padded cells sit only in window
    SLACK — a contained ray's cell index never reaches them (``_cells``
    clamps ix to nx-2), same as today's chunk-padding lanes.

    Returns ``(table, ncx_pad)``: table ((ny-1) * ncx_pad / pack,
    pack * 4 * CH) with cells cell-major inside a row (so the gathered
    block reshapes back to the exact :func:`_cells36` layout), and the
    padded x-cell count ``ncx_pad`` (the packed grid's row stride).
    """
    ch = nodes3d.shape[-1]
    cells = jnp.stack(
        [nodes3d[:-1, :-1], nodes3d[:-1, 1:],
         nodes3d[1:, :-1], nodes3d[1:, 1:]],
        axis=-1).reshape(nodes3d.shape[0] - 1, nodes3d.shape[1] - 1,
                         4 * ch)
    ncx = cells.shape[1]
    ncx_pad = -(-ncx // pack) * pack
    if ncx_pad != ncx:
        cells = jnp.pad(cells, ((0, 0), (0, ncx_pad - ncx), (0, 0)))
    return cells.reshape(-1, pack * 4 * ch), ncx_pad


def _window_gids(bix, biy, th, tw, n_lanes, ncx_pad, pack):
    """Packed-row ids of each window's lane layout (``_cells_packed``).

    Same lane walk as :func:`_window_ids` but one id per ``pack``
    consecutive lanes: groups never straddle a window row (``pack``
    divides every ``tw``) and start P-aligned (``bix`` is snapped), so
    each gathered row is exactly those lanes' cells in order.
    """
    jg = jnp.arange(0, n_lanes, pack, dtype=jnp.int32)[None, :]
    thv = jnp.asarray(th, jnp.int32).reshape(-1, 1)
    twv = jnp.asarray(tw, jnp.int32).reshape(-1, 1)
    jy = jnp.minimum(jg // twv, thv - 1)
    jx = jg % twv
    return ((biy[:, None] + jy) * ncx_pad + (bix[:, None] + jx)) // pack


def _window_bases(st, flag, meta, th, tw, ngroups, group_rays,
                  margin_x, margin_y, pred=None, shapes=None,
                  pack=1, ncx_pad=None):
    """Containment check + window placement for G groups of rays.

    Computes every group's cell bounding box, accumulates the containment
    flag (bbox + 2 x margin must fit the (th, tw)-cell window; margins may
    be per-group vectors — the batched sweep's candidates travel at
    different rates), and centers a window on each bbox.  Returns
    ``(flag, bix, biy, tw_v, th_v)`` with per-group (G,) int32 shapes.

    ``pred=(xe, ye)``: drift-predicted end-of-segment positions.  When
    given, the bbox covers current AND predicted cells, so ``margin``
    only needs the path's deviation from each ray's chord (the sagitta
    bound computed in :func:`_tiled_run_segments_inner`) instead of the
    full worst-case travel — the lever that lets coarse-step segments
    run several times longer between refreshes.

    ``shapes``: optional tuple of (th, tw) candidates sharing one gather
    chunk count.  Each group independently picks the candidate with the
    most containment slack for ITS bbox — oriented rectangles let a
    group whose drift is axis-dominated trade cross-axis cells for
    along-axis cells at the same per-step gather cost, where a square
    window of equal lane capacity would overflow and force escalation to
    a 2-chunk class.  The flag trips only when NO candidate fits.
    """
    x0, y0, inv_hx, inv_hy, nx, ny = meta
    ix, iy = _cells(st[0].reshape(ngroups, group_rays),
                    st[1].reshape(ngroups, group_rays), meta)
    ixm, ixM = jnp.min(ix, axis=1), jnp.max(ix, axis=1)
    iym, iyM = jnp.min(iy, axis=1), jnp.max(iy, axis=1)
    if pred is not None:
        ixe, iye = _cells(pred[0].reshape(ngroups, group_rays),
                          pred[1].reshape(ngroups, group_rays), meta)
        ixm = jnp.minimum(ixm, jnp.min(ixe, axis=1))
        ixM = jnp.maximum(ixM, jnp.max(ixe, axis=1))
        iym = jnp.minimum(iym, jnp.min(iye, axis=1))
        iyM = jnp.maximum(iyM, jnp.max(iye, axis=1))
    span_x = ixM - ixm
    span_y = iyM - iym
    if shapes is None:
        shapes = ((th, tw),)
    # window capacity is tw x th CELLS: local cell index in [0, tw-1]
    needs = jnp.stack([
        jnp.maximum(span_x + 2.0 * margin_x - float(tw_s - 1),
                    span_y + 2.0 * margin_y - float(th_s - 1))
        for th_s, tw_s in shapes])                       # (S, G)
    flag = jnp.maximum(flag, jnp.max(jnp.min(needs, axis=0)))
    if len(shapes) == 1:
        th_v = jnp.full(ngroups, shapes[0][0], jnp.int32)
        tw_v = jnp.full(ngroups, shapes[0][1], jnp.int32)
    else:
        best = jnp.argmin(needs, axis=0)                 # (G,)
        th_v = jnp.asarray([s[0] for s in shapes], jnp.int32)[best]
        tw_v = jnp.asarray([s[1] for s in shapes], jnp.int32)[best]
    twf = tw_v.astype(jnp.float32)
    thf = th_v.astype(jnp.float32)
    # center the window's slack on the bbox
    ncx_clip = float(nx - 1) if pack == 1 else float(ncx_pad)
    bix = jnp.clip(ixm - jnp.floor((twf - 1.0 - span_x) * 0.5),
                   0.0, ncx_clip - twf).astype(jnp.int32)
    biy = jnp.clip(iym - jnp.floor((thf - 1.0 - span_y) * 0.5),
                   0.0, float(ny - 1) - thf).astype(jnp.int32)
    if pack > 1:
        # Packed refresh rows need P-aligned x-bases (_cells_packed).
        # Center-then-snap-DOWN costs up to pack-1 cells of right slack —
        # enough to flip a window sized at the containment edge into a
        # replay storm (measured: logs_r4/18's hand-picked segments) — so
        # when the snapped window leaves the right requirement short, bump
        # one pack unit rightward IF the left margin survives it.  Grid
        # edges stay inherently safe (``_cells`` caps ix into [0, nx-2];
        # the x-padding lets a window reach ncx_pad - tw >= nx-1 - tw, so
        # a fitting span always has a legal aligned placement).  Right
        # containment, the one side alignment can still eat, re-enters
        # the flag explicitly.
        bix = (bix // pack) * pack
        bf = bix.astype(jnp.float32)
        need_right = jnp.minimum(ixM + margin_x, float(nx - 2))
        left_limit = jnp.maximum(jnp.floor(ixm - margin_x), 0.0)
        bump = ((need_right > bf + twf - 1.0)
                & (bf + float(pack) <= left_limit)
                & (bf + float(pack) <= ncx_clip - twf))
        bix = jnp.where(bump, bix + pack, bix)
        flag = jnp.maximum(flag, jnp.max(
            need_right - (bix.astype(jnp.float32) + twf - 1.0)))
    return flag, bix, biy, tw_v, th_v


def _refresh_windows(st, flag, c36, meta, th, tw, nblocks, block_rays,
                     margin_x, margin_y, nchunks, n_ch, pred=None,
                     shapes=None, pack=1, ncx_pad=None):
    """One per-BLOCK window refresh: (flag', tiles, bases).

    ``c36`` is the :func:`_cells36` table; tiles come back as
    (nblocks, n_ch, LANES) with channel index ``chunk * 36 + ch * 4 +
    corner``, bases as (nblocks, 4) f32 rows (bix, biy, tw, th) for the
    kernel's SMEM table — the kernel's flat local index uses the
    per-block tw (``kernels.fused._tile_nag``), which is how oriented
    shape sets (``shapes``) reach the device without a recompile.

    ``pack > 1``: ``c36`` is the :func:`_cells_packed` table instead and
    the gather pulls ``pack``-cell rows (pack * cell_ch floats each) —
    the same floats in the same order, so everything downstream of the
    reshape (and the kernel itself) is untouched; only the row count
    drops pack-fold, which is what recovers gather bandwidth.
    """
    x0, y0, inv_hx, inv_hy, nx, ny = meta
    flag, bix, biy, tw_v, th_v = _window_bases(
        st, flag, meta, th, tw, nblocks, block_rays, margin_x, margin_y,
        pred, shapes, pack, ncx_pad)
    if pack == 1:
        wid = _window_ids(bix, biy, th_v, tw_v, nchunks * LANES, nx - 1)
        cell_ch = c36.shape[-1]           # 36 parity / 16 C1
        cells = c36[wid]                  # (nblocks, nchunks*LANES, cell_ch)
    else:
        gid = _window_gids(bix, biy, th_v, tw_v, nchunks * LANES,
                           ncx_pad, pack)
        cell_ch = c36.shape[-1] // pack
        cells = c36[gid].reshape(nblocks, nchunks * LANES, cell_ch)
    tiles = jnp.transpose(
        cells.reshape(nblocks, nchunks, LANES, cell_ch),
        (0, 1, 3, 2)).reshape(nblocks, n_ch, LANES)
    bases = jnp.stack([bix, biy, tw_v, th_v], axis=-1).astype(jnp.float32)
    return flag, tiles, bases


def _refresh_windows_rows(st, flag, c36T, meta, th, tw, nblocks, rows,
                          margin_x, margin_y, pred=None):
    """Per-sublane-ROW window refresh: one <=128-cell window per 128 rays.

    Same contract as :func:`_refresh_windows`, but the window unit is a
    sublane row (LANES Morton-adjacent rays) instead of a whole kernel
    block: tighter bounding boxes, and the kernel gathers each row from its
    own window slice at single-chunk cost (``tpu.dynamic_gather`` indexes
    per sublane row — see ``kernels.fused._make_kernel(row_tile=True)``), so
    a block's effective coverage is rows x 128 cells with the same 36
    gathers/step a single 121-cell block window needs.

    ``c36T`` is the TRANSPOSED cell table (36, ncells): gathering channel
    planes writes tiles directly in their kernel layout
    (36, nblocks, rows, LANES) — channel-major, block second, so the
    BlockSpec indexes axis 1 — avoiding a 143 MB/refresh layout transpose
    (measured 10.7 ms, half the refresh).  Returns ``(flag', tiles,
    bases)`` with bases (nblocks, 2, rows, LANES) lane-broadcast f32 cell
    indices.
    """
    x0, y0, inv_hx, inv_hy, nx, ny = meta
    ngroups = nblocks * rows
    flag, bix, biy, _, _ = _window_bases(st, flag, meta, th, tw, ngroups,
                                         LANES, margin_x, margin_y, pred)
    wid = _window_ids(bix, biy, th, tw, LANES, nx - 1)
    tiles = c36T[:, wid].reshape(36, nblocks, rows, LANES)
    b2 = jnp.stack([bix, biy], axis=-1).astype(jnp.float32)  # (ngroups, 2)
    bases = jnp.broadcast_to(
        jnp.transpose(b2.reshape(nblocks, rows, 2, 1), (0, 2, 1, 3)),
        (nblocks, 2, rows, LANES))
    return flag, tiles, bases


def _tiled_run_segments_inner(state, nodes3d, delta_s, limit, offset0,
                              n_seg, gamma, *, op, segment, box, block_rays,
                              interpret, meta, tile_shape, stats=False,
                              n_state=9, gold_schedule=None,
                              row_windows=False, use_pred=False,
                              shapes=None, pack=1):
    """Chain tiled-kernel launches; slice block windows between them.

    Each iteration (all inside ONE jit): compute every kernel block's cell
    bounding box, center a (th, tw)-CELL window on it, slice the window's
    (th+1, tw+1) nodes out of the full table with a vmapped
    ``dynamic_slice`` (one *coherent* copy per block — this replaces the
    per-ray 16-node XLA gather that capped the supercell path at 0.06 G),
    pack it per-cell (every cell carries its 4 corner nodes — 36 channels,
    ONE gather index per evaluation, see ``kernels.fused._tile_nag``), and
    launch the resumable kernel for ``segment`` steps.  Returns
    ``(state, flag)``: ``flag > 0`` means some block's bbox plus worst-case
    travel could not fit its window — the run must be redone from the
    caller's checkpoint after re-sorting (results past that refresh would
    silently clamp to wrong cells).
    """
    x0, y0, inv_hx, inv_hy, nx, ny = meta
    th, tw = tile_shape                      # window size in CELLS
    r = state[0].shape[0] * LANES
    rows = block_rays // LANES
    nblocks = r // block_rays
    if row_windows and (th * tw > LANES or rows < 8):
        raise ValueError("row windows need th*tw <= 128 cells and >= 8 "
                         f"sublane rows per block, got {tile_shape} / "
                         f"block_rays {block_rays}")
    nchunks = -(-th * tw // LANES)
    if shapes is not None:
        if row_windows:
            raise ValueError("oriented shape sets are a block-window mode")
        if any(-(-t * w // LANES) != nchunks for t, w in shapes):
            raise ValueError(f"oriented shapes {shapes} must all use the "
                             f"tile class's {nchunks} gather chunk(s)")
    if pack > 1:
        if row_windows:
            raise ValueError("packed refresh rows are a block-window mode")
        if LANES % pack or tw % pack:
            raise ValueError(f"pack {pack} must divide LANES and the "
                             f"window width, got tw={tw}")
        if shapes is not None and any(w % pack for _, w in shapes):
            raise ValueError(f"oriented shapes {shapes} must all have "
                             f"pack-{pack}-aligned widths")
    node_ch = nodes3d.shape[-1]           # 9 parity / 4 C1 (media/c1.py)
    cell_ch = 4 * node_ch
    if row_windows and node_ch != 9:
        raise ValueError("row windows support the 9-channel parity form only")
    n_ch = nchunks * cell_ch
    shape2 = state[0].shape
    zero = jnp.zeros(shape2, jnp.float32)
    from raytracing_tpu.config import gold_tol
    from raytracing_tpu.kernels.golden import golden_schedule
    golden = op in GOLDEN_OPS
    if golden:
        iters, polish = gold_schedule or golden_schedule()
        kernel = _make_golden_kernel(
            "hermite-tile", op, segment, box, iters, gold_tol(np.float32),
            resume=True, tile=meta + tile_shape, stats=stats, polish=polish,
            row_tile=row_windows, tile_channels=cell_ch)
    else:
        kernel = _make_kernel("hermite-tile", op, segment, box,
                              gold_tol(np.float32), resume=True,
                              tile=meta + tile_shape, stats=stats,
                              row_tile=row_windows, tile_channels=cell_ch)
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    if row_windows:
        # channel-major tiles (see _refresh_windows_rows): block on axis 1
        tile_spec = pl.BlockSpec((36, 1, rows, LANES),
                                 lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM)
        base_spec = pl.BlockSpec((1, 2, rows, LANES),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        tile_bytes = nblocks * (36 + 2) * rows * LANES
    else:
        tile_spec = pl.BlockSpec((1, n_ch, LANES), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        # full bases table in SMEM; the kernel indexes its row by program_id
        base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        tile_bytes = nblocks * n_ch * LANES
    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[tile_spec, base_spec] + [blk] * n_state
                 + [blk, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[blk] * n_state,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * n_state,
        cost_estimate=pl.CostEstimate(
            flops=200 * r * segment,
            bytes_accessed=(2 * n_state * r + tile_bytes) * 4,
            transcendentals=3 * r * segment),
        interpret=interpret,
    )
    travel = segment * delta_s
    if use_pred:
        # Drift-predicted windows: the refresh bbox includes each ray's
        # straight-line end p + travel * u, so the margin only needs the
        # true path's deviation from that prediction — at most
        # travel^2 * kappa / 2 (a ray on the tightest turning circle),
        # with kappa a PER-CELL bound on |grad n| / n that holds BETWEEN
        # nodes (|du/ds| = |grad_perp n| / n; x gamma covers the
        # anisotropic family's faster turning) — plus a cell of slack
        # absorbing O(delta_s^2 kappa) stage deviation and index
        # truncation.  Containment is still VERIFIED per refresh: a bound
        # violation trips the flag and replays, never silently clamps.
        # The bound mirrors media.hermite.kappa_cell_bound: corner maxima
        # of each Hermite channel weighted by the basis extrema (4/27),
        # so a bicubic gradient overshooting its node samples inside a
        # cell (sharp user grids) cannot under-size the margin; each cell
        # pairs its OWN gradient bound with its OWN n — never
        # max|grad| / min(n), whose extremes come from different table
        # regions (the reference's +-3 grid padding alone inflated that
        # factored form 27x on fisheye).
        hd = jnp.float32(4.0 / 27.0)

        def _cmax(a):
            a = jnp.abs(a)
            return jnp.maximum(jnp.maximum(a[:-1, :-1], a[:-1, 1:]),
                               jnp.maximum(a[1:, :-1], a[1:, 1:]))

        def _gbound(ch):
            return (_cmax(ch[..., 0])
                    + hd * (_cmax(ch[..., 1]) + _cmax(ch[..., 2]))
                    + hd * hd * _cmax(ch[..., 3]))

        n0 = nodes3d[..., 0]
        nmin = jnp.minimum(jnp.minimum(n0[:-1, :-1], n0[:-1, 1:]),
                           jnp.minimum(n0[1:, :-1], n0[1:, 1:]))
        if node_ch == 9:
            gb = jnp.sqrt(_gbound(nodes3d[..., 1:5]) ** 2
                          + _gbound(nodes3d[..., 5:9]) ** 2)
            kappa = jnp.max(gb / jnp.maximum(nmin, jnp.float32(1e-6)))
        else:
            # C1 form: grad n is the derivative of the n spline — the ONE
            # chord-decomposition bound shared with the host sizing path
            # (media.c1.c1_kappa_cell_bound, xp=jnp for the traced twin)
            from raytracing_tpu.media.c1 import c1_kappa_cell_bound
            kappa = c1_kappa_cell_bound(nodes3d, jnp.float32(inv_hx),
                                        jnp.float32(inv_hy), xp=jnp)
        kappa = kappa * jnp.maximum(jnp.float32(1.0), jnp.abs(gamma))
        sag = travel * travel * kappa * 0.5
        margin_x = jnp.ceil(sag * inv_hx) + 1.0
        margin_y = jnp.ceil(sag * inv_hy) + 1.0
    else:
        # legacy symmetric margins: positions move at most travel in each
        # coordinate during one segment
        margin_x = jnp.ceil(travel * inv_hx)
        margin_y = jnp.ceil(travel * inv_hy)
    if row_windows:
        c36, ncx_pad = jnp.transpose(_cells36(nodes3d)), None
    elif pack > 1:
        c36, ncx_pad = _cells_packed(nodes3d, pack)
    else:
        c36, ncx_pad = _cells36(nodes3d), None

    def seg_body(k, carry):
        st, flag = carry
        if not use_pred:
            pred = None
        else:
            if golden:
                live = st[7]
                ue = (jnp.cos(st[4]) * live, jnp.sin(st[4]) * live)
            else:
                live = st[8]
                ue = (st[2] * live, st[3] * live)
            pred = (st[0] + travel * ue[0], st[1] + travel * ue[1])
        if row_windows:
            flag, tiles, bases = _refresh_windows_rows(
                st, flag, c36, meta, th, tw, nblocks, rows,
                margin_x, margin_y, pred)
        else:
            flag, tiles, bases = _refresh_windows(
                st, flag, c36, meta, th, tw, nblocks, block_rays,
                margin_x, margin_y, nchunks, n_ch, pred, shapes,
                pack, ncx_pad)
        offset = offset0 + k.astype(jnp.float32) * segment
        if golden:
            ds_vec = golden_scalars(delta_s, gamma, limit, offset, iters)
        else:
            ds_vec = jnp.stack([delta_s, limit, offset])
        args = (tiles, bases) + st + (zero, ds_vec)
        return tuple(call(*args)), flag

    state, flag = jax.lax.fori_loop(
        0, n_seg, seg_body, (tuple(state), jnp.float32(-np.inf)))
    return state, flag


@functools.partial(jax.jit, static_argnames=(
    "op", "segment", "box", "block_rays", "interpret", "meta", "tile_shape",
    "stats", "n_state", "gold_schedule", "row_windows", "use_pred",
    "shapes", "pack"))
def _tiled_run_segments(*args, **kw):
    return _tiled_run_segments_inner(*args, **kw)


@functools.partial(jax.jit, static_argnames=(
    "op", "segment", "box", "block_rays", "interpret", "meta", "tile_shape",
    "stats", "n_state", "mesh", "mesh_axes", "gold_schedule", "row_windows",
    "use_pred", "shapes", "pack"))
def _tiled_run_segments_sharded(state, nodes3d, delta_s, limit, offset0,
                                n_seg, gamma, *, mesh, mesh_axes, **kw):
    """The round body under ``shard_map``: rays sharded, windows local.

    Each device runs the refresh + kernel chain on its own ray shard —
    kernel blocks never span shards (the local batch divides by
    block_rays), so block bounding boxes, window slices and the pallas
    grid are all shard-local; the only collective is a ``pmax`` of the
    containment flag so every host round sees one global verdict.  The
    node table rides in as a replicated argument.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    nst = len(state)
    spec_state = (P(mesh_axes, None),) * nst

    def body(state, nodes3d, delta_s, limit, offset0, n_seg, gamma):
        out, flag = _tiled_run_segments_inner(
            state, nodes3d, delta_s, limit, offset0, n_seg, gamma, **kw)
        for ax in mesh_axes:
            flag = jax.lax.pmax(flag, ax)
        return out, flag

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_state, P(), P(), P(), P(), P(), P()),
        out_specs=(spec_state, P()),
        check_vma=False)  # pallas out_shapes carry no vma
    return fn(tuple(state), nodes3d, delta_s, limit, offset0, n_seg, gamma)


@functools.partial(jax.jit, static_argnames=(
    "op", "segment", "box", "block_rays", "interpret", "meta", "tile_shape"))
def _tiled_sweep_segments(state, nodes3d, scal, n_seg, *, op, segment, box,
                          block_rays, interpret, meta, tile_shape):
    """Chain tiled-kernel launches with PER-BLOCK (delta_s, limit) rows.

    The candidate-sweep engine: block b integrates candidate b's step size
    — windows are already per block, and ``_make_kernel(per_block_scal=
    True)`` reads each block's scalar row — so ONE launch advances every
    candidate by ``segment`` steps.  ``scal`` is (nblocks, 3) f32 rows
    (delta_s, limit, offset); the offset column is updated here per
    refresh.  Containment margins are per block (each candidate's travel
    rate differs); the returned flag must stay <= 0 — the caller selects a
    window class per candidate upfront, so a trip means a bug, not a
    recoverable dispersal.
    """
    x0, y0, inv_hx, inv_hy, nx, ny = meta
    th, tw = tile_shape
    r = state[0].shape[0] * LANES
    rows = block_rays // LANES
    nblocks = r // block_rays
    nchunks = -(-th * tw // LANES)
    cell_ch = 4 * nodes3d.shape[-1]       # 36 parity / 16 C1
    n_ch = nchunks * cell_ch
    shape2 = state[0].shape
    zero = jnp.zeros(shape2, jnp.float32)
    from raytracing_tpu.config import gold_tol
    kernel = _make_kernel("hermite-tile", op, segment, box,
                          gold_tol(np.float32), resume=True,
                          tile=meta + tile_shape, per_block_scal=True,
                          tile_channels=cell_ch)
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, n_ch, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_state, _ = _state_layout(op, False)   # 9, +4 op7 window comps
    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[tile_spec, base_spec] + [blk] * n_state
                 + [blk, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[blk] * n_state,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * n_state,
        cost_estimate=pl.CostEstimate(
            flops=200 * r * segment,
            bytes_accessed=(2 * n_state * r + nblocks * n_ch * LANES) * 4,
            transcendentals=3 * r * segment),
        interpret=interpret,
    )
    ds_col = scal[:, 0]
    margin_x = jnp.ceil(segment * ds_col * inv_hx)     # per block
    margin_y = jnp.ceil(segment * ds_col * inv_hy)
    c36 = _cells36(nodes3d)

    def seg_body(k, carry):
        st, flag = carry
        flag, tiles, bases = _refresh_windows(
            st, flag, c36, meta, th, tw, nblocks, block_rays,
            margin_x, margin_y, nchunks, n_ch)
        scal_k = scal.at[:, 2].set(k.astype(jnp.float32) * segment)
        args = (tiles, bases) + st + (zero, scal_k)
        return tuple(call(*args)), flag

    state, flag = jax.lax.fori_loop(
        0, n_seg, seg_body, (tuple(state), jnp.float32(-np.inf)))
    return state, flag


#: window classes for the batched sweep, smallest first
_SWEEP_TILES = ((11, 11), (16, 16), (22, 22), (32, 32))

#: diagnostics of the LAST grid_trace_tiled call (host-side counters, no
#: API change): replay count, adaptive-round count, the smallest segment
#: the run was forced to, the (pack-adjusted) tile it ended on, and pack.
#: Perf probes read this to tell "slow kernel" from "replay storm"
#: (benchmarks/oriented_probe.py --pack).
LAST_TILED_STATS: dict = {}


def grid_sweep_tiled(op: str, pos0, theta0, delta_s, step_limits, medium, *,
                     box, block_rays: int = 1024,
                     interpret: bool = False):
    """Run a whole DELTA_S candidate set on a 2-D grid medium, batched.

    One candidate per kernel block: each block carries its own window (the
    tiled design already provides that) and its own (delta_s, step_limit)
    scalar row, so the full sweep advances in ``ceil(max_steps / segment)``
    launches instead of per-candidate runs — the reference's
    executor.map(search_delta) fan-out (RT_bench.py:1317-1318) as one
    program.  ``pos0``/``theta0`` are PER-CANDIDATE launch values
    (length n_candidates); each is duplicated across its block's lanes.

    Candidates are partitioned into window classes upfront (a coarser step
    needs a larger window to contain one refresh's travel); candidates too
    coarse for the largest window are returned in the ``fallback`` index
    list for the caller to run through the scan tier.  Returns
    ``(final_pos, fallback_idx)`` with ``final_pos`` (n_candidates, 2) —
    NaN rows for fallback candidates.
    """
    from raytracing_tpu.media.c1 import C1GridMedium
    from raytracing_tpu.media.hermite import HermiteGridMedium

    if not isinstance(medium, (HermiteGridMedium, C1GridMedium)):
        raise ValueError("grid_sweep_tiled needs a HermiteGridMedium or "
                         "C1GridMedium")
    if op not in FUSED_OPS:
        raise ValueError(f"grid_sweep_tiled supports {FUSED_OPS} (golden "
                         "candidates run per-candidate through "
                         f"grid_trace_tiled), got {op!r}")
    meta = (float(medium.x0), float(medium.y0), float(medium.inv_hx),
            float(medium.inv_hy), int(medium.nx), int(medium.ny))
    pitch = min(1.0 / meta[2], 1.0 / meta[3])
    delta_s = np.asarray(delta_s, np.float32)
    step_limits = np.asarray(step_limits, np.float32)
    n_cand = len(delta_s)
    pos0 = np.asarray(pos0, np.float32).reshape(n_cand, 2)
    theta0 = np.asarray(theta0, np.float32).reshape(n_cand)
    nodes3d = jnp.asarray(medium.nodes, jnp.float32).reshape(
        medium.ny, medium.nx, int(medium.nodes.shape[-1]))

    # window class per candidate: segment chosen per class from its
    # coarsest member so every refresh's travel fits with ~2 bbox cells of
    # slack (sweep blocks start as duplicated rays -> bbox 0, but windows
    # clamp at domain edges, which costs up to the start-position offset)
    def class_of(ds):
        for ti, tile in enumerate(_SWEEP_TILES):
            # a class is usable only if the medium has that many cells —
            # otherwise the window base clips negative and the node slice
            # runs off the table at trace time (ADVICE r2 #3)
            if tile[0] > medium.ny - 1 or tile[1] > medium.nx - 1:
                continue
            cap = min(tile) - 1
            if 2.0 * np.ceil(ds / pitch) <= cap - 2:
                return ti
        return None

    classes = [class_of(float(d)) for d in delta_s]
    final = np.full((n_cand, 2), np.nan, np.float32)
    fallback = [i for i, c in enumerate(classes) if c is None]

    for ti, tile in enumerate(_SWEEP_TILES):
        idx = [i for i, c in enumerate(classes) if c == ti]
        if not idx:
            continue
        cap = min(tile) - 1
        ds_max = float(delta_s[idx].max())
        segment = max(1, int((cap - 2) * 0.5 * pitch / ds_max))
        steps_max = int(step_limits[idx].max())
        nb = len(idx)
        comps_pos = jnp.asarray(np.repeat(pos0[idx], block_rays, axis=0))
        comps_th = jnp.asarray(np.repeat(theta0[idx], block_rays))
        # the shared resume layout — provisions op7's 4-comp window (MxSA,
        # RT_bench.py:21-27, 626-650) exactly as grid_trace_tiled does
        state = tuple(c.reshape(-1, LANES) for c in _initial_comps(
            op, comps_pos, comps_th, with_stats=False))
        scal = jnp.asarray(
            np.stack([delta_s[idx], step_limits[idx],
                      np.zeros(nb, np.float32)], axis=-1))
        n_seg = -(-steps_max // segment)
        state, flag = _tiled_sweep_segments(
            state, nodes3d, scal, jnp.int32(n_seg), op=op, segment=segment,
            box=tuple(box), block_rays=block_rays, interpret=interpret,
            meta=meta, tile_shape=tile)
        if not (float(flag) <= 0.0):
            raise RuntimeError(
                f"grid_sweep_tiled: containment flag {float(flag)} tripped "
                f"for window {tile} (segment {segment}) — window classing "
                "bug or non-duplicated candidate rays")
        xs = state[0].reshape(nb, block_rays)[:, 0]
        ys = state[1].reshape(nb, block_rays)[:, 0]
        final[idx, 0] = np.asarray(xs)
        final[idx, 1] = np.asarray(ys)

    return final, fallback


#: oriented single-/double-chunk window shape sets, keyed by gather chunk
#: count: same lane capacity (and so per-step gather cost) as the square
#: class, but a block whose drift is axis-dominated picks the rectangle
#: that trades cross-axis for along-axis cells (see _window_bases).
_ORIENT_SHAPES = {
    1: ((4, 32), (8, 16), (11, 11), (16, 8), (32, 4)),
    2: ((8, 32), (16, 16), (32, 8)),
}


def _oriented_shapes(tile, medium):
    """The oriented shape set for ``tile``'s chunk class, or None."""
    nch = -(-tile[0] * tile[1] // LANES)
    cand = _ORIENT_SHAPES.get(nch)
    if cand is None:
        return None
    out = tuple(s for s in cand
                if s[0] <= medium.ny - 1 and s[1] <= medium.nx - 1)
    return out if len(out) > 1 else None


def grid_trace_tiled(op: str, pos0, theta0, delta_s, medium, *, steps: int,
                     box, segment: int | None = None, block_rays: int = 1024,
                     tile_shape: tuple = (11, 11), refreshes_per_round: int = 32,
                     interpret: bool = False, with_stats: bool = False,
                     sort: bool = True, gamma: float = 1.0,
                     mesh=None, gold_schedule: tuple | None = None,
                     row_windows: bool | None = None,
                     oriented: bool | None = None,
                     pack: int | str = "auto") -> FusedFinal:
    """Production-tier tracing through a 2-D sampled-spline medium.

    The block-shared-window successor to :func:`grid_trace`: rays are
    sorted once along a Morton curve of grid cells, and each kernel unit
    carries a (th, tw)-CELL window of the table in VMEM shared by all its
    rays — in per-cell packed form, so each evaluation is 36
    ``tpu.dynamic_gather`` rows at a single flat cell index (same spline,
    bit-identical blend — see ``kernels.fused._hermite_blend`` /
    ``_tile_nag``).  Window refreshes are coherent slices, so the refresh
    cost that capped the supercell path no longer scales with the ray
    count x 144.

    The window unit is a kernel BLOCK (``row_windows`` default): one
    (th, tw)-cell window shared by ``block_rays`` rays; windows above 128
    cells pay ``ceil(cells/128)`` chunk-selected gather sets per step.
    ``row_windows=True`` opts into per-sublane-ROW windows (each row of
    128 Morton-adjacent rays gathers from its own <=128-cell window at
    single-chunk cost) — measured SLOWER on-chip at both the fine and the
    coarse calibrated divisors (1.7 vs 3.0 G, 0.14 vs 0.44 G: the per-row
    refresh's 128x window count dominates its per-step gather saving), so
    it is kept as an experiment knob, not the default.

    ``oriented`` (default None = on for block windows, off for row
    windows — explicit True with ``row_windows`` is an error) lets every
    block pick, per refresh, the
    RECTANGLE of its gather-chunk class — (4,32)...(32,4) at one chunk,
    (8,32)/(16,16)/(32,8) at two — that best fits its bbox+drift, so
    axis-dominated drift spends lane capacity along the motion instead of
    escalating to the next chunk class.  The per-block width rides in the
    SMEM bases row, so one compiled kernel serves every shape and
    trajectories are BIT-IDENTICAL to square windows (tested).  Measured
    on-chip (benchmarks/oriented_probe.py, 1M rays): 0.36 -> 0.60 G at
    the reference's coarse divisor 303 and 2.94 -> 3.37 G at the
    precision divisor 4587 — the auto ladder stays on cheaper chunk
    classes longer.  ``oriented=False`` restores the square ladder.

    ``pack`` (1/2/4/8/16) packs that many x-consecutive cells into each
    refresh gather row (:func:`_cells_packed`): the TPU gather engine is
    latency-bound on short rows (36-float rows 7.9 GB/s; 144-float 13.3;
    576-float 19.9 — benchmarks/refresh_probe.py; the in-situ refresh
    itself measured 6.7 -> 3.8 ms at pack=4, logs_r4/19), and at coarse
    steps the refresh gather is the single largest term of the wall
    clock, so packing trades up to ``pack - 1`` cells of window x-slack
    (bases snap to P alignment; containment stays VERIFIED per refresh)
    for a bandwidth-proportional cut of the refresh term.  Window widths
    round up to a ``pack`` multiple within the same gather-chunk class
    (e.g. (11, 11) -> (10, 12) at pack=4) and oriented shapes round the
    same way; the gathered floats — and so the trajectories — are
    BIT-IDENTICAL to ``pack=1`` at equal segmentation (tested).  The
    "auto" default packs at 4 only in the COARSE regime
    (delta_s > pitch/4, where refreshes dominate: +15-30% measured at
    divisor 303, logs_r4/21-22) and stays unpacked at fine steps, where
    the slack trade shortens segments for refreshes that barely happen
    (-6% measured at divisor 4587, logs_r4/23).  Auto segment sizing
    reserves the alignment snap, so it may pick a different segment than
    pack=1 would — which re-times the refresh cadence; golden ops
    re-derive their direction by exact cos/sin at each launch (vs
    polynomial rotations within), so THEIR trajectories carry a known
    ~1e-8/step cadence sensitivity (7e-6 over 606 coarse fisheye steps,
    measured) that any segmentation change exposes — pack or not.

    Unlike :func:`grid_trace` this has NO ``delta_s < cell`` restriction —
    the coarse calibrated fisheye divisors (278-325, RT_bench.py:1431-1450)
    run at kernel tier too; at such steps the window just refreshes more
    often.  Containment is *verified*, not assumed: every refresh checks
    that each unit's cell bbox plus worst-case travel fits its window; a
    violation re-sorts the rays and replays that round from its checkpoint
    (runs on reference workloads never trip it — fisheye ray fans are
    spatially coherent).  Raises ``RuntimeError`` if a freshly sorted batch
    still cannot fit, e.g. very few rays scattered over the whole domain —
    callers fall back to :func:`grid_trace` / the scan tier.

    Results are returned in the caller's ray order regardless of sorting.
    """
    from raytracing_tpu.media.c1 import C1GridMedium
    from raytracing_tpu.media.hermite import HermiteGridMedium

    if not isinstance(medium, (HermiteGridMedium, C1GridMedium)):
        raise ValueError("grid_trace_tiled needs a HermiteGridMedium or "
                         f"C1GridMedium, got {type(medium).__name__}")
    node_ch = int(medium.nodes.shape[-1])
    if row_windows and node_ch != 9:
        raise ValueError("row windows support the parity (9-channel) "
                         "Hermite form only; C1 media use block windows")
    golden = op in GOLDEN_OPS
    if not golden and op not in FUSED_OPS:
        raise ValueError(f"grid_trace_tiled supports {FUSED_OPS} and "
                         f"{tuple(GOLDEN_OPS)}, got {op!r}")
    if (segment is not None and segment < 1) or refreshes_per_round < 1:
        # a zero cadence would make the refresh loop spin without progress
        raise ValueError("segment and refreshes_per_round must be >= 1, "
                         f"got {segment}/{refreshes_per_round}")
    if oriented and row_windows:
        # rows-mode kernels gather per sublane row with a static shape;
        # silently dropping the shape set would size segments for
        # rectangle capacity the run can't use (flag replays every round).
        # Only an EXPLICIT oriented=True conflicts — the None default
        # resolves to "oriented for block windows, off for row windows"
        # (round-3's unconditional raise broke every default-oriented
        # row-window call, caught by the row-window tests this round)
        raise ValueError("oriented shape sets are a block-window mode; "
                         "drop row_windows or oriented")
    if oriented is None:
        oriented = not row_windows
    if pack == "auto":
        # coarse regime (a ray crosses cells in a few steps): refreshes
        # dominate and packing pays; fine regime: the slack trade loses
        pitch0 = min(1.0 / float(medium.inv_hx), 1.0 / float(medium.inv_hy))
        pack = 4 if (not row_windows
                     and float(delta_s) > 0.25 * pitch0) else 1
    if pack not in (1, 2, 4, 8, 16):
        raise ValueError(f"pack must be 1, 2, 4, 8, 16 or 'auto', "
                         f"got {pack}")
    if pack > 1 and row_windows:
        raise ValueError("packed refresh rows are a block-window mode; "
                         "drop row_windows or pack")
    th, tw = tile_shape                  # window size in CELLS
    r = pos0.shape[0]
    if r % block_rays:
        raise ValueError(f"rays {r} not a multiple of block {block_rays}")
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        if r % (n_dev * block_rays):
            raise ValueError(f"ray count {r} must divide by devices*block "
                             f"({n_dev}*{block_rays})")
    if medium.nx - 1 < tw or medium.ny - 1 < th:
        raise ValueError(f"medium grid {medium.ny}x{medium.nx} nodes is "
                         f"smaller than the {tile_shape}-cell window")
    meta = (float(medium.x0), float(medium.y0), float(medium.inv_hx),
            float(medium.inv_hy), int(medium.nx), int(medium.ny))
    pitch = min(1.0 / meta[2], 1.0 / meta[3])

    rows_per_block = block_rays // LANES

    def use_rows(tile):
        """Row-window mode for this tile?  Opt-in only (measured slower
        than block windows on-chip — see the class docstring); rows need
        >= (8, 128) Mosaic tiles and a <=128-cell window."""
        if not row_windows:
            return False
        return tile[0] * tile[1] <= LANES and rows_per_block >= 8

    if row_windows and not use_rows((th, tw)):
        raise ValueError("row_windows=True needs th*tw <= 128 cells and "
                         f">= 8 sublane rows per block, got {tile_shape} / "
                         f"block_rays {block_rays}")

    def _pk(tile):
        """Ladder tile -> pack-aligned width inside its gather-chunk class.

        Widths round UP to a multiple of ``pack`` (the padded table always
        holds the wider window: ncx_pad >= any pack-rounded tw that passed
        the grid-size check), heights round DOWN so the cell count stays
        within the class's chunks — e.g. (11, 11) -> (10, 12) at pack=4,
        (22, 22) -> (21, 24).
        """
        if pack == 1:
            return tile
        t, w = tile
        nch = -(-t * w // LANES)
        w2 = -(-w // pack) * pack
        return (min(t, (nch * LANES) // w2), w2)

    def shapes_for(tile):
        """The oriented shape set for ``tile`` under the pack constraint.

        Shapes whose width is not a ``pack`` multiple are replaced by
        their ``_pk`` rounding (e.g. (11, 11) -> (10, 12)) rather than
        dropped — losing the near-square from the single-chunk set left
        diagonal-drift blocks with only the extreme rectangles and
        replay-stormed the coarse regime (logs_r4/21 1-chunk rows);
        widths already below ``pack`` (e.g. (32, 4) at pack=8) have no
        same-class rounding and do drop.
        """
        if not oriented or use_rows(tile):
            return None
        shp = _oriented_shapes(tile, medium)
        if shp is not None and pack > 1:
            out = []
            for s in shp:
                s2 = s if s[1] % pack == 0 else _pk(s)
                if (s2[1] % pack == 0 and s2[0] >= 1 and s2 not in out
                        and s2[0] <= medium.ny - 1):
                    out.append(s2)
            shp = tuple(out) if len(out) > 1 else None
        return shp

    # host-side curvature estimate for segment sizing / margin-scheme
    # choice (the traced margins recompute the bound from the live table;
    # 0.0 statics mean a pre-round-3 medium — the 1.0 guess only affects
    # sizing, never correctness).  kappa_max is the pointwise
    # max |grad n| / n; the factored g_max / n_min fallback overestimates
    # badly on padded grids (see media/hermite.HermiteGridMedium).
    kappa_h = (getattr(medium, "kappa_max", 0.0)
               or (medium.g_max / max(medium.n_min, 1e-6)
                   if medium.g_max > 0.0 else 1.0)) * max(1.0, abs(gamma))

    def _pred_slack(travel):
        # cells of margin under drift prediction (see
        # _tiled_run_segments_inner): turning-circle deviation + 1
        return np.ceil(travel * travel * kappa_h * 0.5 / pitch) + 1.0

    def _pred_wins(seg):
        # Compare TOTAL window consumption, not just the margins: the
        # prediction rides in the refresh bbox, so pred mode spends
        # travel + 2*slack cells where legacy spends 2*ceil(travel)
        # (margins on both sides, bbox travel-free).  Comparing margins
        # alone flipped fine-step traces (travel ~3 cells, slack 2) into
        # pred mode where they consume MORE window and refresh more often
        # (measured 3.12 -> 2.75 G at divisor 4587).
        travel = seg * float(delta_s)
        return (travel / pitch + 2.0 * _pred_slack(travel)
                < 2.0 * np.ceil(travel / pitch))

    def _fits_oriented(travel_cells, m, shapes):
        # a direction phi fits iff SOME shape holds both axis projections
        # plus margins and the 4-cell bbox reserve; scan the worst phi
        # over [0, 45deg] (axis symmetry makes that the whole space).
        # NO pack-alignment reserve here: the bump placement
        # (_window_bases) recovers the snapped slack whenever the left
        # margin allows, which is the common case — statically reserving
        # pack-1 cells made the packed ladder over-grow past the
        # measured-best 2-chunk class (auto landed on (21, 24) seg=8 at
        # 0.47 G where (16, 16) seg=6 runs 0.70-0.78 with zero replays);
        # the verified flag + replay ladder covers the rare worst case
        for k in range(9):
            phi = math.pi / 4.0 * k / 8.0
            need_x = travel_cells * math.cos(phi) + m
            need_y = travel_cells * math.sin(phi) + m
            if not any(need_x <= tw_s - 1 - 4 and need_y <= th_s - 1 - 4
                       for th_s, tw_s in shapes):
                return False
        return True

    def _default_segment(tile, shapes=None):
        # capacity is min(tile) cells; ~4 reserved for the unit bbox
        cap = max(1.0, float(min(tile) - 1 - 4))
        # legacy symmetric margins: travel <= cap / 2 on each side
        seg_old = int(cap * 0.5 * pitch / float(delta_s))
        # drift-predicted margins: the prediction span rides in the bbox,
        # so a segment is feasible iff its travel (in cells) plus both
        # slack margins fits the capacity.  Search the largest feasible
        # segment directly — a re-substitution fixed point here oscillates
        # when kappa is large, and one round-3 regression took the
        # infeasible side of such an oscillation (margins could never fit
        # the window, every refresh replayed: 0.44 -> 0.16 G at div 303).
        # With an oriented shape set the capacity is direction-dependent:
        # a segment is feasible iff for EVERY drift direction some shape
        # holds it — rectangles extend the axis-dominated directions well
        # past the square's min(tile) bound.
        seg_pred = 0
        for s in range(1, 65):
            travel = s * float(delta_s)
            m = 2.0 * _pred_slack(travel)
            if shapes is not None:
                if not _fits_oriented(travel / pitch, m, shapes):
                    break
            elif travel / pitch + m > cap:
                break
            seg_pred = s
        return max(1, min(64, max(seg_old, seg_pred)))

    if segment is None:
        if not use_rows((th, tw)):
            # block mode at coarse steps: a ray crosses >1 cell each step;
            # starting with a larger window amortizes refreshes (refresh =
            # several XLA ops + a launch) at the cost of more gather
            # chunks per step.  Row mode skips this: its coverage is
            # already rows x 128 cells at single-chunk cost, so short
            # segments beat paying the chunk multiplier every step.
            grow = {(11, 11): (16, 16), (16, 16): (22, 22), (22, 22): (32, 32)}
            while (_default_segment(_pk((th, tw)), shapes_for((th, tw))) < 4
                   and (th, tw) in grow
                   and 2 * th <= medium.ny - 1 and 2 * tw <= medium.nx - 1):
                th, tw = grow[(th, tw)]
        segment = _default_segment(_pk((th, tw)), shapes_for((th, tw)))
    n_state, _ = _state_layout(op, with_stats)

    pos0 = jnp.asarray(pos0, jnp.float32)
    theta0 = jnp.asarray(theta0, jnp.float32)
    comps = _initial_comps(op, pos0, theta0, with_stats=with_stats,
                           n0_fn=medium.n, gamma=gamma)

    orig_idx = jnp.arange(r, dtype=jnp.int32)  # batch slot -> original ray

    def apply_perm(comps, orig_idx):
        perm = _sort_perm(comps[0], comps[1], meta)
        return [c[perm] for c in comps], orig_idx[perm]

    if sort:
        comps, orig_idx = apply_perm(comps, orig_idx)

    nodes3d = jnp.asarray(medium.nodes, jnp.float32).reshape(
        medium.ny, medium.nx, node_ch)
    limit = jnp.float32(steps)

    if mesh is None:
        def pin(state):
            return state
    else:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        mesh_axes = tuple(mesh.axis_names)
        row_sharding = NamedSharding(mesh, P(mesh_axes, None))

        def pin(state):
            # rows sharded across every mesh axis; kernel blocks stay
            # shard-local (r divides by devices * block_rays)
            return tuple(jax.device_put(s, row_sharding) for s in state)

    state = pin(tuple(c.reshape(-1, LANES) for c in comps))

    def attempt(state, seg, n_run, done_steps, tile):
        rows_mode = use_rows(tile)
        shp = shapes_for(tile)
        kw = dict(op=op, segment=seg, box=tuple(box), block_rays=block_rays,
                  interpret=interpret, meta=meta, tile_shape=_pk(tile),
                  stats=with_stats, n_state=n_state,
                  gold_schedule=gold_schedule, row_windows=rows_mode,
                  use_pred=_pred_wins(seg), shapes=shp, pack=pack)
        if mesh is None:
            return _tiled_run_segments(
                state, nodes3d, jnp.float32(delta_s), limit,
                jnp.float32(done_steps), jnp.int32(n_run),
                jnp.float32(gamma), **kw)
        return _tiled_run_segments_sharded(
            state, nodes3d, jnp.float32(delta_s), limit,
            jnp.float32(done_steps), jnp.int32(n_run), jnp.float32(gamma),
            mesh=mesh, mesh_axes=mesh_axes, **kw)

    def tripped(flag):
        # NaN-aware: once a window misses, zero node values drive the
        # state (and so the later refreshes' flag) to NaN — any
        # non-finite flag means the round is invalid too
        return not (float(flag) <= 0.0)

    # Adaptive round loop.  A round is a jitted chain of refreshes
    # checkpointed on the host; block MEMBERSHIP is frozen within a round
    # (only the windows re-center), so ray dispersion bounds how long a
    # round may safely run.  On an overflow flag the round replays from its
    # checkpoint with freshly sorted rays, one refresh at a time — with a
    # halved segment if even a single fresh-sorted refresh cannot fit
    # (start bbox + travel margin exceeds the window).  Round length, then
    # segment, grow back on clean rounds; every (seg,) variant jit-caches
    # and n_run is traced, so adaptation compiles at most log2(segment)
    # kernel variants.
    # Escalation ladder: near-square windows of doubling area (gathers per
    # step scale with ceil(cells / 128), capacity with the side length) —
    # the same classes the batched sweep compiles for (_SWEEP_TILES).
    def next_tile(tile):
        for cand in _SWEEP_TILES:
            if (cand[0] * cand[1] > tile[0] * tile[1]
                    and cand[0] <= medium.ny - 1 and cand[1] <= medium.nx - 1):
                return cand
        return None

    seg0 = segment
    seg = segment
    tile = (th, tw)
    round_refreshes = refreshes_per_round
    done_steps = 0
    LAST_TILED_STATS.clear()
    LAST_TILED_STATS.update(replays=0, rounds=0, segment0=seg0,
                            min_segment=seg, tile=_pk(tile), pack=pack)
    while done_steps < steps:
        n_run = min(round_refreshes, -(-(steps - done_steps) // seg))
        nstate, flag = attempt(state, seg, n_run, done_steps, tile)
        LAST_TILED_STATS["rounds"] += 1
        if tripped(flag):
            LAST_TILED_STATS["replays"] += 1
            comps = [s.reshape(-1) for s in state]
            comps, orig_idx = apply_perm(comps, orig_idx)
            state = pin(tuple(c.reshape(-1, LANES) for c in comps))
            nstate, flag = attempt(state, seg, 1, done_steps, tile)
            while tripped(flag):
                LAST_TILED_STATS["replays"] += 1
                if seg > 1:
                    seg = max(1, seg // 2)
                else:
                    bigger = next_tile(tile)
                    if bigger is None:
                        raise RuntimeError(
                            "grid_trace_tiled: a freshly sorted ray block "
                            f"still exceeds a {tile[0]}x{tile[1]} node "
                            f"window (flag={float(flag)}) at segment=1; the "
                            "batch is too spatially dispersed for tiling — "
                            "use grid_trace or the scan tier")
                    tile = bigger   # sticky: more gathers, 2x the capacity
                    seg = seg0
                nstate, flag = attempt(state, seg, 1, done_steps, tile)
            state = nstate
            done_steps += seg
            round_refreshes = 1
            LAST_TILED_STATS["min_segment"] = min(
                LAST_TILED_STATS["min_segment"], seg)
            LAST_TILED_STATS["tile"] = _pk(tile)
        else:
            state = nstate
            done_steps += n_run * seg
            if round_refreshes < refreshes_per_round:
                round_refreshes *= 2
            elif seg < seg0:
                seg = min(seg0, seg * 2)

    # un-permute to the caller's ray order
    flat = [s.reshape(-1) for s in state]
    out = [jnp.zeros(r, f.dtype).at[orig_idx].set(f) for f in flat]
    return _final_from_state(op, out, with_stats)


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
    n_state, _ = _state_layout(op, with_stats)

    pos0 = jnp.asarray(pos0, jnp.float32)
    theta0 = jnp.asarray(theta0, jnp.float32)
    comps = _initial_comps(op, pos0, theta0, with_stats=with_stats,
                           n0_fn=medium.n)
    state = tuple(c.reshape(-1, LANES) for c in comps)
    meta = (float(medium.x0), float(medium.y0), float(medium.inv_hx),
            float(medium.inv_hy), int(medium.nx), int(medium.ny))
    state = _grid_run_segments(
        state, jnp.asarray(medium.nodes, jnp.float32), jnp.float32(delta_s),
        jnp.float32(steps), jnp.int32(n_seg), op=op, segment=segment,
        box=tuple(box), block_rays=block_rays, interpret=interpret,
        meta=meta, stats=with_stats, n_state=n_state)
    out = [s.reshape(-1) for s in state]
    return _final_from_state(op, out, with_stats)


# -- 2-D grid media: tiled-window DYNAMIC kernel ------------------------------
def _dyn_tiled_segments_inner(state, nodes3d, delta_s, limit, offset0,
                              n_seg, *, op, segment, box, block_rays,
                              interpret, meta, tile_shape, pack=1,
                              tile_channels=36):
    """Chain tiled DYNAMIC kernel launches; re-center windows between.

    The paraxial twin of :func:`_tiled_run_segments_inner` for the
    18-component dynamic state (kinematics + Kahan compensations +
    (dpos, dangle) tangents + their compensations + caustic bookkeeping;
    kernels/dynamic._make_dynamic_kernel ``resume``).  Reuses the window
    machinery verbatim — :func:`_window_bases` placement/containment,
    :func:`_refresh_windows` coherent slices (packed or not) — with
    legacy symmetric margins (travel per coordinate <= segment * ds; no
    drift prediction: the dynamic tier's production steps are fine
    relative to the cell, so window pressure is low).
    """
    from raytracing_tpu.kernels.dynamic import _make_dynamic_kernel

    x0, y0, inv_hx, inv_hy, nx, ny = meta
    th, tw = tile_shape
    r = state[0].shape[0] * LANES
    rows = block_rays // LANES
    nblocks = r // block_rays
    nchunks = -(-th * tw // LANES)
    if pack > 1 and (LANES % pack or tw % pack):
        raise ValueError(f"pack {pack} must divide LANES and tw={tw}")
    n_ch = nchunks * tile_channels
    shape2 = state[0].shape
    kernel = _make_dynamic_kernel("", op, segment, tuple(box),
                                  tile=meta + tile_shape, resume=True,
                                  tile_channels=tile_channels)
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, n_ch, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[tile_spec, base_spec] + [blk] * 18
                 + [blk, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[blk] * 18,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * 18,
        cost_estimate=pl.CostEstimate(
            flops=600 * r * segment,
            bytes_accessed=(2 * 18 * r + nblocks * n_ch * LANES) * 4,
            transcendentals=0),
        interpret=interpret,
    )
    travel = segment * delta_s
    margin_x = jnp.ceil(travel * inv_hx)
    margin_y = jnp.ceil(travel * inv_hy)
    if pack > 1:
        c36, ncx_pad = _cells_packed(nodes3d, pack)
    else:
        c36, ncx_pad = _cells36(nodes3d), None
    zero = jnp.zeros(shape2, jnp.float32)

    def seg_body(k, carry):
        st, flag = carry
        flag, tiles, bases = _refresh_windows(
            st, flag, c36, meta, th, tw, nblocks, block_rays,
            margin_x, margin_y, nchunks, n_ch, None, None,
            pack, ncx_pad)
        offset = offset0 + k.astype(jnp.float32) * segment
        ds_vec = jnp.stack([delta_s, limit, offset])
        args = (tiles, bases) + st + (zero, ds_vec)
        return tuple(call(*args)), flag

    state, flag = jax.lax.fori_loop(
        0, n_seg, seg_body, (tuple(state), jnp.float32(-np.inf)))
    return state, flag


@functools.partial(jax.jit, static_argnames=(
    "op", "segment", "box", "block_rays", "interpret", "meta",
    "tile_shape", "pack", "tile_channels"))
def _dyn_tiled_segments(*args, **kw):
    return _dyn_tiled_segments_inner(*args, **kw)


@functools.partial(jax.jit, static_argnames=(
    "op", "segment", "box", "block_rays", "interpret", "meta",
    "tile_shape", "pack", "tile_channels", "mesh", "mesh_axes"))
def _dyn_tiled_segments_sharded(state, nodes3d, delta_s, limit, offset0,
                                n_seg, *, mesh, mesh_axes, **kw):
    """The dynamic round body under ``shard_map`` — the paraxial twin of
    :func:`_tiled_run_segments_sharded`: rays sharded, windows local,
    one ``pmax`` of the containment flag per round."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    nst = len(state)
    spec_state = (P(mesh_axes, None),) * nst

    def body(state, nodes3d, delta_s, limit, offset0, n_seg):
        out, flag = _dyn_tiled_segments_inner(
            state, nodes3d, delta_s, limit, offset0, n_seg, **kw)
        for ax in mesh_axes:
            flag = jax.lax.pmax(flag, ax)
        return out, flag

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_state, P(), P(), P(), P(), P()),
        out_specs=(spec_state, P()),
        check_vma=False)  # pallas out_shapes carry no vma
    return fn(tuple(state), nodes3d, delta_s, limit, offset0, n_seg)


def grid_trace_dynamic_tiled(op: str, pos0, theta0, delta_s, medium, *,
                             steps: int, box, segment: int | None = None,
                             block_rays: int = 1024,
                             tile_shape: tuple = (11, 11),
                             refreshes_per_round: int = 32,
                             interpret: bool = False, sort: bool = True,
                             pack: int | str = "auto", mesh=None):
    """Kernel-tier DYNAMIC tracing through a 2-D sampled-spline medium.

    The paraxial twin of :func:`grid_trace_tiled` for the smooth op
    subset (kernels/dynamic.DYN_FUSED_OPS): hand-derived tangents with
    compensated carries run INSIDE the tiled-window kernel, with the
    in-cell derivatives of the 2-D Hermite tables (bilinear-n tangent +
    the full 2x2 gradient Jacobian — the gx/gy surfaces are independent
    bicubics, RT_bench.py:455-458) supplied by
    ``kernels.dynamic._tile_nag_h``.  Windows re-center between
    segments; a containment violation re-sorts and replays from the
    round's checkpoint exactly like the kinematic tier.  Returns a
    ``DynFinal`` (engine fast_dynamic routes 2-D grid media here).

    No golden ops (tangents vanish a.e.), no op7 (windowed fd solver),
    no Welford stats.  ``mesh`` shards the ray batch across devices with
    shard-local windows and a pmax'd containment flag, exactly like the
    kinematic tier's sharded rounds.
    """
    from raytracing_tpu.kernels.dynamic import DYN_FUSED_OPS, DynFinal
    from raytracing_tpu.media.c1 import C1GridMedium
    from raytracing_tpu.media.hermite import HermiteGridMedium

    if op not in DYN_FUSED_OPS:
        raise ValueError(f"dynamic tiled kernel supports {DYN_FUSED_OPS}, "
                         f"got {op!r}")
    if not isinstance(medium, (HermiteGridMedium, C1GridMedium)):
        raise ValueError("grid_trace_dynamic_tiled needs a "
                         "HermiteGridMedium (36-float parity cells) or "
                         "C1GridMedium (16-float consistent cells), got "
                         f"{type(medium).__name__}")
    node_ch = int(medium.nodes.shape[-1])      # 9 parity / 4 C1
    th, tw = tile_shape
    r = pos0.shape[0]
    if r % block_rays:
        raise ValueError(f"rays {r} not a multiple of block {block_rays}")
    if mesh is not None and r % (int(mesh.devices.size) * block_rays):
        raise ValueError(f"ray count {r} must divide by devices*block "
                         f"({int(mesh.devices.size)}*{block_rays})")
    if medium.nx - 1 < tw or medium.ny - 1 < th:
        raise ValueError(f"medium grid {medium.ny}x{medium.nx} nodes is "
                         f"smaller than the {tile_shape}-cell window")
    meta = (float(medium.x0), float(medium.y0), float(medium.inv_hx),
            float(medium.inv_hy), int(medium.nx), int(medium.ny))
    pitch = min(1.0 / meta[2], 1.0 / meta[3])
    if pack == "auto":
        pack = 4 if float(delta_s) > 0.25 * pitch else 1

    def _pk(tile):
        if pack == 1:
            return tile
        t, w = tile
        nch = -(-t * w // LANES)
        w2 = -(-w // pack) * pack
        return (min(t, (nch * LANES) // w2), w2)

    if segment is None:
        cap = max(1.0, float(min(_pk((th, tw))) - 1 - 4))
        segment = max(1, min(64, int(cap * 0.5 * pitch / float(delta_s))))

    pos0 = jnp.asarray(pos0, jnp.float32)
    theta0 = jnp.asarray(theta0, jnp.float32)
    # 18-component launch state: source fixed (dpos0 = 0), dth0 = 1
    zeros = jnp.zeros(r, jnp.float32)
    ones = jnp.ones(r, jnp.float32)
    comps = [pos0[:, 0], pos0[:, 1], zeros, zeros,
             jnp.cos(theta0), jnp.sin(theta0), zeros, zeros, ones,
             zeros, zeros, ones, zeros, zeros,
             zeros, zeros, zeros, zeros]
    orig_idx = jnp.arange(r, dtype=jnp.int32)

    def apply_perm(comps, orig_idx):
        perm = _sort_perm(comps[0], comps[1], meta)
        return [c[perm] for c in comps], orig_idx[perm]

    if sort:
        comps, orig_idx = apply_perm(comps, orig_idx)
    if mesh is None:
        def pin(state):
            return state
    else:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        mesh_axes = tuple(mesh.axis_names)
        row_sharding = NamedSharding(mesh, P(mesh_axes, None))

        def pin(state):
            return tuple(jax.device_put(s, row_sharding) for s in state)
    state = pin(tuple(c.reshape(-1, LANES) for c in comps))
    nodes3d = jnp.asarray(medium.nodes, jnp.float32).reshape(
        medium.ny, medium.nx, node_ch)
    limit = jnp.float32(steps)

    def attempt(state, seg, n_run, done_steps, tile):
        # The ladder tracks the UNPACKED tile (as grid_trace_tiled does):
        # packing can shrink the area (_pk((11,11)) = (10,12) at pack=4), so
        # comparing _SWEEP_TILES against the packed tile loops forever.
        kw = dict(op=op, segment=seg, box=tuple(box),
                  block_rays=block_rays, interpret=interpret, meta=meta,
                  tile_shape=_pk(tile), pack=pack,
                  tile_channels=4 * node_ch)
        if mesh is None:
            return _dyn_tiled_segments(
                state, nodes3d, jnp.float32(delta_s), limit,
                jnp.float32(done_steps), jnp.int32(n_run), **kw)
        return _dyn_tiled_segments_sharded(
            state, nodes3d, jnp.float32(delta_s), limit,
            jnp.float32(done_steps), jnp.int32(n_run), mesh=mesh,
            mesh_axes=mesh_axes, **kw)

    def next_tile(tile):
        for cand in _SWEEP_TILES:
            if (cand[0] * cand[1] > tile[0] * tile[1]
                    and cand[0] <= medium.ny - 1
                    and cand[1] <= medium.nx - 1):
                return cand
        return None

    seg0 = seg = segment
    tile = (th, tw)
    round_refreshes = refreshes_per_round
    done_steps = 0
    while done_steps < steps:
        n_run = min(round_refreshes, -(-(steps - done_steps) // seg))
        nstate, flag = attempt(state, seg, n_run, done_steps, tile)
        if not (float(flag) <= 0.0):
            comps = [s.reshape(-1) for s in state]
            comps, orig_idx = apply_perm(comps, orig_idx)
            state = pin(tuple(c.reshape(-1, LANES) for c in comps))
            nstate, flag = attempt(state, seg, 1, done_steps, tile)
            while not (float(flag) <= 0.0):
                if seg > 1:
                    seg = max(1, seg // 2)
                else:
                    # grid_trace_tiled's escalation ladder: bigger
                    # near-square windows (more gather chunks, 2x the
                    # capacity), sticky for the rest of the run
                    bigger = next_tile(tile)
                    if bigger is None:
                        raise RuntimeError(
                            "grid_trace_dynamic_tiled: a freshly sorted "
                            "ray block exceeds the largest window at "
                            "segment=1 — use trace_dynamic (scan tier)")
                    tile = bigger
                    seg = seg0
                nstate, flag = attempt(state, seg, 1, done_steps, tile)
            state = nstate
            done_steps += seg
            round_refreshes = 1
        else:
            state = nstate
            done_steps += n_run * seg
            if round_refreshes < refreshes_per_round:
                round_refreshes *= 2
            elif seg < seg0:
                seg = min(seg0, seg * 2)

    flat = [s.reshape(-1) for s in state]
    out = [jnp.zeros(r, f.dtype).at[orig_idx].set(f) for f in flat]
    (x, y, _, _, ux, uy, tt, dsim, active, dpx, dpy, dth,
     _, kmah) = out[:14]
    # q needs n at the exit point for the amplitude; evaluate once
    n_exit = medium.n(x, y)
    q = dpx * (-uy) + dpy * ux
    return DynFinal(pos=jnp.stack([x, y], -1),
                    tangent=jnp.stack([ux, uy], -1), n=n_exit,
                    traveltime=tt, dist_sim=dsim, active=active > 0.5,
                    q=q, dtheta=dth, kmah=kmah.astype(jnp.int32))
