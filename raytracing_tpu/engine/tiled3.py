"""Tiled-window kernel tier for sampled 3-D (tri-Hermite grid3) media.

The 3-D lift of engine/segmented.py's ``grid_trace_tiled``: rays sorted
along a 3-D Morton curve, each kernel block sharing one (td, th, tw)-CELL
node window in VMEM refreshed by one coherent row gather per segment,
evaluated in-kernel by :func:`kernels.fused3d._tile_nag3` (8 corner nodes x
8 Hermite channels per cell, the layout media/grid3.py pre-staged for
exactly this path).  This is the production sample -> fit -> trace pipeline
(RT_bench.py:412-464) at kernel speed in three dimensions — the reference's
spline-medium story, which its 2-D FITPACK objects cannot express.

Window classes are near-capacity boxes per gather-chunk count:
(5,5,5) = 125 cells / 1 chunk, (6,6,7) = 252 / 2, (8,8,8) = 512 / 4,
(10,10,10) = 1000 / 8.  The measured operating point is the 1-chunk
(5,5,5) window: every extra gather chunk costs more per step than its
larger window saves in refreshes (benchmarks/logs_r5/14).

Containment is EXACT, not bounded (round-5 design): windows are placed
by predicted drift — each block's window covers the union of its cell
bbox and that bbox shifted by (mean tangent x segment travel), spending
the whole window budget along the motion direction — and the kernel
measures the true per-step window excess of every ray
(kernels/fused3d._window_excess3), so a positive flag means some ray
actually read clamped garbage and the round replays from its
checkpoint.  This replaces the isotropic worst-case margin (which
capped flag-free segments at ~2 cells of travel) without needing the
in-cell tri-Hermite kappa bound a rigorous a-priori prediction would:
optimistic placement costs a bounded replay, never correctness.
Recovery follows the 2-D ladder (re-sort -> halve segments -> bigger
windows -> RuntimeError, which ``engine.fast`` catches and falls back
to the scan tier).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tpu.kernels.fused3d import (CELL3_CH, LANES, Fused3Final,
                                            FUSED3_OPS, _make_tile_kernel3)

#: window classes, smallest first — near-capacity boxes per chunk count
_SWEEP_TILES3 = ((5, 5, 5), (6, 6, 7), (8, 8, 8), (10, 10, 10))


def _morton_key3(ix, iy, iz):
    """Interleave 10-bit cell indices into a 3-D Z-order key (uint32).

    The 3-axis analog of engine/segmented._morton_key: consecutive kernel
    blocks become spatially compact in ALL THREE axes, which is what keeps
    each block's node window small.  10 bits per axis covers grids up to
    1024 cells/axis — beyond that, indices are right-shifted to fit (the
    sort stays monotone at supercell granularity, which is all the
    containment machinery needs).
    """
    def part(v):
        v = jnp.bitwise_and(v, jnp.int32(0x3FF))
        v = jnp.bitwise_and(jnp.bitwise_or(v, jnp.left_shift(v, 16)),
                            jnp.int32(0x30000FF))
        v = jnp.bitwise_and(jnp.bitwise_or(v, jnp.left_shift(v, 8)),
                            jnp.int32(0x300F00F))
        v = jnp.bitwise_and(jnp.bitwise_or(v, jnp.left_shift(v, 4)),
                            jnp.int32(0x30C30C3))
        v = jnp.bitwise_and(jnp.bitwise_or(v, jnp.left_shift(v, 2)),
                            jnp.int32(0x9249249))
        return v

    return jnp.bitwise_or(
        jnp.bitwise_or(part(ix).astype(jnp.uint32),
                       jnp.left_shift(part(iy).astype(jnp.uint32), 1)),
        jnp.left_shift(part(iz).astype(jnp.uint32), 2))


def _cells3(x, y, z, meta):
    (x0, y0, z0, inv_hx, inv_hy, inv_hz, nx, ny, nz) = meta[:9]
    fx = jnp.clip((x - x0) * inv_hx, 0.0, float(nx - 1))
    fy = jnp.clip((y - y0) * inv_hy, 0.0, float(ny - 1))
    fz = jnp.clip((z - z0) * inv_hz, 0.0, float(nz - 1))
    ix = jnp.minimum(jnp.floor(fx), float(nx - 2))
    iy = jnp.minimum(jnp.floor(fy), float(ny - 2))
    iz = jnp.minimum(jnp.floor(fz), float(nz - 2))
    return ix, iy, iz


@functools.partial(jax.jit, static_argnames=("meta",))
def _sort_perm3(x, y, z, meta):
    """Ray permutation ordering the batch along a 3-D Morton curve."""
    ix, iy, iz = _cells3(x, y, z, meta)
    mx = max(int(meta[6]) - 1, int(meta[7]) - 1, int(meta[8]) - 1)
    shift = max(0, mx.bit_length() - 10)
    key = _morton_key3(
        jnp.right_shift(ix.astype(jnp.int32), shift),
        jnp.right_shift(iy.astype(jnp.int32), shift),
        jnp.right_shift(iz.astype(jnp.int32), shift))
    return jnp.argsort(key)


def _cells64(nodes4d):
    """Per-CELL packed node table: (nz, ny, nx, 8) -> (ncells, 64) rows.

    Every cell carries its own 8 corner nodes x 8 Hermite channels at flat
    index ``ch * 8 + corner`` with corner = dx + 2*dy + 4*dz — exactly what
    ``kernels.fused3d._tile_nag3`` gathers (the 3-D form of
    engine/segmented._cells36; same refresh economics: one flat row gather
    per window lane instead of 8 scattered node reads).
    """
    ch = nodes4d.shape[-1]
    corners = [nodes4d[dz:dz + nodes4d.shape[0] - 1,
                       dy:dy + nodes4d.shape[1] - 1,
                       dx:dx + nodes4d.shape[2] - 1]
               for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    # stack axis -1: (..., ch, 8corners) -> flat ch*8 + corner; corner list
    # order is dz-major, so its index is dx + 2*dy + 4*dz as documented
    return jnp.stack(corners, axis=-1).reshape(-1, 8 * ch)


def _window_ids3(bix, biy, biz, td, th, tw, n_lanes, ncx, ncy):
    """Flat cell ids of each window's lane layout: z-major, then y, x."""
    j = jnp.arange(n_lanes, dtype=jnp.int32)[None, :]
    tdv = jnp.asarray(td, jnp.int32).reshape(-1, 1)
    thv = jnp.asarray(th, jnp.int32).reshape(-1, 1)
    twv = jnp.asarray(tw, jnp.int32).reshape(-1, 1)
    jz = jnp.minimum(j // (thv * twv), tdv - 1)   # padding lanes clamp to
    jy = (j // twv) % thv                         # the window's last plane
    jx = j % twv
    return ((biz[:, None] + jz) * ncy + (biy[:, None] + jy)) * ncx \
        + (bix[:, None] + jx)


def _window_bases3(st, flag, meta, td, th, tw, ngroups, group_rays,
                   u_idx, travel):
    """Drift-predicted 3-D window placement for G ray groups.

    Round-5 design: instead of inflating every axis by the isotropic
    worst-case travel (which caps flag-free segments at ~2 cells of
    travel), each group's window covers the UNION of its current cell
    bounding box and that box shifted by the group's predicted drift
    (mean tangent x travel, per axis) — the full window budget rides in
    the direction the block actually moves.  Placement is a PREDICTION,
    not a bound: the kernel measures exact per-step containment
    (kernels/fused3d._window_excess3) and the engine replays from its
    checkpoint on violation, so curvature/spread beyond the prediction
    costs a replay, never correctness.  The returned flag accumulates
    only the upfront impossibility (union bbox larger than the window
    budget; <= 0 means every group was placed).
    """
    (x0, y0, z0, inv_hx, inv_hy, inv_hz, nx, ny, nz) = meta
    ix, iy, iz = _cells3(st[0].reshape(ngroups, group_rays),
                         st[1].reshape(ngroups, group_rays),
                         st[2].reshape(ngroups, group_rays), meta)
    drifts = []
    for k, inv_h in ((0, inv_hx), (1, inv_hy), (2, inv_hz)):
        u = st[u_idx + k].reshape(ngroups, group_rays)
        drifts.append(jnp.mean(u, axis=1) * travel * inv_h)

    def union(imn, imx, drift):
        return imn + jnp.minimum(drift, 0.0), imx + jnp.maximum(drift, 0.0)

    lox, hix = union(jnp.min(ix, axis=1), jnp.max(ix, axis=1), drifts[0])
    loy, hiy = union(jnp.min(iy, axis=1), jnp.max(iy, axis=1), drifts[1])
    loz, hiz = union(jnp.min(iz, axis=1), jnp.max(iz, axis=1), drifts[2])
    span_x = hix - lox
    span_y = hiy - loy
    span_z = hiz - loz
    need = jnp.maximum(
        jnp.maximum(span_x - float(tw - 1), span_y - float(th - 1)),
        span_z - float(td - 1))
    flag = jnp.maximum(flag, jnp.max(need))
    bix = jnp.clip(jnp.floor(lox - (float(tw) - 1.0 - span_x) * 0.5),
                   0.0, float(nx - 1 - tw)).astype(jnp.int32)
    biy = jnp.clip(jnp.floor(loy - (float(th) - 1.0 - span_y) * 0.5),
                   0.0, float(ny - 1 - th)).astype(jnp.int32)
    biz = jnp.clip(jnp.floor(loz - (float(td) - 1.0 - span_z) * 0.5),
                   0.0, float(nz - 1 - td)).astype(jnp.int32)
    return flag, bix, biy, biz


def _refresh_windows3(st, flag, c64, meta, td, th, tw, nblocks, block_rays,
                      u_idx, travel, nchunks, n_ch):
    """One per-BLOCK 3-D window refresh: (flag', tiles, bases)."""
    (x0, y0, z0, inv_hx, inv_hy, inv_hz, nx, ny, nz) = meta
    flag, bix, biy, biz = _window_bases3(
        st, flag, meta, td, th, tw, nblocks, block_rays, u_idx, travel)
    wid = _window_ids3(bix, biy, biz, td, th, tw, nchunks * LANES,
                       nx - 1, ny - 1)
    cells = c64[wid]                      # (nblocks, nchunks*LANES, 64)
    tiles = jnp.transpose(
        cells.reshape(nblocks, nchunks, LANES, CELL3_CH),
        (0, 1, 3, 2)).reshape(nblocks, n_ch, LANES)
    bases = jnp.stack(
        [bix, biy, biz,
         jnp.full_like(bix, tw), jnp.full_like(bix, th),
         jnp.full_like(bix, td)], axis=-1).astype(jnp.float32)
    return flag, tiles, bases


def _tiled3_segments_inner(state, nodes4d, delta_s, limit, offset0, n_seg,
                           *, op, segment, box, block_rays, interpret,
                           meta, tile_shape, dynamic=False):
    """Chain tiled 3-D kernel launches; refresh block windows between.

    Same contract as engine/segmented._tiled_run_segments_inner: returns
    ``(state, flag)`` with ``flag > 0`` meaning some block's bbox plus
    worst-case travel could not fit its window — the caller must replay
    from its checkpoint after re-sorting.  ``dynamic`` switches the
    12-component kinematic kernel for the 25-component paraxial one
    (kernels/dynamic3d._make_dyn_tile_kernel3); the refresh/containment
    machinery is state-width-agnostic (both layouts lead with x, y, z).
    """
    from raytracing_tpu.kernels.dynamic3d import _make_dyn_tile_kernel3

    (x0, y0, z0, inv_hx, inv_hy, inv_hz, nx, ny, nz) = meta
    td, th, tw = tile_shape
    r = state[0].shape[0] * LANES
    rows = block_rays // LANES
    nblocks = r // block_rays
    nchunks = -(-td * th * tw // LANES)
    n_ch = nchunks * CELL3_CH
    n_state = len(state)
    shape2 = state[0].shape
    zero = jnp.zeros(shape2, jnp.float32)
    make = _make_dyn_tile_kernel3 if dynamic else _make_tile_kernel3
    kernel = make(op, segment, box, meta + tile_shape)
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, n_ch, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[tile_spec, base_spec] + [blk] * n_state
                 + [blk, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[blk] * (n_state + 1),
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)]
                  * (n_state + 1),
        cost_estimate=pl.CostEstimate(
            flops=(1300 if dynamic else 400) * r * segment,
            bytes_accessed=(2 * n_state * r + nblocks * n_ch * LANES) * 4,
            transcendentals=2 * r * segment),
        interpret=interpret,
    )
    travel = segment * delta_s
    u_idx = 3 if dynamic else 6      # tangent slots in the state layout
    c64 = _cells64(nodes4d)

    def seg_body(k, carry):
        st, flag = carry
        flag, tiles, bases = _refresh_windows3(
            st, flag, c64, meta, td, th, tw, nblocks, block_rays,
            u_idx, travel, nchunks, n_ch)
        offset = offset0 + k.astype(jnp.float32) * segment
        ds_vec = jnp.stack([delta_s, limit, offset])
        args = (tiles, bases) + st + (zero, ds_vec)
        outs = call(*args)
        # the kernel's exact containment measurement: any positive lane
        # means clamped-garbage reads this segment -> caller replays
        flag = jnp.maximum(flag, jnp.max(outs[-1]))
        return tuple(outs[:-1]), flag

    return jax.lax.fori_loop(0, n_seg, seg_body,
                             (tuple(state), jnp.float32(-np.inf)))


@functools.partial(jax.jit, static_argnames=(
    "op", "segment", "box", "block_rays", "interpret", "meta",
    "tile_shape", "dynamic"))
def _tiled3_segments(*args, **kw):
    return _tiled3_segments_inner(*args, **kw)


@functools.partial(jax.jit, static_argnames=(
    "op", "segment", "box", "block_rays", "interpret", "meta", "tile_shape",
    "dynamic", "mesh", "mesh_axes"))
def _tiled3_segments_sharded(state, nodes4d, delta_s, limit, offset0,
                             n_seg, *, mesh, mesh_axes, **kw):
    """The 3-D round body under shard_map: rays sharded, windows local.

    Kernel blocks never span shards; the only collective is a pmax of the
    containment flag (the exact contract of engine/segmented
    ._tiled_run_segments_sharded).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec_state = (P(mesh_axes, None),) * len(state)

    def body(state, nodes4d, delta_s, limit, offset0, n_seg):
        out, flag = _tiled3_segments_inner(
            state, nodes4d, delta_s, limit, offset0, n_seg, **kw)
        for ax in mesh_axes:
            flag = jax.lax.pmax(flag, ax)
        return out, flag

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_state, P(), P(), P(), P(), P()),
        out_specs=(spec_state, P()),
        check_vma=False)
    return fn(tuple(state), nodes4d, delta_s, limit, offset0, n_seg)


def _prep_tiled3(method, pos0, medium, *, box, delta_s, segment,
                 block_rays, tile_shape, mesh, ops, fname):
    """Shared validation + meta/segment derivation for both tiled tiers.

    One definition of the entry contract (the 2-D tier's kinematic and
    dynamic preambles drifted once — the round-5 ADVICE ladder bug class
    — so the 3-D pair shares it).  Returns ``(op, meta, segment)``.
    """
    from raytracing_tpu.engine.trace3d import canonical3
    from raytracing_tpu.media.grid3 import C1Grid3Medium

    op = canonical3(method)
    if op not in ops:
        raise ValueError(f"{fname} supports {ops}, got {op!r}")
    if not isinstance(medium, C1Grid3Medium):
        raise ValueError(f"{fname} needs a C1Grid3Medium "
                         f"(media/grid3.py), got {type(medium).__name__}")
    if len(box) != 6:
        raise ValueError(f"box must be 6 floats, got {box!r}")
    td, th, tw = tile_shape
    r = pos0.shape[0]
    if r % block_rays:
        raise ValueError(f"rays {r} not a multiple of block {block_rays}")
    if mesh is not None and r % (int(mesh.devices.size) * block_rays):
        raise ValueError(f"ray count {r} must divide by devices*block "
                         f"({int(mesh.devices.size)}*{block_rays})")
    if medium.nx - 1 < tw or medium.ny - 1 < th or medium.nz - 1 < td:
        raise ValueError(f"medium grid {medium.nz}x{medium.ny}x{medium.nx} "
                         f"nodes is smaller than the {tile_shape} window")
    meta = (float(medium.x0), float(medium.y0), float(medium.z0),
            float(medium.inv_hx), float(medium.inv_hy),
            float(medium.inv_hz), int(medium.nx), int(medium.ny),
            int(medium.nz))
    pitch = min(1.0 / meta[3], 1.0 / meta[4], 1.0 / meta[5])
    if segment is None:
        segment = _default_segment3(tile_shape, pitch, delta_s)
    return op, meta, segment


def grid3_trace_tiled(method: str, pos0, dir0, delta_s, medium, *,
                      steps: int, box, segment: int | None = None,
                      block_rays: int = 1024, tile_shape: tuple = (5, 5, 5),
                      refreshes_per_round: int = 32,
                      interpret: bool = False, sort: bool = True,
                      mesh=None) -> Fused3Final:
    """Kernel-tier tracing through a sampled tri-Hermite 3-D medium.

    The production path for measured 3-D fields: Morton-sorted ray blocks
    share VMEM node windows refreshed between bounded-trip kernel
    launches, with the 2-D tier's recovery ladder (re-sort -> smaller
    segments -> bigger windows -> RuntimeError for genuinely dispersed
    batches, which fast_trace3 catches and routes to the scan tier).

    ``medium`` is a :class:`media.grid3.C1Grid3Medium`; ``method`` one of
    the vector ops (engine/trace3d.METHODS3).  ``mesh`` shards the ray
    batch across devices with shard-local windows.  Returns a
    :class:`kernels.fused3d.Fused3Final` in the caller's ray order.
    """
    op, meta, segment = _prep_tiled3(
        method, pos0, medium, box=box, delta_s=delta_s, segment=segment,
        block_rays=block_rays, tile_shape=tile_shape, mesh=mesh,
        ops=FUSED3_OPS, fname="grid3_trace_tiled")
    td, th, tw = tile_shape
    r = pos0.shape[0]

    # 12-component state: pos, Kahan comps, tangent, accumulators, active
    pos0, dir0 = _as_f32_rays(pos0, dir0)
    zeros = jnp.zeros(r, jnp.float32)
    ones = jnp.ones(r, jnp.float32)
    comps = [pos0[:, 0], pos0[:, 1], pos0[:, 2], zeros, zeros, zeros,
             dir0[:, 0], dir0[:, 1], dir0[:, 2], zeros, zeros, ones]
    out = _drive_tiled3(
        comps, medium, meta, op=op, delta_s=delta_s, steps=steps,
        box=box, segment=segment, block_rays=block_rays,
        tile_shape=(td, th, tw), refreshes_per_round=refreshes_per_round,
        interpret=interpret, sort=sort, mesh=mesh, dynamic=False,
        err_name="grid3_trace_tiled")
    (x, y, z, _, _, _, ux, uy, uz, tt, dsim, active) = out
    return Fused3Final(pos=jnp.stack([x, y, z], -1),
                       tangent=jnp.stack([ux, uy, uz], -1),
                       traveltime=tt, dist_sim=dsim,
                       active=active > 0.5)


def _as_f32_rays(pos0, dir0):
    pos0 = jnp.asarray(pos0, jnp.float32)
    dir0 = jnp.asarray(dir0, jnp.float32)
    return pos0, dir0 / jnp.linalg.norm(dir0, axis=-1, keepdims=True)


def _default_segment3(tile_shape, pitch, delta_s):
    """Default steps between window refreshes — one definition, both tiers.

    Drift-predicted placement (round 5, _window_bases3) budgets the FULL
    window depth along the motion direction, so the default spends
    min(tile)-2 cells of travel per segment (one cell of slack for span
    + curvature drift-prediction error); the exact in-kernel containment
    measurement turns any optimism into a bounded replay, not an error.
    The pre-drift formula ((min-3) * 0.5 cells) measured 0.77 G on the
    kernel-matrix row; segment=8 alone measured 0.98 G
    (benchmarks/logs_r5/14)."""
    cap = max(1.0, float(min(tile_shape) - 2))
    return max(1, min(64, int(cap * pitch / float(delta_s))))


def _drive_tiled3(comps, medium, meta, *, op, delta_s, steps, box, segment,
                  block_rays, tile_shape, refreshes_per_round, interpret,
                  sort, mesh, dynamic, err_name):
    """Morton sort + segment chain + escalation ladder + unsort.

    The state-width-agnostic driver shared by the kinematic and dynamic
    3-D tiled tiers: ``comps`` is any list of per-ray components whose
    first three are (x, y, z).  Recovery follows the 2-D ladder
    (re-sort -> halve segments -> bigger windows -> RuntimeError, which
    engine.fast catches and routes to the scan tier).  Returns the flat
    components in the caller's original ray order.
    """
    r = comps[0].shape[0]
    orig_idx = jnp.arange(r, dtype=jnp.int32)

    def apply_perm(comps, orig_idx):
        perm = _sort_perm3(comps[0], comps[1], comps[2], meta)
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
    nodes4d = jnp.asarray(medium.nodes, jnp.float32).reshape(
        medium.nz, medium.ny, medium.nx, 8)
    limit = jnp.float32(steps)

    def attempt(state, seg, n_run, done_steps, tile):
        kw = dict(op=op, segment=seg, box=tuple(box),
                  block_rays=block_rays, interpret=interpret, meta=meta,
                  tile_shape=tile, dynamic=dynamic)
        if mesh is None:
            return _tiled3_segments(
                state, nodes4d, jnp.float32(delta_s), limit,
                jnp.float32(done_steps), jnp.int32(n_run), **kw)
        return _tiled3_segments_sharded(
            state, nodes4d, jnp.float32(delta_s), limit,
            jnp.float32(done_steps), jnp.int32(n_run), mesh=mesh,
            mesh_axes=mesh_axes, **kw)

    def next_tile(tile):
        for cand in _SWEEP_TILES3:
            if (cand[0] * cand[1] * cand[2] > tile[0] * tile[1] * tile[2]
                    and cand[0] <= medium.nz - 1
                    and cand[1] <= medium.ny - 1
                    and cand[2] <= medium.nx - 1):
                return cand
        return None

    seg0 = seg = segment
    tile = tile_shape
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
                    bigger = next_tile(tile)
                    if bigger is None:
                        raise RuntimeError(
                            f"{err_name}: a freshly sorted ray block "
                            "exceeds the largest window at segment=1 — the "
                            "batch is too spatially dispersed for 3-D "
                            "tiling; use the scan tier")
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
    return [jnp.zeros(r, f.dtype).at[orig_idx].set(f) for f in flat]


def grid3_trace_dynamic_tiled(method: str, pos0, dir0, delta_s, medium, *,
                              steps: int, box, segment: int | None = None,
                              block_rays: int = 1024,
                              tile_shape: tuple = (5, 5, 5),
                              refreshes_per_round: int = 32,
                              interpret: bool = False, sort: bool = True,
                              mesh=None):
    """Kernel-tier DYNAMIC tracing through a sampled tri-Hermite medium.

    The paraxial twin of :func:`grid3_trace_tiled` for the smooth vector
    ops (kernels/dynamic3d.DYN3_FUSED_OPS): both hand-derived launch
    tangents run INSIDE the tiled-window kernel, with n / grad / the
    exact symmetric Hessian of the SAME tricubic patch supplied by
    ``kernels.dynamic3d._tile_nag3_h`` — the 3-D form of the 2-D
    C1 dynamic tiled kernel (engine/segmented.grid_trace_dynamic_tiled
    with 16-float cells), and the boundary-value extension of the
    reference's production sample->fit->trace pipeline
    (RT_bench.py:412-464 + the trazar dynamics it never lifted to 3-D).

    Point-source launch (dpos = 0, du = the e1/e2 transverse frame of
    engine/dynamic3d._transverse_frame), so ``detq``/``kmah``/the focus
    locator match ``trace_dynamic3``'s exact-jvp metrics.  Windows
    re-center between segments; recovery follows the kinematic ladder.
    Returns a :class:`kernels.dynamic3d.Dyn3Final` in the caller's ray
    order (engine.fast.fast_dynamic3 routes sampled grid3 media here).
    """
    from raytracing_tpu.engine.dynamic3d import _transverse_frame
    from raytracing_tpu.kernels.dynamic3d import (DYN3_FUSED_OPS,
                                                  Dyn3Final)

    op, meta, segment = _prep_tiled3(
        method, pos0, medium, box=box, delta_s=delta_s, segment=segment,
        block_rays=block_rays, tile_shape=tile_shape, mesh=mesh,
        ops=DYN3_FUSED_OPS, fname="grid3_trace_dynamic_tiled")
    td, th, tw = tile_shape
    r = pos0.shape[0]

    pos0, dir0 = _as_f32_rays(pos0, dir0)
    e1, e2 = _transverse_frame(dir0)
    zeros = jnp.zeros(r, jnp.float32)
    ones = jnp.ones(r, jnp.float32)
    big = jnp.full(r, np.finfo(np.float32).max, jnp.float32)
    # 25-component launch state (kernels/dynamic3d.DYN3_TILE_STATE):
    # source fixed (dpa = dpb = 0), dua/dub = the transverse frame
    comps = ([pos0[:, 0], pos0[:, 1], pos0[:, 2],
              dir0[:, 0], dir0[:, 1], dir0[:, 2],
              zeros, zeros, zeros,
              e1[:, 0], e1[:, 1], e1[:, 2],
              zeros, zeros, zeros,
              e2[:, 0], e2[:, 1], e2[:, 2],
              zeros, zeros, ones, zeros, zeros, big, zeros])
    out = _drive_tiled3(
        comps, medium, meta, op=op, delta_s=delta_s, steps=steps,
        box=box, segment=segment, block_rays=block_rays,
        tile_shape=(td, th, tw), refreshes_per_round=refreshes_per_round,
        interpret=interpret, sort=sort, mesh=mesh, dynamic=True,
        err_name="grid3_trace_dynamic_tiled")
    (x, y, z, ux, uy, uz, dpax, dpay, dpaz, _, _, _,
     dpbx, dpby, dpbz, _, _, _, tt, dsim, active, _, kmah,
     mind, minstep) = out
    # frame-free det Q = (dpa x dpb) . u (kernels/dynamic3d docstring);
    # n at the exit point evaluates once from the same patch algebra
    detq = ((dpay * dpbz - dpaz * dpby) * ux
            + (dpaz * dpbx - dpax * dpbz) * uy
            + (dpax * dpby - dpay * dpbx) * uz)
    n_exit = medium.n_and_grad3(x, y, z)[0]
    return Dyn3Final(pos=jnp.stack([x, y, z], -1),
                     tangent=jnp.stack([ux, uy, uz], -1),
                     traveltime=tt, dist_sim=dsim, active=active > 0.5,
                     detq=detq, kmah=kmah.astype(jnp.int32), n=n_exit,
                     min_absdet=mind,
                     min_absdet_step=minstep.astype(jnp.int32))
