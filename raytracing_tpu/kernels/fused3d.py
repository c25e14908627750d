"""Fused Pallas integrator for the 3-D tier: analytic fields, vector ops.

The 3-D counterpart of :mod:`kernels.fused` for the method set
:data:`engine.trace3d.METHODS3` (op1/op2/op6/op8).  Ray-state tiles —
position, unit tangent, Kahan compensations, accumulators — stay resident
in VMEM across every step; per-step HBM traffic is zero.

Kernel-dialect choices (CLAUDE.md Mosaic rules):

* The RK2 tangent update is the ROTATION-VECTOR Heun of engine/trace3d.py
  (the form that matches the 2-D engine's accuracy, docs/PRECISION.md
  round-3 addendum), expressed entirely in the rotation angle SQUARED:
  ``cos a = 1 - a2 * vers(a2)``, ``sinc`` and ``vers`` as degree-2
  polynomials in a2 — no sqrt, no sin/cos, no atan2 in the hot loop (the
  increments are O(ds * curvature), so the truncation sits below f32 eps;
  chains of real transcendentals are also the known Mosaic compile-time
  trap).
* The momentum-impulse update is an rsqrt normalization of p = n u + J.
* Accumulator inits load from a zeros buffer; the activity mask is f32;
  boundary exit is a 6-face lane mask.

On-chip numbers pend the tunnel (benchmarks/tier_probe_3d.py runs this
kernel when RT_PROBE_PALLAS3D=1); interpret-mode parity vs the scan tier
is tested in tests/test_fused3d.py.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tpu.config import THCK_PARAM

LANES = 128
FUSED3_FIELDS = ("fisheye", "vert_heterogeneous", "interface")
FUSED3_OPS = ("op1", "op2", "op6", "op8")
_SQRT2 = 1.4142135623730951


def _field3_fn(field: str):
    """n and its 3-D gradient, inlined into the kernel (media/fields3d.py
    twins; the stratified fields lift with dn/dz = 0)."""
    if field == "fisheye":
        def f(x, y, z):
            n = 1.0 / (1.0 + x * x + y * y + z * z)
            c = -2.0 * n * n
            return n, c * x, c * y, c * z
    elif field == "vert_heterogeneous":
        def f(x, y, z):
            n = 1.0 / (18.0 + 2.0 * y)
            zero = jnp.zeros_like(x)
            return n, zero, -2.0 * n * n, zero
    else:  # interface
        def f(x, y, z):
            sig = 1.0 / (1.0 + jnp.exp(-y / THCK_PARAM))
            n = _SQRT2 - (_SQRT2 - 1.0) * sig
            zero = jnp.zeros_like(x)
            return (n, zero,
                    -(_SQRT2 - 1.0) * sig * (1.0 - sig) / THCK_PARAM, zero)
    return f


def _rot_coeffs(a2):
    """(cos a, sin a / a, (1 - cos a) / a^2) as polynomials in a^2.

    cos comes FROM vers (cos = 1 - a2*vers) so the three stay mutually
    consistent to the truncation order; |u| is preserved to ~a^6.
    """
    sinc = 1.0 - a2 * (1.0 / 6.0) * (1.0 - a2 * 0.05)
    vers = 0.5 * (1.0 - a2 * (1.0 / 12.0) * (1.0 - a2 * (1.0 / 30.0)))
    return 1.0 - a2 * vers, sinc, vers


def _rodrigues3(ux, uy, uz, rx, ry, rz):
    """Rotate unit (ux,uy,uz) by rotation vector (rx,ry,rz), poly form."""
    a2 = rx * rx + ry * ry + rz * rz
    cos, sinc, vers = _rot_coeffs(a2)
    # rho x u
    cx = ry * uz - rz * uy
    cy = rz * ux - rx * uz
    cz = rx * uy - ry * ux
    rdotu = rx * ux + ry * uy + rz * uz
    return (ux * cos + cx * sinc + rx * rdotu * vers,
            uy * cos + cy * sinc + ry * rdotu * vers,
            uz * cos + cz * sinc + rz * rdotu * vers)


def _step_body3(op: str, box, nag, zero, ds, limit, offset=0.0):
    """The shared per-step fori body over the 16-component 3-D carry.

    One definition of the vector-op physics (position advance, poly-
    rotation Heun / impulse tangent update, optical-path accumulation,
    6-face exit) serves BOTH the analytic fused kernel and the tiled
    sampled-grid3 kernel — identical expressions mean identical
    trajectories wherever the media agree.  ``offset`` is the global step
    count before this launch (resume-chained kernels).
    """
    second_order = op in ("op6", "op8")
    rk2 = op in ("op2", "op6")
    limx_i, limx_s, limy_i, limy_s, limz_i, limz_s = [float(v) for v in box]

    def body(i, carry):
        in_limit = (i.astype(jnp.float32) + offset) < limit
        (x, y, z, cx, cy, cz, ux, uy, uz, n, gx, gy, gz, tt, dsim,
         active) = carry

        # -- position advance (ops/steppers.py in vector form) -------
        if second_order:
            gdotu = gx * ux + gy * uy + gz * uz
            half_fac = ds * ds * 0.5 / n
            ddx = ux * ds + (gx - gdotu * ux) * half_fac
            ddy = uy * ds + (gy - gdotu * uy) * half_fac
            ddz = uz * ds + (gz - gdotu * uz) * half_fac
        else:
            ddx, ddy, ddz = ux * ds, uy * ds, uz * ds

        # Kahan-compensated position accumulation
        tx = ddx - cx
        nx2 = x + tx
        cx2 = (nx2 - x) - tx
        ty = ddy - cy
        ny2 = y + ty
        cy2 = (ny2 - y) - ty
        tz = ddz - cz
        nz2 = z + tz
        cz2 = (nz2 - z) - tz

        n2, gx2, gy2, gz2 = nag(nx2, ny2, nz2)

        # -- tangent update -------------------------------------------
        if rk2:
            # rotation-vector Heun (engine/trace3d.py), poly rotations
            inv_n = 1.0 / n
            gdotu = gx * ux + gy * uy + gz * uz
            k1x = ds * (gx - gdotu * ux) * inv_n
            k1y = ds * (gy - gdotu * uy) * inv_n
            k1z = ds * (gz - gdotu * uz) * inv_n
            r1x = uy * k1z - uz * k1y
            r1y = uz * k1x - ux * k1z
            r1z = ux * k1y - uy * k1x
            umx, umy, umz = _rodrigues3(ux, uy, uz, r1x, r1y, r1z)
            inv_n2 = 1.0 / n2
            gdotm = gx2 * umx + gy2 * umy + gz2 * umz
            k2x = ds * (gx2 - gdotm * umx) * inv_n2
            k2y = ds * (gy2 - gdotm * umy) * inv_n2
            k2z = ds * (gz2 - gdotm * umz) * inv_n2
            rx = (r1x + (umy * k2z - umz * k2y)) * 0.5
            ry = (r1y + (umz * k2x - umx * k2z)) * 0.5
            rz = (r1z + (umx * k2y - umy * k2x)) * 0.5
            nux, nuy, nuz = _rodrigues3(ux, uy, uz, rx, ry, rz)
        else:
            # trapezoidal impulse on p = n u (theta_cost_t's direction)
            half = ds * 0.5
            sx = n * ux + (gx + gx2) * half
            sy = n * uy + (gy + gy2) * half
            sz = n * uz + (gz + gz2) * half
            inv = jax.lax.rsqrt(sx * sx + sy * sy + sz * sz)
            nux, nuy, nuz = sx * inv, sy * inv, sz * inv

        if second_order:
            dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            ntt = tt + dist * (n + n2) * 0.5
            ndsim = dsim + dist
        else:
            ntt = tt + ds * (n + n2) * 0.5
            ndsim = dsim + ds

        out = ((nx2 > limx_s) | (nx2 < limx_i)
               | (ny2 > limy_s) | (ny2 < limy_i)
               | (nz2 > limz_s) | (nz2 < limz_i))
        keep = (active > 0.5) & in_limit

        def sel(new, old):
            return jnp.where(keep, new, old)

        nactive = jnp.where(keep & out, zero, active)
        return (sel(nx2, x), sel(ny2, y), sel(nz2, z),
                sel(cx2, cx), sel(cy2, cy), sel(cz2, cz),
                sel(nux, ux), sel(nuy, uy), sel(nuz, uz),
                sel(n2, n), sel(gx2, gx), sel(gy2, gy), sel(gz2, gz),
                sel(ntt, tt), sel(ndsim, dsim), nactive)

    return body


def _make_kernel3(field: str, op: str, steps: int, box):
    nag = _field3_fn(field)

    def kernel(x_ref, y_ref, z_ref, ux_ref, uy_ref, uz_ref, zero_ref,
               ds_ref, *out_refs):
        x, y, z = x_ref[...], y_ref[...], z_ref[...]
        ux, uy, uz = ux_ref[...], uy_ref[...], uz_ref[...]
        zero = zero_ref[...]
        cx = cy = cz = tt = dsim = zero
        active = zero + 1.0
        ds = ds_ref[0]
        limit = ds_ref[1]

        body = _step_body3(op, box, nag, zero, ds, limit)
        n, gx, gy, gz = nag(x, y, z)
        carry0 = (x, y, z, cx, cy, cz, ux, uy, uz, n, gx, gy, gz, tt,
                  dsim, active)
        final = jax.lax.fori_loop(0, steps, body, carry0)
        (fx, fy, fz, _, _, _, fux, fuy, fuz, _, _, _, _, ftt, fdsim,
         fact) = final
        for ref, val in zip(out_refs, (fx, fy, fz, fux, fuy, fuz, ftt,
                                       fdsim, fact)):
            ref[...] = val

    return kernel


#: floats per packed 3-D cell: 8 tri-Hermite channels x 8 corner nodes
#: (media/grid3.C1Grid3Medium layout, corner index dx + 2*dy + 4*dz)
CELL3_CH = 64


def _tile_nag3(T, bix, biy, biz, meta3, tw_dyn=None, th_dyn=None,
               td_dyn=None):
    """3-D n/grad gathered from a block-shared per-CELL window in VMEM.

    The tri-cubic extension of :func:`kernels.fused._tile_nag`: ``T`` is a
    list of (rows, LANES) values — one per (chunk, channel) with channel
    index ``chunk * 64 + ch * 8 + corner`` — holding a (td, th, tw)-CELL
    window of a :class:`media.grid3.C1Grid3Medium` in per-cell packed
    form: every cell carries its own 8 corner nodes x 8 Hermite channels
    (corner = dx + 2*dy + 4*dz, channels (f, f_u, f_v, f_uv, f_w, f_uw,
    f_vw, f_uvw)).  ``bix/biy/biz`` are the window's base CELL indices
    (per-block scalars from the SMEM bases table).

    The evaluation IS media/grid3.n_and_grad3's algebra: the w (z) axis
    collapses each xy corner's z-pair via 1-D Hermite, then the shared
    2-D C1 blend (media/c1.c1_blend) finishes — identical expressions,
    so kernel and scan tiers agree to float-accumulation order.  All 64
    floats of the lane's cell are gathered once per step and reused by
    both the value (hw) and derivative (dw) z-collapses.

    ``tw_dyn``/``th_dyn``: per-block window width/height as runtime
    scalars (SMEM bases columns 3/4) so one compiled kernel serves every
    window shape within its gather-chunk class.
    """
    from raytracing_tpu.media.c1 import c1_blend, hermite_dbasis
    from raytracing_tpu.media.hermite import hermite_basis

    (inv_hx, inv_hy, inv_hz) = meta3[3:6]
    locate = _tile_cell_locate3(T, bix, biy, biz, meta3, tw_dyn, th_dyn,
                                td_dyn)

    def nag(x, y, z):
        ux, uy, uz, wblend = locate(x, y, z)
        hw = hermite_basis(uz)
        dw = hermite_dbasis(uz)
        n, gx, gy = c1_blend(wblend(hw), ux, uy, inv_hx, inv_hy)
        gz = c1_blend(wblend(dw), ux, uy, inv_hx, inv_hy)[0] * inv_hz
        return n, gx, gy, gz

    return nag


def _tile_cell_locate3(T, bix, biy, biz, meta3, tw_dyn=None, th_dyn=None,
                       td_dyn=None):
    """Shared cell-locate + 64-float gather for 3-D window evaluators.

    Returns ``locate(x, y, z) -> (ux, uy, uz, wblend)`` where ``wblend``
    is the z-collapse closure of :func:`_tile_nag3`'s docstring: given a
    1-D Hermite basis in uz, it yields the 2-D corner accessor feeding
    media/c1's blends.  One definition serves the kinematic evaluator
    above and the Hessian-grade dynamic one
    (kernels/dynamic3d._tile_nag3_h).
    """
    from raytracing_tpu.media.grid3 import _CH2D

    (x0, y0, z0, inv_hx, inv_hy, inv_hz, nx, ny, nz, td, th, tw) = meta3
    twf = float(tw) if tw_dyn is None else tw_dyn
    thf = float(th) if th_dyn is None else th_dyn
    tdf = float(td) if td_dyn is None else td_dyn
    nchunks = (len(T) + CELL3_CH - 1) // CELL3_CH

    def locate(x, y, z):
        fx = jnp.clip((x - x0) * inv_hx, 0.0, float(nx - 1))
        fy = jnp.clip((y - y0) * inv_hy, 0.0, float(ny - 1))
        fz = jnp.clip((z - z0) * inv_hz, 0.0, float(nz - 1))
        ix = jnp.minimum(jnp.floor(fx), float(nx - 2))
        iy = jnp.minimum(jnp.floor(fy), float(ny - 2))
        iz = jnp.minimum(jnp.floor(fz), float(nz - 2))
        ux = fx - ix
        uy = fy - iy
        uz = fz - iz
        # clamp into the window: rays normally stay inside (the engine
        # replays any segment whose exact in-kernel excess went positive,
        # _window_excess3), but a mid-segment escape must read DEFINED
        # garbage, not index out of the gather range
        lx = jnp.clip(ix - bix, 0.0, twf - 1.0)
        ly = jnp.clip(iy - biy, 0.0, thf - 1.0)
        lz = jnp.clip(iz - biz, 0.0, tdf - 1.0)
        t = ((lz * thf + ly) * twf + lx).astype(jnp.int32)
        if nchunks == 1:
            lane = t

            def fetch(ci):
                return jnp.take_along_axis(T[ci], lane, axis=1)
        else:
            lane = jnp.bitwise_and(t, jnp.int32(LANES - 1))
            chk = jnp.right_shift(t, jnp.int32(7))

            def fetch(ci):
                val = jnp.zeros_like(x)
                for k in range(nchunks):
                    g = jnp.take_along_axis(T[k * CELL3_CH + ci], lane,
                                            axis=1)
                    val = jnp.where(chk == k, g, val)
                return val

        # gather all 64 floats of the lane's cell once; vals[ch][corner]
        vals = [[fetch(ch * 8 + c) for c in range(8)] for ch in range(8)]

        def wblend(basis):
            def corners(ch2d):
                b = _CH2D[ch2d]
                return tuple(
                    (vals[b][k] * basis[0] + vals[b + 4][k] * basis[1]
                     + vals[b][k + 4] * basis[2]
                     + vals[b + 4][k + 4] * basis[3])
                    for k in range(4))
            return corners

        return ux, uy, uz, wblend

    return locate


def _window_excess3(bix, biy, biz, meta3, tw_dyn=None, th_dyn=None,
                    td_dyn=None):
    """Exact per-ray window excess (in cells) for a query position.

    The measurement that replaced the isotropic worst-case-travel margin
    (round 5): the engine places windows by PREDICTED drift (mean
    tangent x travel) and the kernel tracks ``max(exc(pos))`` over every
    step it actually takes — positive means some ray read clamped
    garbage and the engine must replay the segment from its checkpoint
    (engine/tiled3._drive_tiled3).  Exactness makes aggressive
    placement safe without an in-cell curvature bound: violations are
    detected, not bounded a priori.
    """
    (x0, y0, z0, inv_hx, inv_hy, inv_hz, nx, ny, nz, td, th, tw) = meta3
    twf = float(tw) if tw_dyn is None else tw_dyn
    thf = float(th) if th_dyn is None else th_dyn
    tdf = float(td) if td_dyn is None else td_dyn

    def exc(x, y, z):
        fx = jnp.clip((x - x0) * inv_hx, 0.0, float(nx - 1))
        fy = jnp.clip((y - y0) * inv_hy, 0.0, float(ny - 1))
        fz = jnp.clip((z - z0) * inv_hz, 0.0, float(nz - 1))
        lx = jnp.minimum(jnp.floor(fx), float(nx - 2)) - bix
        ly = jnp.minimum(jnp.floor(fy), float(ny - 2)) - biy
        lz = jnp.minimum(jnp.floor(fz), float(nz - 2)) - biz
        ex = jnp.maximum(lx - (twf - 1.0), -lx)
        ey = jnp.maximum(ly - (thf - 1.0), -ly)
        ez = jnp.maximum(lz - (tdf - 1.0), -lz)
        return jnp.maximum(jnp.maximum(ex, ey), ez)

    return exc


def _make_tile_kernel3(op: str, segment: int, box, meta3):
    """Resumable tiled-window 3-D kernel: 12 state refs in, 13 out.

    Refs: ``(tile, bases) + state + (zero, ds)`` -> 12 state out refs
    plus the per-lane max window EXCESS (the exact in-kernel containment
    measurement, :func:`_window_excess3`), with state = (x, y, z, cx,
    cy, cz, ux, uy, uz, tt, dsim, active).  ``ds`` is the (3,) SMEM
    bundle (delta_s, limit, offset); ``bases`` the full (nblocks, 6)
    SMEM table of (bix, biy, biz, tw, th, td) rows, indexed 2-D by
    program id (Mosaic rejects SMEM sub-ref views, CLAUDE.md).
    n/grad re-evaluate from the fresh window at segment start.
    """
    td, th, tw = meta3[9], meta3[10], meta3[11]
    n_ch = (-(-td * th * tw // LANES)) * CELL3_CH

    def kernel(tile_ref, base_ref, *refs):
        in_refs, zero_ref, ds_ref = refs[:12], refs[12], refs[13]
        out_refs = refs[14:]
        rows = in_refs[0].shape[0]
        tv = tile_ref[0]
        # hoist the sublane broadcasts out of the step loop (loop-invariant
        # window; same trick as the 2-D tiled kernel)
        T = [jnp.broadcast_to(tv[i:i + 1, :], (rows, LANES))
             for i in range(n_ch)]
        b = pl.program_id(0)
        nag = _tile_nag3(T, base_ref[b, 0], base_ref[b, 1], base_ref[b, 2],
                         meta3, tw_dyn=base_ref[b, 3],
                         th_dyn=base_ref[b, 4], td_dyn=base_ref[b, 5])
        exc = _window_excess3(base_ref[b, 0], base_ref[b, 1],
                              base_ref[b, 2], meta3,
                              tw_dyn=base_ref[b, 3],
                              th_dyn=base_ref[b, 4],
                              td_dyn=base_ref[b, 5])
        (x, y, z, cx, cy, cz, ux, uy, uz, tt, dsim, active) = [
            r[...] for r in in_refs]
        zero = zero_ref[...]
        ds = ds_ref[0]
        limit = ds_ref[1]
        offset = ds_ref[2]

        inner = _step_body3(op, box, nag, zero, ds, limit, offset=offset)

        def body(i, carry):
            new = inner(i, carry[:-1])
            v = exc(new[0], new[1], new[2])
            return new + (jnp.maximum(carry[-1], v),)

        n, gx, gy, gz = nag(x, y, z)
        carry0 = (x, y, z, cx, cy, cz, ux, uy, uz, n, gx, gy, gz, tt,
                  dsim, active, exc(x, y, z))
        final = jax.lax.fori_loop(0, segment, body, carry0)
        (fx, fy, fz, fcx, fcy, fcz, fux, fuy, fuz, _, _, _, _, ftt,
         fdsim, fact, fviol) = final
        for ref, val in zip(out_refs, (fx, fy, fz, fcx, fcy, fcz,
                                       fux, fuy, fuz, ftt, fdsim, fact,
                                       fviol)):
            ref[...] = val

    return kernel


class Fused3Final(NamedTuple):
    """Final-state bundle of a fused 3-D kernel run (arrays length R)."""

    pos: Any          # (R, 3)
    tangent: Any      # (R, 3) unit tangent at exit
    traveltime: Any   # (R,)
    dist_sim: Any     # (R,)
    active: Any       # (R,) bool


@functools.partial(jax.jit, static_argnames=("field", "op", "steps", "box",
                                             "block_rays", "interpret"))
def fused3d_trace_final(pos0, dir0, delta_s, *, field: str, op: str,
                        steps: int, box, block_rays: int = 4096,
                        interpret: bool = False,
                        step_limit=None) -> Fused3Final:
    """Run ``steps`` fused 3-D integration steps; return a Fused3Final.

    Same contract as :func:`kernels.fused.fused_trace_final` with a 3-D
    launch (``dir0`` (R, 3), normalized internally) and a 6-face ``box``.
    """
    if field not in FUSED3_FIELDS:
        raise ValueError(f"fused 3-D kernel supports fields "
                         f"{FUSED3_FIELDS}, got {field!r}")
    if op not in FUSED3_OPS:
        raise ValueError(f"fused 3-D kernel supports ops {FUSED3_OPS}, "
                         f"got {op!r}")
    if len(box) != 6:
        raise ValueError(f"box must be 6 floats, got {box!r}")
    r = pos0.shape[0]
    if r % block_rays:
        raise ValueError(f"rays {r} not a multiple of block {block_rays}")
    rows = block_rays // LANES
    shape2 = (r // LANES, LANES)
    dir0 = jnp.asarray(dir0, jnp.float32)
    dir0 = dir0 / jnp.linalg.norm(dir0, axis=-1, keepdims=True)
    pos0 = jnp.asarray(pos0, jnp.float32)
    planes = [pos0[:, k].reshape(shape2) for k in range(3)]
    tangents = [dir0[:, k].reshape(shape2) for k in range(3)]
    if step_limit is None:
        step_limit = steps
    ds = jnp.stack([jnp.asarray(delta_s, jnp.float32),
                    jnp.asarray(step_limit, jnp.float32)])

    kernel = _make_kernel3(field, op, steps, tuple(float(v) for v in box))
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(r // block_rays,),
        in_specs=[blk] * 7 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[blk] * 9,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * 9,
        cost_estimate=pl.CostEstimate(flops=120 * r * steps,
                                      bytes_accessed=16 * 4 * r,
                                      transcendentals=2 * r * steps),
        interpret=interpret,
    )(*planes, *tangents, jnp.zeros(shape2, jnp.float32), ds)
    fx, fy, fz, fux, fuy, fuz, tt, dsim, act = outs
    return Fused3Final(
        pos=jnp.stack([fx.reshape(-1), fy.reshape(-1), fz.reshape(-1)], -1),
        tangent=jnp.stack([fux.reshape(-1), fuy.reshape(-1),
                           fuz.reshape(-1)], -1),
        traveltime=tt.reshape(-1), dist_sim=dsim.reshape(-1),
        active=act.reshape(-1) > 0.5)
