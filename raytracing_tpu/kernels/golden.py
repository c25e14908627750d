"""Fused golden-section step kernels: op5/op9 (isotropic) and op10/op11
(anisotropic momentum — the v0.3.0 method, SURVEY.md §7.6's centerpiece).

Each integration step runs a complete branchless golden-section minimization
of the momentum-impulse cost (RT_bench.py:573-600, 676-764) *inside* the
Pallas kernel: bracket state lives in registers, one cost evaluation per
iteration (16 at float32 tolerance), everything on the VPU.  The reference
pays ~70 scipy-free Python cost evaluations per ray per step on a CPU; here
a million rays step together.

The isotropic cost is exactly the gamma=1 limit of the anisotropic momentum
cost (moments reduce to n*(cos t, sin t)), so op5/op9 are op10/op11 with
gamma=1 — one kernel family, four ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tpu.config import DELTA_G, GOLD_RATIO, gold_tol, golden_iters
from raytracing_tpu.kernels.fused import LANES, _field_fn

GOLDEN_OPS = {"op5": ("curv", "golden"), "op9": ("t2", "golden"),
              "op10": ("curv", "golden"), "op11": ("t2", "golden"),
              "op10n": ("curv", "newton"), "op11n": ("t2", "newton")}


def _make_kernel(field: str, op: str, steps: int, box, gold_iters_n: int,
                 curv_tol: float):
    nag = _field_fn(field)
    stepper, solver = GOLDEN_OPS[op]
    limx_i, limx_s, limy_i, limy_s = [float(v) for v in box]
    r = GOLD_RATIO

    def kernel(x_ref, y_ref, ang_ref, zero_ref, scal_ref,
               out_x_ref, out_y_ref, out_ang_ref, out_tt_ref, out_ds_ref,
               out_act_ref):
        ds = scal_ref[0]
        gamma = scal_ref[1]
        g2m1 = gamma * gamma - 1.0
        x, y = x_ref[...], y_ref[...]
        ang = ang_ref[...]
        zero = zero_ref[...]
        ux, uy = jnp.cos(ang), jnp.sin(ang)
        n, gx, gy = nag(x, y)
        cx = zero
        cy = zero
        tt = zero
        dsim = zero
        active = zero + 1.0

        def coef_of(ct, st):
            return jnp.sqrt((gamma * st) ** 2 + ct * ct)

        def body(_, carry):
            x, y, cx, cy, ang, ux, uy, n, gx, gy, tt, dsim, active = carry
            # ---- position advance -------------------------------------
            gdotu = gx * ux + gy * uy
            txx = gx - gdotu * ux      # transverse gradient
            txy = gy - gdotu * uy
            if stepper == "t2":
                half_fac = ds * ds * 0.5 / n
                ddx = ux * ds + txx * half_fac
                ddy = uy * ds + txy * half_fac
                significant = zero < 1.0   # always update the angle
            else:  # curvature arc step (RT_bench.py:335-365)
                curv = jnp.sqrt(txx * txx + txy * txy) / n
                significant = curv >= curv_tol
                safe = jnp.where(significant, curv, 1.0)
                d = curv * ds
                sgn = jnp.where(gx * uy - gy * ux > 0, -1.0, 1.0)
                half = sgn * d * 0.5
                sh, ch = jnp.sin(half), jnp.cos(half)
                coefc = 2.0 * sh * sgn / safe
                # cos(ang+half), sin(ang+half) by rotation of (ux, uy)
                arc_dx = (ux * ch - uy * sh) * coefc
                arc_dy = (ux * sh + uy * ch) * coefc
                ddx = jnp.where(significant, arc_dx, ux * ds)
                ddy = jnp.where(significant, arc_dy, uy * ds)
            dxx = ddx - cx
            nx2 = x + dxx
            cx2 = (nx2 - x) - dxx
            dyy = ddy - cy
            ny2 = y + dyy
            cy2 = (ny2 - y) - dyy

            n2, gx2, gy2 = nag(nx2, ny2)

            # ---- golden search on the momentum cost -------------------
            coef_i = coef_of(ux, uy)
            mi_x = n * coef_i * ux * (1.0 - uy * uy * g2m1 / (coef_i * coef_i))
            mi_y = n * coef_i * uy * (1.0 + ux * ux * g2m1 / (coef_i * coef_i))
            jx_i = coef_i * gx
            jy_i = coef_i * gy
            half_ds = ds * 0.5

            def cost(t):
                ct, st = jnp.cos(t), jnp.sin(t)
                cf = coef_of(ct, st)
                mf_x = n2 * cf * ct * (1.0 - st * st * g2m1 / (cf * cf))
                mf_y = n2 * cf * st * (1.0 + ct * ct * g2m1 / (cf * cf))
                rx = mf_x - mi_x - (jx_i + cf * gx2) * half_ds
                ry = mf_y - mi_y - (jy_i + cf * gy2) * half_ds
                return rx * rx + ry * ry

            if solver == "newton":
                # Newton on d(cost)/dt via nested forward-mode jvp
                # (ops/newton.py): quadratic convergence from the O(ds) seed.
                def dcost(t):
                    return jax.jvp(cost, (t,), (jnp.ones_like(t),))[1]

                t_new = ang
                for _ in range(3):
                    d1, d2 = jax.jvp(dcost, (t_new,),
                                     (jnp.ones_like(t_new),))
                    safe = jnp.where(jnp.abs(d2) < 1e-12, 1e-12, jnp.abs(d2))
                    t_new = t_new - jnp.clip(d1 / safe, -0.3, 0.3)
            else:
                a = ang - DELTA_G
                b = ang + DELTA_G
                c = b - (b - a) * r
                d = a + (b - a) * r
                fc = cost(c)
                fd = cost(d)

                def gold_body(_, g):
                    a, b, c, d, fc, fd = g
                    left = fc < fd
                    a2 = jnp.where(left, a, c)
                    b2 = jnp.where(left, d, b)
                    c2 = b2 - (b2 - a2) * r
                    d2 = a2 + (b2 - a2) * r
                    fresh = jnp.where(left, c2, d2)
                    ff = cost(fresh)
                    fc2 = jnp.where(left, ff, fd)
                    fd2 = jnp.where(left, fc, ff)
                    return a2, b2, c2, d2, fc2, fd2

                a, b, c, d, fc, fd = jax.lax.fori_loop(
                    0, gold_iters_n, gold_body, (a, b, c, d, fc, fd))
                t_new = (a + b) * 0.5
            nang = jnp.where(significant, t_new, ang)
            nux, nuy = jnp.cos(nang), jnp.sin(nang)

            dist = jnp.sqrt(ddx * ddx + ddy * ddy)
            cf_new = coef_of(nux, nuy)
            ntt = tt + dist * (coef_i * n + cf_new * n2) * 0.5
            ndsim = dsim + dist

            out = ((nx2 > limx_s) | (nx2 < limx_i)
                   | (ny2 > limy_s) | (ny2 < limy_i))
            keep = active > 0.5

            def sel(new, old):
                return jnp.where(keep, new, old)

            # gated on `keep` so a frozen ray's phantom step can't exit it
            nactive = jnp.where(keep & out, zero, active)
            return (sel(nx2, x), sel(ny2, y), sel(cx2, cx), sel(cy2, cy),
                    sel(nang, ang), sel(nux, ux), sel(nuy, uy), sel(n2, n),
                    sel(gx2, gx), sel(gy2, gy), sel(ntt, tt),
                    sel(ndsim, dsim), nactive)

        x, y, cx, cy, ang, ux, uy, n, gx, gy, tt, dsim, active = (
            jax.lax.fori_loop(0, steps, body,
                              (x, y, cx, cy, ang, ux, uy, n, gx, gy, tt,
                               dsim, active)))
        out_x_ref[...] = x
        out_y_ref[...] = y
        out_ang_ref[...] = ang
        out_tt_ref[...] = tt
        out_ds_ref[...] = dsim
        out_act_ref[...] = active

    return kernel


@functools.partial(jax.jit, static_argnames=("field", "op", "steps", "box",
                                             "block_rays", "interpret"))
def golden_trace_final(pos0, theta0, delta_s, gamma, *, field: str, op: str,
                       steps: int, box, block_rays: int = 4096,
                       interpret: bool = False):
    """Run ``steps`` fused golden-section integration steps.

    Returns (pos, angle, traveltime, dist_sim, active_mask).  ``gamma`` is
    the anisotropy ratio (ignored-by-math when 1.0, i.e. op5/op9).
    """
    if op not in GOLDEN_OPS:
        raise ValueError(f"golden kernel supports {tuple(GOLDEN_OPS)}, got {op!r}")
    r = pos0.shape[0]
    if r % block_rays:
        raise ValueError(f"rays {r} not a multiple of block {block_rays}")
    rows = block_rays // LANES
    shape2 = (r // LANES, LANES)
    x = pos0[:, 0].reshape(shape2)
    y = pos0[:, 1].reshape(shape2)
    ang = theta0.reshape(shape2).astype(jnp.float32)
    zero = jnp.zeros(shape2, jnp.float32)
    scal = jnp.asarray([delta_s, gamma], jnp.float32)

    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    iters = golden_iters(np.float32)
    tol = gold_tol(np.float32)
    fx, fy, fang, tt, dsim, act = pl.pallas_call(
        _make_kernel(field, op, steps, tuple(box), iters, tol),
        grid=(r // block_rays,),
        in_specs=[blk, blk, blk, blk,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[blk] * 6,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * 6,
        cost_estimate=pl.CostEstimate(
            flops=(120 + 45 * iters) * r * steps, bytes_accessed=14 * 4 * r,
            transcendentals=(6 + 3 * iters) * r * steps),
        interpret=interpret,
    )(x, y, ang, zero, scal)
    pos = jnp.stack([fx.reshape(-1), fy.reshape(-1)], axis=-1)
    return pos, fang.reshape(-1), tt.reshape(-1), dsim.reshape(-1), act.reshape(-1) > 0.5
