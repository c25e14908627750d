"""Fused fisheye op1 integrator as a Pallas TPU kernel.

The jnp ``lax.scan`` engine is HBM-bound: every step round-trips the full ray
state (~60 MB at 1M rays) through HBM, capping throughput near
bandwidth/state-size (~1.5 G ray-steps/s measured).  This kernel blocks the
ray batch into VMEM-resident tiles and runs *all* integration steps on a tile
before touching HBM again — state traffic collapses from
O(rays * steps) to O(rays), leaving the VPU as the limit.

Math: op1 (RT_bench.py:469-491) specialized to the analytic Maxwell fisheye —
first-order position advance + the analytic momentum-impulse angle update
(RT_bench.py:393-407) expressed trig-free: instead of
``theta = atan2(sy, sx); u = (cos theta, sin theta)`` the unit tangent is the
normalization ``(sx, sy) * rsqrt(sx^2 + sy^2)`` — identical up to rounding,
no transcendentals in the hot loop.  Positions accumulate with Kahan
compensation so float32 holds to ~1e-7 over thousands of steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # one (8, 128) f32 register tile of rays


def _fisheye_kernel(steps: int, x_ref, y_ref, ux_ref, uy_ref, ds_ref,
                    out_x_ref, out_y_ref, out_tt_ref):
    ds = ds_ref[0]
    x = x_ref[...]
    y = y_ref[...]
    ux = ux_ref[...]
    uy = uy_ref[...]
    # Kahan compensation terms for the position sums.
    cx = jnp.zeros_like(x)
    cy = jnp.zeros_like(y)

    def n_and_grad(x, y):
        n = 1.0 / (1.0 + x * x + y * y)
        c = -2.0 * n * n
        return n, c * x, c * y

    n, gx, gy = n_and_grad(x, y)
    tt = jnp.zeros_like(x)

    def body(_, carry):
        x, y, cx, cy, ux, uy, n, gx, gy, tt = carry
        # first_order_taylor with Kahan-compensated accumulation
        dx = ux * ds - cx
        nx = x + dx
        cx = (nx - x) - dx
        x = nx
        dy = uy * ds - cy
        ny = y + dy
        cy = (ny - y) - dy
        y = ny

        n2, gx2, gy2 = n_and_grad(x, y)
        # theta_cost_t, trig-free: new tangent = normalized momentum+impulse
        half = ds * 0.5
        sx = n * ux + (gx + gx2) * half
        sy = n * uy + (gy + gy2) * half
        inv = jax.lax.rsqrt(sx * sx + sy * sy)
        ux = sx * inv
        uy = sy * inv
        # optical path: dist == ds for a first-order step (|u| == 1)
        tt = tt + ds * (n + n2) * 0.5
        return x, y, cx, cy, ux, uy, n2, gx2, gy2, tt

    x, y, cx, cy, ux, uy, n, gx, gy, tt = jax.lax.fori_loop(
        0, steps, body, (x, y, cx, cy, ux, uy, n, gx, gy, tt))
    out_x_ref[...] = x
    out_y_ref[...] = y
    out_tt_ref[...] = tt


@functools.partial(jax.jit, static_argnames=("steps", "block_rays", "interpret"))
def fisheye_trace_final(pos0, theta0, delta_s, *, steps: int,
                        block_rays: int = 4096, interpret: bool = False):
    """Integrate ``steps`` op1 fisheye steps; return final (pos, traveltime).

    ``pos0`` is (R, 2) float32, ``theta0`` (R,); R must be a multiple of
    ``block_rays`` (pad the batch — rays are independent).
    """
    r = pos0.shape[0]
    if r % block_rays:
        raise ValueError(f"rays {r} not a multiple of block {block_rays}")
    rows = block_rays // LANES
    shape2 = (r // LANES, LANES)
    x = pos0[:, 0].reshape(shape2)
    y = pos0[:, 1].reshape(shape2)
    ux = jnp.cos(theta0).reshape(shape2)
    uy = jnp.sin(theta0).reshape(shape2)
    ds = jnp.asarray([delta_s], jnp.float32)

    grid = (r // block_rays,)
    blk = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    fx, fy, tt = pl.pallas_call(
        functools.partial(_fisheye_kernel, steps),
        grid=grid,
        in_specs=[blk, blk, blk, blk, scalar],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=35 * r * steps, bytes_accessed=11 * 4 * r,
            transcendentals=2 * r * steps),
        interpret=interpret,
    )(x, y, ux, uy, ds)
    pos = jnp.stack([fx.reshape(-1), fy.reshape(-1)], axis=-1)
    return pos, tt.reshape(-1)


def make_fisheye_runner(rays: int, divisor: int, n_turns: int,
                        block_rays: int = 4096):
    """bench.py adapter: returns a callable that runs and blocks, returning
    the final positions as a (R, 2) array (reference step-count semantics:
    steps = n_turns * (divisor + 1) - 1, RT_bench.py:797, 1388)."""
    steps = n_turns * (divisor + 1) - 1
    pad = (-rays) % block_rays
    n = rays + pad
    # Commit the launch batch to the device once: re-uploading 8 MB through
    # the tunnel every run would dominate the measurement.
    pos0 = jax.device_put(
        np.stack([np.ones(n), np.zeros(n)], -1).astype(np.float32))
    theta0 = jax.device_put(np.full(n, np.pi / 2.0, np.float32))
    ds = np.float32(2.0 * np.pi / divisor)

    def run(pipeline: int = 1):
        """One barrier over ``pipeline`` back-to-back launches.

        pipeline=1 is the single-shot protocol: every run pays one full
        tunnel round-trip (~38 ms dispatch+sync measured on the axon
        tunnel — latency a directly-attached host does not have).
        pipeline>1 queues the launches and takes ONE completion barrier;
        all work still finishes before the clock stops, so time/pipeline
        is the honest SUSTAINED per-launch cost (the production serving
        shape: keep the device fed).
        """
        pos = None
        for _ in range(pipeline):
            pos, _ = fisheye_trace_final(pos0, theta0, ds, steps=steps,
                                         block_rays=block_rays)
        np.asarray(pos[:1])  # honest completion barrier through the tunnel
        return pos[:rays]

    return run
