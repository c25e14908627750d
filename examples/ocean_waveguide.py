"""A measured sound-speed profile end-to-end: the SOFAR-channel waveguide.

The reference can only trace the four index fields hard-coded in its
source (RT_bench.py:104-116).  This example is the workload a lab
actually has: a 1-D sound-speed-vs-depth profile measured at discrete
depths (a Munk-style SOFAR channel — a sound-speed MINIMUM that traps
rays into cycling paths).  One array of samples drives the whole stack:

* ``rt.c1_stratified_from_samples``      — conservation-grade profile
  medium (4 floats/cell on the kernel tier),
* ``fast_trace``                         — the fused stratified kernels,
* the momentum oracle — for an x-independent medium p_x = n cos(theta)
  is an exact invariant, so CV(p_x) measures integration truth,
* ``rt.parametric_profile_medium``       — the same profile as TRACED
  parameters: one jax.grad gives the 1-D tomography adjoint.

Run:  python examples/ocean_waveguide.py [rays] [steps]
"""
import sys
import time

import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.engine.fast import fast_trace

rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

# -- the "measurement": sound speed c(z), Munk-like, n = c0 / c -----------
# depth axis y in km, 0 = surface, -3 = bottom; channel axis at -1 km
depth = np.linspace(-3.0, 0.0, 121)
eta = 2.0 * (depth + 1.0)                 # scaled distance from the axis
c = 1.49 * (1.0 + 0.0057 * (eta - 1.0 + np.exp(-eta)))   # km/s
n_samples = c.min() / c                   # slowness, normalized to max 1

medium = rt.c1_stratified_from_samples(n_samples, depth)

# -- a source on the channel axis, fan of launch angles -------------------
box = (-1e6, 1e6, -3.0, 0.0)              # the waveguide never ends in x
scen_box = box
ds = np.float32(0.002)                    # 2 m arc steps
theta0 = np.linspace(-0.12, 0.12, rays).astype(np.float32)   # +-7 degrees
pos0 = np.stack([np.zeros(rays, np.float32),
                 np.full(rays, -1.0, np.float32)], -1)

import dataclasses

scen = dataclasses.replace(rt.scenario("vert"), name="sofar", gamma=1.0,
                           box=scen_box)

out = fast_trace("op6", scen, medium, delta_s=ds, pos0=pos0, theta0=theta0,
                 steps=steps)
np.asarray(out.pos[:1])
t0 = time.perf_counter()
out = fast_trace("op6", scen, medium, delta_s=ds, pos0=pos0, theta0=theta0,
                 steps=steps)
np.asarray(out.pos[:1])
dt = time.perf_counter() - t0
pos = np.asarray(out.pos)
print(f"{rays} rays x {steps} steps [{out.engine}]: "
      f"{rays * steps / dt / 1e9:.2f} G ray-steps/s")
trapped = " — trapped in the channel" if pos[:, 1].min() > -2.9 else ""
print(f"range reached: {pos[:, 0].mean():.3f} km mean "
      f"(max {pos[:, 0].max():.3f}); depth spread "
      f"[{pos[:, 1].min():+.3f}, {pos[:, 1].max():+.3f}] km{trapped}")

# -- physics: p_x is exact in a stratified medium — full-batch CV from
# the kernels' Welford tracker (fast_trace(stats=True)) --------------------
st = fast_trace("op6", scen, medium, delta_s=ds, pos0=pos0, theta0=theta0,
                steps=steps, stats=True)
from raytracing_tpu.engine.oracles import (momentum_cv_pct_from_welford,
                                           momentum_cv_summary)

cv_mean, cv_max, _ = momentum_cv_summary(
    momentum_cv_pct_from_welford(st.mom_count, st.mom_mean, st.mom_m2))
print(f"momentum conservation CV(p_x), full {rays}-ray batch: "
      f"mean {cv_mean:.2e} % / max {cv_max:.2e} %")

# -- inversion teaser: the adjoint w.r.t. the measured samples -------------
import jax
import jax.numpy as jnp

hy = float(depth[1] - depth[0])


inv_sel = slice(None, None, max(1, rays // 8))


def loss(profile):
    m = rt.parametric_profile_medium(profile, float(depth[0]), hy)
    p, *_ = rt.trace_diff("op6", m, pos0[inv_sel], theta0[inv_sel],
                          jnp.float32(0.01), steps=200, box=box)
    return jnp.sum(p[:, 1] ** 2)         # e.g. fit observed depths

g = jax.grad(loss)(jnp.asarray(n_samples, jnp.float32))
nz = int(np.sum(np.abs(np.asarray(g)) > 0))
print(f"tomography adjoint: d(loss)/d(samples) touches {nz}/{len(depth)} "
      "depth samples (one jax.grad through the integrator)")
