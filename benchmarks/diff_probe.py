"""Measure differentiable-trace throughput (forward + gradient) on TPU.

The diff tier (engine/diff.py) is plain stacked XLA — no Pallas — so its
value is capability (inverse problems), not peak speed; this probe pins
what a gradient step actually costs at scale: a fisheye fan of R rays,
`steps` integration steps, loss = mean squared closure miss, and
jax.value_and_grad w.r.t. the 144-node parametric grid (the tomography
configuration at benchmark ray counts).

    python benchmarks/diff_probe.py [--rays 262144] [--steps 300]
                                    [--remat 4]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import raytracing_tpu as rt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--remat", type=int, default=4)
    ap.add_argument("--ng", type=int, default=12)
    args = ap.parse_args(argv)
    r, steps, ng = args.rays, args.steps, args.ng

    h = 2.0 / (ng - 1)
    X, Y = np.meshgrid(np.linspace(-1, 1, ng), np.linspace(-1, 1, ng))
    grid0 = jnp.asarray(1.0 / (1.0 + X * X + Y * Y), jnp.float32)
    theta0 = jax.device_put(
        (np.pi / 2 + np.linspace(-0.02, 0.02, r)).astype(np.float32))
    pos0 = jax.device_put(
        np.tile(np.array([[0.6, 0.0]], np.float32), (r, 1)))
    ds = jnp.float32(2 * np.pi / steps)

    def loss(grid):
        med = rt.parametric_grid_medium(grid, -1.0, -1.0, h, h)
        pos, *_ = rt.trace_diff("op6", med, pos0, theta0, ds, steps=steps,
                                remat_segments=args.remat)
        return jnp.mean(jnp.sum((pos - pos0) ** 2, axis=-1))

    fwd = jax.jit(loss)
    vgrad = jax.jit(jax.value_and_grad(loss))

    def barrier(out):
        # honest completion through the tunnel: a device->host readback,
        # not block_until_ready, which can return early (CLAUDE.md)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    for tag, fn in (("forward", lambda: fwd(grid0)),
                    ("value_and_grad", lambda: vgrad(grid0))):
        t0 = time.time()
        barrier(fn())
        cold = time.time() - t0
        t0 = time.time()
        barrier(fn())
        warm = time.time() - t0
        g = r * steps / warm / 1e9
        print(json.dumps({"config": tag, "rays": r, "steps": steps,
                          "remat": args.remat, "cold_s": round(cold, 2),
                          "warm_s": round(warm, 4),
                          "gsteps_per_sec": round(g, 3)}), flush=True)


if __name__ == "__main__":
    main()
