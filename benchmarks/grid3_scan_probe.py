"""On-chip scan-tier rates through a SAMPLED grid3 medium.

The kernel_matrix rows for the 3-D tiled families (tiled3_grid_op6,
dyn3_tiled_op6) need an honest same-medium baseline: the ~1 G "trace3d"
number in tier_probe_3d.py is the ANALYTIC fisheye (closed-form n/grad,
no gathers).  The production path for measured media is the scan tier
doing 8-corner x 8-channel table gathers per step — this probe measures
exactly that, for both the kinematic scan (trace3d) and the dynamic
exact-jvp scan (trace_dynamic3), on the same 71^3-node medium the
kernel_matrix tiled rows use.

HAZARD CONTAINMENT (CLAUDE.md): scan+gather-over-large-table programs
with many steps have wedged the remote compile helper for hours.  Trip
counts here are BOUNDED (24 steps); the per-step rate is what the
comparison needs and launch overhead is amortized by the 1M-ray batch.
Run through the checkpointed queue, in the background, unkilled.

    python benchmarks/grid3_scan_probe.py [rays] [steps]
"""
import json
import sys
import time

import numpy as np

import jax

import raytracing_tpu as rt
from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 24
BOX3 = (-1.5, 1.5, -1.5, 1.5, -1.5, 1.5)


def _time(fn):
    out = fn()                      # compile + warm
    np.asarray(jax.tree.leaves(out)[0][:1])
    t0 = time.perf_counter()
    out = fn()
    np.asarray(jax.tree.leaves(out)[0][:1])
    return time.perf_counter() - t0


def main():
    ax3 = np.arange(-1.75, 1.7501, 0.05)      # 71^3 nodes, kernel_matrix's
    X3, Y3, Z3 = np.meshgrid(ax3, ax3, ax3, indexing="ij")
    med3 = rt.c1_medium3_from_samples(
        1.0 / (1.0 + X3 ** 2 + Y3 ** 2 + Z3 ** 2), ax3, ax3, ax3,
        dtype=np.float32)
    ds = np.float32(2 * np.pi / 600)
    tilt = np.linspace(0, 0.05, rays).astype(np.float32)
    pos3 = jax.device_put(
        np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (rays, 1)))
    dir3 = jax.device_put(np.stack([np.zeros(rays, np.float32),
                                    np.cos(tilt), np.sin(tilt)],
                                   -1).astype(np.float32))

    dt = _time(lambda: rt.trace3d("op6", med3, pos0=pos3, dir0=dir3,
                                  delta_s=float(ds), steps=steps,
                                  box=BOX3, mode="metrics",
                                  dtype=np.float32))
    print(json.dumps({"tier": "scan3d-grid3-op6", "rays": rays,
                      "steps": steps, "seconds": round(dt, 4),
                      "gsteps_per_sec": round(rays * steps / dt / 1e9,
                                              3)}), flush=True)

    r3 = rays if rays <= 4096 else max(4096, rays // 4)
    dt = _time(lambda: rt.trace_dynamic3(
        "op6", med3, pos0=pos3[:r3], dir0=dir3[:r3], delta_s=float(ds),
        steps=steps, box=BOX3, mode="metrics", dtype=np.float32))
    print(json.dumps({"tier": "dynamic3d-grid3-op6", "rays": r3,
                      "steps": steps, "seconds": round(dt, 4),
                      "gsteps_per_sec": round(r3 * steps / dt / 1e9,
                                              3)}), flush=True)


if __name__ == "__main__":
    main()
