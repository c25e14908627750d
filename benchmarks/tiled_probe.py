"""TPU probe for the tiled 2-D grid kernel: compile small, then scale.

Stage 1 compiles the segment kernel at tiny shapes (bounded Mosaic DAG);
stage 2 times the 1M-ray fisheye GridMedium trace at the precision divisor
(the configuration the supercell path ran at 0.06 G) and at the coarse
op6 divisor 303 (which the supercell path cannot serve at all).

Run: python benchmarks/tiled_probe.py [--stage 1|2|all]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.engine.segmented import grid_trace_tiled
from raytracing_tpu.media.hermite import build_hermite_medium
from raytracing_tpu.media.spline import build_grid_medium


def fan(r, spread=0.02):
    theta = (np.pi / 2 + np.linspace(-spread, spread, r)).astype(np.float32)
    pos = np.tile(np.array([1.0, 0.0], np.float32), (r, 1))
    return pos, theta


def run(r, steps, ds, hm, box, block_rays=1024, label="", reps=1):
    pos, theta = fan(r)
    t0 = time.perf_counter()
    res = grid_trace_tiled("op6", pos, theta, np.float32(ds), hm,
                           steps=steps, box=box, block_rays=block_rays)
    np.asarray(res.pos[:8])          # honest readback barrier
    t1 = time.perf_counter()
    best = t1 - t0
    for _ in range(reps - 1):
        t0 = time.perf_counter()
        res = grid_trace_tiled("op6", pos, theta, np.float32(ds), hm,
                               steps=steps, box=box, block_rays=block_rays)
        np.asarray(res.pos[:8])
        best = min(best, time.perf_counter() - t0)
    err = np.linalg.norm(np.asarray(res.pos) - [1, 0], axis=1)
    print(f"[{label}] {r} rays x {steps} steps: {best:.3f} s "
          f"({r * steps / best / 1e9:.3f} Gsteps/s), "
          f"closure mean {err.mean():.2e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all")
    args = ap.parse_args()

    print("device:", jax.devices()[0], flush=True)
    scen = rt.scenario("fisheye")
    gm = build_grid_medium("fisheye", scen.box, dtype=np.float32)
    hm = build_hermite_medium(gm, dtype=np.float32)
    box = tuple(scen.box)

    if args.stage in ("1", "all"):
        # small compile probe: one tile variant, short trip count
        run(4096, 128, 2 * np.pi / 4587, hm, box, label="probe-fine")
        run(4096, 64, 2 * np.pi / 303, hm, box, label="probe-coarse")
    if args.stage in ("2", "all"):
        r = 1 << 20
        run(r, 4586, 2 * np.pi / 4587, hm, box, label="1M-fine", reps=2)
        run(r, 302, 2 * np.pi / 303, hm, box, label="1M-coarse", reps=2)


if __name__ == "__main__":
    main()
