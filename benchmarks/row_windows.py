"""Measure per-row vs per-block windows on the 2-D grid tier (TPU).

VERDICT r2 #3: close the coarse-divisor gap.  Row windows give a kernel
block rows x 128 cells of coverage at single-chunk gather cost; this
script times 1M rays through grid_trace_tiled in both modes at the
precision divisor (4587) and the reference's coarse calibrated divisor
(303, RT_bench.py:1431-1450).

    python benchmarks/row_windows.py [--rays N] [--divisors 4587,303]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.engine.fast import _as_hermite
from raytracing_tpu.engine.segmented import grid_trace_tiled
from raytracing_tpu.media.spline import build_grid_medium


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--divisors", default="4587,303")
    ap.add_argument("--op", default="op6")
    ap.add_argument("--modes", default="rows,blocks")
    args = ap.parse_args(argv)

    scen = rt.scenario("fisheye")
    hm = _as_hermite(build_grid_medium("fisheye", scen.box, dtype=np.float32))
    r = args.rays
    # device_put ONCE: numpy inputs re-upload ~12 MB through the tunnel on
    # every call, a ~0.5-0.8 s fixed cost that polluted every earlier
    # grid-tier number from this script (found via a steps-sweep whose
    # time barely depended on steps)
    theta0 = jax.device_put(
        (np.pi / 2 + np.linspace(-0.02, 0.02, r)).astype(np.float32))
    pos0 = jax.device_put(np.tile(np.array([1.0, 0.0], np.float32), (r, 1)))

    for div in [int(d) for d in args.divisors.split(",")]:
        ds = 2 * np.pi / div
        steps = div  # one turn
        for mode in args.modes.split(","):
            row = mode == "rows"
            t0 = time.time()
            res = grid_trace_tiled(args.op, pos0, theta0, np.float32(ds), hm,
                                   steps=steps, box=tuple(scen.box),
                                   block_rays=1024, row_windows=row)
            np.asarray(res.pos[:1])     # honest completion barrier
            cold = time.time() - t0
            t0 = time.time()
            res = grid_trace_tiled(args.op, pos0, theta0, np.float32(ds), hm,
                                   steps=steps, box=tuple(scen.box),
                                   block_rays=1024, row_windows=row)
            np.asarray(res.pos[:1])
            warm = time.time() - t0
            rate = r * steps / warm / 1e9
            print(f"div={div:5d} mode={mode:6s} warm={warm:7.3f}s "
                  f"cold={cold:6.1f}s rate={rate:6.2f} G ray-steps/s "
                  f"active={float(np.mean(np.asarray(res.active))):.3f}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
