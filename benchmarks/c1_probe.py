"""Measure the C1 (16-float-cell) media against the parity (36-float) form.

The consistent-gradient media (media/c1.py) cut the tiled 2-D window
kernel's per-step gather count from 36 to 16 and the refresh bytes to 4/9,
and the 1-D stratified kernels from 6 to 4 channels.  This probe times the
same trace through both forms at the two calibrated regimes
(precision divisor 4587, coarse 303 — RT_bench.py:1431-1450) plus the
stratified vert configuration.

    python benchmarks/c1_probe.py [--rays N]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.engine.fast import _as_hermite
from raytracing_tpu.engine.segmented import grid_trace_tiled
from raytracing_tpu.kernels.fused import fused_trace_final_strat
from raytracing_tpu.media.c1 import (build_c1_medium, build_c1_stratified,
                                     compact_c1_stratified)
from raytracing_tpu.media.spline import (build_grid_medium,
                                         build_stratified_medium,
                                         compact_stratified)


def _bench(fn, label, work):
    t0 = time.time()
    res = fn()
    np.asarray(res.pos[:1])
    cold = time.time() - t0
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        res = fn()
        np.asarray(res.pos[:1])
        best = min(best, time.time() - t0)
    print(json.dumps({"config": label, "cold_s": round(cold, 2),
                      "warm_s": round(best, 3),
                      "gsteps_per_sec": round(work / best / 1e9, 3)}),
          flush=True)
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    args = ap.parse_args(argv)
    r = args.rays

    scen = rt.scenario("fisheye")
    hm = _as_hermite(build_grid_medium("fisheye", scen.box,
                                       dtype=np.float32))
    c1 = build_c1_medium("fisheye", scen.box, dtype=np.float32)
    theta0 = jax.device_put(
        (np.pi / 2 + np.linspace(-0.02, 0.02, r)).astype(np.float32))
    pos0 = jax.device_put(np.tile(np.array([1.0, 0.0], np.float32), (r, 1)))

    for div in (4587, 303):
        ds = np.float32(2 * np.pi / div)
        steps = div
        for tag, med in (("parity-36", hm), ("c1-16", c1)):
            _bench(lambda med=med: grid_trace_tiled(
                "op1" if div == 4587 else "op6", pos0, theta0, ds, med,
                steps=steps, box=tuple(scen.box), block_rays=1024),
                f"grid div={div} {tag}", r * steps)

    vs = rt.scenario("vert")
    vm = compact_stratified(
        build_stratified_medium("vert_heterogeneous", vs.box,
                                dtype=np.float32),
        y_range=(vs.box[2] - 0.05, vs.box[3] + 0.05))
    vc1 = compact_c1_stratified(
        build_c1_stratified("vert_heterogeneous", vs.box, dtype=np.float32),
        y_range=(vs.box[2] - 0.05, vs.box[3] + 0.05))
    vpos = jax.device_put(np.tile(vs.pos0[:1].astype(np.float32), (r, 1)))
    vth = jax.device_put(np.resize(np.asarray(vs.theta0, np.float32), r))
    ds = np.float32(rt.SIGMA / 2.74)
    steps = 2000
    for tag, med in (("parity-6ch", vm), ("c1-4ch", vc1)):
        _bench(lambda med=med: fused_trace_final_strat(
            vpos, vth, ds, med, op="op8", steps=steps, box=tuple(vs.box)),
            f"strat vert {tag}", r * steps)


if __name__ == "__main__":
    main()
