"""On-chip probe of the tiled-window DYNAMIC kernel (2-D grid tables).

First real-Mosaic compile + throughput + parity of
engine/segmented.grid_trace_dynamic_tiled: the paraxial tangents with
compensated carries running inside the tiled-window kernel, in-cell
derivative channels from kernels/dynamic._tile_nag_h.  Parity is against
the scan tier's exact jvp on the same sampled fisheye (expect q ~1e-5
rel — the kernels' polynomial rotations vs the scan's exact cos/sin —
and exact KMAH).  Staged small-then-full per the compile hazards.

    python benchmarks/dynamic_tiled_probe.py [--rays N] [--div 4587]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.engine.dynamic import trace_dynamic
from raytracing_tpu.engine.fast import _as_hermite
from raytracing_tpu.engine.segmented import grid_trace_dynamic_tiled
from raytracing_tpu.media.spline import build_grid_medium
from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--div", type=int, default=4587)
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--family", default="parity",
                    help="parity (36-float cells) or c1 (16-float)")
    args = ap.parse_args(argv)

    scen = rt.scenario("fisheye")
    if args.family == "c1":
        from raytracing_tpu.media.c1 import build_c1_medium
        hm = build_c1_medium("fisheye", scen.box, dtype=np.float32)
    else:
        hm = _as_hermite(build_grid_medium("fisheye", scen.box,
                                           dtype=np.float32))
    ds = np.float32(2 * np.pi / args.div)
    steps = args.steps or args.div

    # -- tiny staged compile (256 rays, 32 steps) -------------------------
    r0 = 1024
    th0 = jax.device_put(
        (np.pi / 2 + np.linspace(-0.02, 0.02, r0)).astype(np.float32))
    p0 = jax.device_put(np.tile(np.array([1.0, 0.0], np.float32), (r0, 1)))
    t0 = time.time()
    g = grid_trace_dynamic_tiled("op6", p0, th0, ds, hm, steps=32,
                                 box=tuple(scen.box), block_rays=1024)
    np.asarray(g.q[:1])
    print(json.dumps({"stage": "tiny", "cold_s": round(time.time() - t0, 2)}),
          flush=True)

    # parity vs the scan jvp at small scale
    d = trace_dynamic("op6", scen, hm, delta_s=float(ds), mode="metrics",
                      dtype=np.float32, pos0=np.asarray(p0),
                      theta0=np.asarray(th0), max_size=33, step_limit=32)
    qrel = float(np.max(np.abs(np.asarray(g.q) - np.asarray(d.q))
                        / np.maximum(np.abs(np.asarray(d.q)), 1e-6)))
    print(json.dumps({
        "stage": "parity32", "q_rel": round(qrel, 8),
        "kmah_eq": bool(np.array_equal(np.asarray(g.kmah),
                                       np.asarray(d.kmah)))}), flush=True)

    # -- full size ---------------------------------------------------------
    r = args.rays
    theta0 = jax.device_put(
        (np.pi / 2 + np.linspace(-0.02, 0.02, r)).astype(np.float32))
    pos0 = jax.device_put(np.tile(np.array([1.0, 0.0], np.float32),
                                  (r, 1)))

    def run():
        g = grid_trace_dynamic_tiled("op6", pos0, theta0, ds, hm,
                                     steps=steps, box=tuple(scen.box),
                                     block_rays=1024)
        np.asarray(g.q[:1])
        return g

    t0 = time.time()
    run()
    cold = time.time() - t0
    t0 = time.time()
    g = run()
    warm = time.time() - t0
    print(json.dumps({
        "stage": "full", "rays": r, "steps": steps, "div": args.div,
        "cold_s": round(cold, 2), "warm_s": round(warm, 3),
        "gsteps_per_sec": round(r * steps / warm / 1e9, 3)}), flush=True)

    # NO scan-tier leg here: jvp through the gathered 2-D spline at full
    # size is exactly the known remote-compile/worker hazard (CLAUDE.md —
    # scan+gather-over-large-table programs; the first run of this probe
    # crashed the TPU worker on that leg, logs_r4/32).  The scan-tier
    # baseline for table media is the strat dynamic scan (~0.4-1 G class);
    # interpret parity at small scale above is the correctness check.


if __name__ == "__main__":
    main()
