"""On-chip probe: the fused Pallas dynamic kernel (kernels/dynamic.py).

The dynamic kernel carries the exact paraxial tangent (q, dtheta, KMAH)
alongside the kinematic state; until this probe runs it has only ever
executed in interpret mode (tests/test_dynamic_kernel.py).  Mosaic can
reject or wedge where interpret mode accepts, so this script follows the
CLAUDE.md compile rules: run it in the background, unkilled, with
``--tiny`` FIRST (1024 rays x 16 steps — the minimum VMEM-legal block)
before the full 1M-ray throughput pass.

Per configuration it prints one JSON line with wall-clock, throughput,
and the max relative deviation of (pos, q, dtheta) plus exact-match of
KMAH against the scan tier (engine/dynamic.trace_dynamic), both f32 on
the same chip — the Mosaic-vs-XLA cross-check the interpret tests cannot
give.

    python benchmarks/dynamic_probe.py --tiny
    python benchmarks/dynamic_probe.py [--rays N] [--steps N] [--ops ...]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.kernels.dynamic import DYN_FUSED_OPS, dynamic_trace_final


def _time(fn):
    t0 = time.time()
    res = fn()
    np.asarray(res.pos[:1])     # honest completion barrier (bench.py)
    cold = time.time() - t0
    t0 = time.time()
    res = fn()
    np.asarray(res.pos[:1])
    warm = time.time() - t0
    return cold, warm, res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--ops", default=",".join(DYN_FUSED_OPS))
    ap.add_argument("--tiny", action="store_true",
                    help="1024 rays x 16 steps, op6 only: the first-compile "
                         "canary (CLAUDE.md compile rules)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode dry run of this script itself")
    ap.add_argument("--strat", action="store_true",
                    help="add the sampled-media (stratified-table) rows")
    args = ap.parse_args(argv)
    if args.tiny:
        args.rays, args.steps, args.ops = 1024, 16, "op6"

    scen = rt.scenario("fisheye")
    med = rt.analytic_medium("fisheye")
    r, steps = args.rays, args.steps
    ds = np.float32(2 * np.pi / steps)
    # a narrow fan about pi/2 so q stays O(s) and nonzero (no caustic in
    # the first turn fraction traced here)
    theta_np = (np.pi / 2 + np.linspace(-0.02, 0.02, r)).astype(np.float32)
    theta0 = jax.device_put(theta_np)
    pos0 = jax.device_put(np.tile(np.array([[1.0, 0.0]], np.float32),
                                  (r, 1)))

    for op in [o for o in args.ops.split(",") if o]:
        try:
            cold, warm, res = _time(lambda: dynamic_trace_final(
                pos0, theta0, ds, field="fisheye", op=op, steps=steps,
                box=tuple(scen.box), block_rays=1024,
                interpret=args.interpret))
        except Exception as e:  # Mosaic rejection is data, not a crash
            print(json.dumps({"op": op, "error":
                              f"{type(e).__name__}: {str(e)[:300]}"}),
                  flush=True)
            continue

        # parity oracle: the scan tier's exact-jvp tangent, same chip,
        # same f32 (a small subsample keeps the scan leg cheap at 1M rays)
        sub = min(r, 4096)
        idx = slice(0, r, max(1, r // sub))
        ref = rt.trace_dynamic(op, scen, med, delta_s=float(ds),
                               divisor=steps, n_turns=1, mode="metrics",
                               dtype=np.float32,
                               pos0=pos0[idx], theta0=theta0[idx],
                               max_size=steps + 1)
        kp = np.asarray(res.pos)[idx]
        kq = np.asarray(res.q)[idx]
        kd = np.asarray(res.dtheta)[idx]
        kk = np.asarray(res.kmah)[idx]
        rp, rq = np.asarray(ref.pos), np.asarray(ref.q)
        rd, rk = np.asarray(ref.dtheta), np.asarray(ref.kmah)
        scale_q = max(float(np.abs(rq).max()), 1e-30)
        out = {
            "op": op, "rays": r, "steps": steps,
            "cold_s": round(cold, 2), "warm_s": round(warm, 4),
            "gsteps_per_sec": round(r * steps / warm / 1e9, 3),
            "pos_max_abs": float(np.abs(kp - rp).max()),
            "q_max_rel": float(np.abs(kq - rq).max() / scale_q),
            "dtheta_max_rel": float(np.abs(kd - rd).max()
                                    / max(float(np.abs(rd).max()), 1e-30)),
            "kmah_match": bool((kk == rk).all()),
        }
        print(json.dumps(out), flush=True)

    if args.strat:
        _strat_rows(args)


def _strat_rows(args):
    """Sampled-media dynamic rows: the strat kernel over both table
    families (kernels/dynamic.dynamic_trace_final_strat) vs the scan
    tier's jvp-through-the-gathered-spline, plus throughput."""
    from raytracing_tpu import config
    from raytracing_tpu.kernels.dynamic import dynamic_trace_final_strat
    from raytracing_tpu.media.c1 import build_c1_stratified
    from raytracing_tpu.media.spline import build_stratified_medium

    r, steps = args.rays, args.steps
    box = (-2.0, 25.0, -2.5, 1.0)
    ds = np.float32(0.05)
    theta_np = np.linspace(0.05, np.pi / 2 - 0.05, r).astype(np.float32)
    theta0 = jax.device_put(theta_np)
    pos0 = jax.device_put(np.tile(np.array([[0.0, -1.0]], np.float32),
                                  (r, 1)))
    scen = config.ScenarioConfig(
        name="t", key="-", field="vert_heterogeneous", gamma=1.0,
        ray_count=r, theta0=theta_np,
        pos0=np.tile(np.array([0.0, -1.0], np.float32), (r, 1)),
        s_max=0.0, box=box)
    for family, build in (("parity", build_stratified_medium),
                          ("c1", build_c1_stratified)):
        med = build("vert_heterogeneous", box)
        try:
            cold, warm, res = _time(lambda: dynamic_trace_final_strat(
                pos0, theta0, ds, med, op="op6", steps=steps, box=box,
                block_rays=1024, interpret=args.interpret))
        except Exception as e:
            print(json.dumps({"op": "op6", "family": family, "error":
                              f"{type(e).__name__}: {str(e)[:300]}"}),
                  flush=True)
            continue
        sub = min(r, 4096)
        idx = slice(0, r, max(1, r // sub))
        ref = rt.trace_dynamic("op6", scen, med, delta_s=float(ds),
                               mode="metrics", dtype=np.float32,
                               pos0=np.asarray(pos0)[idx],
                               theta0=theta_np[idx], max_size=steps + 1)
        kq = np.asarray(res.q)[idx]
        rq = np.asarray(ref.q)
        out = {
            "op": "op6", "family": family, "medium": "sampled-1d-tables",
            "rays": r, "steps": steps,
            "cold_s": round(cold, 2), "warm_s": round(warm, 4),
            "gsteps_per_sec": round(r * steps / warm / 1e9, 3),
            "pos_max_abs": float(np.abs(np.asarray(res.pos)[idx]
                                        - np.asarray(ref.pos)).max()),
            "q_max_rel": float(np.abs(kq - rq).max()
                               / max(float(np.abs(rq).max()), 1e-30)),
            "kmah_match": bool((np.asarray(res.kmah)[idx]
                                == np.asarray(ref.kmah)).all()),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
