#!/usr/bin/env python
"""Headline benchmark: million-ray fisheye throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload is the BASELINE.json north-star configuration: a 1M-ray Maxwell
fisheye batch integrated with op1 at the calibrated step (divisor 4587,
RT_bench.py:1433) in float32, metrics-only mode (no trajectory history —
O(rays) memory).  ``vs_baseline`` is measured throughput over the 1e9
ray-steps/sec/chip target; the reference itself publishes no numbers
(BASELINE.md).

Env overrides: RT_BENCH_RAYS, RT_BENCH_TURNS, RT_BENCH_DIVISOR,
RT_BENCH_TRIALS, RT_BENCH_ENGINE (jax|pallas).  RT_BENCH_SUITE=1 also runs
the per-scenario fused-kernel suite (BASELINE.json "configs") and writes
BENCH_SUITE.json; stdout stays one line.
"""
import json
import os
import sys

import numpy as np

import jax

import raytracing_tpu as rt
from raytracing_tpu.bench.harness import benchmark
from raytracing_tpu.engine import oracles

NORTH_STAR = 1.0e9  # ray-steps/sec/chip (BASELINE.json)


def run_suite(rays: int, path: str = "BENCH_SUITE.json"):
    """Per-scenario fused-kernel throughput + oracle values (to a file)."""
    import time

    from raytracing_tpu import config
    from raytracing_tpu.kernels.fused import fused_trace_final
    from raytracing_tpu.kernels.golden import golden_trace_final

    def best_of(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    out = {}
    r = rays - rays % 4096

    # fisheye (op6/HySA) + vert (op8) + interface (op6) + aniso (op11)
    # calibrated steps; step counts capped at 3000 (throughput measurement)
    cases = [
        ("fisheye", "op6", rt.scenario("fisheye"), np.pi / 2.0, (1.0, 0.0),
         2 * np.pi / 303, 303),
        ("vert", "op8", rt.scenario("vert"), np.pi / 3.0, (-2.0, -2.0),
         config.SIGMA / 2.74, 3000),
        ("interface", "op6", rt.scenario("interface"), np.pi / 3.0, (-2.0, -2.0),
         config.SIGMA / 2.55, 3000),
    ]
    for name, op, scen, th, p0, ds, steps in cases:
        theta0 = jax.device_put(np.full(r, th, np.float32))
        pos0 = jax.device_put(
            np.stack([np.full(r, p0[0]), np.full(r, p0[1])], -1).astype(np.float32))

        def run(op=op, scen=scen, ds=ds, steps=steps, pos0=pos0, theta0=theta0):
            pos, *_ = fused_trace_final(pos0, theta0, np.float32(ds),
                                        field=scen.field, op=op, steps=int(steps),
                                        box=tuple(scen.box))
            np.asarray(pos[:1])

        t = best_of(run)
        out[name] = {"op": op, "rays": r, "steps": int(steps),
                     "seconds": round(t, 4),
                     "gsteps_per_sec": round(r * steps / t / 1e9, 2)}
        if name != "fisheye":
            # interface/vert rays leave the box mid-run; frozen lanes still
            # execute, so this is lane throughput, not live-ray throughput
            out[name]["note"] = "lane throughput; includes masked lanes after boundary exit"

    # aniso via the golden kernel (op11) and Newton (op11n)
    scen = rt.scenario("aniso")
    theta0 = jax.device_put(np.full(r, np.pi / 3.0, np.float32))
    pos0 = jax.device_put(np.stack([np.full(r, -2.0), np.full(r, -2.0)], -1).astype(np.float32))
    for op in ("op11", "op11n"):
        def run(op=op):
            pos, *_ = golden_trace_final(pos0, theta0, np.float32(0.0193),
                                         np.float32(3.0),
                                         field="vert_heterogeneous", op=op,
                                         steps=2000, box=tuple(scen.box))
            np.asarray(pos[:1])

        t = best_of(run)
        out[f"aniso_{op}"] = {"op": op, "rays": r, "steps": 2000,
                              "seconds": round(t, 4),
                              "gsteps_per_sec": round(r * 2000 / t / 1e9, 2)}

    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# suite -> {path}: " + ", ".join(
        f"{k}={v['gsteps_per_sec']}G" for k, v in out.items()), file=sys.stderr)


def main():
    rays = int(os.environ.get("RT_BENCH_RAYS", 1 << 20))  # 1M, block-aligned
    n_turns = int(os.environ.get("RT_BENCH_TURNS", 1))
    divisor = int(os.environ.get("RT_BENCH_DIVISOR", 4587))
    trials = int(os.environ.get("RT_BENCH_TRIALS", 10))
    engine = os.environ.get("RT_BENCH_ENGINE", "auto")

    scen = rt.scenario("fisheye")
    med = rt.analytic_medium("fisheye")
    delta_s = 2.0 * np.pi / divisor
    theta0 = np.full(rays, np.pi / 2.0, np.float32)
    pos0 = np.stack([np.ones(rays), np.zeros(rays)], -1).astype(np.float32)

    runner = None
    if engine in ("auto", "pallas"):
        try:
            from raytracing_tpu.kernels.fisheye import make_fisheye_runner
            runner = make_fisheye_runner(rays, divisor, n_turns)
        except Exception as e:  # pallas path unavailable -> jax engine
            if engine == "pallas":
                raise
            print(f"# pallas runner unavailable ({e}); using jax engine",
                  file=sys.stderr)

    if runner is None:
        def runner():
            res = rt.trace("op1", scen, med, delta_s=delta_s,
                           divisor=divisor + 1, n_turns=n_turns,
                           mode="metrics", dtype=np.float32,
                           pos0=pos0, theta0=theta0)
            # A tiny device->host transfer, not just block_until_ready: the
            # axon tunnel's block can return before queued work drains, and
            # a real readback is the only honest completion barrier.
            np.asarray(res.final.pos[:1])
            return res

    if os.environ.get("RT_BENCH_SUITE"):
        run_suite(rays)

    if os.environ.get("RT_BENCH_DF"):
        # accuracy companion: double-word f32 RK4 (kernels/df.py) vs the
        # analytic circle.  Heavier Mosaic compile; opt-in.
        from raytracing_tpu.kernels.df import df_fisheye_trace
        p = df_fisheye_trace(pos0[:4096], theta0[:4096],
                             np.float32(delta_s), steps=divisor)
        sarc = divisor * float(np.float32(delta_s))
        err = float(np.linalg.norm(p[0] - [np.cos(sarc), np.sin(sarc)]))
        print(f"# df32 kernel 1-turn error vs analytic: {err:.3e}",
              file=sys.stderr)

    if os.environ.get("RT_BENCH_PROFILE"):
        # device trace of one run, viewable in XProf/TensorBoard
        from raytracing_tpu.utils.profiling import device_trace
        runner()  # compile outside the trace
        with device_trace(os.environ["RT_BENCH_PROFILE"]):
            runner()

    steps = scen.max_size(delta_s, divisor + 1, n_turns) - 1
    result = benchmark(lambda: runner(), rays * steps, trials=trials, warmup=2)

    # Accuracy companion: closure error of the benchmark configuration.
    res = runner()
    final_pos = np.asarray(res.final.pos if hasattr(res, "final") else res)
    closure = 100.0 * np.linalg.norm(final_pos[0] - np.array([1.0, 0.0])) / (2 * np.pi)

    print(json.dumps({
        "metric": "ray_steps_per_sec_per_chip",
        "value": round(result.ray_steps_per_sec, 1),
        "unit": "ray-steps/s",
        "vs_baseline": round(result.ray_steps_per_sec / NORTH_STAR, 4),
        "detail": {
            "rays": rays, "steps": int(steps), "turns": n_turns,
            "divisor": divisor, "seconds_per_run": round(result.seconds, 4),
            "rounds": result.rounds, "closure_error_pct": float(closure),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
