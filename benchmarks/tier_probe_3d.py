"""On-chip throughput probe: the dynamic and 3-D scan tiers.

The default tiers are pure XLA scan programs (no Pallas, no grid-medium
gathers), so TPU compilation is the ordinary jit path — safe for the
remote compile helper at these trip counts.  Timing per CLAUDE.md:
device_put'd inputs, warm second call, completion via a small
device->host readback.

RT_PROBE_PALLAS3D=1 additionally probes the fused 3-D Pallas kernel
(kernels/fused3d.py) — its first-ever Mosaic compile, which can reject or
wedge where interpret mode accepts; run that leg with a TINY step count
first, in the background, unkilled (CLAUDE.md compile rules).

    python benchmarks/tier_probe_3d.py [rays] [steps]

Prints one line per tier: {"tier": ..., "gsteps_per_sec": ..., ...}.
"""
import json
import os
import sys
import time

import numpy as np

import jax

import raytracing_tpu as rt

rays = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300


def _time(fn):
    # slice BEFORE transfer: np.asarray(x[:1]) pulls one row through the
    # tunnel (the honest completion barrier, bench.py convention);
    # np.asarray(x)[:1] would ship the whole array inside the clock
    out = fn()                      # compile + warm
    np.asarray(jax.tree.leaves(out)[0][:1])
    t0 = time.perf_counter()
    out = fn()
    np.asarray(jax.tree.leaves(out)[0][:1])
    return time.perf_counter() - t0


def main():
    scen = rt.scenario("fisheye")
    med = rt.analytic_medium("fisheye")
    ds = np.float32(2 * np.pi / steps)
    theta0 = jax.device_put(np.full(rays, np.pi / 2, np.float32))
    pos0 = jax.device_put(
        np.tile(np.array([[1.0, 0.0]], np.float32), (rays, 1)))

    # -- 2-D kinematic scan tier (the baseline these tiers pay against) --
    dt = _time(lambda: rt.trace("op6", scen, med, delta_s=ds,
                                divisor=steps, n_turns=1, mode="metrics",
                                dtype=np.float32, pos0=pos0, theta0=theta0,
                                max_size=steps + 1))
    base = rays * steps / dt
    print(json.dumps({"tier": "scan2d-op6", "rays": rays, "steps": steps,
                      "seconds": round(dt, 4),
                      "gsteps_per_sec": round(base / 1e9, 3)}))

    # -- 2-D dynamic tier (one jvp tangent: expect ~2x the scan cost) ----
    dt = _time(lambda: rt.trace_dynamic("op6", scen, med, delta_s=ds,
                                        divisor=steps, n_turns=1,
                                        mode="metrics", dtype=np.float32,
                                        pos0=pos0, theta0=theta0,
                                        max_size=steps + 1))
    print(json.dumps({"tier": "dynamic2d-op6", "rays": rays,
                      "steps": steps, "seconds": round(dt, 4),
                      "gsteps_per_sec": round(rays * steps / dt / 1e9, 3),
                      "vs_scan": round(rays * steps / dt / base, 3)}))

    # -- 3-D kinematic tier ------------------------------------------------
    med3 = rt.analytic_medium3("fisheye")
    tilt = np.linspace(0, 1.0, rays).astype(np.float32)
    pos3 = jax.device_put(
        np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (rays, 1)))
    dir3 = jax.device_put(np.stack([np.zeros(rays, np.float32),
                                    np.cos(tilt), np.sin(tilt)],
                                   -1).astype(np.float32))
    dt = _time(lambda: rt.trace3d("op6", med3, pos0=pos3, dir0=dir3,
                                  delta_s=float(ds), steps=steps,
                                  mode="metrics", dtype=np.float32))
    print(json.dumps({"tier": "trace3d-op6", "rays": rays, "steps": steps,
                      "seconds": round(dt, 4),
                      "gsteps_per_sec": round(rays * steps / dt / 1e9, 3),
                      "vs_scan": round(rays * steps / dt / base, 3)}))

    # -- fused 3-D Pallas kernel (kernels/fused3d.py): OPT-IN via
    # RT_PROBE_PALLAS3D=1.  Its first-ever on-chip Mosaic compile happens
    # here, and Mosaic can reject (or wedge on) programs interpret mode
    # accepts — so it must never ride along with the tunnel-safe XLA
    # tiers above.  Probe cheaply first: RT_PROBE_PALLAS3D=1 with a tiny
    # step count (e.g. `... 4096 8`), in the background, unkilled
    # (CLAUDE.md compile rules); the queue script does exactly that. ------
    if os.environ.get("RT_PROBE_PALLAS3D"):
        try:
            from raytracing_tpu.kernels.fused3d import fused3d_trace_final
            box3 = (-2.0, 2.0, -2.0, 2.0, -2.0, 2.0)
            blk = 4096 if rays % 4096 == 0 else 128 * (rays // 128)
            r_f = (rays // blk) * blk if blk else 0
            if r_f == 0:
                raise ValueError(f"rays {rays} < one 128-lane block")

            def run_f3():
                return fused3d_trace_final(
                    pos3[:r_f], dir3[:r_f], ds, field="fisheye", op="op6",
                    steps=steps, box=box3, block_rays=blk)

            dt = _time(run_f3)
            print(json.dumps({
                "tier": "fused3d-op6", "rays": r_f, "steps": steps,
                "seconds": round(dt, 4),
                "gsteps_per_sec": round(r_f * steps / dt / 1e9, 3),
                "vs_scan": round(r_f * steps / dt / base, 3)}))
        except Exception as e:      # Mosaic rejection is data, not a crash
            print(json.dumps({"tier": "fused3d-op6",
                              "error": f"{type(e).__name__}: {str(e)[:300]}"}))

    # -- 3-D dynamic tier (two tangents: expect ~3x the 3-D scan cost) ---
    # Q carry is wide; keep HBM modest — but never report more rays than
    # the slice actually holds (numpy over-slices silently)
    r3 = rays if rays <= 4096 else max(4096, rays // 4)
    dt = _time(lambda: rt.trace_dynamic3(
        "op6", med3, pos0=pos3[:r3], dir0=dir3[:r3], delta_s=float(ds),
        steps=steps, mode="metrics", dtype=np.float32))
    print(json.dumps({"tier": "dynamic3d-op6", "rays": r3, "steps": steps,
                      "seconds": round(dt, 4),
                      "gsteps_per_sec": round(r3 * steps / dt / 1e9, 3)}))


if __name__ == "__main__":
    main()
