"""TL field map end-to-end ON the TPU chip vs the CPU/f64 reference.

Round-3 verdict: the flagship eigenray/transmission-loss product pinned
itself to host CPU at f64 because (a) full-history readbacks made every
Newton iteration a multi-MB tunnel round-trip and (b) f32 tables floor
the landing curve at ~1e-5.  (a) is gone — the crossing records ride
inside the scan (engine/dynamic.trace_crossings_*) and O(KB) comes home —
so this probe measures what remains of (b): the SAME measured-profile TL
map solved on the TPU chip in f32 (``on_host=False``) against the CPU
f64 solve, matched arrival by arrival.

Per leg it prints wall-clock and arrival counts; the comparison row
reports max per-arrival deviations of launch angle, travel time (rel),
amplitude (rel), and KMAH equality — the quantities a TL map is made of.

    python benchmarks/eigenray_tpu_probe.py [n_ranges n_depths fan tol32]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def _workload(n_ranges: int, n_depths: int):
    # the examples/tl_field_map.py Munk-style measured profile
    depth = np.linspace(-3.0, 0.0, 121)
    eta = 2.0 * (depth + 1.0)
    c = 1.49 * (1.0 + 0.0057 * (eta - 1.0 + np.exp(-eta)))
    ranges = np.linspace(4.0, 40.0, n_ranges)
    depths = np.linspace(-2.5, -0.2, n_depths)
    receivers = np.stack(np.meshgrid(ranges, depths, indexing="ij"),
                         -1).reshape(-1, 2)
    return depth, c.min() / c, receivers


def _solve(samples, y, receivers, n_fan, dtype, on_host, tol):
    import contextlib
    import os

    import jax

    # the f64 table build needs an x64 scope of its own (find_eigenrays
    # scopes one internally, but the medium is built here, outside it) and
    # must land on the CPU backend — the TPU has no f64 storage
    f64 = np.dtype(dtype).itemsize == 8
    dev = (jax.default_device(jax.local_devices(backend="cpu")[0])
           if f64 else contextlib.nullcontext())
    with jax.enable_x64(f64), dev:
        if not f64 and os.environ.get("RT_EIG_DF32", "0") == "1":
            # split-word-evaluated profile: correctly-rounded f32 of the
            # f64 interpolant on ANY backend (engine/df_grid.DfEvalProfile)
            medium = rt.df_eval_profile_medium(samples, y)
        else:
            medium = rt.c1_stratified_from_samples(samples, y, dtype=dtype)
    t0 = time.perf_counter()
    eig = rt.find_eigenrays(
        "op6", medium, source=(0.0, -1.0), receivers=receivers,
        delta_s=0.01, max_size=int(receivers[:, 0].max() / 0.01 * 1.2),
        box=(-1.0, receivers[:, 0].max() + 2.0, -3.0, 0.0),
        fan=(-0.3, 0.3, n_fan), tol=tol, dtype=dtype, on_host=on_host)
    dt = time.perf_counter() - t0
    # second solve: the first pays every jit compile; steady-state is what
    # a TL-map service sees
    t0 = time.perf_counter()
    eig = rt.find_eigenrays(
        "op6", medium, source=(0.0, -1.0), receivers=receivers,
        delta_s=0.01, max_size=int(receivers[:, 0].max() / 0.01 * 1.2),
        box=(-1.0, receivers[:, 0].max() + 2.0, -3.0, 0.0),
        fan=(-0.3, 0.3, n_fan), tol=tol, dtype=dtype, on_host=on_host)
    warm = time.perf_counter() - t0
    return eig, dt, warm


def main():
    n_ranges = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_depths = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_fan = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    tol32 = float(sys.argv[4]) if len(sys.argv) > 4 else 2e-6
    y, samples, receivers = _workload(n_ranges, n_depths)

    import jax
    backend = jax.default_backend()

    ref, cold64, warm64 = _solve(samples, y, receivers, n_fan,
                                 np.float64, on_host=True, tol=1e-9)
    print(json.dumps({
        "leg": "cpu-f64", "arrivals": int(len(np.asarray(ref.theta0))),
        "receivers": len(receivers), "fan": n_fan,
        "cold_s": round(cold64, 2), "warm_s": round(warm64, 2),
        "converged_frac": float(np.mean(np.asarray(ref.converged)))}),
        flush=True)

    tpu, cold32, warm32 = _solve(samples, y, receivers, n_fan,
                                 np.float32, on_host=False, tol=tol32)
    print(json.dumps({
        "leg": f"{backend}-f32", "arrivals":
            int(len(np.asarray(tpu.theta0))), "tol": tol32,
        "cold_s": round(cold32, 2), "warm_s": round(warm32, 2),
        "converged_frac": float(np.mean(np.asarray(tpu.converged)))}),
        flush=True)

    # --- match arrivals: same receiver, nearest launch angle ------------
    pitch = 0.6 / (n_fan - 1)
    rr, tr = np.asarray(ref.receiver), np.asarray(tpu.receiver)
    dth, dtt, damp, dkmah, matched = [], [], [], [], 0
    for k in range(len(receivers)):
        ri = np.where(rr == k)[0]
        ti = np.where(tr == k)[0]
        for i in ri:
            if not len(ti):
                continue
            j = ti[np.argmin(np.abs(np.asarray(tpu.theta0)[ti]
                                    - ref.theta0[i]))]
            if abs(tpu.theta0[j] - ref.theta0[i]) > 0.5 * pitch:
                continue
            matched += 1
            dth.append(abs(tpu.theta0[j] - ref.theta0[i]))
            dtt.append(abs(tpu.traveltime[j] - ref.traveltime[i])
                       / ref.traveltime[i])
            damp.append(abs(tpu.amplitude[j] - ref.amplitude[i])
                        / ref.amplitude[i])
            dkmah.append(int(tpu.kmah[j]) == int(ref.kmah[i]))
    out = {
        "leg": "compare",
        "ref_arrivals": int(len(rr)), "matched": matched,
        "match_frac": round(matched / max(len(rr), 1), 4),
        "theta0_max_abs": float(np.max(dth)) if dth else None,
        "traveltime_max_rel": float(np.max(dtt)) if dtt else None,
        "amplitude_max_rel": float(np.max(damp)) if damp else None,
        "amplitude_p95_rel": float(np.percentile(damp, 95)) if damp
        else None,
        "kmah_match_frac": float(np.mean(dkmah)) if dkmah else None,
    }
    print(json.dumps(out), flush=True)

    # --- attribute the amplitude deviation ------------------------------
    # Each backend solves y(theta) = y_r on ITS OWN f32/f64 landing curve,
    # so matched arrivals sit at slightly different theta0 — and the raw
    # amplitude comparison silently includes dq/dtheta0 times that offset
    # (a property of the BVP, not an arithmetic error: both arrivals are
    # valid eigenrays of their curves).  Re-evaluating the f64 pipeline AT
    # the accelerator's launch angles isolates the arithmetic term.
    import jax

    from raytracing_tpu import config as _cfg
    from raytracing_tpu.engine.dynamic import (spreading_amplitude,
                                               trace_crossings_pick)

    tth, trec = np.asarray(tpu.theta0), np.asarray(tpu.receiver)
    # this workload's rays cross each range once (monotone x), so every
    # arrival is crossing ordinal 0
    with jax.enable_x64(True), jax.default_device(
            jax.local_devices(backend="cpu")[0]):
        med64 = rt.c1_stratified_from_samples(samples, y, dtype=np.float64)
        scen = _cfg.ScenarioConfig(
            name="probe", key="-", field="", gamma=1.0,
            ray_count=len(tth), theta0=tth.astype(np.float64),
            pos0=np.tile([[0.0, -1.0]], (len(tth), 1)), s_max=0.0,
            box=(-1.0, float(receivers[:, 0].max()) + 2.0, -3.0, 0.0))
        cp = trace_crossings_pick(
            "op6", scen, med64, delta_s=0.01,
            xr=receivers[trec, 0].astype(np.float64),
            ordk=np.zeros(len(tth), np.int32), dtype=np.float64,
            pos0=scen.pos0, theta0=scen.theta0,
            max_size=int(receivers[:, 0].max() / 0.01 * 1.2))
        n0, _ = med64.n_and_grad(np.float64(0.0), np.float64(-1.0))
        amp64_at_tpu = np.asarray(spreading_amplitude(
            np.asarray(cp.state)[:, 3], np.asarray(cp.state)[:, 5],
            np.full(len(tth), float(np.asarray(n0)))))
    da_eq = np.abs(np.asarray(tpu.amplitude) - amp64_at_tpu) / amp64_at_tpu
    da_eq = da_eq[np.asarray(cp.found)]
    print(json.dumps({
        "leg": "amp-at-equal-theta",
        "amplitude_max_rel": float(np.max(da_eq)),
        "amplitude_p95_rel": float(np.percentile(da_eq, 95))}),
        flush=True)


if __name__ == "__main__":
    main()
