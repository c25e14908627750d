"""3-D eigenrays end-to-end ON the TPU chip vs the CPU/f64 reference.

The 3-D twin of benchmarks/eigenray_tpu_probe.py, closing VERDICT r4
next #2/#4's measurement legs: round 5 made `find_eigenrays3`
history-free (on-device crossing records, engine/dynamic3d.
trace_crossings_fan3/_pick3) and gave sampled 3-D media a split-word
twin (`df_eval_medium3_from_samples` — every n_and_grad3 is the
correctly-rounded f32 of the f64 tri-Hermite interpolant on ANY
backend).  This probe runs the same sampled-fisheye boundary-value
problem twice:

  * cpu-f64:  plain f64 grid3 tables, on_host=True   (the reference)
  * chip-f32: the df32 facade, on_host=False          (the product)

and matches arrivals per receiver by launch direction — reporting the
angle offset, travel-time/amplitude deviations, and KMAH equality —
then re-evaluates the f64 pipeline AT the chip's launch directions to
split the BVP root-shift term from arithmetic (the 2-D attribution
methodology, logs_r4/29).

Compile-hazard note: the crossing traces are scan+gather programs over
the grid3 node table; the table here is small (~57^3 nodes) and the
fan is hundreds of rays, far from the 1M-ray hazard regime
(CLAUDE.md), and `--tiny` stages a short-trip compile first.

    python benchmarks/eigenray3_tpu_probe.py [--tiny]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

BOX = (-1.4, 1.4, -1.4, 1.4, -1.4, 1.4)
SOURCE = (1.0, 0.0, 0.0)
DS = 2 * np.pi / 500


def _samples():
    ax = np.linspace(-1.75, 1.75, 57)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return 1.0 / (1.0 + X ** 2 + Y ** 2 + Z ** 2), ax


def _receivers(tiny):
    # inside the +-0.35 rad fan's landing disk at the x=-0.9 plane (the
    # fisheye focuses; see tests/test_df_grid3.py for the disk bound)
    if tiny:
        return np.array([[-0.9, 0.02, 0.01]])
    ys = np.array([-0.02, 0.0, 0.02])
    zs = np.array([-0.015, 0.0, 0.015])
    g = np.stack(np.meshgrid(ys, zs, indexing="ij"), -1).reshape(-1, 2)
    return np.concatenate([np.full((len(g), 1), -0.9), g], axis=1)


def _solve(F, ax, receivers, *, dtype, on_host, tol, fan, max_size):
    import contextlib

    import jax

    f64 = np.dtype(dtype).itemsize == 8
    dev = (jax.default_device(jax.local_devices(backend="cpu")[0])
           if f64 else contextlib.nullcontext())
    with jax.enable_x64(f64), dev:
        if f64:
            medium = rt.c1_medium3_from_samples(F, ax, ax, ax,
                                                dtype=np.float64)
        else:
            medium = rt.df_eval_medium3_from_samples(F, ax, ax, ax)

    kw = dict(source=SOURCE, receivers=receivers, delta_s=DS,
              max_size=max_size, box=BOX, fan=fan, iters=10, tol=tol,
              dtype=dtype, on_host=on_host)
    t0 = time.perf_counter()
    eig = rt.find_eigenrays3("op6", medium, **kw)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    eig = rt.find_eigenrays3("op6", medium, **kw)
    warm = time.perf_counter() - t0
    return eig, cold, warm, medium


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="1 receiver, 13x13 fan, short traces (staged "
                         "first compile)")
    args = ap.parse_args(argv)

    import jax
    backend = jax.default_backend()
    F, ax = _samples()
    receivers = _receivers(args.tiny)
    fan = ((-0.35, 0.35, 13, -0.35, 0.35, 13) if args.tiny
           else (-0.35, 0.35, 25, -0.35, 0.35, 25))
    max_size = 700 if args.tiny else 1200
    pitch = 0.7 / ((fan[2] - 1))

    ref, cold64, warm64, _ = _solve(F, ax, receivers, dtype=np.float64,
                                    on_host=True, tol=1e-9, fan=fan,
                                    max_size=max_size)
    print(json.dumps({
        "leg": "cpu-f64", "receivers": len(receivers),
        "arrivals": int(len(np.asarray(ref.traveltime))),
        "cold_s": round(cold64, 2), "warm_s": round(warm64, 2),
        "converged_frac": float(np.mean(np.asarray(ref.converged)))}),
        flush=True)

    tol32 = 3e-6
    tpu, cold32, warm32, _ = _solve(F, ax, receivers, dtype=np.float32,
                                    on_host=False, tol=tol32, fan=fan,
                                    max_size=max_size)
    print(json.dumps({
        "leg": f"{backend}-f32-df", "tol": tol32,
        "arrivals": int(len(np.asarray(tpu.traveltime))),
        "cold_s": round(cold32, 2), "warm_s": round(warm32, 2),
        "converged_frac": float(np.mean(np.asarray(tpu.converged)))}),
        flush=True)

    # --- match arrivals: same receiver, nearest launch direction --------
    rr, tr = np.asarray(ref.receiver), np.asarray(tpu.receiver)
    ru, tu = np.asarray(ref.dir0), np.asarray(tpu.dir0)
    dang, dtt, damp, dkmah, matched = [], [], [], [], 0
    for k in range(len(receivers)):
        ri, ti = np.where(rr == k)[0], np.where(tr == k)[0]
        for i in ri:
            if not len(ti):
                continue
            ang = np.arccos(np.clip(tu[ti] @ ru[i], -1.0, 1.0))
            j = ti[np.argmin(ang)]
            if ang.min() > 0.5 * pitch:
                continue
            matched += 1
            dang.append(float(ang.min()))
            dtt.append(abs(tpu.traveltime[j] - ref.traveltime[i])
                       / ref.traveltime[i])
            damp.append(abs(tpu.amplitude[j] - ref.amplitude[i])
                        / abs(ref.amplitude[i]))
            dkmah.append(int(tpu.kmah[j]) == int(ref.kmah[i]))
    print(json.dumps({
        "leg": "compare", "ref_arrivals": int(len(rr)),
        "matched": matched,
        "match_frac": round(matched / max(len(rr), 1), 4),
        "dir_angle_max": float(np.max(dang)) if dang else None,
        "traveltime_max_rel": float(np.max(dtt)) if dtt else None,
        "amplitude_max_rel": float(np.max(damp)) if damp else None,
        "amplitude_p95_rel": (float(np.percentile(damp, 95))
                              if damp else None),
        "kmah_match_frac": float(np.mean(dkmah)) if dkmah else None}),
        flush=True)

    # --- attribution: the f64 pipeline AT the chip's launch directions --
    # Each backend solves the BVP on ITS OWN landing surface, so matched
    # arrivals sit at slightly different launch directions and the raw
    # amplitude comparison includes d(detQ)/d(dir) times that offset.
    # Re-evaluating f64 crossing-pick rows at the chip's directions
    # isolates the arithmetic term (logs_r4/29 methodology, 3-D form).
    import jax

    from raytracing_tpu.engine.dynamic3d import (CROSS3_COLS,
                                                 spreading_amplitude3,
                                                 trace_crossings_pick3)

    cTT, cN, cDETQ = (CROSS3_COLS.index(k)
                      for k in ("traveltime", "n", "detq"))
    trec = np.asarray(tpu.receiver)
    with jax.enable_x64(True), jax.default_device(
            jax.local_devices(backend="cpu")[0]):
        m64 = rt.c1_medium3_from_samples(F, ax, ax, ax, dtype=np.float64)
        # arrivals keep the crossing ordinal they converged on; this
        # focusing workload crosses each range once before exiting
        cp = trace_crossings_pick3(
            "op6", m64, pos0=np.tile(SOURCE, (len(tu), 1)),
            dir0=tu.astype(np.float64), delta_s=DS, steps=max_size,
            box=BOX, xr=receivers[trec, 0].astype(np.float64),
            ordk=np.zeros(len(tu), np.int32), dtype=np.float64)
        n0, _ = m64.n_and_grad3(*(np.float64(v) for v in SOURCE))
        st = np.asarray(cp.state)
        amp64 = np.asarray(spreading_amplitude3(
            st[:, cDETQ], st[:, cN],
            np.full(len(tu), float(np.asarray(n0)))))
    found = np.asarray(cp.found)
    da = (np.abs(np.asarray(tpu.amplitude) - amp64)
          / np.abs(amp64))[found]
    dt_eq = (np.abs(np.asarray(tpu.traveltime) - st[:, cTT])
             / st[:, cTT])[found]
    print(json.dumps({
        "leg": "at-equal-dir", "evaluated": int(found.sum()),
        "amplitude_max_rel": float(np.max(da)) if len(da) else None,
        "amplitude_p95_rel": (float(np.percentile(da, 95))
                              if len(da) else None),
        "traveltime_max_rel": float(np.max(dt_eq)) if len(dt_eq)
        else None}), flush=True)


if __name__ == "__main__":
    main()
