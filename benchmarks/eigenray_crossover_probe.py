"""Measure WHERE the on-chip eigenray solve beats the host/f64 one.

VERDICT r4 weak #3: on-device eigenray economics were measured only at a
size where they lose (80 receivers: chip warm 2.19 s vs host 1.41 s,
logs_r4/14), while the serving story claimed an unmeasured regime where
the chip wins.  This probe sweeps the TL-map receiver count from 80 to
~10^4 on the SAME Munk-style measured profile (the eigenray_tpu_probe /
examples/tl_field_map.py workload):

  * host/f64:  plain f64 tables, on_host=True      (today's default)
  * chip/f32:  df32-evaluated profile, on_host=False

recording cold (includes jit/Mosaic compiles; persistent cache on) and
warm (steady-state service) wall-clocks per size.  The crossover —
the smallest receiver count whose WARM chip solve is faster — becomes
``engine.eigenray.EIGENRAY_TPU_MIN_RECEIVERS``, the measured routing
constant for f32 solves (accuracy at this operating point is the
eigenray_tpu_probe's 7.2e-6 p95 amplitude story, logs_r4/28).

    python benchmarks/eigenray_crossover_probe.py [--sizes 80,320,...]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

#: (n_ranges, n_depths) per sweep point
GRIDS = {80: (10, 8), 320: (20, 16), 1280: (40, 32), 5120: (80, 64),
         10000: (100, 100)}


def _profile():
    depth = np.linspace(-3.0, 0.0, 121)
    eta = 2.0 * (depth + 1.0)
    c = 1.49 * (1.0 + 0.0057 * (eta - 1.0 + np.exp(-eta)))
    return depth, c.min() / c


def _receivers(n_ranges, n_depths):
    ranges = np.linspace(4.0, 40.0, n_ranges)
    depths = np.linspace(-2.5, -0.2, n_depths)
    return np.stack(np.meshgrid(ranges, depths, indexing="ij"),
                    -1).reshape(-1, 2)


def _solve(medium, receivers, *, dtype, on_host, tol, n_fan=256):
    kw = dict(source=(0.0, -1.0), receivers=receivers, delta_s=0.01,
              max_size=int(receivers[:, 0].max() / 0.01 * 1.2),
              box=(-1.0, receivers[:, 0].max() + 2.0, -3.0, 0.0),
              fan=(-0.3, 0.3, n_fan), tol=tol, dtype=dtype,
              on_host=on_host)
    t0 = time.perf_counter()
    eig = rt.find_eigenrays("op6", medium, **kw)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    eig = rt.find_eigenrays("op6", medium, **kw)
    warm = time.perf_counter() - t0
    return eig, cold, warm


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default=",".join(str(k) for k in GRIDS))
    args = ap.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]

    import contextlib

    import jax
    backend = jax.default_backend()
    y, samples = _profile()

    with jax.enable_x64(True), jax.default_device(
            jax.local_devices(backend="cpu")[0]):
        med64 = rt.c1_stratified_from_samples(samples, y,
                                              dtype=np.float64)
    with contextlib.ExitStack():
        med_df = rt.df_eval_profile_medium(samples, y)

    rows = []
    for size in sizes:
        receivers = _receivers(*GRIDS[size])
        ref, cold64, warm64 = _solve(med64, receivers, dtype=np.float64,
                                     on_host=True, tol=1e-9)
        tpu, cold32, warm32 = _solve(med_df, receivers, dtype=np.float32,
                                     on_host=False, tol=2e-6)
        row = {
            "receivers": len(receivers),
            "host_arrivals": int(len(np.asarray(ref.theta0))),
            "chip_arrivals": int(len(np.asarray(tpu.theta0))),
            "host_cold_s": round(cold64, 2),
            "host_warm_s": round(warm64, 2),
            "chip_cold_s": round(cold32, 2),
            "chip_warm_s": round(warm32, 2),
            "chip_backend": backend,
            "warm_speedup": round(warm64 / warm32, 2),
            "host_conv": float(np.mean(np.asarray(ref.converged))),
            "chip_conv": float(np.mean(np.asarray(tpu.converged))),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    wins = [r["receivers"] for r in rows if r["warm_speedup"] > 1.0]
    print(json.dumps({
        "leg": "crossover",
        "min_receivers_chip_wins": min(wins) if wins else None,
        "note": "wire engine.eigenray.EIGENRAY_TPU_MIN_RECEIVERS to this"
    }), flush=True)


if __name__ == "__main__":
    main()
