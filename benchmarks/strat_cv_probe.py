"""Root-cause the vert_strat momentum-CV floor (VERDICT r2 weak #6).

BENCH_SUITE r2 measured CV(p_x) = 0.0057 % for op8 on the SAMPLED vert
medium vs 3e-05 % on the analytic field at the same step — 200x.  Two
candidate causes with opposite fixes:

* f32 arithmetic / f32 tables -> fix = df32 eval or finer dtype;
* the reference medium's own n/grad INCONSISTENCY -> no arithmetic fix:
  the pipeline interpolates n bilinearly from Z but takes the gradient
  from an independently fitted cubic spline of np.gradient(Z)
  (RT_bench.py:455-458).  gy is then NOT the derivative of the n the
  integrator uses, and momentum conservation (which holds exactly only
  for consistent n/grad pairs) is broken at the MEDIUM level, f64 or not.

This probe separates them by running the same op8 vert trace through the
scan engine in four configurations: analytic f32/f64 and sampled
f32/f64 — if the sampled-f64 CV stays at the sampled-f32 level, the
floor is the medium, not the word size.  A finer grid column then shows
the knob that actually buys margin (the inconsistency shrinks with the
pitch^2 of the bilinear interpolant).

    python benchmarks/strat_cv_probe.py
"""
from __future__ import annotations

import sys

import jax

# CPU-pinned: the probe needs float64 columns, and the scan engine is the
# right tier for a 42-ray diagnostic (the env var is ignored — see
# CLAUDE.md; config.update works)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import raytracing_tpu as rt
from raytracing_tpu import config
from raytracing_tpu.engine import oracles
from raytracing_tpu.media.spline import build_stratified_medium


def cv_of(medium, dtype, ds):
    scen = rt.scenario("vert")
    res = rt.trace("op8", scen, medium, delta_s=ds, mode="history",
                   dtype=dtype)
    cv = np.asarray(oracles.momentum_cv_pct_from_history(res))
    return float(np.mean(cv[1:-1]))   # interior rays, RT_bench.py:1352-1360


def main():
    ds = config.SIGMA / 2.74          # op8's calibrated step
    rows = []
    for label, med_fn in (
            ("analytic", lambda d: rt.analytic_medium("vert_heterogeneous")),
            ("sampled DELTA", lambda d: build_stratified_medium(
                "vert_heterogeneous", rt.scenario("vert").box, dtype=d)),
            ("sampled DELTA/4", lambda d: build_stratified_medium(
                "vert_heterogeneous", rt.scenario("vert").box,
                delta=config.DELTA / 4.0, dtype=d))):
        for dtype in (np.float32, np.float64):
            cv = cv_of(med_fn(dtype), dtype, ds)
            rows.append((label, np.dtype(dtype).name, cv))
            print(f"{label:16s} {np.dtype(dtype).name:8s} "
                  f"CV = {cv:.6f} %", file=sys.stderr)
    return rows


if __name__ == "__main__":
    main()
