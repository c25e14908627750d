"""Regenerate the ARCHITECTURE.md kernel-throughput table on real hardware.

Run:  python benchmarks/kernel_matrix.py  (TPU host; ~3 min after compiles)
Writes benchmarks/kernel_matrix.json.

``--only PREFIX[,PREFIX...]`` re-measures only the rows whose name starts
with a given prefix and MERGES them into the existing JSON (all other
rows kept verbatim).  Use after a change that touches a known subset of
kernel families — a full cold regen costs ~25 Mosaic compiles through
the single-lane tunnel, which a targeted refresh avoids.
"""
import argparse
import json
import time

import numpy as np
import jax

import raytracing_tpu as rt
from raytracing_tpu.kernels.fused import fused_trace_final
from raytracing_tpu.kernels.golden import golden_trace_final
from raytracing_tpu.utils.cache import enable_persistent_cache

# the matrix measures WARM steady-state rates; caching compiles only
# saves tunnel time on re-runs (disable with RT_NO_CACHE=1)
enable_persistent_cache()

R = 1 << 20
DIV = 4587


def best_of(fn, reps=3, per=3):
    """Best mean-of-`per` queued calls with ONE final readback barrier: the
    tunnel's device->host barrier costs ~10-30 ms per call, so blocking
    every call understates the fast kernels.  `fn` must RETURN a device
    array (no internal blocking)."""
    np.asarray(fn()[:1])   # compile + settle
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(per):
            out = fn()
        np.asarray(out[:1])
        ts.append((time.perf_counter() - t0) / per)
    return min(ts)


ONLY = ()   # row-name prefixes; empty = measure everything


def want(name):
    return not ONLY or any(name.startswith(p) for p in ONLY)


def main():
    scen = rt.scenario("fisheye")
    theta0 = jax.device_put(np.full(R, np.pi / 2, np.float32))
    pos0 = jax.device_put(
        np.stack([np.ones(R), np.zeros(R)], -1).astype(np.float32))
    ds = np.float32(2 * np.pi / DIV)
    out = {}

    from raytracing_tpu.kernels.fisheye import fisheye_trace_final
    spec_pos = jax.device_put(
        np.stack([np.ones(R), np.zeros(R)], -1).astype(np.float32))
    spec_th = jax.device_put(np.full(R, np.pi / 2, np.float32))

    def spec():
        return fisheye_trace_final(spec_pos, spec_th,
                                   np.float32(2 * np.pi / DIV),
                                   steps=1 * (DIV + 1) - 1)[0]

    if want("specialized_op1"):
        t = best_of(spec)
        out["specialized_op1"] = round(R * DIV / t / 1e9, 2)

    for op in ["op1", "op2", "op3", "op4", "op6", "op7", "op8"]:
        if not want(f"fused_{op}"):
            continue
        def run(op=op):
            return fused_trace_final(pos0, theta0, ds, field="fisheye",
                                     op=op, steps=DIV, box=tuple(scen.box)).pos
        out[f"fused_{op}"] = round(R * DIV / best_of(run) / 1e9, 2)

    aniso = rt.scenario("aniso")
    vth = jax.device_put(np.random.default_rng(0)
                         .uniform(0.05, 1.5, R).astype(np.float32))
    vpos = jax.device_put(
        np.stack([np.full(R, -2.0), np.full(R, -2.0)], -1).astype(np.float32))
    for op in ["op5", "op9", "op10", "op11", "op10n", "op11n"]:
        if not want(f"golden_{op}"):
            continue
        def run(op=op):
            return golden_trace_final(vpos, vth, np.float32(0.0193),
                                      np.float32(3.0),
                                      field="vert_heterogeneous", op=op,
                                      steps=2000, box=tuple(aniso.box)).pos
        out[f"golden_{op}"] = round(R * 2000 / best_of(run) / 1e9, 2)

    # golden on the sampled 1-D tables (aniso production medium)
    from raytracing_tpu.media.spline import build_stratified_medium
    smed = build_stratified_medium("vert_heterogeneous", aniso.box,
                                   dtype=np.float32)

    def run_gs():
        return golden_trace_final(vpos, vth, np.float32(0.0193),
                                  np.float32(3.0), field=aniso.field,
                                  op="op11", steps=2000,
                                  box=tuple(aniso.box), medium=smed).pos
    if want("golden_strat_op11"):
        out["golden_strat_op11"] = round(
            R * 2000 / best_of(run_gs) / 1e9, 2)

    # 2-D sampled-spline medium via the tiled window kernel (per-cell packed
    # windows, Morton-sorted blocks) — the reference's production pipeline
    from raytracing_tpu.engine.segmented import grid_trace_tiled
    from raytracing_tpu.media.hermite import build_hermite_medium
    from raytracing_tpu.media.spline import build_grid_medium

    hmed = build_hermite_medium(
        build_grid_medium("fisheye", scen.box, dtype=np.float32))

    def run_tiled():
        return grid_trace_tiled("op1", pos0, theta0, ds, hmed,
                                steps=DIV - 1, box=tuple(scen.box)).pos
    # internal host round-loop syncs per round; time single calls
    if want("tiled_grid_op1"):
        t = best_of(run_tiled, per=1)
        out["tiled_grid_op1"] = round(R * (DIV - 1) / t / 1e9, 2)

    # golden family on the 2-D spline (closed-form minimizer + window
    # gathers): iso op5 on the sampled fisheye medium
    def run_tiled_gold():
        return grid_trace_tiled("op5", pos0, theta0, ds, hmed,
                                steps=DIV - 1, box=tuple(scen.box)).pos
    if want("tiled_grid_op5"):
        t = best_of(run_tiled_gold, per=1)
        out["tiled_grid_op5"] = round(R * (DIV - 1) / t / 1e9, 2)

    # DYNAMIC tiled kernel: paraxial tangents with compensated carries over
    # the same 2-D spline window machinery (round 4; measured ~76 % of the
    # kinematic tiled rate)
    from raytracing_tpu.engine.segmented import grid_trace_dynamic_tiled

    def run_tiled_dyn():
        return grid_trace_dynamic_tiled(
            "op6", pos0, theta0, ds, hmed, steps=DIV - 1,
            box=tuple(scen.box), block_rays=1024).q
    if want("dyn_tiled_op6"):
        t = best_of(run_tiled_dyn, per=1)
        out["dyn_tiled_op6"] = round(R * (DIV - 1) / t / 1e9, 2)

    from raytracing_tpu.kernels.df import _df_core_segmented

    def run_df():
        # time the device core; df_trace's host recombination would add a
        # full-array download per call
        return _df_core_segmented(pos0, theta0, ds, field="fisheye",
                                  segment=512, n_full=DIV // 512,
                                  rem=DIV % 512)[0]
    if want("df32_rk4"):
        out["df32_rk4"] = round(R * DIV / best_of(run_df) / 1e9, 2)

    # ---- every remaining production kernel family gets a canonical row
    # (VERDICT r4 weak #2: logs-only numbers are invisible to regression
    # tracking) ----------------------------------------------------------

    # fused analytic DYNAMIC kernel (kernels/dynamic.py, hand tangents)
    from raytracing_tpu.kernels.dynamic import (dynamic_trace_final,
                                                dynamic_trace_final_strat)

    def run_dyn():
        return dynamic_trace_final(pos0, theta0, ds, field="fisheye",
                                   op="op6", steps=DIV,
                                   box=tuple(scen.box)).q
    if want("dyn_op6"):
        out["dyn_op6"] = round(R * DIV / best_of(run_dyn) / 1e9, 2)

    # stratified-table DYNAMIC kernel (1-D sampled medium)
    def run_dyn_strat():
        return dynamic_trace_final_strat(vpos, vth, np.float32(0.0193),
                                         smed, op="op6", steps=2000,
                                         box=tuple(aniso.box)).q
    if want("dyn_strat_op6"):
        out["dyn_strat_op6"] = round(
            R * 2000 / best_of(run_dyn_strat) / 1e9, 2)

    # fused 3-D kinematic kernel (kernels/fused3d.py, analytic fisheye)
    from raytracing_tpu.kernels.fused3d import fused3d_trace_final

    pos3 = jax.device_put(np.stack(
        [np.ones(R), np.zeros(R), np.zeros(R)], -1).astype(np.float32))
    dir3 = jax.device_put(np.stack(
        [np.zeros(R), np.ones(R), np.full(R, 1e-3)], -1).astype(np.float32))
    box3 = (-1.5, 1.5, -1.5, 1.5, -1.5, 1.5)
    D3 = 600

    def run_f3():
        return fused3d_trace_final(pos3, dir3, np.float32(2 * np.pi / D3),
                                   field="fisheye", op="op6", steps=D3,
                                   box=box3).pos
    if want("fused3d_op6"):
        out["fused3d_op6"] = round(R * D3 / best_of(run_f3) / 1e9, 2)

    # fused 3-D DYNAMIC kernel (kernels/dynamic3d.py, two hand tangents)
    from raytracing_tpu.kernels.dynamic3d import dynamic3d_trace_final

    def run_d3():
        return dynamic3d_trace_final(pos3, dir3, np.float32(2 * np.pi / D3),
                                     field="fisheye", op="op6", steps=D3,
                                     box=box3).detq
    if want("dyn3_op6"):
        out["dyn3_op6"] = round(R * D3 / best_of(run_d3) / 1e9, 2)

    # 3-D tiled-window kernel over a sampled tri-Hermite grid3 medium
    # (engine/tiled3.py — the 3-D sample->fit->trace production path)
    from raytracing_tpu.engine.tiled3 import grid3_trace_tiled
    from raytracing_tpu.media.grid3 import c1_medium3_from_samples

    ax3 = np.arange(-1.75, 1.7501, 0.05)
    X3, Y3, Z3 = np.meshgrid(ax3, ax3, ax3, indexing="ij")
    med3 = c1_medium3_from_samples(
        1.0 / (1.0 + X3 ** 2 + Y3 ** 2 + Z3 ** 2), ax3, ax3, ax3,
        dtype=np.float32)

    def run_t3():
        return grid3_trace_tiled("op6", pos3, dir3,
                                 np.float32(2 * np.pi / D3), med3,
                                 steps=D3, box=box3, block_rays=1024).pos
    if want("tiled3_grid_op6"):
        t = best_of(run_t3, per=1)
        out["tiled3_grid_op6"] = round(R * D3 / t / 1e9, 2)

    # 3-D DYNAMIC tiled-window kernel (round 5: the paraxial twin — both
    # launch tangents + the exact patch Hessian inside the window kernel)
    from raytracing_tpu.engine.tiled3 import grid3_trace_dynamic_tiled

    def run_dt3():
        return grid3_trace_dynamic_tiled(
            "op6", pos3, dir3, np.float32(2 * np.pi / D3), med3,
            steps=D3, box=box3, block_rays=1024).detq
    if want("dyn3_tiled_op6"):
        t = best_of(run_dt3, per=1)
        out["dyn3_tiled_op6"] = round(R * D3 / t / 1e9, 2)

    if ONLY:   # targeted refresh: merge over the existing table
        try:
            with open("benchmarks/kernel_matrix.json") as f:
                merged = json.load(f)
        except FileNotFoundError:
            merged = {}
        merged.update(out)
        out = merged

    with open("benchmarks/kernel_matrix.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated row-name prefixes to re-measure "
                         "and merge (default: full regen)")
    ns = ap.parse_args()
    if ns.only:
        ONLY = tuple(p for p in ns.only.split(",") if p)
    main()
