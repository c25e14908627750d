"""Tiny first-compile canaries for the round-5 Mosaic kernel families.

Round 5 added two Pallas families whose FIRST real-Mosaic compile happens
on this round's queue: the 3-D tiled-window kernel over sampled
tri-Hermite media (engine/tiled3.grid3_trace_tiled) and the fused 3-D
DYNAMIC kernel (kernels/dynamic3d.dynamic3d_trace_final).  Mosaic can
reject — or wedge the single-lane remote compile helper on — programs
interpret mode accepts (CLAUDE.md), so each family gets a tiny-trip
canary (1024-ray blocks, the TPU Mosaic floor; 8-16 steps) that runs
BEFORE kernel_matrix.py's full-size rows.  Also checks small-scale
numeric parity vs the scan tier while it's here.

    python benchmarks/canary3d.py [tiled3|dyn3|all]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax

import raytracing_tpu as rt
from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

BOX3 = (-1.5, 1.5, -1.5, 1.5, -1.5, 1.5)
R = 1024


def _launch():
    tilt = np.linspace(0, 0.05, R).astype(np.float32)
    pos3 = jax.device_put(
        np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (R, 1)))
    dir3 = jax.device_put(np.stack(
        [np.zeros(R, np.float32), np.cos(tilt), np.sin(tilt)],
        -1).astype(np.float32))
    return pos3, dir3


def canary_tiled3():
    from raytracing_tpu.engine.tiled3 import grid3_trace_tiled

    ax = np.arange(-1.75, 1.7501, 0.05)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    med3 = rt.c1_medium3_from_samples(
        1.0 / (1.0 + X ** 2 + Y ** 2 + Z ** 2), ax, ax, ax,
        dtype=np.float32)
    pos3, dir3 = _launch()
    ds = np.float32(2 * np.pi / 600)
    interp = jax.default_backend() == "cpu"
    t0 = time.perf_counter()
    g = grid3_trace_tiled("op6", pos3, dir3, ds, med3, steps=16,
                          box=BOX3, block_rays=1024, interpret=interp)
    np.asarray(g.pos[:1])
    cold = time.perf_counter() - t0
    # small-scale parity vs the 3-D scan tier on the same medium
    s = rt.trace3d("op6", med3, pos0=np.asarray(pos3),
                   dir0=np.asarray(dir3), delta_s=float(ds), steps=16,
                   box=BOX3, dtype=np.float32, mode="metrics")
    dpos = float(np.abs(np.asarray(g.pos)
                        - np.asarray(s.final.pos)).max())
    print(json.dumps({"canary": "tiled3", "cold_s": round(cold, 2),
                      "pos_max_abs_vs_scan": dpos}), flush=True)


def canary_dyn3():
    from raytracing_tpu.kernels.dynamic3d import dynamic3d_trace_final

    pos3, dir3 = _launch()
    ds = np.float32(2 * np.pi / 600)
    interp = jax.default_backend() == "cpu"
    t0 = time.perf_counter()
    d = dynamic3d_trace_final(pos3, dir3, ds, field="fisheye", op="op6",
                              steps=16, box=BOX3, block_rays=1024,
                              interpret=interp)
    np.asarray(d.detq[:1])
    cold = time.perf_counter() - t0
    med3 = rt.analytic_medium3("fisheye")
    s = rt.trace_dynamic3("op6", med3, pos0=np.asarray(pos3),
                          dir0=np.asarray(dir3), delta_s=float(ds),
                          steps=16, box=BOX3, dtype=np.float32,
                          mode="metrics")
    dq = np.asarray(d.detq, np.float64)
    sq = np.asarray(s.detq, np.float64)
    rel = float(np.max(np.abs(dq - sq)
                       / np.maximum(np.abs(sq), 1e-6)))
    print(json.dumps({"canary": "dyn3", "cold_s": round(cold, 2),
                      "detq_rel_vs_scan": rel}), flush=True)


def canary_dyntiled3():
    """First Mosaic compile of the 25-state dynamic tiled-window kernel
    (engine/tiled3.grid3_trace_dynamic_tiled) — tiny trips, staged
    before any full-size row."""
    from raytracing_tpu.engine.tiled3 import grid3_trace_dynamic_tiled

    ax = np.arange(-1.75, 1.7501, 0.05)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    med3 = rt.c1_medium3_from_samples(
        1.0 / (1.0 + X ** 2 + Y ** 2 + Z ** 2), ax, ax, ax,
        dtype=np.float32)
    pos3, dir3 = _launch()
    ds = np.float32(2 * np.pi / 600)
    interp = jax.default_backend() == "cpu"
    t0 = time.perf_counter()
    g = grid3_trace_dynamic_tiled("op6", pos3, dir3, ds, med3, steps=16,
                                  box=BOX3, block_rays=1024,
                                  interpret=interp)
    np.asarray(g.detq[:1])
    cold = time.perf_counter() - t0
    s = rt.trace_dynamic3("op6", med3, pos0=np.asarray(pos3),
                          dir0=np.asarray(dir3), delta_s=float(ds),
                          steps=16, box=BOX3, dtype=np.float32,
                          mode="metrics")
    dq = np.asarray(g.detq, np.float64)
    sq = np.asarray(s.detq, np.float64)
    rel = float(np.max(np.abs(dq - sq)
                       / np.maximum(np.abs(sq), 1e-6)))
    kmah_ok = bool(np.array_equal(np.asarray(g.kmah), np.asarray(s.kmah)))
    print(json.dumps({"canary": "dyntiled3", "cold_s": round(cold, 2),
                      "detq_rel_vs_scan": rel, "kmah_match": kmah_ok}),
          flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("tiled3", "all"):
        canary_tiled3()
    if which in ("dyn3", "all"):
        canary_dyn3()
    if which in ("dyntiled3", "all"):
        canary_dyntiled3()


if __name__ == "__main__":
    main()
