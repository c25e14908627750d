"""Operating-point sweep for the 3-D tiled-window kernels.

The tiled3 default config ((5,5,5) window, auto segment) refreshes every
~4 steps at the kernel_matrix step size — each refresh gathers
nblocks x nchunks x 128 x 64 floats from the 87 MB per-cell table, so
the 0.75 G matrix row is plausibly REFRESH-bound, not compute-bound.
Larger windows buy longer segments (fewer refreshes) at the price of
more gather chunks per in-kernel evaluation ((5,5,5)=1 chunk,
(6,6,7)=2, (8,8,8)=4, (10,10,10)=8); larger blocks cut the number of
windows but must still contain their rays.  This probe measures the
grid: window class x segment x block_rays, for the kinematic and
dynamic families, on the same 71^3 medium and 1M-ray fan as
kernel_matrix.py.

Every config is its own Mosaic compile (minutes each through the
tunnel, persistent cache on) — run through the checkpointed queue,
in the background, unkilled.

    python benchmarks/tiled3_sweep.py [--dynamic] [--rays N] [--steps N]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax

import raytracing_tpu as rt
from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

BOX3 = (-1.5, 1.5, -1.5, 1.5, -1.5, 1.5)

#: (tile_shape, segment, block_rays).  Round-1 sweep (logs_r5/14, the
#: pre-drift isotropic margins): best (5,5,5) seg=8 @ 0.983 G; every
#: multi-chunk window lost on per-step gather selects; seg past the
#: margin cap collapsed to replay storms.  Round-2 sweep (drift-
#: predicted placement + exact in-kernel containment): push the 1-chunk
#: window's segment through the full drifted budget.
CONFIGS = (
    ((5, 5, 5), None, 1024),       # auto default (drift-predicted: 14)
    ((5, 5, 5), 8, 1024),          # round-1 best, for same-session A/B
    ((5, 5, 5), 20, 1024),
    ((5, 5, 5), 14, 2048),
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dynamic", action="store_true")
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=600)
    args = ap.parse_args(argv)

    from raytracing_tpu.engine.tiled3 import (grid3_trace_dynamic_tiled,
                                              grid3_trace_tiled)

    ax3 = np.arange(-1.75, 1.7501, 0.05)
    X3, Y3, Z3 = np.meshgrid(ax3, ax3, ax3, indexing="ij")
    med3 = rt.c1_medium3_from_samples(
        1.0 / (1.0 + X3 ** 2 + Y3 ** 2 + Z3 ** 2), ax3, ax3, ax3,
        dtype=np.float32)
    R = args.rays
    pos3 = jax.device_put(np.tile(
        np.array([[1.0, 0.0, 0.0]], np.float32), (R, 1)))
    dir3 = jax.device_put(np.stack(
        [np.zeros(R), np.ones(R), np.full(R, 1e-3)],
        -1).astype(np.float32))
    ds = np.float32(2 * np.pi / 600)
    fn = grid3_trace_dynamic_tiled if args.dynamic else grid3_trace_tiled
    fam = "dyn3_tiled" if args.dynamic else "tiled3"

    for tile, seg, blk in CONFIGS:
        kw = dict(steps=args.steps, box=BOX3, block_rays=blk,
                  tile_shape=tile, segment=seg)
        try:
            out = fn("op6", pos3, dir3, ds, med3, **kw)   # compile + warm
            np.asarray(out.pos[:1])
            t0 = time.perf_counter()
            out = fn("op6", pos3, dir3, ds, med3, **kw)
            np.asarray(out.pos[:1])
            dt = time.perf_counter() - t0
            print(json.dumps({
                "family": fam, "tile": list(tile), "segment": seg,
                "block_rays": blk, "seconds": round(dt, 3),
                "gsteps_per_sec": round(R * args.steps / dt / 1e9, 3)}),
                flush=True)
        except Exception as e:    # Mosaic rejection / ladder = data
            print(json.dumps({
                "family": fam, "tile": list(tile), "segment": seg,
                "block_rays": blk,
                "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                flush=True)


if __name__ == "__main__":
    main()
