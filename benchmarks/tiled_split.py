"""Split tiled-kernel time into refresh vs in-kernel cost.

total(seg) ~ steps * per_step_kernel + (steps/seg) * per_refresh
Varying `segment` at fixed steps separates the two terms.
"""
import time

import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.engine.segmented import grid_trace_tiled
from raytracing_tpu.media.hermite import build_hermite_medium
from raytracing_tpu.media.spline import build_grid_medium

scen = rt.scenario("fisheye")
hm = build_hermite_medium(build_grid_medium("fisheye", scen.box,
                                            dtype=np.float32))
box = tuple(scen.box)
r = 1 << 20
theta = (np.pi / 2 + np.linspace(-0.02, 0.02, r)).astype(np.float32)
pos = np.tile(np.array([1.0, 0.0], np.float32), (r, 1))
steps = 2048
ds = 2 * np.pi / 4587

for seg in (64, 32, 16):
    for rep in range(2):
        t0 = time.perf_counter()
        res = grid_trace_tiled("op6", pos, theta, np.float32(ds), hm,
                               steps=steps, box=box, block_rays=1024,
                               segment=seg)
        np.asarray(res.pos[:8])
        dt = time.perf_counter() - t0
    print(f"seg={seg}: {dt:.3f} s ({r * steps / dt / 1e9:.3f} G), "
          f"{steps // seg} refreshes", flush=True)

for br in (2048, 4096):
    for rep in range(2):
        t0 = time.perf_counter()
        res = grid_trace_tiled("op6", pos, theta, np.float32(ds), hm,
                               steps=steps, box=box, block_rays=br,
                               segment=64)
        np.asarray(res.pos[:8])
        dt = time.perf_counter() - t0
    print(f"block_rays={br}: {dt:.3f} s ({r * steps / dt / 1e9:.3f} G)",
          flush=True)
