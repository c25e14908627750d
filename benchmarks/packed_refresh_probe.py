"""Isolate the in-situ refresh-gather term: packed vs unpacked (TPU).

benchmarks/refresh_probe.py measured RAW row-gather bandwidth rising with
row length (36-float rows 7.9 GB/s, 144 13.3, 576 19.9), which scoped the
P-cell packed refresh (engine/segmented._cells_packed).  The pipeline
probe (oriented_probe.py --pack, logs_r4/18) then showed NO wall-clock
win at divisor 303 — this probe decides which link of the chain broke:
it times the ACTUAL `_refresh_windows` jit (gather + layout transpose +
bases) on the production fisheye table at the div-303 refresh shape,
pack in {1, 4, 16}, honest readbacks, device-resident inputs.

    python benchmarks/packed_refresh_probe.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import raytracing_tpu as rt
from raytracing_tpu.engine import segmented as S
from raytracing_tpu.engine.fast import _as_hermite
from raytracing_tpu.media.spline import build_grid_medium
from raytracing_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    scen = rt.scenario("fisheye")
    hm = _as_hermite(build_grid_medium("fisheye", scen.box,
                                       dtype=np.float32))
    meta = (float(hm.x0), float(hm.y0), float(hm.inv_hx),
            float(hm.inv_hy), int(hm.nx), int(hm.ny))
    nodes3d = jnp.asarray(hm.nodes, jnp.float32).reshape(
        hm.ny, hm.nx, hm.nodes.shape[-1])

    r = 1 << 20
    block_rays = 1024
    nblocks = r // block_rays
    th = tw = 16
    nchunks = 2
    n_ch = nchunks * 36

    # a Morton-coherent synthetic state: blocks of rays inside one cell
    # neighborhood each (the production case after the sort)
    rng = np.random.default_rng(0)
    cx = rng.uniform(20, hm.nx - 20, nblocks)
    cy = rng.uniform(20, hm.ny - 20, nblocks)
    px = ((cx[:, None] + rng.uniform(-2, 2, (nblocks, block_rays)))
          / meta[2] + meta[0])
    py = ((cy[:, None] + rng.uniform(-2, 2, (nblocks, block_rays)))
          / meta[3] + meta[1])
    st = (jax.device_put(px.reshape(-1, S.LANES).astype(np.float32)),
          jax.device_put(py.reshape(-1, S.LANES).astype(np.float32)))

    for pack in (1, 4, 16):
        if pack == 1:
            c36, ncx_pad = S._cells36(nodes3d), None
        else:
            c36, ncx_pad = S._cells_packed(nodes3d, pack)
        c36 = jax.device_put(c36)

        @jax.jit
        def refresh(st, c36, pack=pack, ncx_pad=ncx_pad):
            return S._refresh_windows(
                st, jnp.float32(-np.inf), c36, meta, th, tw, nblocks,
                block_rays, 2.0, 2.0, nchunks, n_ch,
                pack=pack, ncx_pad=ncx_pad)

        flag, tiles, bases = refresh(st, c36)
        np.asarray(tiles.ravel()[:1])
        t0 = time.time()
        n = 10
        for _ in range(n):
            flag, tiles, bases = refresh(st, c36)
        np.asarray(tiles.ravel()[:1])
        dt = (time.time() - t0) / n
        nbytes = tiles.size * 4
        print(json.dumps({
            "pack": pack, "ms": round(dt * 1e3, 2),
            "tiles_gb_s": round(nbytes / dt / 1e9, 1),
            "flag_ok": bool(np.asarray(flag) <= 0)}), flush=True)


if __name__ == "__main__":
    main()
