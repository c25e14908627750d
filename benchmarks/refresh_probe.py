"""Microbench window-refresh formulations on the TPU (VERDICT r2 #3).

The per-row window refresh moves ~151 MB (1M rays x 128 cells x 36 f32
coeffs / 128 rays-per-group) per refresh; XLA formulations differ by an
order of magnitude.  This probes each candidate with honest readbacks:

  A  c36[wid]          (ncells, 36) row gather -> (G, 128, 36)
  At A + transpose to the kernel's channel-major (36, nb, rows, 128)
  C  c36T[:, wid]      (36, ncells) column gather -> (36, G, 128)
  D  vmapped dynamic_slice (th, tw, 36) windows from (ny-1, nx-1, 36)
  E  one gather, slice_sizes=(36, th, tw) from plane-major (36, ny, nx)
  Et E + reshape/transpose to (36, nb, rows, 128)
  N  node windows (th+1, tw+1, 9) via vmapped dynamic_slice (38 MB only)
  Nc N + corner-stack to cells36 layout (the round-2 refresh)

    python benchmarks/refresh_probe.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NX = NY = 510          # cells (511 nodes)
G = 8192               # 1M rays / 128
TH, TW = 8, 16
ROWS = 8
NB = G // ROWS


def bench(name, fn, *args):
    args = [jax.device_put(a) for a in args]
    f = jax.jit(fn)
    r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[:1]), r)
    t0 = time.time()
    n = 5
    for _ in range(n):
        r = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[:1]), r)
    dt = (time.time() - t0) / n
    nbytes = sum(x.size * 4 for x in jax.tree_util.tree_leaves(r))
    print(f"{name:3s} {dt*1e3:8.2f} ms  {nbytes/dt/1e9:7.1f} GB/s out",
          file=sys.stderr)


def main():
    rng = np.random.default_rng(0)
    ncells = NX * NY
    c36 = rng.standard_normal((ncells, 36)).astype(np.float32)
    c36T = np.ascontiguousarray(c36.T)
    c36_3d = c36.reshape(NY, NX, 36)
    c36_pm = np.ascontiguousarray(c36_3d.transpose(2, 0, 1))  # (36, NY, NX)
    nodes = rng.standard_normal((NY + 1, NX + 1, 9)).astype(np.float32)

    bix = rng.integers(0, NX - TW, G).astype(np.int32)
    biy = rng.integers(0, NY - TH, G).astype(np.int32)
    j = np.arange(128, dtype=np.int32)
    jy, jx = np.minimum(j // TW, TH - 1), j % TW
    wid = (biy[:, None] + jy[None, :]) * NX + (bix[:, None] + jx[None, :])

    bench("A", lambda t, w: t[w], c36, wid)
    bench("At", lambda t, w: jnp.transpose(
        t[w].reshape(NB, ROWS, 128, 36), (3, 0, 1, 2)), c36, wid)
    bench("C", lambda t, w: t[:, w], c36T, wid)
    bench("D", lambda t, by, bx: jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(t, (y, x, jnp.int32(0)),
                                           (TH, TW, 36)))(by, bx),
          c36_3d, biy, bix)
    bench("E", lambda t, by, bx: jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(t, (jnp.int32(0), y, x),
                                           (36, TH, TW)))(by, bx),
          c36_pm, biy, bix)
    bench("Et", lambda t, by, bx: jnp.transpose(
        jax.vmap(lambda y, x: jax.lax.dynamic_slice(
            t, (jnp.int32(0), y, x), (36, TH, TW)))(by, bx)
        .reshape(NB, ROWS, 36, 128), (2, 0, 1, 3)),
          c36_pm, biy, bix)
    bench("N", lambda t, by, bx: jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(t, (y, x, jnp.int32(0)),
                                           (TH + 1, TW + 1, 9)))(by, bx),
          nodes, biy, bix)

    def nc(t, by, bx):
        win = jax.vmap(lambda y, x: jax.lax.dynamic_slice(
            t, (y, x, jnp.int32(0)), (TH + 1, TW + 1, 9)))(by, bx)
        return jnp.stack([win[:, :-1, :-1], win[:, :-1, 1:],
                          win[:, 1:, :-1], win[:, 1:, 1:]],
                         axis=-1).reshape(G, TH * TW, 36)
    bench("Nc", nc, nodes, biy, bix)


if __name__ == "__main__":
    main()
