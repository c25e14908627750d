"""Tiled-window DYNAMIC kernel for sampled 3-D (tri-Hermite) media.

The paraxial twin of tests/test_tiled3.py — the boundary-value extension
of the reference's production sample -> fit -> trace pipeline
(RT_bench.py:412-464 + the trazar dynamics, RT_bench.py:766-948) at
kernel speed in three dimensions.  Tests pin

* unit-level Hessian parity: kernels.dynamic3d._tile_nag3_h's gather +
  blend equals jax.jacfwd of C1Grid3Medium.n_and_grad3 (the exact second
  derivative of the SAME tricubic patch) to float64 roundoff,
* full-observable parity with the scan tier's exact jvp
  (engine/dynamic3d.trace_dynamic3): pos / traveltime / det Q / KMAH /
  the focus locator — including its 1-based step labels (the scan feeds
  arange(1, ...)) and the in_limit gate against chained-segment overrun,
* bit-identical segment chaining (the window-refresh seam adds nothing),
* the escalation ladder's RuntimeError for dispersed batches and
  fast_dynamic3's routing + scan fallback,
* sharded rounds matching the single-device result on the CPU mesh.
"""
import numpy as np
import pytest

from raytracing_tpu.engine.dynamic3d import trace_dynamic3
from raytracing_tpu.engine.tiled3 import grid3_trace_dynamic_tiled
from raytracing_tpu.media.grid3 import c1_medium3_from_samples

# heavyweight module: interpret-mode kernel chains (CLAUDE.md test tiers)
pytestmark = pytest.mark.slow

BOX = (-1.5, 1.5, -1.5, 1.5, -1.5, 1.5)


@pytest.fixture(scope="module")
def fisheye3_medium():
    ax = np.linspace(-1.6, 1.6, 33)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")   # F is [iz, iy, ix]
    F = 1.0 / (1.0 + X ** 2 + Y ** 2 + Z ** 2)
    return c1_medium3_from_samples(F, ax, ax, ax, dtype=np.float32)


def _fan(r, spread=0.05):
    th = np.pi / 2 + np.linspace(-spread, spread, r)
    dirs = np.stack([np.cos(th), np.sin(th), np.full(r, 0.02)],
                    -1).astype(np.float32)
    pos0 = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (r, 1))
    return pos0, dirs


def test_tile_nag3_h_matches_jacfwd(fisheye3_medium):
    """The window Hessian IS the second derivative of the tricubic patch:
    compare against jax.jacfwd of n_and_grad3 in float64 (symmetric by
    construction; all six unique components to ~1e-9 relative)."""
    import jax
    import jax.numpy as jnp

    from raytracing_tpu.engine.tiled3 import _cells64, _window_ids3
    from raytracing_tpu.kernels.dynamic3d import _tile_nag3_h
    from raytracing_tpu.kernels.fused3d import LANES

    ax = np.linspace(-1.6, 1.6, 33)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    F = 1.0 / (1.0 + X ** 2 + Y ** 2 + Z ** 2)
    med = c1_medium3_from_samples(F, ax, ax, ax, dtype=np.float64)

    rng = np.random.default_rng(0)
    base = (3, 4, 5)
    pts = rng.uniform(0.0, 5.0, (3, 2, LANES))
    hx, hy, hz = 1 / med.inv_hx, 1 / med.inv_hy, 1 / med.inv_hz
    x = med.x0 + (base[0] + pts[0]) * hx
    y = med.y0 + (base[1] + pts[1]) * hy
    z = med.z0 + (base[2] + pts[2]) * hz

    nodes4d = jnp.asarray(med.nodes).reshape(med.nz, med.ny, med.nx, 8)
    c64 = _cells64(nodes4d)
    wid = _window_ids3(np.array([base[0]]), np.array([base[1]]),
                       np.array([base[2]]), 5, 5, 5, LANES,
                       med.nx - 1, med.ny - 1)
    cells = np.asarray(c64)[np.asarray(wid)[0]]
    T = [jnp.broadcast_to(jnp.asarray(cells[:, i])[None, :], (2, LANES))
         for i in range(64)]
    meta3 = (float(med.x0), float(med.y0), float(med.z0),
             float(med.inv_hx), float(med.inv_hy), float(med.inv_hz),
             med.nx, med.ny, med.nz, 5, 5, 5)
    nag = _tile_nag3_h(T, jnp.float64(base[0]), jnp.float64(base[1]),
                       jnp.float64(base[2]), meta3)
    out = nag(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    n_k, g_k, h_k = out[0], out[1:4], out[4:]

    def gradf(p):
        n, g = med.n_and_grad3(p[0], p[1], p[2])
        return jnp.stack(g)

    P = jnp.stack([jnp.asarray(x).ravel(), jnp.asarray(y).ravel(),
                   jnp.asarray(z).ravel()], -1)
    J = np.asarray(jax.vmap(jax.jacfwd(gradf))(P))          # (N, 3, 3)
    ref = (J[:, 0, 0], J[:, 0, 1], J[:, 0, 2],
           J[:, 1, 1], J[:, 1, 2], J[:, 2, 2])
    for kern, want in zip(h_k, ref):
        np.testing.assert_allclose(np.asarray(kern).ravel(), want,
                                   rtol=1e-8, atol=1e-10)
    # consistency: n and grad from the same patch too
    n_m, (gx_m, gy_m, gz_m) = med.n_and_grad3(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(n_k), np.asarray(n_m),
                               rtol=1e-12)
    for a, b in zip(g_k, (gx_m, gy_m, gz_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("op", ["op1", "op6"])
def test_dyn_tiled3_matches_scan_jvp(fisheye3_medium, op):
    """Every Dyn3Final observable against trace_dynamic3's exact jvp.
    det Q carries f32 accumulation-order noise (closed-form Hessian vs
    linearized jvp arithmetic) — ~5e-5 median over 300 steps; the focus
    locator must agree EXACTLY (same step labels, same admitted set)."""
    med = fisheye3_medium
    pos0, dirs = _fan(256)
    ds = np.float32(2 * np.pi / 600)
    g = grid3_trace_dynamic_tiled(op, pos0, dirs, ds, med, steps=300,
                                  box=BOX, block_rays=256, interpret=True)
    t = trace_dynamic3(op, med, pos0=pos0, dir0=dirs, delta_s=float(ds),
                       steps=300, box=BOX, mode="metrics",
                       dtype=np.float32)
    np.testing.assert_allclose(np.asarray(g.pos), np.asarray(t.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.traveltime),
                               np.asarray(t.traveltime), atol=1e-5)
    m = np.asarray(t.detq) != 0
    rel = (np.abs(np.asarray(g.detq) - np.asarray(t.detq))[m]
           / np.abs(np.asarray(t.detq))[m])
    assert np.percentile(rel, 95) < 1e-3
    np.testing.assert_array_equal(np.asarray(g.kmah), np.asarray(t.kmah))
    np.testing.assert_array_equal(np.asarray(g.min_absdet_step),
                                  np.asarray(t.min_absdet_step))
    np.testing.assert_allclose(np.asarray(g.min_absdet),
                               np.asarray(t.min_absdet),
                               rtol=1e-2, atol=1e-7)


def test_dyn_tiled3_chain_bit_identity(fisheye3_medium):
    """Different segment lengths produce bit-identical results: the
    refresh seam re-evaluates n/g/H from the same table floats the
    previous segment's last step read (no Kahan state, no reordering)."""
    med = fisheye3_medium
    pos0, dirs = _fan(256)
    ds = np.float32(2 * np.pi / 600)
    a = grid3_trace_dynamic_tiled("op6", pos0, dirs, ds, med, steps=120,
                                  box=BOX, block_rays=256, interpret=True,
                                  segment=8)
    b = grid3_trace_dynamic_tiled("op6", pos0, dirs, ds, med, steps=120,
                                  box=BOX, block_rays=256, interpret=True,
                                  segment=24)
    for f in a._fields:
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)


def test_dyn_tiled3_dispersed_batch_raises():
    ax = np.linspace(-1.6, 1.6, 6)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    small = c1_medium3_from_samples(1.0 / (1.0 + X**2 + Y**2 + Z**2),
                                    ax, ax, ax, dtype=np.float32)
    rng = np.random.default_rng(7)
    r = 256
    pos0 = rng.uniform(-1.4, 1.4, (r, 3)).astype(np.float32)
    dirs = rng.normal(size=(r, 3)).astype(np.float32)
    with pytest.raises(RuntimeError, match="scan tier"):
        grid3_trace_dynamic_tiled("op6", pos0, dirs, np.float32(0.01),
                                  small, steps=50, box=BOX,
                                  block_rays=256, interpret=True)


def test_fast_dynamic3_routes_grid3_to_tiled(fisheye3_medium):
    from raytracing_tpu.engine.fast import fast_dynamic3

    med = fisheye3_medium
    pos0, dirs = _fan(200)        # ragged: exercises padding
    ds = 2 * np.pi / 600
    res, eng = fast_dynamic3("op6", med, pos0=pos0, dir0=dirs,
                             delta_s=ds, steps=120, box=BOX,
                             block_rays=256, interpret=True)
    assert eng == "dynamic3-kernel-tiled" and res.pos.shape == (200, 3)
    t = trace_dynamic3("op6", med, pos0=pos0, dir0=dirs, delta_s=ds,
                       steps=120, box=BOX, mode="metrics",
                       dtype=np.float32)
    np.testing.assert_allclose(np.asarray(res.pos), np.asarray(t.pos),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res.kmah),
                                  np.asarray(t.kmah))

    # dispersed batch: falls back to the scan tier
    ax = np.linspace(-1.6, 1.6, 6)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    small = c1_medium3_from_samples(1.0 / (1.0 + X**2 + Y**2 + Z**2),
                                    ax, ax, ax, dtype=np.float32)
    rng = np.random.default_rng(7)
    pos_d = rng.uniform(-1.4, 1.4, (200, 3)).astype(np.float32)
    dir_d = rng.normal(size=(200, 3)).astype(np.float32)
    res2, eng2 = fast_dynamic3("op6", small, pos0=pos_d, dir0=dir_d,
                               delta_s=0.01, steps=50, box=BOX,
                               block_rays=256, interpret=True)
    assert eng2 == "dynamic3-scan"


def test_dyn_tiled3_sharded_matches_single(fisheye3_medium):
    """grid3_trace_dynamic_tiled(mesh=...) shards rays across the device
    mesh; shard-local windows + a pmax'd flag reproduce the
    single-device dynamics bit-exactly (same blocks, same windows)."""
    import jax
    from jax.sharding import Mesh

    med = fisheye3_medium
    pos0, dirs = _fan(1024)
    ds = np.float32(2 * np.pi / 600)
    a = grid3_trace_dynamic_tiled("op6", pos0, dirs, ds, med, steps=120,
                                  box=BOX, block_rays=128, interpret=True)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("rays",))
    b = grid3_trace_dynamic_tiled("op6", pos0, dirs, ds, med, steps=120,
                                  box=BOX, block_rays=128, interpret=True,
                                  mesh=mesh)
    for f in ("pos", "detq", "kmah", "traveltime", "min_absdet_step"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)
