"""Tiled-window kernel for sampled 3-D (tri-Hermite grid3) media.

The 3-D form of the production sample -> fit -> trace path
(RT_bench.py:412-464): tests pin

* unit-level window-evaluator parity: kernels.fused3d._tile_nag3's gather
  + blend equals media/grid3.C1Grid3Medium.n_and_grad3 (shared c1_blend
  algebra) to float roundoff,
* trajectory parity with the 3-D scan tier on a sampled fisheye (poly
  rotations vs exact trig -> ~1e-5 atol, the 2-D tier's grade),
* the sort/unsort round trip (caller ray order),
* boundary-exit freezing and the "never left the box" activity mapping,
* the escalation ladder's RuntimeError for dispersed batches and
  fast_trace3's routing + fallback,
* sharded rounds matching the single-device result on the CPU mesh.
"""
import numpy as np
import pytest

from raytracing_tpu.engine.tiled3 import grid3_trace_tiled
from raytracing_tpu.engine.trace3d import trace3d
from raytracing_tpu.media.grid3 import c1_medium3_from_samples

# heavyweight module: interpret-mode kernel chains (CLAUDE.md test tiers)
pytestmark = pytest.mark.slow

BOX = (-1.5, 1.5, -1.5, 1.5, -1.5, 1.5)


def _inside(pos, box):
    """Kernel 'active' semantics: the final position never left the box
    (exit_step == steps is ambiguous — a ray exiting exactly at the last
    step carries it too, the round-5 ADVICE class)."""
    p = np.asarray(pos)
    return ((p[:, 0] >= box[0]) & (p[:, 0] <= box[1])
            & (p[:, 1] >= box[2]) & (p[:, 1] <= box[3])
            & (p[:, 2] >= box[4]) & (p[:, 2] <= box[5]))


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


def test_tile_nag3_matches_medium_eval(fisheye3_medium):
    """The window evaluator reproduces n_and_grad3 to float roundoff when
    handed the full-grid window (same c1_blend, gathered corners)."""
    import jax.numpy as jnp

    from raytracing_tpu.engine.tiled3 import _cells64
    from raytracing_tpu.kernels.fused3d import LANES, _tile_nag3

    med = fisheye3_medium
    # one window covering a (5,5,5)-cell region; query points inside it
    rng = np.random.default_rng(0)
    base = (3, 4, 5)                                    # (bix, biy, biz)
    pts = rng.uniform(0.0, 5.0, (3, 2, LANES)).astype(np.float32)
    hx, hy, hz = 1 / med.inv_hx, 1 / med.inv_hy, 1 / med.inv_hz
    x = med.x0 + (base[0] + pts[0]) * hx
    y = med.y0 + (base[1] + pts[1]) * hy
    z = med.z0 + (base[2] + pts[2]) * hz

    nodes4d = jnp.asarray(med.nodes).reshape(med.nz, med.ny, med.nx, 8)
    c64 = _cells64(nodes4d)
    from raytracing_tpu.engine.tiled3 import _window_ids3
    wid = _window_ids3(np.array([base[0]]), np.array([base[1]]),
                       np.array([base[2]]), 5, 5, 5, LANES,
                       med.nx - 1, med.ny - 1)
    cells = np.asarray(c64)[np.asarray(wid)[0]]         # (LANES, 64)
    T = [jnp.broadcast_to(jnp.asarray(cells[:, i])[None, :], (2, LANES))
         for i in range(64)]
    meta3 = (float(med.x0), float(med.y0), float(med.z0),
             float(med.inv_hx), float(med.inv_hy), float(med.inv_hz),
             med.nx, med.ny, med.nz, 5, 5, 5)
    nag = _tile_nag3(T, jnp.float32(base[0]), jnp.float32(base[1]),
                     jnp.float32(base[2]), meta3)
    n_k, gx_k, gy_k, gz_k = nag(jnp.asarray(x), jnp.asarray(y),
                                jnp.asarray(z))
    n_m, (gx_m, gy_m, gz_m) = med.n_and_grad3(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(n_k), np.asarray(n_m), rtol=2e-7)
    for a, b in ((gx_k, gx_m), (gy_k, gy_m), (gz_k, gz_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("op", ["op1", "op2", "op6", "op8"])
def test_tiled3_matches_scan(fisheye3_medium, op):
    med = fisheye3_medium
    pos0, dirs = _fan(256)
    ds = np.float32(2 * np.pi / 600)
    g = grid3_trace_tiled(op, pos0, dirs, ds, med, steps=300, box=BOX,
                          block_rays=256, interpret=True)
    t = trace3d(op, med, pos0=pos0, dir0=dirs, delta_s=float(ds),
                steps=300, box=BOX, mode="metrics", dtype=np.float32)
    np.testing.assert_allclose(np.asarray(g.pos), np.asarray(t.final.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.tangent),
                               np.asarray(t.final.unitv), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.traveltime),
                               np.asarray(t.final.traveltime), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(g.active),
                                  _inside(t.final.pos, BOX))


def test_tiled3_sort_round_trip(fisheye3_medium):
    """Results come back in the CALLER's ray order, identical under any
    input permutation (Morton sort + unsort are exact inverses)."""
    med = fisheye3_medium
    pos0, dirs = _fan(256)
    ds = np.float32(2 * np.pi / 600)
    a = grid3_trace_tiled("op6", pos0, dirs, ds, med, steps=120, box=BOX,
                          block_rays=256, interpret=True)
    rng = np.random.default_rng(5)
    perm = rng.permutation(256)
    b = grid3_trace_tiled("op6", pos0[perm], dirs[perm], ds, med,
                          steps=120, box=BOX, block_rays=256,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(a.pos)[perm],
                                  np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.traveltime)[perm],
                                  np.asarray(b.traveltime))


def test_tiled3_boundary_exit(fisheye3_medium):
    """Rays leaving a tight box freeze at the exit point; active maps to
    the scan tier's never-left set.  The shallow-to-steep fan exits the
    top face at angle-dependent steps; a 2-chunk (6,6,7) window is given
    upfront so the test exercises exits, not the escalation ladder
    (interpret-mode ladder compiles are minutes each)."""
    med = fisheye3_medium
    r = 256
    a = np.linspace(0.1, 1.2, r)             # elevation from +x
    dirs = np.stack([np.cos(a), np.sin(a), np.full(r, 0.02)],
                    -1).astype(np.float32)
    pos0 = np.tile(np.array([0.0, 0.9, 0.0], np.float32), (r, 1))
    box = (-1.4, 1.4, -1.4, 1.0, -1.4, 1.4)
    ds = np.float32(0.01)
    g = grid3_trace_tiled("op6", pos0, dirs, ds, med, steps=30, box=box,
                          block_rays=256, interpret=True,
                          tile_shape=(6, 6, 7))
    t = trace3d("op6", med, pos0=pos0, dir0=dirs, delta_s=float(ds),
                steps=30, box=box, mode="metrics", dtype=np.float32)
    assert 0 < np.asarray(g.active).sum() < r
    np.testing.assert_array_equal(np.asarray(g.active),
                                  _inside(t.final.pos, box))
    np.testing.assert_allclose(np.asarray(g.pos), np.asarray(t.final.pos),
                               atol=1e-5)


@pytest.fixture(scope="module")
def small3_medium():
    """6-node grid: only the (5,5,5) ladder rung fits, so dispersed
    batches exhaust the ladder after one rung (fast)."""
    ax = np.linspace(-1.6, 1.6, 6)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    F = 1.0 / (1.0 + X ** 2 + Y ** 2 + Z ** 2)
    return c1_medium3_from_samples(F, ax, ax, ax, dtype=np.float32)


def test_tiled3_dispersed_batch_raises(small3_medium):
    """A batch scattered over the whole grid exhausts the window ladder
    with the RuntimeError fast_trace3 falls back on."""
    rng = np.random.default_rng(7)
    r = 256
    pos0 = rng.uniform(-1.4, 1.4, (r, 3)).astype(np.float32)
    dirs = rng.normal(size=(r, 3)).astype(np.float32)
    with pytest.raises(RuntimeError, match="scan tier"):
        grid3_trace_tiled("op6", pos0, dirs, np.float32(0.01),
                          small3_medium, steps=50, box=BOX,
                          block_rays=256, interpret=True)


def test_fast_trace3_routes_grid3_to_tiled(fisheye3_medium):
    from raytracing_tpu.engine.fast import fast_trace3

    med = fisheye3_medium
    pos0, dirs = _fan(200)        # ragged: exercises padding
    ds = 2 * np.pi / 600
    res, eng = fast_trace3("op6", med, pos0=pos0, dir0=dirs, delta_s=ds,
                           steps=300, box=BOX, block_rays=256,
                           interpret=True)
    assert eng == "grid3-tiled" and res.pos.shape == (200, 3)
    t = trace3d("op6", med, pos0=pos0, dir0=dirs, delta_s=ds, steps=300,
                box=BOX, mode="metrics", dtype=np.float32)
    np.testing.assert_allclose(np.asarray(res.pos),
                               np.asarray(t.final.pos), atol=1e-5)

    # dispersed batch: falls back to the scan tier with consistent
    # containment-based activity (small grid: the ladder exhausts fast)
    ax = np.linspace(-1.6, 1.6, 6)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    small = c1_medium3_from_samples(1.0 / (1.0 + X**2 + Y**2 + Z**2),
                                    ax, ax, ax, dtype=np.float32)
    rng = np.random.default_rng(7)
    pos_d = rng.uniform(-1.4, 1.4, (200, 3)).astype(np.float32)
    dir_d = rng.normal(size=(200, 3)).astype(np.float32)
    res2, eng2 = fast_trace3("op6", small, pos0=pos_d, dir0=dir_d,
                             delta_s=0.01, steps=50, box=BOX,
                             block_rays=256, interpret=True)
    assert eng2 == "scan3d"
    p = np.asarray(res2.pos)
    inside = ((p[:, 0] >= BOX[0]) & (p[:, 0] <= BOX[1])
              & (p[:, 1] >= BOX[2]) & (p[:, 1] <= BOX[3])
              & (p[:, 2] >= BOX[4]) & (p[:, 2] <= BOX[5]))
    np.testing.assert_array_equal(np.asarray(res2.active), inside)


def test_tiled3_sharded_matches_single(fisheye3_medium):
    """grid3_trace_tiled(mesh=...) shards rays across the device mesh;
    shard-local windows + a pmax'd flag reproduce the single-device
    trajectories bit-exactly (same blocks, same windows)."""
    import jax
    from jax.sharding import Mesh

    med = fisheye3_medium
    pos0, dirs = _fan(1024)
    ds = np.float32(2 * np.pi / 600)
    a = grid3_trace_tiled("op6", pos0, dirs, ds, med, steps=120, box=BOX,
                          block_rays=128, interpret=True)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("rays",))
    b = grid3_trace_tiled("op6", pos0, dirs, ds, med, steps=120, box=BOX,
                          block_rays=128, interpret=True, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.traveltime),
                                  np.asarray(b.traveltime))
    np.testing.assert_array_equal(np.asarray(a.active),
                                  np.asarray(b.active))
