"""Tiled 2-D grid kernel: block-shared node windows + dynamic_gather eval.

The production path for the reference's sampled-spline medium
(RT_bench.py:435-464): rays sorted along a Morton curve, each kernel block
sharing one (th, tw)-node window refreshed by coherent slices.  Tests pin

* parity with the per-ray supercell kernel (same `_hermite_blend`) and with
  the scan engine on the same GridMedium,
* the coarse-step regime (delta_s > cell pitch) the supercell kernel cannot
  serve at all,
* the sort/unsort round trip (results in caller order, bit-identical),
* overflow handling: escalation to larger tiles, the RuntimeError for
  genuinely dispersed batches, and fast_trace's fallback routing.
"""
import dataclasses

import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.engine.segmented import grid_trace, grid_trace_tiled
from raytracing_tpu.media.hermite import build_hermite_medium
from raytracing_tpu.media.spline import build_grid_medium

# heavyweight module: segmented chains / sharded meshes / full sweeps /
# interpret-mode kernel parity.  Deselect with -m 'not slow' (CLAUDE.md).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fisheye_media():
    scen = rt.scenario("fisheye")
    gm = build_grid_medium("fisheye", scen.box, dtype=np.float32)
    hm = build_hermite_medium(gm, dtype=np.float32)
    return scen, gm, hm


def _fan(r, spread=0.02):
    theta = (np.pi / 2 + np.linspace(-spread, spread, r)).astype(np.float32)
    pos = np.tile(np.array([1.0, 0.0], np.float32), (r, 1))
    return pos, theta


def test_tiled_matches_supercell(fisheye_media):
    """Fine steps: tiled == per-ray supercell (shared blend -> ~1 ulp)."""
    scen, gm, hm = fisheye_media
    pos0, theta0 = _fan(256)
    ds, steps = 2 * np.pi / 4587, 400
    a = grid_trace("op6", pos0, theta0, np.float32(ds), hm, steps=steps,
                   box=tuple(scen.box), block_rays=256, interpret=True)
    b = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm,
                         steps=steps, box=tuple(scen.box), block_rays=256,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               atol=5e-7)
    np.testing.assert_allclose(np.asarray(a.traveltime),
                               np.asarray(b.traveltime), atol=5e-7)
    np.testing.assert_array_equal(np.asarray(a.active), np.asarray(b.active))


def test_tiled_coarse_step_matches_scan(fisheye_media):
    """delta_s > cell pitch — the regime only the tiled kernel serves.

    The reference's fast calibrated fisheye divisors (278-325,
    RT_bench.py:1431-1450) all land here; the per-ray supercell kernel
    rejects them outright.
    """
    scen, gm, hm = fisheye_media
    pos0, theta0 = _fan(128)
    ds = 2 * np.pi / 303          # op6's calibrated divisor
    steps = 302                   # reference step count: N*divisor - 1
    res = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm,
                           steps=steps, box=tuple(scen.box), block_rays=128,
                           interpret=True)
    ref = rt.trace("op6", scen, gm, delta_s=ds, mode="metrics",
                   dtype=np.float32, max_size=steps + 1,
                   pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(res.pos),
                               np.asarray(ref.final.pos), atol=3e-4)
    np.testing.assert_allclose(np.asarray(res.traveltime),
                               np.asarray(ref.final.traveltime), atol=3e-4)


def test_tiled_sort_roundtrip_bit_identical(fisheye_media):
    """A dispersing ring forces resorts; results come back in caller order
    and match the unsorted run bit-for-bit (same kernels, same windows)."""
    scen, gm, hm = fisheye_media
    r = 1024
    ang = np.linspace(0, 2 * np.pi, r, endpoint=False)
    pos0 = np.stack([1.0 + 0.05 * np.cos(ang), 0.05 * np.sin(ang)],
                    -1).astype(np.float32)
    theta0 = (ang + np.pi / 2).astype(np.float32)
    ds = 2 * np.pi / 4587
    a = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm, steps=100,
                         box=tuple(scen.box), block_rays=128, interpret=True,
                         sort=False)
    b = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm, steps=100,
                         box=tuple(scen.box), block_rays=128, interpret=True,
                         sort=True)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.traveltime),
                                  np.asarray(b.traveltime))


def test_tiled_op7_window_and_stats():
    """op7 (4-position window in segment state) + Welford momentum stats
    through the tiled kernel == the scan engine on the same 2-D medium."""
    scen = rt.scenario("vert")
    gm = build_grid_medium("vert_heterogeneous", scen.box, dtype=np.float32)
    hm = build_hermite_medium(gm, dtype=np.float32)
    r = 128
    # one 128-ray block: keep the fan narrow enough to share a window
    theta0 = np.linspace(0.7, 0.8, r).astype(np.float32)
    pos0 = np.tile(scen.pos0[:1].astype(np.float32), (r, 1))
    ds, steps = 0.004, 200
    res = grid_trace_tiled("op7", pos0, theta0, np.float32(ds), hm,
                           steps=steps, box=tuple(scen.box), block_rays=128,
                           interpret=True, with_stats=True)
    ref = rt.trace("op7", scen, gm, delta_s=ds, mode="metrics",
                   dtype=np.float32, max_size=steps + 1,
                   pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(res.pos),
                               np.asarray(ref.final.pos), atol=5e-3)
    np.testing.assert_array_equal(np.asarray(res.mom_count),
                                  np.asarray(ref.final.mom_count))
    np.testing.assert_allclose(np.asarray(res.mom_mean),
                               np.asarray(ref.final.mom_mean), atol=5e-4)


def test_tiled_interface_box_exits():
    """2-D interface medium with box exits: frozen rays stay inside their
    block's window accounting and the active mask matches the scan tier."""
    scen = dataclasses.replace(rt.scenario("interface"),
                               box=(-2.0, 2.0, -2.0, 2.0))
    gm = build_grid_medium("interface", scen.box, dtype=np.float32)
    hm = build_hermite_medium(gm, dtype=np.float32)
    r = 128
    # narrow fan (one block must share a window); shallow angles reflect at
    # the interface and exit through x = 2 within the step budget
    theta0 = np.linspace(0.05, 0.09, r).astype(np.float32)
    pos0 = np.tile(np.array([[-0.5, -0.5]], np.float32), (r, 1))
    ds, steps = 0.005, 600
    res = grid_trace_tiled("op8", pos0, theta0, np.float32(ds), hm,
                           steps=steps, box=tuple(scen.box), block_rays=128,
                           interpret=True)
    ref = rt.trace("op8", scen, gm, delta_s=ds, mode="metrics",
                   dtype=np.float32, max_size=steps + 1,
                   pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(res.pos),
                               np.asarray(ref.final.pos), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(res.active),
                                  np.asarray(ref.exit_step) == steps)


def test_tiled_golden_ops_on_grid(fisheye_media):
    """The golden/anisotropic family (op5 iso, op11 gamma=3) runs on the
    2-D grid medium through the tiled kernel and matches the scan engine —
    previously these combinations only had the chunked-scan path."""
    scen, gm, hm = fisheye_media
    r = 128
    theta0 = (np.pi / 2 + np.linspace(-0.01, 0.01, r)).astype(np.float32)
    pos0 = np.tile(np.array([1.0, 0.0], np.float32), (r, 1))
    ds = 2 * np.pi / 325
    # parity bracket schedule: the f32 scan engine this test compares
    # against follows the pure-bracket angle sequence (polish validated in
    # test_golden_kernel.py)
    from raytracing_tpu.config import golden_iters
    parity = (golden_iters(np.float32), 0)
    res = grid_trace_tiled("op5", pos0, theta0, np.float32(ds), hm,
                           steps=200, box=tuple(scen.box), block_rays=128,
                           interpret=True, gold_schedule=parity)
    ref = rt.trace("op5", scen, gm, delta_s=ds, mode="metrics",
                   dtype=np.float32, max_size=201, pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(res.pos),
                               np.asarray(ref.final.pos), atol=3e-4)

    sca = rt.scenario("aniso")
    gma = build_grid_medium("vert_heterogeneous", sca.box, dtype=np.float32)
    hma = build_hermite_medium(gma, dtype=np.float32)
    theta0 = np.linspace(0.75, 0.85, r).astype(np.float32)
    pos0 = np.tile(sca.pos0[:1].astype(np.float32), (r, 1))
    res = grid_trace_tiled("op11", pos0, theta0, np.float32(0.0193), hma,
                           steps=150, box=tuple(sca.box), block_rays=128,
                           interpret=True, gamma=3.0, with_stats=True,
                           gold_schedule=parity)
    ref = rt.trace("op11", sca, gma, delta_s=0.0193, mode="metrics",
                   dtype=np.float32, max_size=151, pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(res.pos),
                               np.asarray(ref.final.pos), atol=3e-4)
    np.testing.assert_array_equal(np.asarray(res.mom_count),
                                  np.asarray(ref.final.mom_count))
    np.testing.assert_allclose(np.asarray(res.mom_mean),
                               np.asarray(ref.final.mom_mean), atol=1e-5)


def test_tiled_dispersed_batch_raises(fisheye_media):
    """A batch genuinely too scattered for any tile raises RuntimeError
    (the fast_trace router catches it and falls back)."""
    scen, gm, hm = fisheye_media
    r = 128
    rng = np.random.default_rng(7)
    pos0 = rng.uniform(-1.4, 1.4, (r, 2)).astype(np.float32)
    theta0 = rng.uniform(0, 2 * np.pi, r).astype(np.float32)
    with pytest.raises(RuntimeError, match="dispersed"):
        grid_trace_tiled("op6", pos0, theta0, np.float32(0.003), hm,
                         steps=50, box=tuple(scen.box), block_rays=128,
                         interpret=True)


def test_fast_trace_routes_grid_to_tiled(fisheye_media):
    """fast_trace on a GridMedium routes through the tiled kernel at ANY
    step size (incl. coarse), and falls back for dispersed batches."""
    from raytracing_tpu.engine.fast import fast_trace

    scen, gm, hm = fisheye_media
    pos0, theta0 = _fan(96)       # non-multiple: exercises padding
    ds = 2 * np.pi / 303
    res = fast_trace("op6", scen, gm, delta_s=ds, pos0=pos0, theta0=theta0,
                     steps=302, interpret=True)
    assert res.engine == "grid-tiled"
    ref = rt.trace("op6", scen, gm, delta_s=ds, mode="metrics",
                   dtype=np.float32, max_size=303, pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(res.pos),
                               np.asarray(ref.final.pos), atol=3e-4)

    rng = np.random.default_rng(7)
    pos_d = rng.uniform(-1.4, 1.4, (96, 2)).astype(np.float32)
    th_d = rng.uniform(0, 2 * np.pi, 96).astype(np.float32)
    res2 = fast_trace("op6", scen, gm, delta_s=0.003, pos0=pos_d,
                      theta0=th_d, steps=50, interpret=True)
    assert res2.engine in ("grid-supercell", "scan")
    ref2 = rt.trace("op6", scen, gm, delta_s=0.003, mode="metrics",
                    dtype=np.float32, max_size=51, pos0=pos_d, theta0=th_d)
    np.testing.assert_allclose(np.asarray(res2.pos),
                               np.asarray(ref2.final.pos), atol=1e-3)


def test_tiled_sharded_matches_single(fisheye_media):
    """grid_trace_tiled(mesh=...) shards rays across the device mesh
    (kernel blocks stay shard-local; one pmax per round for the
    containment flag) and reproduces the single-device run bit-for-bit."""
    from raytracing_tpu.parallel.mesh import make_mesh

    scen, gm, hm = fisheye_media
    mesh = make_mesh(8)
    r = 8 * 128
    pos0, theta0 = _fan(r, spread=0.01)
    ds = 2 * np.pi / 4587
    a = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm, steps=200,
                         box=tuple(scen.box), block_rays=128, interpret=True)
    b = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm, steps=200,
                         box=tuple(scen.box), block_rays=128, interpret=True,
                         mesh=mesh)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.traveltime),
                                  np.asarray(b.traveltime))
    assert len(b.pos.sharding.device_set) == 8


def test_row_windows_match_block_windows(fisheye_media):
    """Per-sublane-row windows == per-block windows bit-for-bit.

    The row-mode kernel gathers the same node values from per-row window
    slices (different bases, same cells), so trajectories must be
    identical to the block-window mode whose parity with grid_trace /
    the scan engine is pinned above.
    """
    scen, gm, hm = fisheye_media
    r = 1024                       # one block of 8 sublane rows
    pos0, theta0 = _fan(r)
    ds = 2 * np.pi / 4587
    a = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm, steps=120,
                         box=tuple(scen.box), block_rays=1024,
                         interpret=True, row_windows=False)
    b = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm, steps=120,
                         box=tuple(scen.box), block_rays=1024,
                         interpret=True, row_windows=True)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.traveltime),
                                  np.asarray(b.traveltime))
    np.testing.assert_array_equal(np.asarray(a.active), np.asarray(b.active))


def test_row_windows_coarse_step_matches_scan(fisheye_media):
    """Row mode at a coarse calibrated divisor (delta_s > cell pitch) —
    the regime the row design targets (short segments, single-chunk
    gathers) — stays in agreement with the scan engine."""
    scen, gm, hm = fisheye_media
    r = 1024
    pos0, theta0 = _fan(r)
    ds = 2 * np.pi / 303
    steps = 150
    res = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm,
                           steps=steps, box=tuple(scen.box),
                           block_rays=1024, interpret=True, row_windows=True)
    ref = rt.trace("op6", scen, gm, delta_s=ds, mode="metrics",
                   dtype=np.float32, max_size=steps + 1,
                   pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(res.pos),
                               np.asarray(ref.final.pos), atol=3e-4)


def test_row_windows_golden_op(fisheye_media):
    """The golden family rides the row-window evaluator too."""
    scen, gm, hm = fisheye_media
    r = 1024
    pos0, theta0 = _fan(r)
    ds = 2 * np.pi / 303
    parity = (16, 0)
    a = grid_trace_tiled("op5", pos0, theta0, np.float32(ds), hm, steps=80,
                         box=tuple(scen.box), block_rays=1024,
                         interpret=True, gold_schedule=parity,
                         row_windows=False)
    b = grid_trace_tiled("op5", pos0, theta0, np.float32(ds), hm, steps=80,
                         box=tuple(scen.box), block_rays=1024,
                         interpret=True, gold_schedule=parity,
                         row_windows=True)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_row_windows_rejects_bad_config(fisheye_media):
    scen, gm, hm = fisheye_media
    pos0, theta0 = _fan(256)
    with pytest.raises(ValueError, match="row_windows"):
        grid_trace_tiled("op6", pos0, theta0, np.float32(0.001), hm,
                         steps=10, box=tuple(scen.box), block_rays=256,
                         interpret=True, row_windows=True)
    pos1k, th1k = _fan(1024)
    with pytest.raises(ValueError, match="row_windows"):
        grid_trace_tiled("op6", pos1k, th1k, np.float32(0.001), hm,
                         steps=10, box=tuple(scen.box), block_rays=1024,
                         tile_shape=(16, 16), interpret=True,
                         row_windows=True)


def test_tiled_golden_seed_schedule_on_grid(fisheye_media):
    """The production closed-form schedule (gold_schedule default,
    GOLD_SEED_ITERS) on the 2-D grid medium lands on the same trajectory
    as the coarse-bracket+polish schedule — the window-gather evaluator
    feeds the same cost constants either way."""
    scen, gm, hm = fisheye_media
    r = 128
    theta0 = (np.pi / 2 + np.linspace(-0.01, 0.01, r)).astype(np.float32)
    pos0 = np.tile(np.array([1.0, 0.0], np.float32), (r, 1))
    ds = 2 * np.pi / 325
    seed = grid_trace_tiled("op5", pos0, theta0, np.float32(ds), hm,
                            steps=200, box=tuple(scen.box), block_rays=128,
                            interpret=True)
    brk = grid_trace_tiled("op5", pos0, theta0, np.float32(ds), hm,
                           steps=200, box=tuple(scen.box), block_rays=128,
                           interpret=True, gold_schedule=(12, 2))
    np.testing.assert_allclose(np.asarray(seed.pos), np.asarray(brk.pos),
                               atol=5e-5)


def test_oriented_windows_bit_identical(fisheye_media):
    """Per-block ORIENTED windows (engine/segmented._window_bases shapes):
    same evaluator, same blend — trajectories must be BIT-identical to
    square block windows in both kernel families (the window only decides
    which table cells ride in VMEM, never their values)."""
    scen, gm, hm = fisheye_media
    pos0, theta0 = _fan(2048)
    ds = 2 * np.pi / 500
    kw = dict(steps=300, box=tuple(scen.box), block_rays=1024,
              interpret=True, segment=8)
    a = grid_trace_tiled("op1", pos0, theta0, np.float32(ds), hm, **kw)
    b = grid_trace_tiled("op1", pos0, theta0, np.float32(ds), hm,
                         oriented=True, **kw)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.traveltime),
                                  np.asarray(b.traveltime))
    g1 = grid_trace_tiled("op10", pos0, theta0, np.float32(ds), hm,
                          gamma=3.0, **kw)
    g2 = grid_trace_tiled("op10", pos0, theta0, np.float32(ds), hm,
                          gamma=3.0, oriented=True, **kw)
    np.testing.assert_array_equal(np.asarray(g1.pos), np.asarray(g2.pos))


def test_oriented_shape_choice_axial_drift():
    """_window_bases picks the rectangle matching an elongated bbox, and
    the containment flag only trips when NO candidate shape fits."""
    import jax.numpy as jnp
    from raytracing_tpu.engine.segmented import _window_bases

    meta = (0.0, 0.0, 1.0, 1.0, 201, 201)  # unit cells, 200x200
    shapes = ((4, 32), (8, 16), (11, 11), (16, 8), (32, 4))
    # group 0: x-elongated bbox (20 cells wide, 1 tall) -> needs tw >= 24
    # group 1: y-elongated                              -> needs th >= 24
    # group 2: compact                                  -> square fits best
    gx = np.array([[100.0, 120.0], [100.0, 100.0], [100.0, 101.0]])
    gy = np.array([[100.0, 100.0], [100.0, 120.0], [100.0, 101.0]])
    st = (jnp.asarray(gx.reshape(-1), jnp.float32),
          jnp.asarray(gy.reshape(-1), jnp.float32))
    flag, bix, biy, tw_v, th_v = _window_bases(
        st, jnp.float32(-np.inf), meta, 11, 11, 3, 2, 1.5, 1.5,
        shapes=shapes)
    assert float(flag) <= 0.0
    tw_v, th_v = np.asarray(tw_v), np.asarray(th_v)
    assert tw_v[0] == 32 and th_v[0] == 4        # x-drift -> wide window
    assert tw_v[1] == 4 and th_v[1] == 32        # y-drift -> tall window
    assert (tw_v[2], th_v[2]) == (11, 11)        # compact -> most slack
    # windows must contain the padded bboxes
    assert bix[0] <= 98 and bix[0] + 32 >= 123
    assert biy[1] <= 98 and biy[1] + 32 >= 123
    # a 40-cell diagonal bbox fits nothing in the set -> flag trips
    gx2 = np.array([[100.0, 140.0]])
    gy2 = np.array([[100.0, 140.0]])
    st2 = (jnp.asarray(gx2.reshape(-1), jnp.float32),
           jnp.asarray(gy2.reshape(-1), jnp.float32))
    flag2, *_ = _window_bases(st2, jnp.float32(-np.inf), meta, 11, 11, 1, 2,
                              1.5, 1.5, shapes=shapes)
    assert float(flag2) > 0.0


def test_oriented_rejects_row_windows(fisheye_media):
    """oriented + row_windows is an explicit conflict (rows-mode kernels
    cannot consume a shape set; sizing for one would replay every
    refresh)."""
    scen, gm, hm = fisheye_media
    pos0, theta0 = _fan(1024)
    with pytest.raises(ValueError, match="block-window"):
        grid_trace_tiled("op6", pos0, theta0, np.float32(0.001), hm,
                         steps=10, box=tuple(scen.box), block_rays=1024,
                         interpret=True, oriented=True, row_windows=True)


def test_oriented_coarse_axial_matches_square(fisheye_media):
    """Coarse steps with axis-dominated drift: the oriented run (which
    actually engages rectangles) stays bit-identical to the square-window
    escalated run on the same segment."""
    scen, gm, hm = fisheye_media
    r = 1024
    # rays sweeping mostly horizontally through the fisheye grid
    theta0 = np.linspace(-0.02, 0.02, r).astype(np.float32)
    pos0 = np.tile(np.array([-1.2, 0.4], np.float32), (r, 1))
    ds = 2 * np.pi / 303                 # coarse: > 1 cell per step
    kw = dict(steps=60, box=tuple(scen.box), block_rays=1024,
              interpret=True, segment=3)
    a = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm,
                         tile_shape=(16, 16), **kw)
    b = grid_trace_tiled("op6", pos0, theta0, np.float32(ds), hm,
                         oriented=True, **kw)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos),
                               atol=5e-7)


def test_tiled_rejects_zero_cadence(fisheye_media):
    """refreshes_per_round=0 / segment=0 used to spin the refresh loop
    forever at zero progress; now a named error."""
    scen, gm, hm = fisheye_media
    pos0, theta0 = _fan(1024)
    for bad in (dict(refreshes_per_round=0), dict(segment=0)):
        with pytest.raises(ValueError, match=">= 1"):
            grid_trace_tiled("op6", pos0, theta0, np.float32(0.001), hm,
                             steps=10, box=tuple(scen.box), block_rays=1024,
                             interpret=True, **bad)


def test_packed_refresh_bit_identical(fisheye_media):
    """P-cell packed refresh gathers (engine/segmented._cells_packed):
    the same floats arrive in pack-fold fewer, pack-fold longer rows, so
    at EQUAL segmentation non-golden trajectories are BIT-identical.
    Golden ops re-derive their direction by exact cos/sin at each kernel
    launch (vs polynomial rotations within a launch), so any containment
    replay the alignment snap provokes — which halves the segment for
    that round — perturbs them at the known ~1e-8/step refresh-cadence
    level (same sensitivity as segment=4 vs 6 at pack=1, measured 7e-6
    over 606 steps); they get a cadence-sized tolerance, not equality."""
    scen, gm, hm = fisheye_media
    pos0, theta0 = _fan(2048)
    ds = np.float32(2 * np.pi / 303)
    kw = dict(steps=120, box=tuple(scen.box), block_rays=256,
              interpret=True, segment=4, tile_shape=(16, 16))
    a6 = grid_trace_tiled("op6", pos0, theta0, ds, hm, **kw)
    a5 = grid_trace_tiled("op5", pos0, theta0, ds, hm, **kw)
    for pack in (4, 16):
        b = grid_trace_tiled("op6", pos0, theta0, ds, hm, pack=pack, **kw)
        np.testing.assert_array_equal(np.asarray(a6.pos), np.asarray(b.pos))
        np.testing.assert_array_equal(np.asarray(a6.traveltime),
                                      np.asarray(b.traveltime))
        g = grid_trace_tiled("op5", pos0, theta0, ds, hm, pack=pack, **kw)
        np.testing.assert_allclose(np.asarray(a5.pos), np.asarray(g.pos),
                                   atol=1e-5)


def test_packed_refresh_oriented_and_edges(fisheye_media):
    """pack composes with oriented shape sets (widths filtered to pack
    multiples) and stays correct with windows butting the padded right
    edge of the cell grid; bad configs raise named errors."""
    scen, gm, hm = fisheye_media
    pos0, theta0 = _fan(2048)
    ds = np.float32(2 * np.pi / 303)
    kw = dict(steps=120, box=tuple(scen.box), block_rays=256,
              interpret=True, segment=4)
    a = grid_trace_tiled("op6", pos0, theta0, ds, hm, oriented=True, **kw)
    b = grid_trace_tiled("op6", pos0, theta0, ds, hm, oriented=True,
                         pack=4, **kw)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    with pytest.raises(ValueError, match="pack"):
        grid_trace_tiled("op6", pos0, theta0, ds, hm, pack=3, **kw)
    with pytest.raises(ValueError, match="block-window"):
        grid_trace_tiled("op6", pos0, theta0, ds, hm, pack=4,
                         row_windows=True, steps=120, box=tuple(scen.box),
                         block_rays=1024, interpret=True,
                         tile_shape=(8, 16), oriented=False)
