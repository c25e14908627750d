"""df32 on the sampled 2-D spline (engine/df_grid.py).

Accuracy claims follow docs/PRECISION.md's rule: always df32 vs the FLOAT64
evaluation of the same object, never f32-vs-f32.
"""
import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.engine.df_grid import (_make_df_nag, _split64,
                                           build_df_grid_medium,
                                           df_grid_trace)
from raytracing_tpu.media.spline import build_grid_medium

# heavyweight module: segmented chains / sharded meshes / full sweeps /
# interpret-mode kernel parity.  Deselect with -m 'not slow' (CLAUDE.md).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def media():
    scen = rt.scenario("fisheye")
    dfm = build_df_grid_medium("fisheye", scen.box)
    gm64 = build_grid_medium("fisheye", scen.box, dtype=np.float64)
    return scen, dfm, gm64


def test_df_tables_match_f64_spline(media):
    """The split-table evaluator reproduces the f64 spline to ~double-word
    resolution (hi+lo carries ~2^-48): bilinear n AND both bicubic
    gradient components."""
    import jax.numpy as jnp

    scen, dfm, gm64 = media
    rng = np.random.default_rng(7)
    x = rng.uniform(-1.4, 1.4, 512)
    y = rng.uniform(-1.4, 1.4, 512)
    n64, (gx64, gy64) = gm64.n_and_grad(jnp.asarray(x), jnp.asarray(y))
    xh, xl = _split64(x)
    yh, yl = _split64(y)
    nag = _make_df_nag(dfm)
    (nh, nl), (gxh, gxl), (gyh, gyl) = nag(
        jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(yh), jnp.asarray(yl))

    def err(h, l, ref):
        v = np.asarray(h, np.float64) + np.asarray(l, np.float64)
        return np.max(np.abs(v - np.asarray(ref)))

    assert err(nh, nl, n64) < 1e-10
    assert err(gxh, gxl, gx64) < 1e-9
    assert err(gyh, gyl, gy64) < 1e-9


def test_df_grid_matches_f64_scan(media):
    """One fisheye turn on the exact sampled spline: df32 RK4 vs the f64
    scan engine's op12 on the same GridMedium — ~1e-7 grade (the analytic
    df tier's bound, test_df.py), proving the arithmetic, not the medium."""
    scen, dfm, gm64 = media
    div = 1000
    ds = float(np.float32(2 * np.pi / div))
    r = 4
    pos0 = np.stack([np.ones(r), np.zeros(r)], -1)
    theta0 = np.full(r, np.pi / 2)
    p = df_grid_trace(pos0, theta0, ds, dfm, steps=div)
    ref = rt.trace("op12", scen, gm64, delta_s=ds, max_size=div + 1,
                   mode="metrics", dtype=np.float64,
                   pos0=pos0, theta0=theta0)
    err = np.linalg.norm(p[0] - np.asarray(ref.final.pos)[0])
    assert err < 1e-6, err


def test_df_grid_segmented_equals_oneshot(media):
    """Chained segments are exactly the loop carry — bit-identical."""
    scen, dfm, _ = media
    ds = float(np.float32(2 * np.pi / 300))
    r = 4
    pos0 = np.stack([np.ones(r), np.zeros(r)], -1)
    theta0 = np.full(r, np.pi / 2)
    a = df_grid_trace(pos0, theta0, ds, dfm, steps=300, segment=512)
    b = df_grid_trace(pos0, theta0, ds, dfm, steps=300, segment=64)
    np.testing.assert_array_equal(a, b)


def test_df_c1_shows_arithmetic_on_sampled_media():
    """df32 + C1: the consistent-gradient spline of the same samples tracks
    the analytic field to O(h^4), so the df trajectory closes on the
    ANALYTIC circle at ~5e-8/turn — 4 orders below the parity tables'
    medium floor (~5e-4/turn) — and matches the f64 scan on the same C1
    medium to double-word resolution."""
    import jax

    from raytracing_tpu.engine.df_grid import build_df_c1_medium
    from raytracing_tpu.media.c1 import build_c1_medium

    scen = rt.scenario("fisheye")
    med = build_df_c1_medium("fisheye", scen.box)
    div = 300
    ds = 2 * np.pi / div
    pos0 = np.tile(np.array([[1.0, 0.0]]), (4, 1))
    th = np.full(4, np.pi / 2)
    p = df_grid_trace(pos0, th, np.float32(ds), med, steps=div)
    sarc = div * float(np.float32(ds))
    target = np.array([np.cos(sarc), np.sin(sarc)])
    assert float(np.linalg.norm(p[0] - target)) < 5e-7

    c64 = build_c1_medium("fisheye", scen.box, dtype=np.float64)
    res = rt.trace("op12", scen, c64, delta_s=ds, mode="metrics",
                   dtype=np.float64, max_size=div + 1, pos0=pos0, theta0=th)
    assert float(np.abs(p - np.asarray(res.final.pos)).max()) < 5e-7


def test_df_from_user_samples_f64_substitute():
    """USER-measured samples reach the df tier (df_c1_medium_from_samples):
    the df trace matches the f64 scan of the same C1 interpolant to
    double-word grade and tracks the smooth truth at the medium's O(h^4)
    floor — the examples/measured_medium.py configuration, certified."""
    import dataclasses

    from raytracing_tpu.media.medium import CustomMedium

    def f(x, y):
        return 1.0 / (1.0 + 0.4 * x * x + 0.6 * y * y)

    gx = np.linspace(-2.0, 2.0, 161)
    gy = np.linspace(-1.5, 1.5, 121)
    Z = f(gx[None, :], gy[:, None])
    dfm = rt.df_c1_medium_from_samples(Z, gx, gy)

    r, steps, ds = 4, 600, float(np.float32(0.005))
    pos0 = np.stack([np.full(r, -1.5), np.linspace(-0.05, 0.05, r)], -1)
    theta0 = np.zeros(r)
    p = rt.df_grid_trace(pos0, theta0, np.float32(ds), dfm, steps=steps)

    scen = dataclasses.replace(rt.scenario("fisheye"), name="measured",
                               gamma=1.0, box=(-1.8, 1.8, -1.3, 1.3))
    c64 = rt.c1_medium_from_samples(Z, gx, gy, dtype=np.float64)
    ref = rt.trace("op12", scen, c64, delta_s=ds, mode="metrics",
                   dtype=np.float64, max_size=steps + 1,
                   pos0=pos0, theta0=theta0)
    assert float(np.abs(p - np.asarray(ref.final.pos)).max()) < 1e-7

    truth = CustomMedium(n_fn=f)
    tru = rt.trace("op12", scen, truth, delta_s=ds, mode="metrics",
                   dtype=np.float64, max_size=steps + 1,
                   pos0=pos0, theta0=theta0)
    assert float(np.abs(p - np.asarray(tru.final.pos)).max()) < 5e-6


def test_df_from_samples_validation():
    gx = np.linspace(0.0, 1.0, 8)
    gy = np.concatenate([np.linspace(0.0, 1.0, 7), [3.0]])  # non-uniform
    Z = np.ones((8, 8))
    with pytest.raises(ValueError, match="uniformly spaced"):
        rt.df_c1_medium_from_samples(Z, gx, gy)
    with pytest.raises(ValueError, match="Z shape"):
        rt.df_grid_medium_from_samples(Z[:5], gx, np.linspace(0, 1, 8))
    with pytest.raises(ValueError, match="4x4"):
        rt.df_c1_medium_from_samples(np.ones((3, 8)), gx,
                                     np.linspace(0, 1, 3))


def test_df_c1_profile_matches_f64_scan():
    """df32 on a measured 1-D PROFILE: trajectories match the f64 scan of
    the same C1 interpolant to double-word grade over a long waveguide
    trace — the f64-substitute for e.g. ocean sound-speed profiles."""
    import dataclasses

    # a CHANNEL profile (index maximum at y=0) so the fan stays trapped:
    # the df tier has no boundary mask, so the f64 reference must never
    # freeze a ray at the box
    y = np.linspace(-1.5, 1.5, 61)
    col = 1.2 - 0.25 * y * y
    dfm = rt.df_c1_profile_from_samples(col, y)

    r, steps, ds = 4, 1500, float(np.float32(0.01))
    pos0 = np.stack([np.zeros(r), np.linspace(-0.1, 0.1, r)], -1)
    theta0 = np.full(r, 0.3)
    p = rt.df_grid_trace(pos0, theta0, np.float32(ds), dfm, steps=steps)

    scen = dataclasses.replace(rt.scenario("vert"), name="profile",
                               gamma=1.0, box=(-1e6, 1e6, -1.5, 1.5))
    c64 = rt.c1_stratified_from_samples(col, y, dtype=np.float64)
    ref = rt.trace("op12", scen, c64, delta_s=ds, mode="metrics",
                   dtype=np.float64, max_size=steps + 1,
                   pos0=pos0, theta0=theta0)
    err = float(np.abs(p - np.asarray(ref.final.pos)).max())
    assert err < 2e-7, err

    # and the split tables evaluate the SAME spline: n/gy vs the f64 medium
    from raytracing_tpu.engine.df_grid import (_make_df_profile_nag,
                                               _split64)
    qy = np.random.default_rng(5).uniform(-1.4, 1.4, 256)
    yh, yl = _split64(qy)
    zero = np.zeros_like(yh)
    (nh, nl), _, (gyh, gyl) = _make_df_profile_nag(dfm)(
        jnp_arr(zero), jnp_arr(zero), jnp_arr(yh), jnp_arr(yl))
    n64, (_, gy64) = c64.n_and_grad(np.zeros_like(qy), qy)
    assert np.abs(np.asarray(nh, np.float64) + np.asarray(nl, np.float64)
                  - np.asarray(n64)).max() < 1e-12
    assert np.abs(np.asarray(gyh, np.float64) + np.asarray(gyl, np.float64)
                  - np.asarray(gy64)).max() < 1e-11


def jnp_arr(a):
    import jax.numpy as jnp
    return jnp.asarray(a)


def test_df_eval_profile_facade():
    """DfEvalProfile: an f32 n_and_grad surface whose values are the
    correctly-rounded f32 of the f64 interpolant — and a drop-in medium
    for the dynamic/eigenray scan (jvp-able, freezes/crossings intact)."""
    import numpy as np

    import raytracing_tpu as rt
    from raytracing_tpu.engine.eigenray import find_eigenrays

    depth = np.linspace(-3.0, 0.0, 61)
    c = 1.5 - 0.1 * np.exp(-((depth + 1.5) ** 2))
    m = rt.df_eval_profile_medium(c.min() / c, depth)
    import jax

    with jax.enable_x64(True):
        m64 = rt.c1_stratified_from_samples(c.min() / c, depth,
                                            dtype=np.float64)
        y = np.linspace(-2.9, -0.1, 500)
        n32, (gx32, gy32) = m.n_and_grad(np.zeros_like(y, np.float32),
                                         y.astype(np.float32))
        n64, (_, gy64) = m64.n_and_grad(np.zeros_like(y), y)
        # correctly-rounded: within 1 ulp of the f64 value
        assert np.abs(np.asarray(n32, np.float64)
                      - np.asarray(n64)).max() < 1.2e-7
        assert np.all(np.asarray(gx32) == 0.0)
    # the dynamic tier's jvp of n_and_grad crosses the df arithmetic
    eig = find_eigenrays("op6", m, source=(0.0, -1.5),
                         receivers=[(3.0, -1.5)], delta_s=0.01,
                         max_size=400, box=(-1.0, 4.0, -3.0, 0.0),
                         fan=(-0.2, 0.2, 33), tol=2e-6,
                         dtype=np.float32, on_host=True)
    assert len(np.asarray(eig.theta0)) >= 1
    assert bool(np.asarray(eig.converged).all())
    assert np.all(np.isfinite(np.asarray(eig.amplitude)))
