"""Differentiable tracing (engine/diff.py): gradients through the integrator.

The reference is forward-only; these tests pin the new capability:
forward parity with the production scan engine, gradient correctness
against finite differences, and an end-to-end inverse problem (recover a
medium parameter from observed ray exits by gradient descent).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.engine.diff import (ParametricMedium,
                                        parametric_grid_medium, trace_diff)
from raytracing_tpu.engine.trace import trace


def _fisheye_pm(curv=1.0):
    # n = 1 / (1 + curv*(x^2 + y^2)); curv=1 is the reference fisheye
    # (RT_bench.py:110-112).  The parameter must change the GEOMETRY:
    # a pure amplitude is a null direction (rays follow grad log n).
    return ParametricMedium(
        lambda p, x, y: 1.0 / (1.0 + p * (x * x + y * y)),
        jnp.float64(curv))


def test_forward_matches_scan_engine():
    """trace_diff runs the SAME op matrix: forward results must match the
    production scan engine on the fisheye circle."""
    scen = rt.scenario("fisheye")
    div = 400
    ds = 2 * np.pi / div
    r = 8
    theta0 = np.full(r, np.pi / 2)
    pos0 = np.tile(np.array([[1.0, 0.0]]), (r, 1))
    res = trace("op1", scen, rt.analytic_medium("fisheye"), delta_s=ds,
                divisor=div + 1, n_turns=1, dtype=np.float64, mode="metrics")
    pos, ang, tt, act = trace_diff(
        "op1", _fisheye_pm(), jnp.asarray(pos0), jnp.asarray(theta0),
        jnp.float64(ds), steps=div, box=tuple(scen.box))
    ref = np.asarray(res.final.pos)       # fisheye scenario: 1 ray
    np.testing.assert_allclose(np.asarray(pos)[:, 0], ref[0, 0],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(pos)[:, 1], ref[0, 1],
                               atol=1e-12)


@pytest.mark.parametrize("op", ["op1", "op6", "op12"])
def test_grad_matches_finite_difference(op):
    """d(closure miss)/d(lens curvature) through the trace == central FD."""
    div = 200
    ds = 2 * np.pi / div
    pos0 = jnp.asarray(np.tile(np.array([[1.0, 0.0]]), (4, 1)))
    th0 = jnp.full(4, jnp.pi / 2, jnp.float64)

    def miss(curv):
        med = ParametricMedium(
            lambda p, x, y: 1.0 / (1.0 + p * (x * x + y * y)), curv)
        pos, *_ = trace_diff(op, med, pos0, th0, jnp.float64(ds),
                             steps=div)
        tgt = jnp.asarray([1.0, 0.0])
        return jnp.mean(jnp.sum((pos - tgt) ** 2, axis=-1))

    g = jax.grad(miss)(jnp.float64(1.1))
    h = 1e-6
    fd = (miss(jnp.float64(1.1 + h)) - miss(jnp.float64(1.1 - h))) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-5)


def test_inverse_problem_recovers_interface_thickness():
    """Recover the sigmoid interface's thickness parameter from observed
    exit positions — the inverse problem the forward-only reference cannot
    pose.  Synthetic truth at thck=0.12; start the fit at 0.2."""
    true_thck = 0.12

    def n_fn(p, x, y):
        # the reference interface profile with free thickness
        # (RT_bench.py:106-108)
        return jnp.sqrt(2.0) - (jnp.sqrt(2.0) - 1.0) / (1.0 + jnp.exp(-y / p))

    r = 9
    theta0 = jnp.asarray(np.linspace(np.pi / 5, np.pi / 2.2, r))
    pos0 = jnp.asarray(np.tile(np.array([[-2.0, -1.0]]), (r, 1)))
    ds = 0.02
    steps = 250

    def exits(thck):
        med = ParametricMedium(n_fn, thck)
        pos, *_ = trace_diff("op6", med, pos0, theta0, jnp.float64(ds),
                             steps=steps)
        return pos

    target = exits(jnp.float64(true_thck))

    def loss(thck):
        return jnp.mean(jnp.sum((exits(thck) - target) ** 2, axis=-1))

    import optax

    vg = jax.jit(jax.value_and_grad(loss))
    opt = optax.adam(optax.exponential_decay(0.02, 50, 0.3))
    p = jnp.float64(0.2)
    state = opt.init(p)
    for _ in range(150):
        _, g = vg(p)
        up, state = opt.update(g, state)
        p = p + up
    assert abs(float(p) - true_thck) < 1e-4, float(p)
    assert float(loss(p)) < 1e-7


def test_grad_wrt_launch_and_step():
    """Launch angle and step size are differentiable inputs too."""
    pos0 = jnp.asarray([[1.0, 0.0]] * 2)
    th0 = jnp.full(2, jnp.pi / 2, jnp.float64)

    def endx(th, ds):
        pos, *_ = trace_diff("op1", _fisheye_pm(), pos0, th0 + th,
                             ds, steps=50)
        return jnp.sum(pos[:, 0])

    g_th, g_ds = jax.grad(endx, argnums=(0, 1))(
        jnp.float64(0.0), jnp.float64(0.01))
    assert np.isfinite(float(g_th)) and abs(float(g_th)) > 0
    assert np.isfinite(float(g_ds)) and abs(float(g_ds)) > 0


@pytest.mark.slow
def test_gamma_gradients_newton_vs_golden():
    """Anisotropy gamma is a fittable parameter THROUGH the Newton ops:
    grad matches finite differences.  The golden-section ops are
    piecewise constant in their cost (the bracket's output angle depends
    on the physics only through comparisons), so their autodiff gamma
    gradient is zero a.e. — pinned here so the documented caveat stays
    true."""
    pm = ParametricMedium(
        lambda p, x, y: 1.0 / (18.0 + 2.0 * y) + 0.0 * x + 0.0 * p,
        jnp.float64(1.0))
    pos0 = jnp.asarray([[0.0, -1.0]] * 4)
    th0 = jnp.full(4, np.pi / 4, jnp.float64)

    def endsum(op, gam):
        pos, *_ = trace_diff(op, pm, pos0, th0, jnp.float64(0.01),
                             steps=200, gamma=gam)
        return pos.sum()

    h = 1e-5
    g = jax.grad(lambda v: endsum("op10n", v))(jnp.float64(3.0))
    fd = (endsum("op10n", jnp.float64(3.0 + h))
          - endsum("op10n", jnp.float64(3.0 - h))) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)
    assert abs(float(fd)) > 1e-4          # the dependence is real
    g_gold = jax.grad(lambda v: endsum("op10", v))(jnp.float64(3.0))
    assert float(g_gold) == 0.0           # golden: zero a.e. (documented)


@pytest.mark.slow
def test_traveltime_tomography_recovers_anomaly():
    """Many-parameter inverse problem: reconstruct a 12x12 n-grid (144
    parameters) from exit travel times + positions of 160 crossing rays —
    classic travel-time tomography, impossible in the forward-only
    reference.  Asserts the recovered anomaly correlates with truth in
    the ray-covered interior."""
    import optax

    NG = 12


    X, Y = np.meshgrid(np.linspace(-1, 1, NG), np.linspace(-1, 1, NG))
    truth = jnp.asarray(
        1.0 + 0.15 * np.exp(-((X - 0.2) ** 2 + (Y + 0.1) ** 2) / 0.08))
    m = 40
    t = np.linspace(-0.9, 0.9, m)
    sp = np.linspace(-0.7, 0.7, m)
    pos0 = jnp.asarray(np.concatenate([
        np.stack([np.full(m, -1.0), t], 1),
        np.stack([t, np.full(m, -1.0)], 1),
        np.stack([np.full(m, 1.0), t], 1),
        np.stack([t, np.full(m, 1.0)], 1)]))
    th0 = jnp.asarray(np.concatenate(
        [sp, np.pi / 2 + sp, np.pi + sp, -np.pi / 2 + sp]))
    steps, ds = 170, 0.015
    box = (-1.0, 1.0, -1.0, 1.0)

    h = 2.0 / (NG - 1)

    def observe(grid):
        med = parametric_grid_medium(grid, -1.0, -1.0, h, h)
        pos, _, tt, _ = trace_diff("op6", med, pos0, th0, jnp.float64(ds),
                                   steps=steps, box=box)
        return tt, pos

    target_tt, target_pos = observe(truth)

    def loss(grid):
        tt, pos = observe(grid)
        data = (jnp.mean((tt - target_tt) ** 2)
                + jnp.mean(jnp.sum((pos - target_pos) ** 2, -1)))
        dgx = grid[:, 1:] - grid[:, :-1]
        dgy = grid[1:, :] - grid[:-1, :]
        return data + 0.02 * (jnp.mean(dgx ** 2) + jnp.mean(dgy ** 2))

    vg = jax.jit(jax.value_and_grad(loss))
    opt = optax.adam(optax.exponential_decay(0.01, 200, 0.3))
    p = jnp.ones((NG, NG), jnp.float64)
    state = opt.init(p)
    for _ in range(600):
        _, g = vg(p)
        up, state = opt.update(g, state)
        p = p + up
    rec, tr = np.asarray(p), np.asarray(truth)
    ci = np.corrcoef((rec - 1)[2:-2, 2:-2].ravel(),
                     (tr - 1)[2:-2, 2:-2].ravel())[0, 1]
    assert ci > 0.85, ci


@pytest.mark.slow
def test_grad_sharded_over_mesh():
    """Inverse problems scale like forward traces: shard the ray batch of
    a trace_diff loss over the 8-device mesh and check the medium-parameter
    gradient matches the single-device value (ray fans are data-parallel;
    the loss mean is the only cross-shard reduction)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from raytracing_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    r = 64
    theta0 = jnp.asarray(np.linspace(np.pi / 5, np.pi / 2.2, r))
    pos0 = jnp.asarray(np.tile(np.array([[-2.0, -1.0]]), (r, 1)))

    def n_fn(p, x, y):
        return jnp.sqrt(2.0) - (jnp.sqrt(2.0) - 1.0) / (1.0 + jnp.exp(-y / p))

    def loss(thck, pos0, theta0):
        med = ParametricMedium(n_fn, thck)
        pos, *_ = trace_diff("op6", med, pos0, theta0, jnp.float64(0.02),
                             steps=120)
        return jnp.mean(jnp.sum(pos ** 2, axis=-1))

    g_single = jax.grad(loss)(jnp.float64(0.15), pos0, theta0)
    ray_sh = NamedSharding(mesh, P(mesh.axis_names[0] if len(
        mesh.axis_names) == 1 else mesh.axis_names))
    pos_sh = jax.device_put(pos0, ray_sh)
    th_sh = jax.device_put(theta0, ray_sh)
    g_mesh = jax.jit(jax.grad(loss))(jnp.float64(0.15), pos_sh, th_sh)
    np.testing.assert_allclose(float(g_mesh), float(g_single), rtol=1e-12)


def test_parametric_grid_medium_adjoint_sparsity():
    """The node-value gradient of a straight ray's travel time touches
    ONLY the nodes bracketing the path — the tomography adjoint is local,
    as the physics demands."""
    NG = 8
    h = 2.0 / (NG - 1)
    vals = jnp.ones((NG, NG), jnp.float64)
    pos0 = jnp.asarray([[-1.0, 0.0]] * 2)
    th0 = jnp.zeros(2, jnp.float64)     # straight horizontal rays at y=0

    def loss(v):
        m = parametric_grid_medium(v, -1.0, -1.0, h, h)
        *_, tt, _ = trace_diff("op6", m, pos0, th0, jnp.float64(0.02),
                               steps=60)
        return tt.sum()

    g = np.asarray(jax.grad(loss)(vals))
    nz_rows = np.unique(np.nonzero(np.abs(g) > 0)[0])
    # y=0 sits between node rows 3 and 4 on an 8-node grid over [-1, 1]
    assert set(nz_rows) <= {3, 4}, nz_rows
    assert (np.abs(g) > 0).sum() > 0


def test_remat_segments_identical_gradients():
    """remat_segments trades recompute for O(k)-smaller residual memory;
    values AND gradients must be identical to the plain scan."""
    def miss(curv, k):
        med = ParametricMedium(
            lambda p, x, y: 1.0 / (1.0 + p * (x * x + y * y)), curv)
        pos, *_ = trace_diff("op6", med,
                             jnp.asarray([[1.0, 0.0]] * 2),
                             jnp.full(2, jnp.pi / 2, jnp.float64),
                             jnp.float64(0.02), steps=120,
                             remat_segments=k)
        return jnp.sum(pos ** 2)

    v1, g1 = jax.value_and_grad(miss)(jnp.float64(1.1), 1)
    v4, g4 = jax.value_and_grad(miss)(jnp.float64(1.1), 4)
    assert float(v1) == float(v4)
    # backward reassociation may differ in the last ulp
    np.testing.assert_allclose(float(g1), float(g4), rtol=1e-13)
    with pytest.raises(ValueError, match="divide"):
        miss(jnp.float64(1.1), 7)


@pytest.mark.slow
@pytest.mark.parametrize("op", ["op2", "op3", "op4", "op5", "op7", "op8",
                                "op9"])
def test_forward_parity_all_iso_ops(op):
    """Every isotropic op traces identically (<= ~1e-14) to the scan
    engine through the diff tier — op7's backward-diff order ramp keys on
    the 1-based step index (engine/trace.py:162), pinned here."""
    scen = rt.scenario("fisheye")
    div = 300
    ds = 2 * np.pi / div
    pm = _fisheye_pm()
    pos0 = np.tile(np.array([[1.0, 0.0]]), (2, 1))
    th0 = np.full(2, np.pi / 2)
    res = trace(op, scen, rt.analytic_medium("fisheye"), delta_s=ds,
                divisor=div + 1, n_turns=1, dtype=np.float64,
                mode="metrics")
    d = trace_diff(op, pm, jnp.asarray(pos0), jnp.asarray(th0),
                   jnp.float64(ds), steps=div, box=tuple(scen.box))
    np.testing.assert_allclose(np.asarray(d.pos)[0],
                               np.asarray(res.final.pos)[0], atol=1e-13)


@pytest.mark.slow
@pytest.mark.parametrize("op", ["op10", "op11", "op10n", "op11n"])
def test_forward_parity_aniso_ops(op):
    """Anisotropic ops (gamma=3) match the scan engine through the diff
    tier on the reference's aniso scenario fan."""
    scen = rt.scenario("4")
    pm = ParametricMedium(
        lambda p, x, y: p / (18.0 + 2.0 * y) + 0.0 * x, jnp.float64(1.0))
    res = trace(op, scen, rt.analytic_medium(scen.field), delta_s=0.01,
                dtype=np.float64, mode="metrics", max_size=300)
    d = trace_diff(op, pm,
                   jnp.asarray(np.asarray(scen.pos0, np.float64)),
                   jnp.asarray(np.asarray(scen.theta0, np.float64)),
                   jnp.float64(0.01), steps=299, box=tuple(scen.box),
                   gamma=scen.gamma)
    np.testing.assert_allclose(np.asarray(d.pos),
                               np.asarray(res.final.pos), atol=1e-12)
    # travel time uses the EFFECTIVE index coef*n (RT_bench.py:784-790)
    np.testing.assert_allclose(np.asarray(d.traveltime),
                               np.asarray(res.final.traveltime), rtol=1e-12)


def test_parametric_profile_medium_adjoint_and_fd():
    """1-D profile parameters: the travel-time gradient is local to the
    samples bracketing the ray's depth and matches finite differences —
    the inverse-problem entry for MEASURED profiles."""
    from raytracing_tpu.engine.diff import parametric_profile_medium

    NY = 9
    hy = 0.25                            # y grid over [-1, 1]
    vals = jnp.ones(NY, jnp.float64) * 1.2
    pos0 = jnp.asarray([[-0.5, 0.1]] * 2)
    th0 = jnp.zeros(2, jnp.float64)      # straight rays at y = 0.1

    def loss(v):
        m = parametric_profile_medium(v, -1.0, hy)
        *_, tt, _ = trace_diff("op6", m, pos0, th0, jnp.float64(0.02),
                               steps=50)
        return tt.sum()

    g = np.asarray(jax.grad(loss)(vals))
    nz = np.nonzero(np.abs(g) > 0)[0]
    # y=0.1 sits between samples 4 (y=0) and 5 (y=0.25); a constant
    # profile keeps the ray straight so nothing else is ever touched
    assert set(nz) == {4, 5}, nz

    eps = 1e-6
    for k in (4, 5):
        vp = vals.at[k].add(eps)
        vm = vals.at[k].add(-eps)
        fd = (loss(vp) - loss(vm)) / (2 * eps)
        assert float(fd) == pytest.approx(float(g[k]), rel=1e-5)


@pytest.mark.slow
def test_parametric_profile_inversion_recovers_gradient():
    """Recover a thermocline strength from exit positions alone: the
    1-D counterpart of the interface-thickness inversion."""
    from raytracing_tpu.engine.diff import parametric_profile_medium

    y = np.linspace(-2.0, 1.0, 25)
    hy = float(y[1] - y[0])

    def profile(a):
        return 1.0 + a * jnp.tanh(2.0 * jnp.asarray(y))

    r = 8
    pos0 = jnp.stack([jnp.zeros(r), jnp.linspace(-1.5, -0.5, r)], -1)
    th0 = jnp.full(r, 0.4)
    kw = dict(steps=120, box=(-10.0, 10.0, -2.0, 1.0))

    def final_pos(a):
        m = parametric_profile_medium(profile(a), float(y[0]), hy)
        pos, *_ = trace_diff("op6", m, pos0, th0, jnp.float64(0.02), **kw)
        return pos

    target = final_pos(0.3)

    def loss(a):
        d = final_pos(a) - target
        return jnp.sum(d * d)

    a = jnp.asarray(0.1, jnp.float64)
    g = jax.grad(loss)
    for _ in range(60):                 # curvature ~65 -> lr below 2/65
        a = a - 0.02 * g(a)
    assert float(a) == pytest.approx(0.3, abs=1e-3)
