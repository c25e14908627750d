"""Full-trajectory parity: the lax.scan engine vs the per-ray numpy mirror.

Exercises the parts the mirror does differently on purpose — vmapped masking
vs per-ray break, in-carry window vs a Python list, fixed-trip golden vs a
while loop — over short trajectories of every structural family.
"""
import dataclasses

import numpy as np
import pytest

import ref_numpy
from raytracing_tpu import analytic_medium, scenario, trace

#: a representative op of each (stepper, solver) structure
STRUCTURAL_OPS = ["op1", "op2", "op3", "op4", "op5", "op6", "op7", "op8", "op9"]


def _compare(res, s_ray, n_ray, d_ray, atol=1e-9):
    got_s, got_n = res.reference_layout()
    np.testing.assert_allclose(got_s, s_ray, atol=atol,
                               err_msg="history mismatch")
    np.testing.assert_allclose(got_n, n_ray, atol=atol)
    np.testing.assert_array_equal(np.asarray(res.exit_step), d_ray[2].astype(int))
    np.testing.assert_allclose(np.asarray(res.dist_real), d_ray[0], atol=atol)
    np.testing.assert_allclose(np.asarray(res.dist_sim), d_ray[1], atol=atol)


@pytest.mark.parametrize("op", STRUCTURAL_OPS)
def test_fisheye_short(op):
    scen = scenario("fisheye")
    med = analytic_medium("fisheye")
    div = 40
    ds = 2 * np.pi / div
    s_ray, n_ray, d_ray = ref_numpy.trace(op, scen, ds, divisor=div + 1, n_turns=1)
    # XLA CPU's f64 sin/cos take an inaccurate (~5e-9) code path for
    # 1-element arrays; trace a duplicated ray pair and compare ray 0 so the
    # exact vectorized path is exercised, as it is for every real batch.
    res = trace(op, scen, med, delta_s=ds, divisor=div + 1, n_turns=1,
                dtype=np.float64,
                pos0=np.repeat(scen.pos0, 2, 0), theta0=np.repeat(scen.theta0, 2))
    res = res._replace(history=res.history[:, :1], n_hist=res.n_hist[:, :1],
                       exit_step=res.exit_step[:1], dist_real=res.dist_real[:1],
                       dist_sim=res.dist_sim[:1])
    atol = 5e-7 if op in ("op5", "op9") else 1e-9  # golden midpoint ~ sqrt(eps)
    _compare(res, s_ray, n_ray, d_ray, atol=atol)


@pytest.mark.parametrize("op", ["op2", "op4", "op6", "op7", "op9"])
def test_vert_short(op):
    scen = dataclasses.replace(scenario("vert"), s_max=2.0)
    med = analytic_medium("vert_heterogeneous")
    ds = 0.02
    s_ray, n_ray, d_ray = ref_numpy.trace(op, scen, ds)
    res = trace(op, scen, med, delta_s=ds, dtype=np.float64)
    _compare(res, s_ray, n_ray, d_ray, atol=5e-7 if op == "op9" else 1e-9)


@pytest.mark.parametrize("op", ["op10", "op11"])
def test_aniso_short(op):
    scen = dataclasses.replace(scenario("aniso"), s_max=2.0)
    med = analytic_medium("vert_heterogeneous")
    ds = 0.02
    s_ray, n_ray, d_ray = ref_numpy.trace(op, scen, ds)
    res = trace(op, scen, med, delta_s=ds, dtype=np.float64)
    _compare(res, s_ray, n_ray, d_ray, atol=5e-7)


def test_boundary_exit_masking():
    """Rays exiting through different walls at different steps freeze exactly
    like the mirror's per-ray break, and later history rows stay zero."""
    scen = dataclasses.replace(scenario("vert"),
                               box=(-2.0, -1.0, -2.5, -1.5), s_max=3.0)
    med = analytic_medium("vert_heterogeneous")
    ds = 0.05
    s_ray, n_ray, d_ray = ref_numpy.trace("op6", scen, ds)
    res = trace("op6", scen, med, delta_s=ds, dtype=np.float64)
    _compare(res, s_ray, n_ray, d_ray)
    # Every ray must actually have exited (box is tiny).
    assert np.all(d_ray[2] < s_ray.shape[0] - 1)
    # Rows past the exit are zero in both.
    got_s, _ = res.reference_layout()
    for k in range(scen.ray_count):
        i = int(d_ray[2, k])
        assert np.all(got_s[i + 1:, :, k] == 0.0)


def test_interface_short():
    scen = dataclasses.replace(scenario("interface"), s_max=5.0)
    med = analytic_medium("interface")
    ds = 0.02
    s_ray, n_ray, d_ray = ref_numpy.trace("op6", scen, ds)
    res = trace("op6", scen, med, delta_s=ds, dtype=np.float64)
    _compare(res, s_ray, n_ray, d_ray)


def test_padded_scan_matches_exact():
    """A longer buffer with step_limit reproduces the exact-size run."""
    scen = scenario("fisheye")
    med = analytic_medium("fisheye")
    div = 40
    ds = 2 * np.pi / div
    pos0 = np.repeat(scen.pos0, 2, 0)
    theta0 = np.repeat(scen.theta0, 2)
    exact = trace("op1", scen, med, delta_s=ds, divisor=div + 1, n_turns=1,
                  dtype=np.float64, pos0=pos0, theta0=theta0)
    n_rows = scen.max_size(ds, div + 1, 1)
    padded = trace("op1", scen, med, delta_s=ds, max_size=n_rows + 37,
                   step_limit=n_rows - 1, dtype=np.float64,
                   pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(padded.history[:n_rows]),
                               np.asarray(exact.history), atol=0)
    assert np.all(np.asarray(padded.history[n_rows:]) == 0.0)
    np.testing.assert_array_equal(np.asarray(padded.exit_step),
                                  np.asarray(exact.exit_step))


def test_metrics_mode_matches_history_mode():
    scen = dataclasses.replace(scenario("vert"), s_max=2.0)
    med = analytic_medium("vert_heterogeneous")
    ds = 0.02
    hist = trace("op8", scen, med, delta_s=ds, dtype=np.float64)
    metr = trace("op8", scen, med, delta_s=ds, mode="metrics", dtype=np.float64)
    assert metr.history is None
    np.testing.assert_allclose(np.asarray(metr.final.pos),
                               np.asarray(hist.final.pos), atol=0)
    np.testing.assert_allclose(np.asarray(metr.final.traveltime),
                               np.asarray(hist.final.traveltime), atol=0)


def test_custom_medium_matches_builtin():
    """A user-defined fisheye via CustomMedium reproduces the builtin."""
    import jax.numpy as jnp
    from raytracing_tpu.media.medium import CustomMedium

    custom = CustomMedium(n_fn=lambda x, y: 1.0 / (1.0 + x * x + y * y))
    builtin = analytic_medium("fisheye")
    scen = scenario("fisheye")
    ds = 2 * np.pi / 50
    kw = dict(delta_s=ds, max_size=51, dtype=np.float64,
              pos0=np.repeat(scen.pos0, 2, 0), theta0=np.repeat(scen.theta0, 2))
    a = trace("op6", scen, custom, **kw)
    b = trace("op6", scen, builtin, **kw)
    np.testing.assert_allclose(np.asarray(a.history), np.asarray(b.history),
                               atol=1e-12)
