"""Sampled 3-D tri-Hermite grid media (media/grid3.py).

The 3-D lift of the reference's sample->fit->trace pipeline
(RT_bench.py:412-464): exactness of the tensor-product construction,
gradient/value consistency, agreement with the 1-D profile machinery on
stratified data, clamping, and physics oracles (Bouguer / closure)
through a genuinely 3-D sampled field.
"""
import numpy as np
import pytest

from raytracing_tpu.engine.trace3d import bouguer_invariant, trace3d
from raytracing_tpu.media.fields3d import analytic_medium3
from raytracing_tpu.media.grid3 import (C1Grid3Medium, check_uniform_grid3,
                                        c1_medium3_from_samples)

RNG = np.random.default_rng(7)


def _grid(nx=9, ny=10, nz=11, span=1.5):
    x = np.linspace(-span, span, nx)
    y = np.linspace(-span, span, ny)
    z = np.linspace(-span, span, nz)
    return x, y, z, np.meshgrid(z, y, x, indexing="ij")


def test_tricubic_polynomial_reproduction_exact():
    """Not-a-knot tensor splines reproduce per-axis-cubic polynomials, so
    the tri-Hermite tables must evaluate the polynomial and its gradient
    to f64 round-off everywhere in the domain, not just at nodes."""
    x, y, z, (Zg, Yg, Xg) = _grid()

    def f(X, Y, Z):
        return ((2.0 + 0.3 * X - 0.1 * X ** 3) * (1.0 + 0.2 * Y * Y)
                + 0.5 * Z + 0.07 * Z ** 3 - 0.11 * X * Y * Z)

    def grad_f(X, Y, Z):
        return ((0.3 - 0.3 * X * X) * (1.0 + 0.2 * Y * Y) - 0.11 * Y * Z,
                (2.0 + 0.3 * X - 0.1 * X ** 3) * 0.4 * Y - 0.11 * X * Z,
                0.5 + 0.21 * Z * Z - 0.11 * X * Y)

    med = c1_medium3_from_samples(f(Xg, Yg, Zg), x, y, z, dtype=np.float64)
    q = RNG.uniform(-1.45, 1.45, size=(200, 3))
    n, (gx, gy, gz) = med.n_and_grad3(q[:, 0], q[:, 1], q[:, 2])
    ex_gx, ex_gy, ex_gz = grad_f(q[:, 0], q[:, 1], q[:, 2])
    np.testing.assert_allclose(np.asarray(n), f(q[:, 0], q[:, 1], q[:, 2]),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gx), ex_gx, rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gy), ex_gy, rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gz), ex_gz, rtol=0, atol=1e-10)


def test_gradient_is_exact_derivative_of_n():
    """grad n must be the ANALYTIC gradient of the n the integrator sees
    (the C1 family's defining property) — checked against forward-mode
    autodiff of n3 on a non-separable sampled field."""
    import jax

    x, y, z, (Zg, Yg, Xg) = _grid(12, 11, 10)
    F = 1.0 + 0.25 * np.exp(-(Xg ** 2 + 0.5 * Yg ** 2 + 2.0 * Zg ** 2))
    med = c1_medium3_from_samples(F, x, y, z, dtype=np.float64)
    q = RNG.uniform(-1.4, 1.4, size=(64, 3))
    qx, qy, qz = (np.ascontiguousarray(q[:, k]) for k in range(3))
    n, (gx, gy, gz) = med.n_and_grad3(qx, qy, qz)
    ones, zeros = np.ones_like(qx), np.zeros_like(qx)
    for g, tang in ((gx, (ones, zeros, zeros)), (gy, (zeros, ones, zeros)),
                    (gz, (zeros, zeros, ones))):
        _, jv = jax.jvp(med.n3, (qx, qy, qz), tang)
        np.testing.assert_allclose(np.asarray(g), np.asarray(jv),
                                   rtol=0, atol=1e-11)


def test_mixed_tangent_order_commutes():
    """D_y(D_x F) == D_x(D_y F) for the tensor-product construction — the
    builder picks one order; this pins that the choice is immaterial."""
    from raytracing_tpu.media.grid3 import _axis_tangents

    F = RNG.standard_normal((7, 8, 9))
    a = _axis_tangents(_axis_tangents(F, 2), 1)
    b = _axis_tangents(_axis_tangents(F, 1), 2)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_stratified_profile_agrees_with_1d_c1_family():
    """A y-only profile sampled as a 3-D grid must reproduce the 1-D C1
    profile medium (media/c1.c1_stratified_from_samples) exactly: the
    tensor spline of x/z-constant data IS the 1-D y-spline."""
    from raytracing_tpu.media.c1 import c1_stratified_from_samples

    y = np.linspace(-2.0, 0.0, 17)
    prof = 1.5 - 0.3 * np.tanh(3.0 * (y + 1.0))
    x = np.linspace(-1.0, 1.0, 5)
    z = np.linspace(-1.0, 1.0, 6)
    F = np.broadcast_to(prof[None, :, None], (6, 17, 5))
    med3 = c1_medium3_from_samples(F, x, y, z, dtype=np.float64)
    med1 = c1_stratified_from_samples(prof, y, dtype=np.float64)

    q = RNG.uniform(-0.9, 0.9, size=(50,))
    qy = RNG.uniform(-1.9, -0.1, size=(50,))
    n3, (gx3, gy3, gz3) = med3.n_and_grad3(q, qy, -q)
    n1, (_, gy1) = med1.n_and_grad(q, qy)
    np.testing.assert_allclose(np.asarray(n3), np.asarray(n1),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy3), np.asarray(gy1),
                               rtol=0, atol=1e-11)
    assert np.abs(np.asarray(gx3)).max() < 1e-12
    assert np.abs(np.asarray(gz3)).max() < 1e-12


def test_clamping_matches_edge_queries():
    """Out-of-range queries clamp to the grid boundary — the FITPACK
    convention every sampled medium follows (media/spline.GridMedium)."""
    x, y, z, (Zg, Yg, Xg) = _grid(6, 7, 8, span=1.0)
    F = 1.0 + 0.1 * Xg + 0.2 * Yg * Yg + 0.05 * Zg
    med = c1_medium3_from_samples(F, x, y, z)
    n_out, g_out = med.n_and_grad3(np.float32(5.0), np.float32(-9.0),
                                   np.float32(2.0))
    n_edge, g_edge = med.n_and_grad3(np.float32(1.0), np.float32(-1.0),
                                     np.float32(1.0))
    assert np.allclose(np.asarray(n_out), np.asarray(n_edge))
    for a, b in zip(g_out, g_edge):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_validation_rejects_bad_grids():
    x = np.linspace(0, 1, 5)
    with pytest.raises(ValueError, match="shape"):
        c1_medium3_from_samples(np.zeros((4, 4, 4)), x, x, x)
    with pytest.raises(ValueError, match="4x4x4"):
        c1_medium3_from_samples(np.zeros((3, 5, 5)), x, x,
                                np.linspace(0, 1, 3))
    with pytest.raises(ValueError, match="ascending"):
        c1_medium3_from_samples(np.zeros((5, 5, 5)), x, x, x[::-1])
    F, *_ = check_uniform_grid3(np.zeros((5, 5, 5)), x, x, x)
    assert F.dtype == np.float64


def test_richardson_calibration_accepts_grid3():
    """Measured 3-D media calibrate their step by Richardson
    self-convergence like every other measured medium
    (parallel/sweep.delta_s_search_convergence3)."""
    from raytracing_tpu.parallel.sweep import delta_s_search_convergence3

    x, y, z, (Zg, Yg, Xg) = _grid(10, 10, 10)
    F = 1.0 + 0.2 * np.exp(-(Xg ** 2 + Yg ** 2 + Zg ** 2))
    med = c1_medium3_from_samples(F, x, y, z)
    t = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    pos0 = np.tile([[-1.0, 0.0, 0.0]], (8, 1))
    dir0 = np.stack([np.full(8, 3.0), np.cos(t), np.sin(t)], -1)
    res = delta_s_search_convergence3(
        "op6", med, pos0=pos0, dir0=dir0, arc_length=2.5,
        candidates=2.5 / (40 * 2.0 ** np.arange(4)), tol=1e-3)
    assert res.delta_s_selected is not None and res.delta_s_selected > 0


def test_sampled_fisheye_bouguer_and_closure():
    """Trace through the SAMPLED 3-D fisheye and hold the physics oracles:
    Bouguer invariant n|r x u| drift stays at the integrator's grade and
    the trajectory tracks the analytic medium's (the sampled field's own
    fit error dominates, as in the 2-D sampled pipeline)."""
    n_g = 33
    x = np.linspace(-1.7, 1.7, n_g)
    Zg, Yg, Xg = np.meshgrid(x, x, x, indexing="ij")
    F = 1.0 / (1.0 + Xg ** 2 + Yg ** 2 + Zg ** 2)
    med = c1_medium3_from_samples(F, x, x, x, dtype=np.float64)

    r = 24
    t = np.linspace(0.0, 2 * np.pi, r, endpoint=False)
    pos0 = np.zeros((r, 3))
    # fisheye circles through r0 reach 1/r0 at the antipode: launch at 0.7
    # so the whole orbit (max radius ~1.43) stays inside the sampled grid
    pos0[:, 0] = 0.7
    dir0 = np.stack([np.zeros(r), np.cos(t), np.sin(t)], -1)
    steps = 600
    ds = 2 * np.pi / 600
    out = trace3d("op6", med, pos0=pos0, dir0=dir0, delta_s=ds,
                  steps=steps, dtype=np.float64)
    ref = trace3d("op6", analytic_medium3("fisheye"), pos0=pos0, dir0=dir0,
                  delta_s=ds, steps=steps, dtype=np.float64)

    b = bouguer_invariant(out)
    drift = np.abs(b - b[0]).max() / np.abs(b[0]).max()
    assert drift < 3e-5, drift
    dev = np.abs(np.asarray(out.history)[..., :3]
                 - np.asarray(ref.history)[..., :3]).max()
    assert dev < 2e-4, dev
