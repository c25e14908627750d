"""Eigenray solver: boundary-value arrivals, multipath, field synthesis.

Closed-form oracles:

* homogeneous medium — one straight eigenray: exact launch angle
  ``atan2(dy, dx)``, travel time ``n d``, amplitude ``1/sqrt(d)``;
* linear velocity ``v = 18 + 2y`` (the analytic vert_heterogeneous field,
  RT_bench.py:114-116) — the classic two-point travel time
  ``t = arccosh(1 + g^2 d^2 / (2 v_A v_B)) / g`` (circular-arc rays);
* parabolic waveguide — multipath: symmetric arrival pairs with equal
  travel times, plus the axial ray.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.engine.eigenray import (coherent_tl, find_eigenrays,
                                            incoherent_tl, pressure)
from raytracing_tpu.media.medium import CustomMedium


def _homog():
    return CustomMedium(lambda x, y: jnp.ones_like(x) + 0.0 * y)


def test_homogeneous_single_eigenray_exact():
    # tol is a residual bound and the solver stops AT it; ask for 1e-12
    # to demonstrate the machine-precision floor
    eig = find_eigenrays("op1", _homog(), source=(0, 0), receivers=[(3, 1)],
                         delta_s=0.02, max_size=400, box=(-1, 5, -2, 3),
                         fan=(0.0, 1.2, 64), tol=1e-12)
    assert len(eig.theta0) == 1 and bool(eig.converged[0])
    assert eig.theta0[0] == pytest.approx(np.arctan2(1, 3), abs=1e-11)
    assert eig.traveltime[0] == pytest.approx(np.sqrt(10), abs=1e-11)
    assert eig.amplitude[0] == pytest.approx(10 ** -0.25, abs=1e-11)
    assert eig.kmah[0] == 0
    assert abs(eig.y_err[0]) < 1e-12


def test_linear_velocity_slotnick_traveltime():
    """v = 18 + 2y: the arccosh two-point formula, to integrator accuracy."""
    med = rt.analytic_medium("vert_heterogeneous")
    eig = find_eigenrays("op6", med, source=(0, 0), receivers=[(3, -1)],
                         delta_s=0.005, max_size=2000, box=(-2, 5, -2.5, 1),
                         fan=(-1.2, 0.6, 128), tol=1e-12)
    assert len(eig.theta0) == 1 and bool(eig.converged[0])
    vA, vB, d, g = 18.0, 16.0, np.sqrt(10.0), 2.0
    t_exact = np.arccosh(1 + g * g * d * d / (2 * vA * vB)) / g
    assert eig.traveltime[0] == pytest.approx(t_exact, rel=2e-7)
    assert abs(eig.y_err[0]) < 1e-10


def _waveguide():
    return CustomMedium(lambda x, y: 1.5 - 0.5 * y * y + 0.0 * x)


def test_parabolic_waveguide_multipath():
    """On-axis source/receiver pair: axial arrival + symmetric multipath.

    At range 60 (~8 paraxial periods) the amplitude-dependence of the ray
    period separates steep from shallow paths: the landing-depth curve
    crosses the axis 4 times besides the exact axial hit, so 5 arrivals.
    """
    eig = find_eigenrays("op6", _waveguide(), source=(0, 0),
                         receivers=[(60.0, 0.0)], delta_s=0.02,
                         max_size=4200, box=(-1, 63, -1.5, 1.5),
                         fan=(-0.6, 0.6, 192))
    assert len(eig.theta0) == 5
    assert bool(np.all(eig.converged))
    assert np.all(np.abs(eig.y_err) < 1e-8)
    # arrivals come back sorted by travel time
    assert np.all(np.diff(eig.traveltime) >= 0)
    # up/down symmetry: each off-axis arrival has a mirror with equal tau
    off = np.abs(eig.theta0) > 1e-6
    taus = np.sort(eig.traveltime[off])
    assert len(taus) % 2 == 0
    np.testing.assert_allclose(taus[0::2], taus[1::2], rtol=1e-9)
    # multipath passes foci: some arrival carries caustic phase
    assert np.any(eig.kmah > 0)


def test_field_synthesis_reductions():
    eig = find_eigenrays("op6", _waveguide(), source=(0, 0),
                         receivers=[(12.0, 0.0), (12.0, 0.4)],
                         delta_s=0.02, max_size=900,
                         box=(-1, 15, -1.5, 1.5), fan=(-0.6, 0.6, 192))
    assert set(np.asarray(eig.receiver)) == {0, 1}
    p = pressure(eig, omega=50.0, n_receivers=2)
    assert p.shape == (2,) and np.all(np.isfinite(p))
    ctl = coherent_tl(eig, omega=50.0, n_receivers=2)
    itl = incoherent_tl(eig, n_receivers=2)
    assert np.all(np.isfinite(ctl)) and np.all(np.isfinite(itl))
    # for_receiver views agree with the flat arrays
    e0 = eig.for_receiver(0)
    assert np.all(np.asarray(e0.receiver) == 0)
    assert len(e0.theta0) + len(eig.for_receiver(1).theta0) == len(eig.theta0)


def test_no_arrivals_is_empty_not_error():
    eig = find_eigenrays("op1", _homog(), source=(0, 0),
                         receivers=[(-3.0, 0.0)],  # behind the fan
                         delta_s=0.05, max_size=100, box=(-5, 5, -5, 5),
                         fan=(0.0, 1.0, 16))
    assert len(eig.theta0) == 0
    assert np.isinf(incoherent_tl(eig, n_receivers=1)).all()


def test_receiver_grid_matches_per_receiver_solves():
    """The vectorized bracket scan (one crossing pass per unique range,
    all receivers/ordinals at once) finds exactly the arrivals that
    solving each receiver alone finds."""
    grid = [(12.0, 0.0), (12.0, 0.4), (20.0, 0.0), (20.0, -0.3)]
    kw = dict(delta_s=0.02, max_size=1500, box=(-1, 23, -1.5, 1.5),
              fan=(-0.6, 0.6, 192))
    eig = find_eigenrays("op6", _waveguide(), source=(0, 0),
                         receivers=grid, **kw)
    for i, rcv in enumerate(grid):
        solo = find_eigenrays("op6", _waveguide(), source=(0, 0),
                              receivers=[rcv], **kw)
        mine = eig.for_receiver(i)
        assert len(mine.theta0) == len(solo.theta0) > 0
        np.testing.assert_allclose(np.sort(mine.theta0),
                                   np.sort(solo.theta0), atol=1e-9)
        np.testing.assert_allclose(np.sort(mine.traveltime),
                                   np.sort(solo.traveltime), rtol=1e-9)


def test_exact_landing_still_counts_as_crossing():
    """A step that lands EXACTLY on the receiver range is one crossing.

    The compensated position carries make exact landings routine when
    delta_s and the range are commensurate (50 Kahan-compensated steps of
    fl(0.02) in a homogeneous axial ray give x == 1.0 bit-exactly); the
    old ``d0 * d1 < 0`` predicate scored those 0 and the axial arrival
    vanished (caught by test_parabolic_waveguide_multipath).  Both the
    device scans (engine/dynamic.trace_crossings_*) and the host twins
    (engine/eigenray._crossing_vals/_pick_crossings) use the
    sign-transition form now."""
    from raytracing_tpu.engine.eigenray import _crossing_depths

    eig = find_eigenrays("op6", _homog(), source=(0, 0),
                         receivers=[(1.0, 0.0), (2.0, 0.0)],
                         delta_s=0.02, max_size=200, box=(-1, 3, -1, 1),
                         fan=(-0.2, 0.2, 33))
    assert set(np.asarray(eig.receiver)) == {0, 1}
    assert np.all(np.asarray(eig.converged))
    # host twin: a synthetic history whose x hits the range exactly
    h = np.zeros((4, 1, 7))
    h[:, 0, 0] = [0.0, 0.5, 1.0, 1.5]     # x lands exactly on 1.0
    h[:, 0, 1] = [0.0, 0.1, 0.2, 0.3]     # y
    d = _crossing_depths(h, np.array([3]), 1.0)
    assert d.shape == (1, 1) and np.isclose(d[0, 0], 0.2)
