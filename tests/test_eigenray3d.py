"""3-D eigenray solver: 2-parameter Newton with the exact paraxial Q.

Oracles: exact homogeneous arrival (direction, travel time, 1/d spherical
amplitude); reduction to the 2-D solver for stratified media (same
multipath set, same travel times, arrivals confined to the source-receiver
plane); convergence on a genuinely 3-D medium (eddy) where the arrival
leaves the launch plane — which no 2-D solver can produce.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.engine.eigenray import find_eigenrays, incoherent_tl
from raytracing_tpu.engine.eigenray3d import find_eigenrays3
from raytracing_tpu.media.fields3d import Custom3D, Stratified3D
from raytracing_tpu.media.medium import CustomMedium

# grid fan traces x Newton iterations: the heaviest new-tier module rides
# the full suite only (CLAUDE.md test tiers)
pytestmark = pytest.mark.slow


def _homog3():
    return Custom3D(lambda x, y, z: jnp.ones_like(x))


def test_homogeneous_single_arrival_exact():
    r = np.array([3.0, 1.0, -0.5])
    eig = find_eigenrays3("op1", _homog3(), source=(0, 0, 0),
                          receivers=[r], delta_s=0.02, max_size=250,
                          box=(-1, 5, -3, 3, -3, 3),
                          fan=(-0.5, 0.5, 17, -0.5, 0.5, 17))
    assert len(eig.traveltime) == 1 and bool(eig.converged[0])
    d = np.linalg.norm(r)
    np.testing.assert_allclose(eig.dir0[0], r / d, atol=1e-12)
    assert eig.traveltime[0] == pytest_approx(d, 1e-12)
    # spherical spreading: A = 1/d (crossing-interp limits detq to ~1e-6)
    assert abs(eig.amplitude[0] - 1 / d) < 2e-6
    assert eig.miss[0] < 1e-12 and eig.kmah[0] == 0
    # the duck-typed 2-D reductions accept Eigenrays3
    assert np.isfinite(incoherent_tl(eig, n_receivers=1)).all()


def pytest_approx(v, tol):
    import pytest
    return pytest.approx(v, abs=tol)


def test_stratified_reduces_to_2d_multipath():
    """On a stratified waveguide the 3-D solver finds exactly the 2-D
    solver's arrival set: same count, same travel times, all in-plane."""
    n2 = CustomMedium(lambda x, y: 1.5 - 0.5 * y * y + 0.0 * x)
    med3 = Stratified3D(n2)
    rng = 30.0
    e2 = find_eigenrays("op6", n2, source=(0, 0), receivers=[(rng, 0.0)],
                        delta_s=0.02, max_size=2200,
                        box=(-1, rng + 3, -1.5, 1.5), fan=(-0.6, 0.6, 129))
    e3 = find_eigenrays3("op6", med3, source=(0, 0, 0),
                         receivers=[(rng, 0.0, 0.0)], delta_s=0.02,
                         max_size=2200, box=(-1, rng + 3, -1.5, 1.5, -2, 2),
                         center_dir=(1.0, 0.0, 0.0),
                         fan=(-0.65, 0.65, 25, -0.65, 0.65, 25))
    assert len(e2.theta0) >= 3
    assert len(e3.traveltime) == len(e2.theta0)
    assert bool(np.all(e3.converged))
    np.testing.assert_allclose(np.sort(e3.traveltime),
                               np.sort(e2.traveltime), rtol=1e-8)
    # arrivals stay in the source-receiver plane (z == 0)
    assert np.abs(e3.dir0[:, 2]).max() < 1e-9


def test_eddy_out_of_plane_arrival():
    """A receiver reached only by bending around/through an eddy: the
    arrival's launch direction leaves the vertical source-receiver plane."""
    def n_fn(x, y, z):
        bump = jnp.exp(-((x - 5.0) ** 2 + (z - 1.0) ** 2) / 4.0)
        return (1.3 - 0.02 * jnp.tanh(y)) * (1.0 - 5e-3 * bump)

    med = Custom3D(n_fn)
    recv = np.array([12.0, 0.5, 0.8])
    eig = find_eigenrays3("op6", med, source=(0.0, 0.0, 0.0),
                          receivers=[recv], delta_s=0.02, max_size=900,
                          box=(-1, 15, -6, 6, -6, 6),
                          fan=(-0.3, 0.3, 15, -0.3, 0.3, 15))
    assert len(eig.traveltime) >= 1
    assert bool(np.all(eig.converged))
    assert np.all(eig.miss < 1e-7)
    # the straight-line chart direction vs the solved launch: the eddy
    # (plus the vertical gradient) forces a genuinely 3-D correction
    straight = recv / np.linalg.norm(recv)
    assert np.abs(eig.dir0[:, 2] - straight[2]).max() > 1e-4


def test_no_arrivals_is_empty():
    eig = find_eigenrays3("op1", _homog3(), source=(0, 0, 0),
                          receivers=[(-5.0, 0.0, 0.0)], delta_s=0.1,
                          max_size=50, box=(-6, 6, -6, 6, -6, 6),
                          fan=(-0.2, 0.2, 7, -0.2, 0.2, 7))
    assert len(eig.traveltime) == 0
    assert np.isinf(incoherent_tl(eig, n_receivers=1)).all()
