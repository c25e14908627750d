"""GridMedium parity with scipy RectBivariateSpline (the reference's media)."""
import numpy as np
import pytest
from scipy.interpolate import RectBivariateSpline

from raytracing_tpu import config
from raytracing_tpu.media import grid as gridmod
from raytracing_tpu.media.medium import analytic_medium
from raytracing_tpu.media.spline import build_grid_medium

BOX = {"interface": (-2.0, 20.0, -2.0, 4.0),
       "fisheye": (-1.5, 1.5, -1.5, 1.5),
       "vert_heterogeneous": (-2.0, 5.0, -2.5, 1.0)}


def test_gen_grid_reference_truncation():
    # genZ's exact int() point-count truncation (RT_bench.py:426-427).
    box = BOX["fisheye"]
    x, y, Z = gridmod.gen_grid("fisheye", box)
    span = box[1] - box[0] + 6.0
    assert len(x) == int(span / config.DELTA + 1)
    assert np.isclose(x[0], -4.5) and np.isclose(x[-1], 4.5)
    assert Z.shape == (len(y), len(x))


@pytest.mark.parametrize("field", ["fisheye", "vert_heterogeneous"])
def test_grid_medium_matches_scipy(field):
    box = BOX[field]
    med = build_grid_medium(field, box, dtype=np.float64)

    x, y, Z = gridmod.gen_grid(field, box)
    dndx, dndy = gridmod.gradient_grids(Z)
    z_lin = RectBivariateSpline(y, x, Z, kx=1, ky=1)
    sx = RectBivariateSpline(y, x, dndx, kx=3, ky=3)
    sy = RectBivariateSpline(y, x, dndy, kx=3, ky=3)

    rng = np.random.default_rng(3)
    qx = rng.uniform(box[0] - 1, box[1] + 1, 500)
    qy = rng.uniform(box[2] - 1, box[3] + 1, 500)

    n, (gx, gy) = med.n_and_grad(qx, qy)
    want_n = z_lin(qy, qx, grid=False)
    want_gx = sx(qy, qx, grid=False)
    want_gy = sy(qy, qx, grid=False)
    np.testing.assert_allclose(np.asarray(n), want_n, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gx), want_gx, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gy), want_gy, rtol=1e-8, atol=1e-10)


def test_grid_medium_clamps_like_fitpack():
    """Out-of-range queries clamp to the grid boundary (fpbisp.f semantics)."""
    field = "fisheye"
    box = BOX[field]
    med = build_grid_medium(field, box, dtype=np.float64)
    x, y, Z = gridmod.gen_grid(field, box)
    n_out = float(med.n(np.array(100.0), np.array(0.0)))
    n_edge = float(med.n(np.array(x[-1]), np.array(0.0)))
    assert n_out == pytest.approx(n_edge, abs=1e-12)


def test_grid_medium_approximates_analytic():
    """On the fine reference grid the spline tracks the analytic field."""
    field = "vert_heterogeneous"
    med = build_grid_medium(field, BOX[field], dtype=np.float64)
    ana = analytic_medium(field)
    rng = np.random.default_rng(5)
    qx = rng.uniform(-1.0, 4.0, 200)
    qy = rng.uniform(-2.0, 0.5, 200)
    n_g, (gx_g, gy_g) = med.n_and_grad(qx, qy)
    n_a, (gx_a, gy_a) = ana.n_and_grad(qx, qy)
    np.testing.assert_allclose(np.asarray(n_g), np.asarray(n_a), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_g), np.asarray(gy_a),
                               rtol=1e-3, atol=1e-8)
