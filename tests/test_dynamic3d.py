"""3-D dynamic tier: 2x2 paraxial Jacobian, foci, spherical amplitudes.

Oracles: homogeneous det Q == s^2 exactly (TL = 20 log10 s, spherical
spreading); the Maxwell fisheye's perfect point image (det Q touches zero
quadratically AT the antipode and again at the source); an astigmatic
waveguide whose vertical caustics flip the sign of det Q (KMAH); and
finite-difference cross-checks of |det Q| on a fully 3-D medium.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.engine.dynamic3d import (DYN3_COLS, _transverse_frame,
                                             trace_dynamic3)
from raytracing_tpu.engine.trace3d import trace3d
from raytracing_tpu.media.fields3d import (Custom3D, Stratified3D,
                                           analytic_medium3)


def _homog3():
    return Custom3D(lambda x, y, z: jnp.ones_like(x))


def test_homogeneous_spherical_spreading_exact():
    d = np.array([[1.0, 2.0, 2.0], [0.0, 0.0, 1.0], [3.0, -4.0, 0.0]])
    res = trace_dynamic3("op6", _homog3(), pos0=np.zeros((3, 3)), dir0=d,
                         delta_s=0.1, steps=50)
    np.testing.assert_allclose(np.asarray(res.detq), 25.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.transmission_loss_db()),
                               20.0 * np.log10(5.0), atol=1e-9)
    assert np.all(np.asarray(res.kmah) == 0)
    # Q itself is ~ s * I in the transported frame (no astigmatism)
    np.testing.assert_allclose(
        np.asarray(res.Q), np.broadcast_to(5.0 * np.eye(2), (3, 2, 2)),
        atol=1e-9)


def test_fisheye_point_focus_localized():
    """Perfect imaging: det Q collapses AT the antipode (quadratic touch,
    no sign change — the documented degenerate-focus case) and the ray
    refocuses at the source after the full turn."""
    med = analytic_medium3("fisheye")
    div = 600
    res = trace_dynamic3("op6", med, pos0=np.tile([[1.0, 0, 0]], (2, 1)),
                         dir0=np.array([[0, 1.0, 0],
                                        [0, np.cos(0.5), np.sin(0.5)]]),
                         delta_s=2 * np.pi / div, steps=div)
    step = np.asarray(res.min_absdet_step)
    # min over the whole run is the source refocus at the END; the
    # antipodal image shows as the interior collapse in the history
    h = np.asarray(res.history)[..., DYN3_COLS.index("detq")]
    interior = np.abs(h[div // 4: 3 * div // 4])
    antipode = np.argmin(interior, axis=0) + div // 4
    assert np.all(np.abs(antipode - div // 2) <= 1)
    assert interior.min() < 1e-8          # collapse by ~12 orders
    assert np.abs(h[1:]).max() > 1.0
    assert np.all(step == div)            # global min: back at the source
    assert np.asarray(res.min_absdet).max() < 1e-9
    # quadratic touch: sign never flips, so det-KMAH stays 0 here
    assert np.all(np.asarray(res.kmah) == 0)


def test_astigmatic_caustic_flips_det_sign():
    """A stratified waveguide focuses vertically only: det Q = q_vert *
    q_horiz changes sign at each vertical caustic — KMAH counts them."""
    from raytracing_tpu.media.medium import CustomMedium
    med = Stratified3D(CustomMedium(lambda x, y: 1.5 - 0.5 * y * y + 0.0 * x))
    tilt = 0.3
    res = trace_dynamic3("op6", med, pos0=np.zeros((1, 3)),
                         dir0=np.array([[np.cos(tilt), np.sin(tilt), 0.0]]),
                         delta_s=0.02, steps=1500)
    h = np.asarray(res.history)[..., DYN3_COLS.index("detq")][:, 0]
    sign_changes = int(np.sum(np.sign(h[1:-1]) * np.sign(h[2:]) < 0))
    assert sign_changes >= 2
    assert int(res.kmah[0]) == sign_changes


def test_matches_finite_differences_on_3d_medium():
    """|det Q| equals the central-difference Jacobian determinant on a
    genuinely 3-D medium (a Gaussian lens bump) — the jvp tangents are
    the exact derivative of the discrete integrator."""
    def n_fn(x, y, z):
        return 1.2 - 0.3 * jnp.exp(-((x - 1.5) ** 2 + y ** 2 + z ** 2))

    med = Custom3D(n_fn)
    pos0 = np.zeros((2, 3))
    dir0 = np.array([[1.0, 0.15, 0.1], [1.0, -0.1, 0.2]])
    ds, steps = 0.01, 300
    res = trace_dynamic3("op6", med, pos0=pos0, dir0=dir0, delta_s=ds,
                         steps=steps, mode="metrics")

    u0 = dir0 / np.linalg.norm(dir0, axis=1, keepdims=True)
    e1, e2 = (np.asarray(v) for v in _transverse_frame(jnp.asarray(u0)))
    eps = 1e-6

    def kin(da, db):
        d = u0 + da * e1 + db * e2
        return np.asarray(trace3d("op6", med, pos0=pos0, dir0=d,
                                  delta_s=ds, steps=steps, dtype=np.float64,
                                  mode="metrics").final.pos)

    dpa = (kin(eps, 0) - kin(-eps, 0)) / (2 * eps)
    dpb = (kin(0, eps) - kin(0, -eps)) / (2 * eps)
    # project onto any orthonormal transverse basis at the final tangent:
    # |det| is basis-invariant
    uf = np.asarray(res.unitv)
    f1, f2 = (np.asarray(v) for v in _transverse_frame(jnp.asarray(uf)))
    Qfd = np.stack([
        np.stack([np.sum(dpa * f1, 1), np.sum(dpb * f1, 1)], -1),
        np.stack([np.sum(dpa * f2, 1), np.sum(dpb * f2, 1)], -1)], -2)
    det_fd = np.linalg.det(Qfd)
    np.testing.assert_allclose(np.abs(np.asarray(res.detq)),
                               np.abs(det_fd), rtol=1e-4)


def test_metrics_matches_history_and_errors():
    med = _homog3()
    kw = dict(pos0=np.zeros((2, 3)),
              dir0=np.array([[1.0, 0, 0], [0, 1.0, 0]]),
              delta_s=0.1, steps=20)
    a = trace_dynamic3("op8", med, mode="metrics", **kw)
    b = trace_dynamic3("op8", med, mode="history", **kw)
    assert a.history is None
    np.testing.assert_array_equal(np.asarray(a.detq), np.asarray(b.detq))
    np.testing.assert_array_equal(
        np.asarray(b.history)[-1, :, DYN3_COLS.index("detq")],
        np.asarray(b.detq))
    with pytest.raises(ValueError, match="mode"):
        trace_dynamic3("op1", med, mode="full", **kw)
    with pytest.raises(ValueError, match="planar"):
        trace_dynamic3("op5", med, **kw)


def test_crossing_records_match_host_scan():
    """On-device crossing recorders (cross_fan / cross_pick) reproduce the
    host-side full-history machinery BIT-exactly: same linear
    interpolation between the same bracketing steps (to XLA fusion
    reassociation, ~1 ulp), same ordinal bookkeeping, same last-crossing
    fallback (engine/eigenray.py _crossing_vals / _pick_crossings) — the
    shape that removes the full-history readback from the 3-D eigenray
    solver."""
    from raytracing_tpu.engine import eigenray as eig
    from raytracing_tpu.engine.dynamic3d import (CROSS3_COLS,
                                                 DYN3_FULL_COLS,
                                                 trace_crossings_fan3,
                                                 trace_crossings_pick3)

    med = Custom3D(lambda x, y, z: 1.5 - 0.5 * y * y + 0.0 * x)
    r = 24
    th = np.linspace(-0.4, 0.4, r)
    dirs = np.stack([np.cos(th), np.sin(th), np.full(r, 0.05)], -1)
    pos0 = np.zeros((r, 3))
    kw = dict(pos0=pos0, dir0=dirs, delta_s=0.02, steps=1200,
              box=(-1, 26, -1.5, 1.5, -2, 2))

    res = trace_dynamic3("op6", med, mode="history", full_history=True,
                         **kw)
    hist, last = np.asarray(res.history), np.asarray(res.exit_step)

    fan = trace_crossings_fan3("op6", med, ranges=np.array([10.0, 20.0]),
                               max_ord=8, **kw)
    yz_host = eig._crossing_vals(hist, last, 10.0, (1, 2), 0)
    d = np.asarray(fan.depths)[:, 0, :yz_host.shape[1], :]
    mask = np.isfinite(yz_host)
    np.testing.assert_array_equal(np.isfinite(yz_host), np.isfinite(d))
    np.testing.assert_allclose(np.where(mask, yz_host, 0.0),
                               np.where(mask, d, 0.0),
                               rtol=1e-12, atol=1e-14)

    xr = np.full(r, 10.0)
    ordk = np.zeros(r, np.int32)
    pick = trace_crossings_pick3("op6", med, xr=xr, ordk=ordk, **kw)
    st, found = np.asarray(pick.state), np.asarray(pick.found)
    hs, hf = eig._pick_crossings(hist, last, xr, ordk, 0,
                                 DYN3_FULL_COLS.index("kmah"))
    np.testing.assert_array_equal(found, hf)
    colmap = {"y": 1, "z": 2, "traveltime": 3, "n": 4, "detq": 5,
              "kmah": 6, "ux": 7, "uy": 8, "uz": 9, "dpax": 10,
              "dpay": 11, "dpaz": 12, "dpbx": 13, "dpby": 14, "dpbz": 15}
    for ci, name in enumerate(CROSS3_COLS):
        np.testing.assert_allclose(st[found, ci],
                                   hs[found, colmap[name]],
                                   rtol=1e-12, atol=1e-14, err_msg=name)
