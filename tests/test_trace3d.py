"""3-D tracing tier: vector op matrix, media adapters, physics oracles.

The reference has no 3-D capability at all (its state is one angle,
RT_bench.py:798-826); every assertion here is against closed-form 3-D
physics:

* homogeneous media — straight lines, exact;
* Maxwell fisheye (spherically symmetric) — each ray stays in its launch
  plane and closes after one turn, identically for any plane orientation;
* Bouguer's theorem — n |r x u| constant in spherically symmetric media,
  drift is pure O(ds^2) integrator error;
* stratified media — horizontal azimuth conserved to roundoff, slowness
  magnitude at the 2-D oracle's grade, and full reduction to the 2-D
  parity engine for in-plane launches.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.engine.trace3d import (METHODS3, TRACE3_COLS,
                                           bouguer_invariant, trace3d)
from raytracing_tpu.media.fields3d import (Analytic3D, Custom3D,
                                           Stratified3D, analytic_medium3)

F64 = np.float64


def _homog3():
    return Custom3D(lambda x, y, z: jnp.ones_like(x))


@pytest.mark.parametrize("method", sorted(METHODS3))
def test_homogeneous_straight_lines_exact(method):
    d = np.array([[1.0, 2.0, 2.0], [0.0, 0.0, 1.0], [-3.0, 0.0, 4.0]])
    res = trace3d(method, _homog3(), pos0=np.zeros((3, 3)), dir0=d,
                  delta_s=0.1, steps=50, dtype=F64)
    want = d / np.linalg.norm(d, axis=1, keepdims=True) * 5.0
    np.testing.assert_allclose(np.asarray(res.final.pos), want, atol=1e-13)
    # optical path == arc length in n == 1
    np.testing.assert_allclose(np.asarray(res.final.traveltime), 5.0,
                               atol=1e-12)


def test_fisheye3_closure_and_planarity():
    """Spherical symmetry: every launch plane carries the same circle."""
    med = analytic_medium3("fisheye")
    tilts = np.array([0.0, 0.4, 0.7, 1.2])
    dirs = np.stack([np.zeros_like(tilts), np.cos(tilts), np.sin(tilts)], -1)
    pos0 = np.tile([[1.0, 0.0, 0.0]], (len(tilts), 1))
    div = 600
    res = trace3d("op6", med, pos0=pos0, dir0=dirs, delta_s=2 * np.pi / div,
                  steps=div, dtype=F64)
    closure = np.linalg.norm(np.asarray(res.final.pos) - pos0, axis=1)
    assert closure.max() < 1e-7
    # identical to float roundoff across plane orientations
    np.testing.assert_allclose(closure, closure[0], atol=1e-12)
    # planarity: the trajectory never leaves the launch plane r0 x u0
    h = np.asarray(res.history)
    r = h[..., 0:3]
    normal = np.cross(pos0, dirs)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    off_plane = np.abs(np.einsum("srk,rk->sr", r, normal))
    assert off_plane.max() < 1e-10
    # and matches the 2-D engine's closure for the in-plane ray
    scen = rt.scenario("fisheye")
    r2 = rt.trace("op6", scen, rt.analytic_medium("fisheye"),
                  delta_s=2 * np.pi / div, divisor=div + 1, n_turns=1,
                  dtype=F64, pos0=np.array([[1.0, 0.0]]),
                  theta0=np.array([np.pi / 2]), mode="metrics")
    c2 = np.linalg.norm(np.asarray(r2.final.pos)[0] - [1, 0])
    # the rotation-vector Heun IS the 2-D angle update for planar
    # dynamics: same closure to ~1e-12
    assert abs(closure[0] - c2) < 1e-11


def test_bouguer_invariant_second_order():
    """n |r x u| drifts as pure O(ds^2) integrator error."""
    med = analytic_medium3("fisheye")
    pos0 = np.array([[1.0, 0.0, 0.0]])
    dir0 = np.array([[0.0, 0.8, 0.6]])
    drifts = []
    for div in (300, 600):
        res = trace3d("op6", med, pos0=pos0, dir0=dir0,
                      delta_s=2 * np.pi / div, steps=div, dtype=F64)
        B = bouguer_invariant(res)
        drifts.append(np.abs(B - B[0]).max())
    assert drifts[0] < 1e-7
    assert drifts[1] < drifts[0] / 3.0  # halving the step shrinks drift


def test_stratified_conservation_and_azimuth():
    s3 = Stratified3D(rt.analytic_medium("vert_heterogeneous"))
    dir0 = np.array([[0.6, -0.5, 0.3], [0.2, -0.8, 0.55]])
    cvs = {"op1": [], "op8": []}
    for method in cvs:
        for ds, steps in ((0.01, 400), (0.005, 800)):
            res = trace3d(method, s3, pos0=np.zeros((2, 3)), dir0=dir0,
                          delta_s=ds, steps=steps, dtype=F64, stats=True,
                          mode="metrics")
            cv = res.horizontal_slowness_cv_pct()
            assert np.nanmax(cv) < 0.05  # the reference's 2-D bar, in 3-D
            cvs[method].append(np.nanmax(cv))
            # horizontal azimuth: conserved to roundoff (u_x, u_z scale by
            # one common factor per step in any stratified medium)
            u = np.asarray(res.final.unitv)
            az0 = np.arctan2(dir0[:, 2], dir0[:, 0])
            az1 = np.arctan2(u[:, 2], u[:, 0])
            assert np.abs(az1 - az0).max() < 1e-12
    # op1's 1st-order stepper bounds its global conservation order; op8's
    # 2nd-order stepper restores the clean O(ds^2) drift (400x tighter)
    assert cvs["op1"][1] < cvs["op1"][0] * 0.7
    assert cvs["op8"][1] < cvs["op8"][0] / 3.0
    assert cvs["op8"][0] < cvs["op1"][0] / 100.0


def test_reduces_to_2d_parity_engine():
    """In-plane 3-D launches reproduce the 2-D engine: second-order
    trajectory agreement and IDENTICAL boundary-exit steps."""
    scen = rt.scenario("vert")
    prof = rt.analytic_medium("vert_heterogeneous")
    s3 = Stratified3D(prof)
    th = np.array([0.3, 0.7, 1.1])
    pos2 = np.tile(scen.pos0[:1], (3, 1)).astype(F64)
    ds, steps = 0.01, 400
    r2 = rt.trace("op6", scen, prof, delta_s=ds, dtype=F64, pos0=pos2,
                  theta0=th, mode="metrics", max_size=steps + 1)
    p3 = np.concatenate([pos2, np.zeros((3, 1))], -1)
    d3 = np.stack([np.cos(th), np.sin(th), np.zeros(3)], -1)
    r3 = trace3d("op6", s3, pos0=p3, dir0=d3, delta_s=ds, steps=steps,
                 dtype=F64, mode="metrics",
                 box=(*scen.box, -1.0, 1.0))
    np.testing.assert_array_equal(np.asarray(r3.exit_step),
                                  np.asarray(r2.exit_step))
    diff = np.abs(np.asarray(r3.final.pos)[:, :2]
                  - np.asarray(r2.final.pos)).max()
    assert diff < 5e-7
    # z stays identically zero for in-plane launches
    assert np.abs(np.asarray(r3.final.pos)[:, 2]).max() < 1e-14


def test_measured_profile_lifts_to_3d():
    """A lab's 1-D sound-speed samples trace in 3-D via Stratified3D."""
    y = np.linspace(-1.5, 1.5, 61)
    med = rt.c1_stratified_from_samples(1.2 - 0.25 * y * y, y,
                                        dtype=np.float64)
    s3 = Stratified3D(med)
    dir0 = np.array([[0.7, 0.1, 0.7], [0.9, -0.2, 0.4]])
    res = trace3d("op6", s3, pos0=np.zeros((2, 3)), dir0=dir0,
                  delta_s=0.01, steps=600, dtype=F64, stats=True)
    cv = res.horizontal_slowness_cv_pct()
    assert np.nanmax(cv) < 0.05
    h = np.asarray(res.history)
    assert h.shape == (601, 2, len(TRACE3_COLS))
    # rays stay trapped inside the sampled waveguide
    assert np.abs(h[..., 1]).max() < 1.5


def test_history_metrics_agree_and_box_exit():
    med = _homog3()
    d = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    kw = dict(pos0=np.zeros((2, 3)), dir0=d, delta_s=0.1, steps=30,
              dtype=F64, box=(-1, 2.05, -1, 9, -1, 1))
    a = trace3d("op8", med, mode="metrics", **kw)
    b = trace3d("op8", med, mode="history", **kw)
    for fld in ("pos", "unitv", "traveltime", "exit_step"):
        np.testing.assert_array_equal(np.asarray(getattr(a.final, fld)),
                                      np.asarray(getattr(b.final, fld)))
    # ray 0 exits at x > 2.05 (21st step), ray 1 runs the full budget
    assert int(a.exit_step[0]) == 21 and int(a.exit_step[1]) == 30
    assert not bool(np.asarray(a.final.active)[0])
    np.testing.assert_allclose(np.asarray(a.final.pos)[0, 0], 2.1,
                               atol=1e-12)


def test_named_errors():
    med = _homog3()
    ok = dict(pos0=np.zeros((1, 3)), dir0=np.ones((1, 3)), delta_s=0.1,
              steps=5)
    with pytest.raises(ValueError, match="planar"):
        trace3d("op5", med, **ok)
    with pytest.raises(ValueError, match="rays, 3"):
        trace3d("op1", med, pos0=np.zeros((1, 2)), dir0=np.ones((1, 2)),
                delta_s=0.1, steps=5)
    with pytest.raises(ValueError, match="mode"):
        trace3d("op1", med, mode="full", **ok)
    with pytest.raises(ValueError, match="box"):
        trace3d("op1", med, box=(0, 1, 0, 1), **ok)
    with pytest.raises(ValueError, match="3-D field"):
        analytic_medium3("warp")
    # aliases resolve
    res = trace3d("HySA", med, **ok)
    assert np.all(np.isfinite(np.asarray(res.final.pos)))


def test_stratified3d_rejects_x_dependent_media():
    """Wrapping a genuinely 2-D medium would silently zero its x-gradient;
    the constructor probes x-independence instead."""
    from raytracing_tpu.media.spline import build_grid_medium

    g2 = build_grid_medium("fisheye", rt.scenario("fisheye").box,
                           dtype=np.float64)
    with pytest.raises(ValueError, match="x-independent"):
        Stratified3D(g2)
    with pytest.raises(ValueError, match="x-independent"):
        from raytracing_tpu.media.medium import CustomMedium
        Stratified3D(CustomMedium(lambda x, y: 1.0 + 0.1 * x + 0.0 * y))


def test_delta_s_convergence_search_3d():
    """Richardson step calibration for 3-D media (no oracle table exists)."""
    from raytracing_tpu.parallel.sweep import delta_s_search_convergence3

    med = analytic_medium3("fisheye")
    r = 8
    tilt = np.linspace(0, 0.5, r)
    pos0 = np.tile([[1.0, 0, 0]], (r, 1))
    dir0 = np.stack([np.zeros(r), np.cos(tilt), np.sin(tilt)], -1)
    sr = delta_s_search_convergence3("op6", med, pos0=pos0, dir0=dir0,
                                     arc_length=2 * np.pi, tol=1e-4)
    assert sr.index is not None
    assert sr.metrics["halving_err"][sr.index] < 1e-4
    # tighter tolerance selects a finer step (f64: a 1e-6 displacement
    # bound sits below f32's accumulation floor over thousands of steps)
    sr2 = delta_s_search_convergence3("op6", med, pos0=pos0, dir0=dir0,
                                      arc_length=2 * np.pi, tol=1e-6,
                                      dtype=np.float64)
    assert sr2.delta_s_selected < sr.delta_s_selected
    with pytest.raises(ValueError, match="descend"):
        delta_s_search_convergence3("op6", med, pos0=pos0, dir0=dir0,
                                    arc_length=1.0,
                                    candidates=np.array([0.01, 0.02]))
