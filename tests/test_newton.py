"""Newton momentum solver (op10n/op11n): precision and agreement tests."""
import dataclasses

import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu import config
from raytracing_tpu.engine import oracles


def test_newton_agrees_with_golden_f64():
    """At float64 both solvers find the same cost minimum."""
    scen = dataclasses.replace(rt.scenario("aniso"), s_max=2.0)
    med = rt.analytic_medium("vert_heterogeneous")
    ds = 0.02
    g = rt.trace("op11", scen, med, delta_s=ds, mode="metrics", dtype=np.float64)
    n = rt.trace("op11n", scen, med, delta_s=ds, mode="metrics", dtype=np.float64)
    np.testing.assert_allclose(np.asarray(n.final.pos)[1:-1],
                               np.asarray(g.final.pos)[1:-1], atol=1e-6)


def test_newton_beats_golden_at_f32():
    """The point of the extension: at float32, Newton's momentum drift is
    orders of magnitude below golden's sqrt(eps) noise floor."""
    scen = dataclasses.replace(rt.scenario("aniso"), s_max=4.0)
    med = rt.analytic_medium("vert_heterogeneous")
    ds = 0.02

    def cv(op):
        res = rt.trace(op, scen, med, delta_s=ds, mode="metrics",
                       dtype=np.float32)
        c = oracles.momentum_cv_pct_from_stats(res)
        return float(oracles.scenario_average_cv_pct(c))

    cv_golden = cv("op11")
    cv_newton = cv("op11n")
    assert cv_newton < cv_golden / 20, (cv_newton, cv_golden)
    # and newton at f32 already meets the reference's f64 acceptance bar
    assert cv_newton < config.MAX_MOMENTUM_CV_PCT, cv_newton


def test_newton_kernel_matches_engine():
    from raytracing_tpu.kernels.golden import golden_trace_final
    scen = dataclasses.replace(rt.scenario("aniso"), s_max=1.5)
    med = rt.analytic_medium("vert_heterogeneous")
    ds = np.float32(0.02)
    steps = scen.max_size(float(ds)) - 1
    r0 = scen.ray_count
    pad = (-r0) % 128
    pos0 = np.concatenate([scen.pos0, np.tile(scen.pos0[-1:], (pad, 1))]).astype(np.float32)
    theta0 = np.concatenate([scen.theta0, np.tile(scen.theta0[-1:], pad)]).astype(np.float32)
    pos, ang, tt, dsim, act, *_ = golden_trace_final(
        pos0, theta0, ds, np.float32(scen.gamma), field="vert_heterogeneous",
        op="op11n", steps=steps, box=tuple(scen.box), block_rays=128,
        interpret=True)
    res = rt.trace("op11n", scen, med, delta_s=float(ds), mode="metrics",
                   dtype=np.float32, pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(pos)[1:r0 - 1],
                               np.asarray(res.final.pos)[1:r0 - 1], atol=1e-5)


def test_newton_aniso_cv_calibrated_f64():
    """op11n passes the reference's anisotropic acceptance at the calibrated
    step, like op11."""
    from raytracing_tpu.calibrated import calibrated
    scen = rt.scenario("aniso")
    med = rt.analytic_medium("vert_heterogeneous")
    ds, _ = calibrated("op11", "aniso")
    res = rt.trace("op11n", scen, med, delta_s=ds, mode="metrics",
                   dtype=np.float64)
    c = oracles.momentum_cv_pct_from_stats(res)
    assert float(oracles.scenario_average_cv_pct(c)) < config.MAX_MOMENTUM_CV_PCT
