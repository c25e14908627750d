"""Fused golden-section kernels vs the jnp engine (interpret mode, CPU)."""
import dataclasses

import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.kernels.golden import GOLDEN_OPS, golden_trace_final

# heavyweight module: segmented chains / sharded meshes / full sweeps /
# interpret-mode kernel parity.  Deselect with -m 'not slow' (CLAUDE.md).
pytestmark = pytest.mark.slow


def _pad(scen, pad_to=128):
    r0 = scen.ray_count
    pad = (-r0) % pad_to
    pos0 = np.concatenate([scen.pos0, np.tile(scen.pos0[-1:], (pad, 1))]).astype(np.float32)
    theta0 = np.concatenate([scen.theta0, np.tile(scen.theta0[-1:], pad)]).astype(np.float32)
    return r0, pos0, theta0


@pytest.mark.parametrize("op", ["op10", "op11"])
def test_golden_kernel_aniso_matches_engine(op):
    scen = dataclasses.replace(rt.scenario("aniso"), s_max=1.5)
    med = rt.analytic_medium("vert_heterogeneous")
    ds = np.float32(0.02)
    steps = scen.max_size(float(ds)) - 1
    r0, pos0, theta0 = _pad(scen)

    # polish=0: the pure-bracket parity schedule the f32 scan engine follows
    pos, ang, tt, dsim, act, *_ = golden_trace_final(
        pos0, theta0, ds, np.float32(scen.gamma), field="vert_heterogeneous",
        op=op, steps=steps, box=tuple(scen.box), block_rays=128,
        interpret=True, polish=0)

    res = rt.trace(op, scen, med, delta_s=float(ds), mode="metrics",
                   dtype=np.float32, pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(pos)[:r0],
                               np.asarray(res.final.pos)[:r0], atol=5e-4)
    np.testing.assert_allclose(np.asarray(ang)[:r0],
                               np.asarray(res.final.angle)[:r0], atol=5e-3)
    np.testing.assert_allclose(np.asarray(tt)[:r0],
                               np.asarray(res.final.traveltime)[:r0], atol=5e-4)


@pytest.mark.parametrize("op", ["op5", "op9"])
def test_golden_kernel_iso_matches_engine(op):
    scen = dataclasses.replace(rt.scenario("vert"), s_max=1.5)
    med = rt.analytic_medium("vert_heterogeneous")
    ds = np.float32(0.02)
    steps = scen.max_size(float(ds)) - 1
    r0, pos0, theta0 = _pad(scen)
    pos, ang, tt, dsim, act, *_ = golden_trace_final(
        pos0, theta0, ds, np.float32(1.0), field="vert_heterogeneous",
        op=op, steps=steps, box=tuple(scen.box), block_rays=128,
        interpret=True, polish=0)
    res = rt.trace(op, scen, med, delta_s=float(ds), mode="metrics",
                   dtype=np.float32, pos0=pos0, theta0=theta0)
    # Endpoint rays (theta = 0, pi/2) sit on cost-function symmetries where
    # float32 golden noise walks them differently per implementation — the
    # reference's own CV metric excludes them too (RT_bench.py:1357).
    np.testing.assert_allclose(np.asarray(pos)[1:r0 - 1],
                               np.asarray(res.final.pos)[1:r0 - 1], atol=5e-4)


def test_golden_kernel_momentum_conservation():
    """The physics the method exists for: p_x conserved along each ray."""
    scen = dataclasses.replace(rt.scenario("aniso"), s_max=2.0)
    ds = np.float32(0.02)
    steps = scen.max_size(float(ds)) - 1
    r0, pos0, theta0 = _pad(scen)
    pos, ang, tt, dsim, act, *_ = golden_trace_final(
        pos0, theta0, ds, np.float32(scen.gamma), field="vert_heterogeneous",
        op="op11", steps=steps, box=tuple(scen.box), block_rays=128,
        interpret=True)
    # compare final p_x against the launch p_x for interior rays
    from tests_helpers import momenta_np
    m0 = momenta_np(theta0[:r0], pos0[:r0], scen.gamma)
    mf = momenta_np(np.asarray(ang)[:r0], np.asarray(pos)[:r0], scen.gamma)
    rel = np.abs(mf[1:-1, 0] - m0[1:-1, 0]) / np.abs(m0[1:-1, 0])
    # The default schedule (closed-form seed + Newton polish,
    # GOLD_SEED_ITERS) holds the angle to f32 roundoff per step; end-to-end
    # drift over 100 steps stays ~1e-4 — the pure f32 bracket's ~1 % walk
    # is gone.
    assert np.median(rel) < 1e-3, rel


@pytest.mark.parametrize("scen_name,op,gamma", [
    ("vert", "op5", 1.0), ("aniso", "op11", 3.0)])
def test_golden_polish_cv_meets_reference_bar(scen_name, op, gamma):
    """The round-3 headline fix: the polished golden kernels conserve p_x to
    the reference's own acceptance bar (scenario-average interior-ray CV
    < 0.05 %, RT_bench.py:1310,1352-1360) in pure float32 — no relaxed
    threshold.  The pure f32 bracket measures ~0.6 % on the same slice."""
    import dataclasses
    from raytracing_tpu.calibrated import calibrated
    scen = rt.scenario(scen_name)
    ds, _ = calibrated(op, scen_name)
    # ~1000 calibrated steps: enough walk to discriminate (parity-bracket
    # CV here is >10x the bar) while keeping interpret mode quick
    scen = dataclasses.replace(scen, s_max=1000 * float(ds))
    steps = scen.max_size(float(ds)) - 1
    r0, pos0, theta0 = _pad(scen)
    res = golden_trace_final(
        pos0, theta0, np.float32(ds), np.float32(gamma), field=scen.field,
        op=op, steps=steps, box=tuple(scen.box), block_rays=128,
        interpret=True, with_stats=True)
    cnt = np.asarray(res.mom_count)[:r0]
    mean = np.asarray(res.mom_mean)[:r0]
    m2 = np.asarray(res.mom_m2)[:r0]
    cv = 100.0 * np.sqrt(m2 / np.maximum(cnt, 1)) / np.abs(mean)
    avg_cv = np.mean(cv[1:-1])          # interior rays, reference metric
    assert avg_cv < 0.05, f"scenario-average CV {avg_cv}% >= 0.05%"


def test_golden_polish_matches_float64_mirror():
    """Polish is the same minimizer at a tighter tolerance: the polished f32
    kernel lands on the float64 engine's trajectory (which runs the golden
    bracket at the reference's sqrt(eps_f64) tolerance), while the pure-f32
    bracket wanders ~1e-2 over the same arc.  Endpoint rays excluded: the
    theta=pi/2 ray runs along the box edge and exits on f32 noise."""
    import dataclasses
    scen = dataclasses.replace(rt.scenario("aniso"), s_max=1.5)
    med = rt.analytic_medium("vert_heterogeneous")
    ds = np.float32(0.02)
    steps = scen.max_size(float(ds)) - 1
    r0, pos0, theta0 = _pad(scen)
    polished = golden_trace_final(
        pos0, theta0, ds, np.float32(scen.gamma), field="vert_heterogeneous",
        op="op11", steps=steps, box=tuple(scen.box), block_rays=128,
        interpret=True)
    res = rt.trace("op11", scen, med, delta_s=float(ds), mode="metrics",
                   dtype=np.float64, pos0=pos0.astype(np.float64),
                   theta0=theta0.astype(np.float64))
    np.testing.assert_allclose(np.asarray(polished.pos)[1:r0 - 1],
                               np.asarray(res.final.pos)[1:r0 - 1],
                               atol=1e-3)


def test_golden_kernel_rejects_unknown_op():
    pos0 = np.zeros((128, 2), np.float32)
    with pytest.raises(ValueError, match="golden kernel supports"):
        golden_trace_final(pos0, np.zeros(128, np.float32), 0.1, 1.0,
                           field="fisheye", op="op1", steps=2,
                           box=(-1, 1, -1, 1), block_rays=128, interpret=True)


def test_golden_step_limit_freezes():
    """Traced step_limit: rays freeze after `lim` applied steps."""
    scen = rt.scenario("fisheye")
    r = 128
    pos0 = np.tile(np.array([[1.0, 0.0]], np.float32), (r, 1))
    theta0 = np.full(r, np.pi / 2.0, np.float32)
    full = golden_trace_final(pos0, theta0, np.float32(0.1), np.float32(1.0),
                              field="fisheye", op="op5", steps=20,
                              box=tuple(scen.box), block_rays=128,
                              interpret=True)
    lim = golden_trace_final(pos0, theta0, np.float32(0.1), np.float32(1.0),
                             field="fisheye", op="op5", steps=40,
                             box=tuple(scen.box), block_rays=128,
                             interpret=True, step_limit=np.float32(20))
    np.testing.assert_allclose(np.asarray(lim.pos), np.asarray(full.pos),
                               atol=0)


def test_golden_strat_medium_matches_scan():
    """Golden kernel gathering the sampled stratified tables == scan engine
    on the same medium (aniso scenario, gamma=3)."""
    from raytracing_tpu.media.spline import build_stratified_medium
    scen = rt.scenario("aniso")
    med = build_stratified_medium("vert_heterogeneous", scen.box,
                                  dtype=np.float32)
    r = 128
    # stop short of theta = pi/2: that ray runs exactly along the x = -2 box
    # edge and f32 noise (~1e-7 in x) arbitrarily decides its "exit"
    theta0 = np.linspace(scen.theta0[0], np.pi / 2 - 0.01, r).astype(np.float32)
    pos0 = np.tile(scen.pos0[:1].astype(np.float32), (r, 1))
    ds, steps = 0.02, 150
    g = golden_trace_final(pos0, theta0, np.float32(ds),
                           np.float32(scen.gamma), field=scen.field,
                           op="op10", steps=steps, box=tuple(scen.box),
                           block_rays=128, interpret=True, medium=med,
                           with_stats=True, polish=0)
    res = rt.trace("op10", scen, med, delta_s=ds, mode="metrics",
                   dtype=np.float32, max_size=steps + 1,
                   pos0=pos0, theta0=theta0)
    # the kernel's rotation-composed golden probes differ from the scan's
    # cos/sin ones by ~f32 eps per step; 150 steps with bracket tol 3.4e-4
    # rad legitimately wander ~1e-3 in position
    np.testing.assert_allclose(np.asarray(g.pos), np.asarray(res.final.pos),
                               atol=2e-3)
    # Welford stats against the scan carry's tracker
    np.testing.assert_array_equal(np.asarray(g.mom_count),
                                  np.asarray(res.final.mom_count))
    np.testing.assert_allclose(np.asarray(g.mom_mean),
                               np.asarray(res.final.mom_mean), rtol=2e-3)


@pytest.mark.parametrize("op,gamma", [
    ("op5", 1.0), ("op9", 1.0), ("op10", 3.0), ("op11", 3.0)])
def test_closed_form_schedule_matches_bracket(op, gamma):
    """The production closed-form schedule (gold_iters=0, GOLD_SEED_ITERS)
    lands on the SAME minimizer the coarse-bracket+polish schedule does:
    full-arc endpoints agree to ~1e-5 and the momentum CV is equal or
    better.  (The iso seed is the exact nearest-point-on-circle minimizer;
    the aniso seed is the ellipse ray-intersection, polished to roundoff.)
    """
    scen = dataclasses.replace(rt.scenario("aniso"), s_max=2.0)
    ds = np.float32(0.02)
    steps = scen.max_size(float(ds)) - 1
    r0, pos0, theta0 = _pad(scen)
    kw = dict(field="vert_heterogeneous", op=op, steps=steps,
              box=tuple(scen.box), block_rays=128, interpret=True,
              with_stats=True)
    seed = golden_trace_final(pos0, theta0, ds, np.float32(gamma), **kw)
    brk = golden_trace_final(pos0, theta0, ds, np.float32(gamma),
                             gold_iters=12, polish=2, **kw)
    np.testing.assert_allclose(np.asarray(seed.pos)[1:r0 - 1],
                               np.asarray(brk.pos)[1:r0 - 1], atol=5e-5)

    def cv(g):
        c = np.sqrt(np.asarray(g.mom_m2)[1:r0 - 1]
                    / np.asarray(g.mom_count)[1:r0 - 1]) \
            / np.abs(np.asarray(g.mom_mean)[1:r0 - 1])
        return np.mean(c)

    assert cv(seed) <= cv(brk) * 1.05
