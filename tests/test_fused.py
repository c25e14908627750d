"""Generic fused Pallas kernels vs the jnp engine (interpret mode, CPU)."""
import dataclasses

import numpy as np
import pytest

import raytracing_tpu as rt
from raytracing_tpu.kernels.fused import FUSED_OPS, fused_trace_final


@pytest.mark.parametrize("op", FUSED_OPS)
def test_fused_fisheye_matches_engine(op):
    R = 256
    div = 101
    ds = np.float32(2 * np.pi / div)
    theta0 = np.full(R, np.pi / 2.0, np.float32)
    pos0 = np.stack([np.ones(R), np.zeros(R)], -1).astype(np.float32)
    scen = rt.scenario("fisheye")

    pos, tt, dsim, act = fused_trace_final(
        pos0, theta0, ds, field="fisheye", op=op, steps=div,
        box=tuple(scen.box), block_rays=256, interpret=True)

    med = rt.analytic_medium("fisheye")
    res = rt.trace(op, scen, med, delta_s=ds, max_size=div + 1,
                   mode="metrics", dtype=np.float32, pos0=pos0, theta0=theta0)
    # op7's 11a-18b+9c-2d combination of near-equal positions amplifies
    # float32 rounding; the float64 truth lies between kernel and engine.
    np.testing.assert_allclose(np.asarray(pos), np.asarray(res.final.pos),
                               atol=2e-4 if op == "op7" else 1e-5)
    np.testing.assert_allclose(np.asarray(tt), np.asarray(res.final.traveltime),
                               atol=5e-5)
    assert np.all(np.asarray(act))


@pytest.mark.parametrize("op", ["op6", "op8"])
def test_fused_vert_boundary_exit_matches_engine(op):
    """Rays leave the shrunken box at different steps; the fused kernel's
    freeze mask must reproduce the engine's masked early exit exactly."""
    scen = dataclasses.replace(rt.scenario("vert"),
                               box=(-2.0, -1.0, -2.5, -1.5), s_max=3.0)
    med = rt.analytic_medium("vert_heterogeneous")
    ds = np.float32(0.05)
    steps = scen.max_size(float(ds)) - 1
    r0 = scen.ray_count
    pad = (-r0) % 128
    pos0 = np.concatenate([scen.pos0, np.tile(scen.pos0[-1:], (pad, 1))]).astype(np.float32)
    theta0 = np.concatenate([scen.theta0, np.tile(scen.theta0[-1:], pad)]).astype(np.float32)

    pos, tt, dsim, act = fused_trace_final(
        pos0, theta0, ds, field="vert_heterogeneous", op=op, steps=steps,
        box=tuple(scen.box), block_rays=128, interpret=True)

    res = rt.trace(op, scen, med, delta_s=float(ds), mode="metrics",
                   dtype=np.float32, pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(pos)[:r0],
                               np.asarray(res.final.pos)[:r0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dsim)[:r0],
                               np.asarray(res.final.dist_sim)[:r0], atol=1e-4)
    # every ray exits the tiny box in both implementations
    assert not np.any(np.asarray(act)[:r0])
    assert np.all(np.asarray(res.exit_step)[:r0] < steps)


def test_fused_interface_matches_engine():
    scen = dataclasses.replace(rt.scenario("interface"), s_max=5.0)
    med = rt.analytic_medium("interface")
    ds = np.float32(0.02)
    steps = scen.max_size(float(ds)) - 1
    r0 = scen.ray_count
    pad = (-r0) % 128
    pos0 = np.concatenate([scen.pos0, np.tile(scen.pos0[-1:], (pad, 1))]).astype(np.float32)
    theta0 = np.concatenate([scen.theta0, np.tile(scen.theta0[-1:], pad)]).astype(np.float32)
    pos, tt, dsim, act = fused_trace_final(
        pos0, theta0, ds, field="interface", op="op6", steps=steps,
        box=tuple(scen.box), block_rays=128, interpret=True)
    res = rt.trace("op6", scen, med, delta_s=float(ds), mode="metrics",
                   dtype=np.float32, pos0=pos0, theta0=theta0)
    np.testing.assert_allclose(np.asarray(pos)[:r0],
                               np.asarray(res.final.pos)[:r0], atol=2e-4)
    np.testing.assert_allclose(np.asarray(tt)[:r0],
                               np.asarray(res.final.traveltime)[:r0], atol=2e-4)


def test_fused_rejects_unsupported():
    pos0 = np.zeros((128, 2), np.float32)
    theta0 = np.zeros(128, np.float32)
    with pytest.raises(ValueError, match="supports ops"):
        fused_trace_final(pos0, theta0, 0.1, field="fisheye", op="op5",
                          steps=3, box=(-1, 1, -1, 1), block_rays=128,
                          interpret=True)
    with pytest.raises(ValueError, match="supports fields"):
        fused_trace_final(pos0, theta0, 0.1, field="warp", op="op1",
                          steps=3, box=(-1, 1, -1, 1), block_rays=128,
                          interpret=True)


def test_step_limit_freeze_does_not_phantom_exit():
    """A ray frozen by the traced step_limit must stay active even when its
    phantom (masked) next step would cross the box boundary."""
    import jax.numpy as jnp
    from raytracing_tpu.kernels.fused import fused_trace_final

    r = 128
    pos0 = np.tile(np.array([[17.0, 1.0]], np.float32), (r, 1))
    theta0 = np.zeros(r, np.float32)  # heading +x toward the x=20 wall
    ds = 2.0
    box = (-2.0, 20.0, -2.0, 4.0)
    pos, _tt, _dsim, act = fused_trace_final(
        pos0, theta0, jnp.float32(ds), field="interface", op="op1",
        steps=4, box=box, block_rays=128, interpret=True,
        step_limit=jnp.float32(1.0))
    # frozen at x=19 (inside); phantom step to x=21 must not deactivate
    np.testing.assert_allclose(np.asarray(pos)[:, 0], 19.0, atol=1e-3)
    assert bool(np.all(np.asarray(act)))
