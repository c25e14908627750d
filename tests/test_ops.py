"""Single-step op kernels vs the scalar numpy mirror (float64, ~1e-9)."""
import jax.numpy as jnp
import numpy as np
import pytest

import ref_numpy
from raytracing_tpu.media.medium import analytic_medium
from raytracing_tpu.ops.registry import OP_NAMES, RayPoint, build_op

_FIELD_FOR_OP = {"op10": "vert_heterogeneous", "op11": "vert_heterogeneous"}


def _random_point(rng, field, gamma, med_np):
    # A physically consistent state: n/grad evaluated at pos by the medium.
    if field == "fisheye":
        pos = rng.uniform(-1.0, 1.0, 2)
    else:
        pos = np.array([rng.uniform(-1.5, 3.0), rng.uniform(-1.8, 0.5)])
    angle = rng.uniform(-np.pi / 2, np.pi)
    n, grad = med_np(pos[0], pos[1])
    unitv = np.array([np.cos(angle), np.sin(angle)])
    coef = ref_numpy.anisotropy(angle, gamma)
    window = [pos - 3 * 0.01 * unitv, pos - 2 * 0.01 * unitv,
              pos - 0.01 * unitv, pos.copy()]
    return pos, angle, unitv, n, grad, coef, window


@pytest.mark.parametrize("op_name", OP_NAMES)
def test_op_step_matches_mirror(op_name):
    field = _FIELD_FOR_OP.get(op_name, "fisheye")
    gamma = 3.0 if op_name in ("op10", "op11") else 1.0
    med_np = ref_numpy.make_medium(field)
    med_jx = analytic_medium(field)
    op = build_op(op_name, np.float64)
    step = 0.02
    rng = np.random.default_rng(hash(op_name) % 2**31)

    for trial in range(12):
        pos, angle, unitv, n, grad, coef, window = _random_point(
            rng, field, gamma, med_np)
        step_idx = 5  # steady-state (past op7's priming ramp)

        f_pos, f_angle, f_n, f_grad = ref_numpy.step_op(
            op_name, angle, n, grad, unitv, pos, coef, list(window), step_idx,
            med_np, gamma, step)

        pt = RayPoint(pos=jnp.asarray(pos), angle=jnp.float64(angle),
                      unitv=jnp.asarray(unitv), n=jnp.float64(n),
                      grad=jnp.asarray(grad), coef=jnp.float64(coef),
                      window=jnp.asarray(np.stack(window)))
        res = op(pt, jnp.int32(step_idx), med_jx, jnp.float64(gamma),
                 jnp.float64(step))

        # Curvature ops: the engine's chord uses cancellation-free angle-sum
        # identities, the mirror the reference's direct sine differences;
        # they agree to ~eps/curv, which the looser atol absorbs.
        pos_atol = 1e-8 if op_name in ("op3", "op4", "op5", "op10") else 1e-12
        np.testing.assert_allclose(res.pos, f_pos, rtol=1e-12, atol=pos_atol,
                                   err_msg=f"{op_name} pos trial {trial}")
        curv_op = op_name in ("op3", "op4", "op5", "op10")
        tol = 1e-6 if op_name in ("op5", "op9", "op10", "op11") else (
            1e-8 if curv_op else 1e-10)
        np.testing.assert_allclose(float(res.angle), f_angle, atol=tol,
                                   err_msg=f"{op_name} angle trial {trial}")
        np.testing.assert_allclose(float(res.n), f_n,
                                   rtol=1e-9 if curv_op else 1e-12)
        np.testing.assert_allclose(res.grad, f_grad,
                                   rtol=1e-9 if curv_op else 1e-12,
                                   atol=1e-8 if curv_op else 1e-12)


@pytest.mark.parametrize("step_idx,expected_order", [(1, 1), (2, 2), (3, 3), (9, 3)])
def test_op7_priming_ramp(step_idx, expected_order):
    """op7's in-scan order ramp matches the mirror's priming logic."""
    med_np = ref_numpy.make_medium("fisheye")
    med_jx = analytic_medium("fisheye")
    op = build_op("op7", np.float64)
    rng = np.random.default_rng(42 + step_idx)
    pos, angle, unitv, n, grad, coef, window = _random_point(
        rng, "fisheye", 1.0, med_np)
    # Mirror the scan's window state at this step index: entries older than
    # the available history are copies of the initial position.
    if step_idx == 1:
        window = [window[3]] * 4
    elif step_idx == 2:
        window = [window[2]] * 3 + [window[3]]
    step = 0.02

    f_pos, f_angle, *_ = ref_numpy.step_op(
        "op7", angle, n, grad, unitv, pos, coef, list(window), step_idx,
        med_np, 1.0, step)
    pt = RayPoint(pos=jnp.asarray(pos), angle=jnp.float64(angle),
                  unitv=jnp.asarray(unitv), n=jnp.float64(n),
                  grad=jnp.asarray(grad), coef=jnp.float64(coef),
                  window=jnp.asarray(np.stack(window)))
    res = op(pt, jnp.int32(step_idx), med_jx, jnp.float64(1.0), jnp.float64(step))
    np.testing.assert_allclose(float(res.angle), f_angle, atol=1e-10)
    np.testing.assert_allclose(res.pos, f_pos, rtol=1e-12)
