"""Angle-determination methods (L1 angle solvers).

jnp ports of the reference's four angle solvers (RT_bench.py:368-407) plus the
trapezoidal impulse integral (RT_bench.py:202-214).  The 4-point backward
difference operates on a fixed (..., 4, 2) rolling window of positions carried
in the scan state — replacing the reference's mutable module-global
``VECTOR_LIST`` (RT_bench.py:73, 370-372, 646-648), which was its one latent
data race (SURVEY.md 5.2).
"""
from __future__ import annotations

import jax.numpy as jnp


def impulse_t(a, b, step):
    """Trapezoidal impulse integral step*(a + b)/2 (RT_bench.py:202-214)."""
    return step * (a + b) / 2.0


def theta_cost_t(init_n, angle, i_grad, f_grad, step):
    """Closed-form momentum-impulse angle update (RT_bench.py:393-407).

    atan2(n sin t + J_y, n cos t + J_x) with J the trapezoidal impulse.
    """
    num = init_n * jnp.sin(angle) + impulse_t(i_grad[..., 1], f_grad[..., 1], step)
    den = init_n * jnp.cos(angle) + impulse_t(i_grad[..., 0], f_grad[..., 0], step)
    return jnp.arctan2(num, den)


def tfinal_2o(angle, step, init_n, final_n, i_grad, f_grad):
    """RK2 on d(theta)/ds (the AnDF update, RT_bench.py:374-391)."""
    k1 = step * (jnp.cos(angle) * i_grad[..., 1]
                 - jnp.sin(angle) * i_grad[..., 0]) / init_n
    k2 = step * (jnp.cos(angle + k1) * f_grad[..., 1]
                 - jnp.sin(angle + k1) * f_grad[..., 0]) / final_n
    return angle + (k1 + k2) / 2.0


# -- Backward finite differences over the 4-position window -----------------
# The window w has shape (..., 4, 2) with w[..., 3, :] the newest position.

def finite_diff_1(window):
    """First-order backward difference (priming step 1, RT_bench.py:843-844)."""
    x = window[..., 3, :] - window[..., 2, :]
    return jnp.arctan2(x[..., 1], x[..., 0])


def finite_diff_2(window):
    """Second-order backward difference (priming step 2, RT_bench.py:856-857)."""
    x = 3.0 * window[..., 3, :] - 4.0 * window[..., 2, :] + window[..., 1, :]
    return jnp.arctan2(x[..., 1], x[..., 0])


def finite_diff_3(window):
    """Third-order backward difference (the MxSA update, RT_bench.py:370-372)."""
    x = (11.0 * window[..., 3, :] - 18.0 * window[..., 2, :]
         + 9.0 * window[..., 1, :] - 2.0 * window[..., 0, :])
    return jnp.arctan2(x[..., 1], x[..., 0])


def push_window(window, pos):
    """Append ``pos`` as the newest entry of the rolling window."""
    return jnp.concatenate([window[..., 1:, :], pos[..., None, :]], axis=-2)
