"""Newton refinement of the anisotropic momentum-impulse angle solve.

Framework extension beyond the reference: op10/op11 minimize the anisotropic
momentum cost with ~70 golden-section cost evaluations per step
(RT_bench.py:175-199, 702-764), and a float32 golden argmin is only accurate
to ~sqrt(eps) — a ~1 % momentum drift per hundred steps.  Newton iteration
on d(cost)/d(theta) = 0, seeded at the previous angle (an excellent guess:
the per-step angle change is O(delta_s)), converges quadratically to
~eps-level argmin precision in 3 iterations — faster *and* ~1000x more
precise at float32.

Derivatives come from ``jax.jvp`` (forward-mode, elementwise — no vmap
needed), so the same code runs in the scan engine and inside Pallas kernels.
The isotropic cost needs no Newton at all: its minimizer is exactly the
closed-form ``theta_cost_t`` (set d/dtheta[(n2 cos - Kx)^2 + (n2 sin - Ky)^2]
= 0 and Kx sin = Ky cos drops out), which is why op8 and op9 agree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

#: Newton iterations; quadratic convergence from an O(delta_s) seed makes
#: three plenty at float32 (two reach ~1e-7 rad on the scenario costs).
NEWTON_ITERS = 3
#: trust region: per-iteration step clamp (rad).  The per-integration-step
#: angle change is O(delta_s) << 0.3 in every scenario.
MAX_STEP = 0.3


def newton_minimize(cost_fn, theta0, iters: int = NEWTON_ITERS):
    """Elementwise Newton on d(cost)/d(theta) = 0, seeded at ``theta0``.

    ``cost_fn`` must be elementwise over its input.  Safeguards: the second
    derivative is floored away from zero and steps are clamped to
    +/-MAX_STEP, so a degenerate curvature cannot throw the angle across the
    bracket the way an unlucky golden start could.
    """

    def dcost(t):
        return jax.jvp(cost_fn, (t,), (jnp.ones_like(t),))[1]

    theta = theta0
    for _ in range(iters):
        d1, d2 = jax.jvp(dcost, (theta,), (jnp.ones_like(theta),))
        # floor |f''| and keep its sign so maxima repel instead of attract
        safe = jnp.where(jnp.abs(d2) < 1e-12, 1e-12, jnp.abs(d2))
        step = jnp.clip(d1 / safe, -MAX_STEP, MAX_STEP)
        theta = theta - step
    return theta
