"""Position-advancement methods (L1 steppers).

Branch-free jnp ports of the reference's three steppers (RT_bench.py:298-365):

* :func:`first_order_taylor`  — r += u * ds
* :func:`second_order_taylor` — adds the transverse-gradient curvature term
* :func:`curvature_step`      — arc step on the local circle of curvature,
  falling back to first order when the curvature is negligible

Positions are (..., 2) arrays (x, y); all functions are shape-polymorphic so
they serve scalars (parity tests), vmapped batches, and Pallas kernels alike.
The reference's ``if curv < GOLD_TOL`` / ``if np.cross(...) > 0`` branches
(RT_bench.py:354-363) become ``jnp.where`` selects.
"""
from __future__ import annotations

import jax.numpy as jnp


def first_order_taylor(pos, unitv, step):
    """Linear advance r + u*ds (RT_bench.py:300-312)."""
    return pos + unitv * step


def second_order_taylor(pos, unitv, step, n, grad):
    """Taylor advance with transverse-gradient correction (RT_bench.py:314-333).

    r' = r + u*ds + (grad_n - (grad_n . u) u) * ds^2 / (2 n)
    """
    gdotu = jnp.sum(grad * unitv, axis=-1, keepdims=True)
    transverse = grad - gdotu * unitv
    return pos + unitv * step + transverse * (step * step) / (2.0 * n[..., None])


def curvature_step(angle, grad, unitv, n, pos, step, tol):
    """Arc step on the circle of curvature (RT_bench.py:335-365).

    kappa = |grad_n - (grad_n . u) u| / n; when kappa < tol the step
    degenerates to first order and the caller must skip the angle update
    (the reference's ``ignore`` flag, RT_bench.py:354-357).

    Returns ``(new_pos, significant)`` where ``significant`` is True when the
    curvature is non-negligible (reference's ``ignore == True`` path).

    The chord displacement uses the angle-difference identities
    ``sin(t) - sin(t - d) = 2 cos(t - d/2) sin(d/2)`` (and its cosine
    analogue) instead of the reference's direct differences
    (RT_bench.py:361-363): algebraically identical, but free of catastrophic
    cancellation when ``kappa * ds`` is tiny — important at float32.
    """
    gdotu = jnp.sum(grad * unitv, axis=-1, keepdims=True)
    transverse = grad - gdotu * unitv
    curv = jnp.linalg.norm(transverse, axis=-1) / n
    significant = curv >= tol
    safe_curv = jnp.where(significant, curv, 1.0)
    d = curv * step

    # Turn direction from the 2-D cross product grad x u (RT_bench.py:360).
    turn_left = (grad[..., 0] * unitv[..., 1] - grad[..., 1] * unitv[..., 0]) > 0
    # Signed rotation: left turn rotates the tangent by -d, right by +d
    # (reference's two branches expressed with a signed angle increment).
    sgn = jnp.where(turn_left, -1.0, 1.0)
    half = sgn * d / 2.0
    # chord = (sin(a + s*d) - sin(a), -(cos(a + s*d) - cos(a))) * s / curv
    #       = (2 cos(a + half) sin(half), 2 sin(a + half) sin(half)) * s / curv
    sin_half = jnp.sin(half)
    coeff = 2.0 * sin_half * sgn / safe_curv
    dx = jnp.cos(angle + half) * coeff
    dy = jnp.sin(angle + half) * coeff
    arc_pos = pos + jnp.stack([dx, dy], axis=-1)

    lin_pos = first_order_taylor(pos, unitv, step)
    new_pos = jnp.where(significant[..., None], arc_pos, lin_pos)
    return new_pos, significant
