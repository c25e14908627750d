"""Branchless golden-section minimizer.

Replaces the reference's data-dependent ``while |c - d| > GOLD_TOL`` loop
(RT_bench.py:175-199) with a fixed-trip-count ``lax.scan``: the bracket width
shrinks deterministically by the golden ratio each iteration, so the dynamic
loop always runs the same number of times — :func:`config.golden_iters`
computes that count from the dtype's tolerance, and a static count is what
``jit``/``vmap`` want.

Unlike the reference (which re-evaluates the cost at both interior points
every iteration), this implementation keeps the classic one-new-evaluation
property: per iteration exactly one cost evaluation, with the surviving
interior point's value reused.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracing_tpu.config import GOLD_RATIO


def golden_minimize(cost_fn, a, b, iters: int):
    """Minimize ``cost_fn`` on [a, b] with ``iters`` golden-section steps.

    ``a``/``b`` may be arrays (batched brackets); ``cost_fn`` must be
    elementwise over them.  Returns the bracket midpoint, matching the
    reference's ``(b + a) / 2`` (RT_bench.py:199).
    """
    r = jnp.asarray(GOLD_RATIO, dtype=jnp.result_type(a, b))
    c = b - (b - a) * r
    d = a + (b - a) * r
    fc = cost_fn(c)
    fd = cost_fn(d)

    def body(carry, _):
        a, b, c, d, fc, fd = carry
        left = fc < fd                      # keep [a, d] if True else [c, b]
        a2 = jnp.where(left, a, c)
        b2 = jnp.where(left, d, b)
        c2 = b2 - (b2 - a2) * r
        d2 = a2 + (b2 - a2) * r
        # Golden-ratio identity r^2 = 1 - r makes exactly one of (c2, d2) a
        # reused point: on a left keep, c2 == old c (value fc); on a right
        # keep, d2 == old d (value fd).  Evaluate only the fresh point.
        fresh = jnp.where(left, c2, d2)
        ffresh = cost_fn(fresh)
        fc2 = jnp.where(left, ffresh, fd)
        fd2 = jnp.where(left, fc, ffresh)
        return (a2, b2, c2, d2, fc2, fd2), None

    (a, b, _, _, _, _), _ = jax.lax.scan(body, (a, b, c, d, fc, fd), None,
                                         length=iters)
    return (a + b) / 2
