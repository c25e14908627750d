"""Batched ray state carried through the integration scan.

The reference keeps per-ray scalars in Python locals mutated inside the hot
loop (RT_bench.py:866-875) plus the mutable global ``VECTOR_LIST``
(RT_bench.py:73); here the complete state of *all* rays is one immutable
pytree with a leading ray axis, updated functionally each scan step.  Optional
fields (op7's position window, the Welford momentum tracker used by the
metrics-only path) are ``None`` when unused so they cost nothing.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class RayState(NamedTuple):
    """State of a ray batch; every array has leading shape (R,)."""

    pos: Any          # (R, 2) current position
    angle: Any        # (R,)   current group angle
    unitv: Any        # (R, 2) (cos angle, sin angle)
    n: Any            # (R,)   isotropic index at pos
    grad: Any         # (R, 2) gradient of n at pos
    coef: Any         # (R,)   anisotropy factor at angle
    n_eff: Any        # (R,)   coef * n  (the reference's n_ray entries)
    m: Any            # (R, 2) momenta
    traveltime: Any   # (R,)   accumulated optical path
    dist_sim: Any     # (R,)   accumulated Euclidean distance (d_ray[1])
    dist_real: Any    # (R,)   accumulated expected arc length (d_ray[0])
    active: Any       # (R,)   bool: still integrating
    exit_step: Any    # (R,)   int32: row index of the last written step (d_ray[2])
    window: Any       # (R, 4, 2) rolling position window, or None
    mom_count: Any    # (R,)   Welford sample count, or None
    mom_mean: Any     # (R,)   Welford running mean of m_x, or None
    mom_m2: Any       # (R,)   Welford running sum of squared deviations, or None


def where_state(mask, new: RayState, old: RayState) -> RayState:
    """Per-ray select between two states; ``mask`` has shape (R,)."""

    def sel(a, b):
        m = mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim))
        return jnp.where(m, a, b)

    return jax.tree.map(sel, new, old)
