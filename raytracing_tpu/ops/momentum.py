"""Ray momenta for isotropic and anisotropic media.

jnp ports of ``moment``/``moments`` (RT_bench.py:217-245).  In the reference
the anisotropy ratio ``gamma`` is a module global consumed deep inside op10/
op11 (RT_bench.py:725-728); here it is an explicit argument everywhere.

For gamma == 1 (isotropic) ``moments`` reduces exactly to n * (cos t, sin t),
i.e. the standard ray slowness vector.
"""
from __future__ import annotations

import jax.numpy as jnp

from raytracing_tpu.media.fields import anisotropy


def moment(n, theta, gamma, trig, quad):
    """Directional momentum component (RT_bench.py:217-230).

    ``trig``/``quad`` are the two entries of the reference's ``opt_vec``:
    (cos t, -sin^2 t) for the x component, (sin t, cos^2 t) for y.
    """
    coef = anisotropy(theta, gamma)
    return n * coef * trig * (1.0 + quad * (gamma * gamma - 1.0) / (coef * coef))


def moments(theta, n, unitv, gamma):
    """Momentum vector (m_x, m_y) of a ray (RT_bench.py:232-245)."""
    ux, uy = unitv[..., 0], unitv[..., 1]
    mx = moment(n, theta, gamma, ux, -(uy * uy))
    my = moment(n, theta, gamma, uy, ux * ux)
    return jnp.stack([mx, my], axis=-1)
