"""Medium abstraction: everything the integrator needs is ``n_and_grad``.

The reference threads two scipy spline closures ``(z, grd)`` through every
call (RT_bench.py:141-156) plus a module-global field function ``f``
(RT_bench.py:1567-1580).  Here a medium is a small pytree with one method::

    n, (dndx, dndy) = medium.n_and_grad(x, y)

Two implementations:

* :class:`AnalyticMedium` — closed-form n and gradient (exact; the fast path).
* :class:`GridMedium` (media/spline.py) — bilinear n + bicubic gradient
  evaluated from precomputed coefficient tables, matching the reference's
  RectBivariateSpline semantics (RT_bench.py:435-464).

Both are registered pytrees so they can be passed through ``jit``/``scan``/
``shard_map`` as ordinary operands.
"""
from __future__ import annotations

import dataclasses

import jax

from raytracing_tpu.media import fields as _fields


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class AnalyticMedium:
    """Closed-form medium: n and its gradient from :mod:`media.fields`."""

    field: str  # key into fields.FIELDS

    def n_and_grad(self, x, y):
        n_fn, grad_fn = _fields.FIELDS[self.field]
        return n_fn(x, y), grad_fn(x, y)

    def n(self, x, y):
        return _fields.FIELDS[self.field][0](x, y)


def analytic_medium(field: str) -> AnalyticMedium:
    if field not in _fields.FIELDS:
        raise ValueError(f"unknown field {field!r}; have {sorted(_fields.FIELDS)}")
    return AnalyticMedium(field)
