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


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=False)
class CustomMedium:
    """User-defined medium: any jnp-traceable n(x, y), gradient by autodiff.

    The reference requires editing its source to add a medium
    (RT_bench.py:104-116 plus the global `f` binding at 1567-1580); here any
    elementwise function works, with the gradient supplied by forward-mode
    autodiff — so it runs unmodified inside the scan engine on all backends.
    A hand-written ``grad_fn(x, y) -> (dndx, dndy)`` can be supplied when
    autodiff through the field is ill-conditioned (see the interface sigmoid
    note in media/fields.py).
    """

    n_fn: object                 # callable (x, y) -> n, elementwise
    grad_fn: object = None       # optional callable (x, y) -> (dndx, dndy)

    def n_and_grad(self, x, y):
        import jax.numpy as jnp

        n = self.n_fn(x, y)
        if self.grad_fn is not None:
            return n, self.grad_fn(x, y)
        ones = jnp.ones_like(x)
        zeros = jnp.zeros_like(x)
        _, dndx = jax.jvp(self.n_fn, (x, y), (ones, zeros))
        _, dndy = jax.jvp(self.n_fn, (x, y), (zeros, ones))
        return n, (dndx, dndy)

    def n(self, x, y):
        return self.n_fn(x, y)
