"""3-D media: everything the 3-D integrator needs is ``n_and_grad3``.

The reference is strictly 2-D (its fields are f(x, y), RT_bench.py:104-119,
and its state vectors carry one angle); this module is the framework's
extension of the medium abstraction to three dimensions::

    n, (dndx, dndy, dndz) = medium.n_and_grad3(x, y, z)

Implementations:

* :class:`Analytic3D`   — closed-form fields (the Maxwell fisheye
  generalizes verbatim: n = 1/(1 + r^2) is spherically symmetric, and its
  3-D rays are the same perfect circles as in 2-D).
* :class:`Custom3D`     — any jnp-traceable n(x, y, z); gradient by
  forward-mode autodiff (the 3-D twin of media.medium.CustomMedium).
* :class:`Stratified3D` — lifts ANY 2-D x-independent medium (analytic
  vert field, measured profile tables from
  ``stratified_medium_from_samples`` / ``c1_stratified_from_samples``)
  into 3-D: n depends on y only, so the (x, z) horizontal slowness vector
  is an exact invariant — the 3-D form of the reference's conservation
  oracle (RT_bench.py:957-958).

All are registered pytrees, so they pass through jit/scan/shard_map as
operands like the 2-D media.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _fisheye3(x, y, z):
    r2 = x * x + y * y + z * z
    return 1.0 / (1.0 + r2)


def _fisheye3_grad(x, y, z):
    r2 = x * x + y * y + z * z
    c = -2.0 / ((1.0 + r2) * (1.0 + r2))
    return c * x, c * y, c * z


def _vert3(x, y, z):
    return 1.0 / (18.0 + 2.0 * y) + 0.0 * x


def _vert3_grad(x, y, z):
    n = 1.0 / (18.0 + 2.0 * y)
    zero = jnp.zeros_like(x)
    return zero, -2.0 * n * n, zero


def _interface3(x, y, z):
    from raytracing_tpu.media.fields import _SQRT2, _sigmoid

    from raytracing_tpu import config
    return (_SQRT2 - (_SQRT2 - 1.0) * _sigmoid(y / config.THCK_PARAM)
            + 0.0 * x)


def _interface3_grad(x, y, z):
    from raytracing_tpu.media.fields import _SQRT2, _sigmoid

    from raytracing_tpu import config
    sig = _sigmoid(y / config.THCK_PARAM)
    zero = jnp.zeros_like(x)
    return (zero,
            -(_SQRT2 - 1.0) * sig * (1.0 - sig) / config.THCK_PARAM,
            zero)


#: stratified reference fields lift with dn/dz = 0 (RT_bench.py:104-116
#: in vector form; the same twins the fused 3-D kernels inline)
FIELDS3 = {
    "fisheye": (_fisheye3, _fisheye3_grad),
    "vert_heterogeneous": (_vert3, _vert3_grad),
    "interface": (_interface3, _interface3_grad),
}


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Analytic3D:
    """Closed-form 3-D medium from :data:`FIELDS3`."""

    field: str

    def n_and_grad3(self, x, y, z):
        n_fn, g_fn = FIELDS3[self.field]
        return n_fn(x, y, z), g_fn(x, y, z)

    def n3(self, x, y, z):
        return FIELDS3[self.field][0](x, y, z)


def analytic_medium3(field: str) -> Analytic3D:
    if field not in FIELDS3:
        raise ValueError(f"unknown 3-D field {field!r}; have {sorted(FIELDS3)}")
    return Analytic3D(field)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True, eq=False)
class Custom3D:
    """User 3-D medium: any jnp-traceable n(x, y, z), gradient by autodiff."""

    n_fn: object                 # callable (x, y, z) -> n, elementwise
    grad_fn: object = None       # optional (x, y, z) -> (dndx, dndy, dndz)

    def n_and_grad3(self, x, y, z):
        n = self.n_fn(x, y, z)
        if self.grad_fn is not None:
            return n, self.grad_fn(x, y, z)
        ones, zeros = jnp.ones_like(x), jnp.zeros_like(x)
        _, gx = jax.jvp(self.n_fn, (x, y, z), (ones, zeros, zeros))
        _, gy = jax.jvp(self.n_fn, (x, y, z), (zeros, ones, zeros))
        _, gz = jax.jvp(self.n_fn, (x, y, z), (zeros, zeros, ones))
        return n, (gx, gy, gz)

    def n3(self, x, y, z):
        return self.n_fn(x, y, z)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Stratified3D:
    """A 2-D x-independent medium lifted to 3-D: n = n(y), horizontal
    isotropy in (x, z).

    Wraps any medium whose ``n_and_grad(x, y)`` ignores x (the analytic
    vert field, 1-D measured profile tables) — exactly the media whose 2-D
    conservation oracle is p_x; in 3-D the whole horizontal slowness
    vector (n u_x, n u_z) is invariant.

    X-independence is PROBED at construction (wide-spread x samples at a
    few y values): wrapping a genuinely 2-D medium would silently zero its
    x-gradient — rays would refract inconsistently with the index they
    accumulate.  Clamping media (grid tables) clamp the wide probes to
    opposite edges, so x-variation still shows.
    """

    base: object   # 2-D x-independent medium with n_and_grad(x, y)

    def __post_init__(self):
        import numpy as _np
        xs = jnp.asarray([-1e3, 0.0, 1e3])
        for yv in (-1.0, 0.0, 1.0):
            try:
                n, (gx, _) = self.base.n_and_grad(xs, jnp.full(3, yv))
                n = _np.asarray(n)
                gx = _np.asarray(gx)
            except (jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError):
                # reconstructed by tree_unflatten inside a transform; the
                # user-facing construction already validated
                return
            if (_np.abs(n - n[0]).max() > 1e-9 * (1 + _np.abs(n[0]))
                    or _np.abs(gx).max() > 1e-12):
                raise ValueError(
                    "Stratified3D needs an x-independent medium "
                    "(n = n(y)); the wrapped medium's n or dn/dx varies "
                    "with x — lift genuinely 2-D media to 3-D with a "
                    "Custom3D(n_fn(x, y, z)) instead")

    def tree_flatten(self):
        return (self.base,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def n_and_grad3(self, x, y, z):
        n, (_, gy) = self.base.n_and_grad(x, y)
        zero = jnp.zeros_like(n)
        return n, (zero, gy, zero)

    def n3(self, x, y, z):
        n, _ = self.base.n_and_grad(x, y)
        return n
