"""Media fields: analytic gradients vs autodiff, anisotropy identities."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tpu.media import fields


@pytest.mark.parametrize("name", sorted(fields.FIELDS))
def test_analytic_gradient_matches_autodiff(name):
    n_fn, grad_fn = fields.FIELDS[name]
    rng = np.random.default_rng(0)
    xs = rng.uniform(-2.0, 2.0, 50)
    # Keep |y| small for the interface: autodiff through the sigmoid NaNs out
    # once exp(-y/0.005) overflows, while the closed form stays finite — the
    # robustness is why the closed form exists.
    yspan = 0.05 if name == "interface" else 2.0
    ys = rng.uniform(-yspan, yspan, 50)
    gx, gy = grad_fn(jnp.asarray(xs), jnp.asarray(ys))
    agx = jax.vmap(jax.grad(n_fn, argnums=0))(jnp.asarray(xs), jnp.asarray(ys))
    agy = jax.vmap(jax.grad(n_fn, argnums=1))(jnp.asarray(xs), jnp.asarray(ys))
    np.testing.assert_allclose(gx, agx, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(gy, agy, rtol=1e-10, atol=1e-12)


def test_anisotropy_isotropic_limit():
    thetas = jnp.linspace(-np.pi, np.pi, 101)
    np.testing.assert_allclose(fields.anisotropy(thetas, 1.0), 1.0, atol=1e-15)


def test_anisotropy_uv_consistency():
    thetas = jnp.linspace(-np.pi, np.pi, 101)
    for gamma in (1.0, 3.0):
        a = fields.anisotropy(thetas, gamma)
        b = fields.anisotropy_uv(jnp.cos(thetas), jnp.sin(thetas), gamma)
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_interface_limits():
    # Deep below the interface n -> sqrt(2); far above n -> 1 (RT_bench.py:106-108).
    n_fn, _ = fields.FIELDS["interface"]
    assert float(n_fn(0.0, -1.0)) == pytest.approx(np.sqrt(2.0), abs=1e-12)
    assert float(n_fn(0.0, 1.0)) == pytest.approx(1.0, abs=1e-12)
