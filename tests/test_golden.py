"""Golden-section minimizer: convergence and parity with a while-loop mirror."""
import jax.numpy as jnp
import numpy as np

import ref_numpy
from raytracing_tpu.config import golden_iters
from raytracing_tpu.ops.golden import golden_minimize


def test_quadratic_batched():
    mins = jnp.linspace(-1.0, 1.0, 16)
    cost = lambda t: (t - mins) ** 2
    a = mins - np.pi / 2
    b = mins + np.pi / 2
    res = golden_minimize(cost, a, b, golden_iters(np.float64))
    np.testing.assert_allclose(res, mins, atol=1e-7)


def test_matches_while_loop_mirror():
    rng = np.random.default_rng(1)
    for _ in range(20):
        center = rng.uniform(-2, 2)
        shift = rng.uniform(-1, 1)

        def f_np(t):
            return np.sin(t - shift) ** 2 + 0.1 * (t - shift) ** 2

        def f_jx(t):
            return jnp.sin(t - shift) ** 2 + 0.1 * (t - shift) ** 2

        a, b = center - np.pi / 2, center + np.pi / 2
        want = ref_numpy.golden(f_np, a, b)
        got = golden_minimize(f_jx, jnp.float64(a), jnp.float64(b),
                              golden_iters(np.float64))
        assert abs(float(got) - want) < 1e-7


def test_iter_count_reaches_tolerance():
    # After golden_iters shrinks, the bracket gap |c - d| must be <= tol.
    k = golden_iters(np.float64)
    from raytracing_tpu.config import GOLD_RATIO, gold_tol
    width = np.pi * GOLD_RATIO ** k
    assert width * (2 * GOLD_RATIO - 1) <= gold_tol(np.float64)
