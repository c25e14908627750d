"""Morton sort key: production-dtype (x32) regression coverage.

The tiled grid kernel's containment contract depends on `argsort` over
`_morton_key` being a true Z-order: part(iy) occupies odd bits up to bit 31,
so the combined key must be UNSIGNED.  The original ADVICE-r2-#4 fix widened
to int64, which silently truncates back to int32 when jax_enable_x64 is off —
the production default (bench.py, serving, fast_trace); the test suite's
conftest enables x64, which masked it.  These tests run the key under
`jax.enable_x64(False)` to reproduce the production environment.
"""
import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tpu.engine.segmented import _morton_key


def _ref_key(ix, iy):
    def part(v):
        v = np.uint64(v)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
        return int(v)

    return part(ix) | (part(iy) << 1)


def test_morton_key_unsigned_and_ordered_without_x64():
    with jax.enable_x64(False):
        iy = jnp.array([32768, 32769, 0, 1], jnp.int32)
        ix = jnp.zeros(4, jnp.int32)
        k = _morton_key(ix, iy)
        assert k.dtype == jnp.uint32
        # tall-grid cells (iy >= 32768) must sort AFTER small ones — with a
        # signed key their shifted bit 31 flips the comparison
        assert list(np.argsort(np.asarray(k))) == [2, 3, 0, 1]


def test_morton_key_matches_uint64_reference():
    rng = np.random.default_rng(0)
    ixs = rng.integers(0, 65536, 256).astype(np.int32)
    iys = rng.integers(0, 65536, 256).astype(np.int32)
    ref = np.array([_ref_key(a, b) for a, b in zip(ixs, iys)], np.uint64)
    with jax.enable_x64(False):
        got = np.asarray(_morton_key(jnp.asarray(ixs), jnp.asarray(iys)))
    assert np.array_equal(ref, got.astype(np.uint64))
