"""Feasibility probe for in-kernel window refresh (not production code).

Tests whether this Mosaic build supports the primitives the resident-window
grid kernel would need: reduce a VMEM vector to a scalar, use it as a
dynamic offset for an HBM->VMEM DMA, and relayout the DMA'd (8, 16) tile to
a (1, 128) gather row.

RESULT (2026-08, v5e, this jax build): the relayout is the blocker —
Mosaic fails with "infer-vector-layout: unsupported shape cast" on
``tpu.reshape (8x16) -> (1x128)`` (a sublane->lane shuffle).  Without it,
an in-kernel refresh would need one DMA descriptor per (channel, row) —
~288 per refresh — which forfeits most of the win.  The tiled grid kernel
therefore keeps its XLA-side window refresh (~3.7 ms each, ~10% of a
fine-step trace); revisit if Mosaic grows cross-dim reshapes.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(tbl_hbm, x_ref, out_ref, win, sem):
    # (a) data-dependent scalar: min over the block's vector
    base = jnp.min(x_ref[...]).astype(jnp.int32)
    # (b) DMA a (8, 16) window from the HBM-resident table at that offset
    dma = pltpu.make_async_copy(
        tbl_hbm.at[pl.ds(base, 8), pl.ds(base, 16)], win, sem)
    dma.start()
    dma.wait()
    # (c) relayout the window into a 128-lane gather row and gather
    row = win[...].reshape(1, 128)
    T = jnp.broadcast_to(row, (8, 128))
    idx = jnp.clip(x_ref[...].astype(jnp.int32), 0, 127)
    out_ref[...] = jnp.take_along_axis(T, idx, axis=1)


@jax.jit
def run(tbl, x):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 16), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(tbl, x)


def main():
    tbl = jnp.arange(64 * 64, dtype=jnp.float32).reshape(64, 64)
    x = jnp.full((8, 128), 3.0, jnp.float32)
    out = np.asarray(run(tbl, x))
    # expected: base=3 -> window rows 3..10, cols 3..18; row-major flat
    # index 3 of the window = tbl[3, 6]
    want = float(tbl[3, 3 + 3])
    print("probe ok; out[0,0] =", out[0, 0], "want", want,
          "match:", out[0, 0] == want)


if __name__ == "__main__":
    main()
