"""Micro-example 1: vector add — the smallest complete Pallas TPU program.

The teaching analog of the reference's CuTe micro-examples
(kernels/cutlass/cute/vector_add.cu: local_tile/Tensor demo). Where CuTe
teaches layout algebra over thread/value tiles, the Pallas equivalents are
BlockSpecs (how the grid carves HBM arrays into VMEM blocks) and the
(sublane, lane) tiling rules.

Run: python examples/vector_add.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def add_kernel(a_ref, b_ref, o_ref):
    # refs are VMEM blocks; [...] loads the whole block into vector
    # registers, the assignment stores back. One fused VPU add per element.
    o_ref[...] = a_ref[...] + b_ref[...]


def vector_add(a, b, block_rows=256):
    rows, lanes = a.shape  # lanes should be a multiple of 128
    grid = (rows // block_rows,)
    return pl.pallas_call(
        add_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        # index_map: grid position i -> block index (i, 0); Pallas streams
        # block i*block_rows..(i+1)*block_rows through VMEM, double-buffered
        in_specs=[pl.BlockSpec((block_rows, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((block_rows, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(a, b)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4096, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4096, 256)), jnp.float32)
    out = vector_add(a, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(a + b))
    print("vector_add OK:", out.shape, out.dtype)
