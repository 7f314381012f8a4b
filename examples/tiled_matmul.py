"""Micro-example 2: tiled MXU matmul with a K-reduction grid axis.

The teaching analog of the reference's CuTe TiledMMA example
(kernels/cutlass/cute/mma_tile_tex.cc — layout printing for MMA tiles).
Demonstrates the three core MXU patterns:

1. a 3-D grid where the last ("arbitrary") axis is the K reduction,
2. accumulation directly in the f32 output block, which stays
   VMEM-resident while (i, j) is unchanged (see tpukern/ops/matmul.py for
   why this beats a scratch accumulator),
3. conditional init on the first K step via pl.when.

Run: python examples/tiled_matmul.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def matmul_kernel(a_ref, b_ref, o_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # one MXU pass per grid step; f32 accumulation regardless of input dtype
    o_ref[...] += jnp.dot(a_ref[...], b_ref[...],
                          preferred_element_type=jnp.float32)


def tiled_matmul(a, b, bm=256, bn=256, bk=256):
    M, K = a.shape
    N = b.shape[1]
    return pl.pallas_call(
        matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid=(M // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=jax.default_backend() != "tpu",
    )(a, b)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((512, 512)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((512, 512)), jnp.bfloat16)
    out = tiled_matmul(a, b)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-2, atol=1e-1)
    print("tiled_matmul OK:", out.shape, out.dtype)
