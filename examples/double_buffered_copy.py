"""Micro-example 3: manual double-buffered DMA (HBM -> VMEM -> HBM).

The teaching analog of the reference's cp.async double-buffering study
(kernels/sgemm/sgemm_async.cu, kernels/hgemm/naive/hgemm_async.cu): the
same overlap — issue the NEXT copy before consuming the CURRENT buffer —
expressed with pltpu.make_async_copy + DMA semaphores instead of
cp.async.commit_group/wait_group. (Pallas's grid pipeline does this
automatically for BlockSpec-indexed inputs; writing it manually is how
irregular access patterns like paged KV fetches work.)

Run: python examples/double_buffered_copy.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256


def scaled_copy_kernel(x_hbm, o_ref, scratch, sems):
    n_chunks = x_hbm.shape[0] // CHUNK

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(idx * CHUNK, CHUNK), :],
            scratch.at[slot],
            sems.at[slot],
        )

    get_dma(0, 0).start()             # prologue: first chunk in flight

    def body(idx, _):
        slot = idx % 2
        nxt = (idx + 1) % 2

        @pl.when(idx + 1 < n_chunks)   # issue next copy before waiting
        def _():
            get_dma(nxt, idx + 1).start()

        get_dma(slot, idx).wait()      # consume current chunk
        o_ref[pl.ds(idx * CHUNK, CHUNK), :] = scratch[slot] * 2.0
        return ()

    jax.lax.fori_loop(0, n_chunks, body, ())


def scaled_copy(x):
    return pl.pallas_call(
        scaled_copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # stays in HBM
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, x.shape[1]), x.dtype),  # 2 slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x)


if __name__ == "__main__":
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2048, 256)),
                    jnp.float32)
    out = scaled_copy(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    print("double_buffered_copy OK:", out.shape)
