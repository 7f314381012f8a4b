"""Embedding: row gather from a weight table.

Reference: kernels/embedding/embedding.cu:16-69 —
embedding_{f32,f32x4,f32x4_pack,f16,f16x2,f16x8_pack} (one thread block per
token, vector-width-laddered row copies).

TPU design — three genuinely different gather mechanisms (the variant axis
that matters on TPU, instead of vector width):

1. `embedding_prefetch`: scalar-prefetched indices drive the BlockSpec
   index_map, so Pallas's own pipeline DMAs exactly the needed weight row
   per grid step (idiomatic Pallas gather).
2. `embedding_dma`: weight stays in HBM (`pl.ANY`); the kernel issues one
   async copy per token in the block, all in flight concurrently, directly
   into the output block (the paged-attention page-fetch pattern).
3. `embedding_onehot`: one-hot matmul on the MXU — for small vocabularies
   the systolic array is the fastest gather engine on the chip.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import cdiv, use_interpret
from tpukern.core.registry import register


def embedding_prefetch(idx, weight, interpret=None):
    """One weight row per grid step, chosen by the scalar-prefetched index.

    The weight is viewed as (V, 1, D) so the block's last two dims (1, D)
    equal the array dims — single rows of a 2-D array violate Mosaic's
    (8, 128) block tiling rule."""
    S = idx.shape[0]
    V, D = weight.shape
    w3 = weight.reshape(V, 1, D)

    def kernel(idx_ref, w_ref, o_ref):
        o_ref[...] = w_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 1, D), lambda i, idx_ref: (idx_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda i, idx_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, 1, D), weight.dtype),
        grid_spec=grid_spec,
        interpret=use_interpret() if interpret is None else interpret,
    )(idx.astype(jnp.int32), w3)
    return out.reshape(S, D)


def embedding_dma(idx, weight, block_tokens=8, interpret=None):
    """Weight in HBM; per-token async copies straight into the output block,
    all concurrently in flight (one DMA per row, like the reference's one
    block per token)."""
    S = idx.shape[0]
    V, D = weight.shape
    assert S % block_tokens == 0, "pad token count to the block size"
    # (V, 1, D) view: whole-row DMAs slice only the leading (untiled) dim
    w3 = weight.reshape(V, 1, D)

    def kernel(idx_ref, w_ref, o_ref, sems):
        i = pl.program_id(0)
        copies = []
        for t in range(block_tokens):
            row = idx_ref[i * block_tokens + t]
            copies.append(pltpu.make_async_copy(
                w_ref.at[row], o_ref.at[t], sems.at[t]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // block_tokens,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_tokens, 1, D),
                               lambda i, idx_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((block_tokens,))],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, 1, D), weight.dtype),
        grid_spec=grid_spec,
        interpret=use_interpret() if interpret is None else interpret,
    )(idx.astype(jnp.int32), w3)
    return out.reshape(S, D)


def embedding_onehot(idx, weight, block_tokens=128, interpret=None):
    """Gather as one-hot @ weight on the MXU (weight resident in VMEM;
    best for small vocab)."""
    S = idx.shape[0]
    V, D = weight.shape
    idx2 = idx.astype(jnp.int32).reshape(S, 1)

    def kernel(idx_ref, w_ref, o_ref):
        rows = o_ref.shape[0]
        ids = jax.lax.broadcasted_iota(jnp.int32, (rows, V), 1)
        oh = (idx_ref[...] == ids).astype(w_ref.dtype)
        o_ref[...] = jnp.dot(oh, w_ref[...],
                             preferred_element_type=jnp.float32
                             ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, D), weight.dtype),
        grid=(cdiv(S, block_tokens),),
        in_specs=[
            pl.BlockSpec((block_tokens, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_tokens, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(idx2, weight)


def embedding_ref(idx, weight):
    return jnp.take(weight, idx, axis=0)


_VARIANTS = [
    ("prefetch_f32", embedding_prefetch, jnp.float32),
    ("prefetch_bf16", embedding_prefetch, jnp.bfloat16),
    ("dma_f32", embedding_dma, jnp.float32),
    ("dma_bf16", embedding_dma, jnp.bfloat16),
    ("onehot_f32", embedding_onehot, jnp.float32),
    ("onehot_bf16", embedding_onehot, jnp.bfloat16),
]

for _sfx, _impl, _dt in _VARIANTS:
    def _fn(idx, weight, _impl=_impl, _dt=_dt, **kw):
        return _impl(idx, weight.astype(_dt), **kw)
    register("embedding", f"embedding_{_sfx}", ref=embedding_ref)(_fn)
