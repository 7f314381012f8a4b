"""Blockwise dot product: sum(a * b) with f32 accumulation.

Reference: kernels/dot-product/dot_product.cu:35-153 —
dot_prod_{f32,f32x4,f16,f16x2,f16x8_pack}_f32 (multiply + two-level block
reduce + atomicAdd). Same TPU structure as ops/reduce.py: sequential grid,
SMEM scalar accumulator, VPU block reduce.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import LANES, use_interpret
from tpukern.core.registry import register
from tpukern.ops.reduce import _padded_rows


def dot_prod(a, b, acc_dtype=jnp.float32, block_rows=256, interpret=None):
    from tpukern.core import kernel_dtype, to_kernel_dtype
    acc_dtype = jnp.dtype(acc_dtype)
    kdt = kernel_dtype(acc_dtype)
    a2 = _padded_rows(to_kernel_dtype(a), block_rows)
    b2 = _padded_rows(to_kernel_dtype(b), block_rows)
    grid = (a2.shape[0] // block_rows,)

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        part = jnp.sum(a_ref[...].astype(kdt) * b_ref[...].astype(kdt),
                       axis=0, keepdims=True)       # (1, LANES) per-lane
        acc_ref[...] += part

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = jnp.full_like(o_ref, jnp.sum(acc_ref[...]))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, LANES), kdt),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, LANES), kdt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(a2, b2)
    return out[0, 0].astype(acc_dtype)


def _ref(a, b):
    return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32))


_VARIANTS = [
    ("f32_f32_r8", jnp.float32, 8),
    ("f32_f32_r64", jnp.float32, 64),
    ("bf16_f32_r16", jnp.bfloat16, 16),
    ("bf16_f32_r128", jnp.bfloat16, 128),
    ("f16_f32_r16", jnp.float16, 16),
]

for _sfx, _in, _br in _VARIANTS:
    def _fn(a, b, _in=_in, _br=_br, **kw):
        return dot_prod(a.astype(_in), b.astype(_in), block_rows=_br, **kw)
    register("dot_product", f"dot_{_sfx}", ref=_ref)(_fn)
