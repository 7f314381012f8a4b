"""Full-array reductions: the block_all_reduce dtype/accumulator matrix.

Reference: kernels/reduce/block_all_reduce.cu — 20 bound variants of
block_all_reduce_sum over {f32,f16,bf16,fp8(e4m3,e5m2),i8} x packing x
accumulator dtype, built from warp shuffle reduces (:30-38) + a two-level
block reduce with a final atomicAdd (:42-62).

TPU design: no cross-block atomics exist; instead a single sequential grid
axis streams row blocks through VMEM while a PER-LANE (1,128) vector
accumulator lives in VMEM scratch — the VPU-native analog of the
reference's two-level reduce: rows collapse into lanes every block (level
1), lanes collapse once at the end (level 2, the atomicAdd stand-in). The
warp-shuffle tree maps to the VPU's native cross-sublane `jnp.sum`.

Variant axes = input dtype x accumulator dtype x block height, mirroring
the reference's dtype x packing matrix. f16/fp8 are storage-only on TPU
(core.config.kernel_dtype): those variants round inputs through the
declared dtype and accumulate in f32 (v5e has no f16 ALU/fp8 compute).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import (LANES, as_rows, cdiv, kernel_dtype, round_up,
                          to_kernel_dtype, use_interpret)
from tpukern.core.registry import register


def _padded_rows(x, block_rows, fill=0):
    """as_rows + pad rows to a block multiple (reductions must not see the
    undefined out-of-bounds block padding Pallas would otherwise supply)."""
    x2 = as_rows(x)
    rows = x2.shape[0]
    rp = round_up(rows, block_rows)
    if rp != rows:
        x2 = jnp.pad(x2, ((0, rp - rows), (0, 0)), constant_values=fill)
    return x2


def _reduce_all(x, *, mode: str, acc_dtype, block_rows: int, interpret=None):
    """Reduce every element of x to a scalar (sum or max)."""
    acc_dtype = jnp.dtype(acc_dtype)
    kdt = kernel_dtype(acc_dtype)
    x = to_kernel_dtype(x)

    if mode == "sum":
        fill, init = 0, 0
        combine = lambda a, b: a + b
        block_red = lambda b: jnp.sum(b, axis=0, keepdims=True)
        lane_red = jnp.sum
    else:
        # pad in the INPUT dtype's domain, init in the accumulator's
        fill = (float(jnp.finfo(x.dtype).min)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else int(jnp.iinfo(x.dtype).min))
        init = (float(jnp.finfo(kdt).min)
                if jnp.issubdtype(kdt, jnp.floating)
                else int(jnp.iinfo(kdt).min))
        combine = jnp.maximum
        block_red = lambda b: jnp.max(b, axis=0, keepdims=True)
        lane_red = jnp.max

    x2 = _padded_rows(x, block_rows, fill=fill)
    grid = (x2.shape[0] // block_rows,)

    def kernel(x_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.full_like(acc_ref, init)

        part = block_red(x_ref[...].astype(kdt))          # (1, LANES)
        acc_ref[...] = combine(acc_ref[...], part)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = jnp.full_like(o_ref, lane_red(acc_ref[...]))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, LANES), kdt),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, LANES), kdt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(x2)
    return out[0, 0].astype(acc_dtype)


def sum_all(x, acc_dtype=jnp.float32, block_rows=256, **kw):
    return _reduce_all(x, mode="sum", acc_dtype=acc_dtype,
                       block_rows=block_rows, **kw)


def max_all(x, acc_dtype=jnp.float32, block_rows=256, **kw):
    return _reduce_all(x, mode="max", acc_dtype=acc_dtype,
                       block_rows=block_rows, **kw)


def _ref_sum(x, acc_dtype):
    return jnp.sum(to_kernel_dtype(x).astype(acc_dtype))


def _ref_max(x, acc_dtype):
    return jnp.max(to_kernel_dtype(x).astype(acc_dtype))


# (variant suffix, in dtype, acc dtype, block rows) — the 20-variant matrix,
# mirroring block_all_reduce.cu's dispatch table (:699-768). f16/fp8 rows
# are storage-dtype variants (see module docstring).
_SUM_VARIANTS = [
    ("f32_f32_r8", jnp.float32, jnp.float32, 8),
    ("f32_f32_r64", jnp.float32, jnp.float32, 64),
    ("f32_f32_r256", jnp.float32, jnp.float32, 256),
    ("bf16_bf16_r16", jnp.bfloat16, jnp.bfloat16, 16),
    ("bf16_f32_r16", jnp.bfloat16, jnp.float32, 16),
    ("bf16_f32_r128", jnp.bfloat16, jnp.float32, 128),
    ("bf16_f32_r512", jnp.bfloat16, jnp.float32, 512),
    ("f16_f16_r16", jnp.float16, jnp.float16, 16),
    ("f16_f32_r16", jnp.float16, jnp.float32, 16),
    ("f16_f32_r128", jnp.float16, jnp.float32, 128),
    ("i8_i32_r32", jnp.int8, jnp.int32, 32),
    ("i8_i32_r256", jnp.int8, jnp.int32, 256),
    ("fp8e4m3_f16_r32", jnp.float8_e4m3fn, jnp.float16, 32),
    ("fp8e4m3_f32_r32", jnp.float8_e4m3fn, jnp.float32, 32),
    ("fp8e5m2_f16_r32", jnp.float8_e5m2, jnp.float16, 32),
    ("fp8e5m2_f32_r32", jnp.float8_e5m2, jnp.float32, 32),
]

_MAX_VARIANTS = [
    ("f32_f32_r64", jnp.float32, jnp.float32, 64),
    ("bf16_f32_r128", jnp.bfloat16, jnp.float32, 128),
    ("f16_f32_r128", jnp.float16, jnp.float32, 128),
    ("i8_i32_r256", jnp.int8, jnp.int32, 256),
]

for _sfx, _in, _acc, _br in _SUM_VARIANTS:
    def _fn(x, _in=_in, _acc=_acc, _br=_br, **kw):
        return sum_all(x.astype(_in), acc_dtype=_acc, block_rows=_br, **kw)
    register("reduce", f"sum_{_sfx}",
             ref=lambda x, _acc=_acc: _ref_sum(x, _acc),
             tags=("storage-only",) if "fp8" in _sfx or "f16_" in _sfx else ())(_fn)

for _sfx, _in, _acc, _br in _MAX_VARIANTS:
    def _fn(x, _in=_in, _acc=_acc, _br=_br, **kw):
        return max_all(x.astype(_in), acc_dtype=_acc, block_rows=_br, **kw)
    register("reduce", f"max_{_sfx}",
             ref=lambda x, _acc=_acc: _ref_max(x, _acc))(_fn)
