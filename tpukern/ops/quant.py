"""Quantization kernels: int8 per-row quantize/dequantize with on-chip PRNG
stochastic rounding.

Reference context: the reference's dtype breadth (int8/fp8 rows of
kernels/reduce/block_all_reduce.cu, int8 tensor-core paths) without a
dedicated quantization op. On TPU the serving-relevant op IS quantization
(int8 KV caches halve decode DMA bandwidth — see ops/paged_attention.py),
so it gets a first-class family here, built on the TPU-native PRNG
(pltpu.prng_seed / prng_random_bits / stochastic_round).

Layout: per-row scales (rows on sublanes, features on lanes) — the VPU
reduces each row's absmax in one pass.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import LANES, cdiv, min_sublanes, round_up, use_interpret
from tpukern.core.registry import register


def quantize_int8(x, seed=0, stochastic=False, block_rows=256,
                  interpret=None):
    """Per-row symmetric int8 quantization of a 2-D f32/bf16 array.

    Returns (values int8 (S, K), scales f32 (S,)).
    """
    S, K = x.shape
    Kp = round_up(K, LANES)
    if Kp != K:
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
    br = min(block_rows, round_up(S, min_sublanes(jnp.int8)))

    def kernel(seed_ref, x_ref, v_ref, s_ref):
        if stochastic:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        xf = x_ref[...].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
        scaled = xf / scale
        if stochastic:
            # pltpu.stochastic_round only targets bf16/fp8; int8 stochastic
            # rounding is floor(x + u), u ~ U[0,1) from the on-chip PRNG
            bits = pltpu.prng_random_bits(scaled.shape)
            # Mosaic cannot cast uint32->f32 (and shifts sign-extend):
            # mask to the low 23 bits via an int32 bitcast for u ~ U[0,1)
            bits23 = jnp.bitwise_and(pltpu.bitcast(bits, jnp.int32),
                                     jnp.int32(0x7FFFFF))
            u = bits23.astype(jnp.float32) * (1.0 / 8388608.0)
            v_ref[...] = jnp.clip(jnp.floor(scaled + u),
                                  -128, 127).astype(jnp.int8)
        else:
            v_ref[...] = jnp.round(scaled).astype(jnp.int8)
        s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)

    values, scales = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, Kp), jnp.int8),
                   jax.ShapeDtypeStruct((S, LANES), jnp.float32)),
        grid=(cdiv(S, br),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((br, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((br, Kp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((br, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(jnp.asarray([seed], jnp.int32), x)
    return values[:, :K], scales[:, 0]


def dequantize_int8(values, scales, out_dtype=jnp.float32, block_rows=256,
                    interpret=None):
    """Inverse of quantize_int8."""
    S, K = values.shape
    Kp = round_up(K, LANES)
    if Kp != K:
        values = jnp.pad(values, ((0, 0), (0, Kp - K)))
    br = min(block_rows, round_up(S, min_sublanes(jnp.int8)))
    scales2 = jnp.broadcast_to(scales[:, None], (S, LANES))

    def kernel(v_ref, s_ref, o_ref):
        o_ref[...] = (v_ref[...].astype(jnp.float32)
                      * s_ref[:, :1]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, Kp), out_dtype),
        grid=(cdiv(S, br),),
        in_specs=[
            pl.BlockSpec((br, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, Kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(values, scales2)
    return out[:, :K]


FP8_MAX = 448.0  # float8_e4m3fn largest normal


def quantize_fp8(x, block_rows=256, interpret=None):
    """Per-row scaled float8_e4m3fn quantization of a 2-D f32/bf16 array
    (the KV-cache storage tier below int8: same 1 byte/value, but a
    tapered-precision mantissa instead of uniform steps).

    Returns (values e4m3 (S, K), scales f32 (S,)).
    """
    S, K = x.shape
    Kp = round_up(K, LANES)
    if Kp != K:
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
    br = min(block_rows, round_up(S, min_sublanes(jnp.int8)))

    def kernel(x_ref, v_ref, s_ref):
        xf = x_ref[...].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.where(absmax == 0.0, 1.0, absmax / FP8_MAX)
        v_ref[...] = (xf / scale).astype(v_ref.dtype)
        s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)

    values, scales = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, Kp), jnp.float8_e4m3fn),
                   jax.ShapeDtypeStruct((S, LANES), jnp.float32)),
        grid=(cdiv(S, br),),
        in_specs=[pl.BlockSpec((br, Kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((br, Kp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((br, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(x)
    return values[:, :K], scales[:, 0]


def quantize_fp8_ref(x):
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / FP8_MAX)
    return (xf / scale).astype(jnp.float8_e4m3fn), scale[:, 0]


def quantize_ref(x):
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    return jnp.round(xf / scale).astype(jnp.int8), scale[:, 0]


register("quant", "quantize_int8",
         ref=lambda x, **kw: quantize_ref(x))(
    lambda x, **kw: quantize_int8(x, **kw))
register("quant", "quantize_int8_stochastic",
         ref=lambda x, **kw: quantize_ref(x),
         tags=("tpu-only",))(  # pltpu PRNG has no interpret-mode impl
    lambda x, **kw: quantize_int8(x, stochastic=True, **kw))
register("quant", "dequantize_int8", ref=None)(
    lambda v, s, **kw: dequantize_int8(v, s, **kw))
register("quant", "quantize_fp8",
         ref=lambda x, **kw: quantize_fp8_ref(x))(
    lambda x, **kw: quantize_fp8(x, **kw))
