"""RMS norm: per-row root-mean-square normalization.

Reference: kernels/rms-norm/rms_norm.cu:54-334 — 9 variants
rms_norm_{f32,f32x4,f16_f16,f16x2_f16,f16x8_f16,f16x8_f32,f16x8_pack_f16,
f16x8_pack_f32,f16_f32} with scalar gain g. Same per-row grid + accumulator
dtype structure as layer_norm (see ops/layernorm.py for TPU design notes).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import (LANES, cdiv, kernel_dtype, min_sublanes,
                          round_up, to_kernel_dtype, use_interpret)
from tpukern.core.registry import register
from tpukern.ops.layernorm import _pad_cols0


def rms_norm(x, g=1.0, eps=1e-5, acc_dtype=jnp.float32, block_rows=None,
             interpret=None):
    """y = x / sqrt(mean(x^2) + eps) * g, per row. g scalar or (K,)."""
    orig_dtype = x.dtype
    x = to_kernel_dtype(x)
    acc_dtype = kernel_dtype(acc_dtype)
    x, K = _pad_cols0(x)
    S, Kp = x.shape
    br = block_rows or min_sublanes(x.dtype)
    br = min(br, round_up(S, min_sublanes(x.dtype)))
    vec_affine = hasattr(g, "shape") and getattr(g, "ndim", 0) >= 1
    if vec_affine:
        g2 = jnp.pad(jnp.asarray(g).reshape(1, -1), ((0, 0), (0, Kp - K)))

    def kernel(*refs):
        if vec_affine:
            x_ref, g_ref, o_ref = refs
        else:
            x_ref, o_ref = refs
        # f32 arithmetic; low-precision acc variants round the row stat
        # through acc_dtype (see layernorm.py for the Mosaic rationale)
        xa = x_ref[...].astype(jnp.float32)
        ms = jnp.sum(xa * xa, axis=-1, keepdims=True) / K
        if acc_dtype != jnp.float32:
            ms = ms.astype(acc_dtype).astype(jnp.float32)
        inv = jax.lax.rsqrt(ms + eps)
        y = xa * inv
        if vec_affine:
            y = y * g_ref[...].astype(jnp.float32)
        else:
            y = y * g
        o_ref[...] = y.astype(o_ref.dtype)

    in_specs = [pl.BlockSpec((br, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    args = [x]
    if vec_affine:
        in_specs.append(pl.BlockSpec((1, Kp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(g2)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, Kp), x.dtype),
        grid=(cdiv(S, br),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, Kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(*args)
    return out[:, :K].astype(orig_dtype)


def rms_norm_ref(x, g=1.0, eps=1e-5):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps) * jnp.asarray(g, jnp.float32)).astype(x.dtype)


_VARIANTS = [
    ("f32_r8", jnp.float32, jnp.float32, None),
    ("f32_r64", jnp.float32, jnp.float32, 64),
    ("bf16_bf16_r16", jnp.bfloat16, jnp.bfloat16, None),
    ("bf16_f32_r16", jnp.bfloat16, jnp.float32, None),
    ("bf16_f32_r128", jnp.bfloat16, jnp.float32, 128),
    ("f16_f16_r16", jnp.float16, jnp.float16, None),
    ("f16_f32_r16", jnp.float16, jnp.float32, None),
    ("f16_f32_r128", jnp.float16, jnp.float32, 128),
    ("bf16_f32_r512", jnp.bfloat16, jnp.float32, 512),
]

for _sfx, _in, _acc, _br in _VARIANTS:
    def _fn(x, g=1.0, _in=_in, _acc=_acc, _br=_br, **kw):
        return rms_norm(x.astype(_in), g, acc_dtype=_acc, block_rows=_br, **kw)
    register("rms_norm", f"rms_norm_{_sfx}", ref=rms_norm_ref)(_fn)
