"""Layer norm: per-row mean/variance normalization.

Reference: kernels/layer-norm/layer_norm.cu:34-374 — 8 variants
layer_norm_{f32,f32x4,f16_f16,f16x2_f16,f16x8_f16,f16x8_pack_f16,
f16x8_pack_f32,f16_f32} over a per-row grid (grid(N), block(K/vec)) with
two-level block reduces for mean/var. gamma/beta are scalars in the
reference harness; a vector-affine variant is also provided here since that
is the real-world op.

TPU design: rows on sublanes, K on lanes; one VPU row-reduction per block,
stats in the accumulator dtype (variant axis, mirroring the reference's
`_f16` vs `_f32` accumulator split). E[x^2]-E[x]^2 form keeps zero-padding
of the lane dim harmless.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import (LANES, cdiv, kernel_dtype, min_sublanes,
                          round_up, to_kernel_dtype, use_interpret)
from tpukern.core.registry import register


def _pad_cols0(x):
    S, K = x.shape
    Kp = round_up(K, LANES)
    if Kp != K:
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
    return x, K


def layer_norm(x, g=1.0, b=0.0, eps=1e-5, acc_dtype=jnp.float32,
               block_rows=None, interpret=None):
    """y = (x - mean) / sqrt(var + eps) * g + b, per row.

    g/b may be scalars (reference parity) or (K,) vectors.
    """
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
        b2 = jnp.pad(jnp.asarray(b).reshape(1, -1), ((0, 0), (0, Kp - K)))

    def kernel(*refs):
        if vec_affine:
            x_ref, g_ref, b_ref, o_ref = refs
        else:
            x_ref, o_ref = refs
        # arithmetic in f32 (Mosaic has no bf16 rsqrt/cmpf); low-precision
        # accumulator variants round the row stats through acc_dtype,
        # matching the reference's *_f16-accumulator semantics
        xa = x_ref[...].astype(jnp.float32)
        mean = jnp.sum(xa, axis=-1, keepdims=True) / K
        var = jnp.sum(xa * xa, axis=-1, keepdims=True) / K - mean * mean
        if acc_dtype != jnp.float32:
            mean = mean.astype(acc_dtype).astype(jnp.float32)
            var = var.astype(acc_dtype).astype(jnp.float32)
        inv = jax.lax.rsqrt(var + eps)
        y = (xa - mean) * inv
        if vec_affine:
            y = (y * g_ref[...].astype(jnp.float32)
                 + b_ref[...].astype(jnp.float32))
        else:
            y = y * g + b
        o_ref[...] = y.astype(o_ref.dtype)

    in_specs = [pl.BlockSpec((br, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    args = [x]
    if vec_affine:
        in_specs += [pl.BlockSpec((1, Kp), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [g2, b2]

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


def layer_norm_ref(x, g=1.0, b=0.0, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    g = jnp.asarray(g, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


_VARIANTS = [
    ("f32_r8", jnp.float32, jnp.float32, None),
    ("f32_r64", jnp.float32, jnp.float32, 64),
    ("bf16_bf16_r16", jnp.bfloat16, jnp.bfloat16, None),
    ("bf16_f32_r16", jnp.bfloat16, jnp.float32, None),
    ("bf16_f32_r128", jnp.bfloat16, jnp.float32, 128),
    ("f16_f16_r16", jnp.float16, jnp.float16, None),
    ("f16_f32_r16", jnp.float16, jnp.float32, None),
    ("f16_f32_r128", jnp.float16, jnp.float32, 128),
]

for _sfx, _in, _acc, _br in _VARIANTS:
    def _fn(x, g=1.0, b=0.0, _in=_in, _acc=_acc, _br=_br, **kw):
        return layer_norm(x.astype(_in), g, b, acc_dtype=_acc,
                          block_rows=_br, **kw)
    register("layer_norm", f"layer_norm_{_sfx}", ref=layer_norm_ref)(_fn)
