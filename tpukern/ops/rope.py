"""RoPE: rotary position embedding, theta=10000.

Reference: kernels/rope/rope.cu:20-50 — rope_{f32,f32_v2,f32x4_pack}
(pairwise rotate of (x[2i], x[2i+1]); v2 = block-per-token indexing).

TPU design: the lane dimension cannot be cheaply stride-2 gathered, so the
native layout here is the half-split ("NeoX") pairing (x[i], x[i+D/2]) —
both halves are contiguous lane slices. The reference's interleaved layout
is provided as a variant that de/re-interleaves at the XLA level around the
same kernel. Angles are computed in-kernel from broadcasted_iota positions
(f32 transcendentals on the VPU); `*_cached` variants take precomputed
cos/sin tables instead (the production pattern).
"""

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import cdiv, min_sublanes, round_up, use_interpret
from tpukern.core.registry import register

_LOG_THETA = math.log(10000.0)


def rope(x, block_rows=None, interpret=None):
    """Half-split RoPE on (S, D): rotate (x[:, :D/2], x[:, D/2:]) by
    position-dependent angles. D must be even and D/2 a lane multiple for
    peak efficiency (any even D works, padded internally)."""
    S, D = x.shape
    assert D % 2 == 0, "RoPE needs even head dim"
    half = D // 2
    br = block_rows or min_sublanes(x.dtype)
    br = min(br, round_up(S, min_sublanes(x.dtype)))

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        rows, d = x_ref.shape
        pos = (jax.lax.broadcasted_iota(jnp.int32, (rows, half), 0)
               + i * rows).astype(jnp.float32)
        j = jax.lax.broadcasted_iota(
            jnp.int32, (rows, half), 1).astype(jnp.float32)
        freq = jnp.exp(j * (-2.0 * _LOG_THETA / D))
        ang = pos * freq
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        xf = x_ref[...].astype(jnp.float32)
        x1, x2 = xf[:, :half], xf[:, half:]
        o_ref[...] = jnp.concatenate(
            [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
        ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, D), x.dtype),
        grid=(cdiv(S, br),),
        in_specs=[pl.BlockSpec((br, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(x)


def rope_batched(x, seq_len, sign=1.0, block_rows=None, interpret=None):
    """RoPE over flattened (N*seq_len, D) rows: position = row % seq_len.

    Lets (B, H, S, D) tensors be rotated in ONE kernel call after a free
    reshape, instead of vmapping per (b, h). sign=-1 applies the inverse
    rotation (used as the custom-VJP backward).
    """
    R, D = x.shape
    assert D % 2 == 0 and R % seq_len == 0
    half = D // 2
    br = block_rows or min_sublanes(x.dtype)
    br = min(br, round_up(R, min_sublanes(x.dtype)))

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        rows = x_ref.shape[0]
        pos = ((jax.lax.broadcasted_iota(jnp.int32, (rows, half), 0)
                + i * rows) % seq_len).astype(jnp.float32)
        j = jax.lax.broadcasted_iota(
            jnp.int32, (rows, half), 1).astype(jnp.float32)
        freq = jnp.exp(j * (-2.0 * _LOG_THETA / D))
        ang = pos * freq
        cos, sin = jnp.cos(ang), sign * jnp.sin(ang)
        xf = x_ref[...].astype(jnp.float32)
        x1, x2 = xf[:, :half], xf[:, half:]
        o_ref[...] = jnp.concatenate(
            [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
        ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, D), x.dtype),
        grid=(cdiv(R, br),),
        in_specs=[pl.BlockSpec((br, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(x)


def rope_cached(x, cos, sin, block_rows=None, interpret=None):
    """Half-split RoPE with precomputed (S, D/2) cos/sin tables."""
    S, D = x.shape
    half = D // 2
    br = block_rows or min_sublanes(x.dtype)
    br = min(br, round_up(S, min_sublanes(x.dtype)))

    def kernel(x_ref, c_ref, s_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        x1, x2 = xf[:, :half], xf[:, half:]
        cos, sin = c_ref[...], s_ref[...]
        o_ref[...] = jnp.concatenate(
            [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
        ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, D), x.dtype),
        grid=(cdiv(S, br),),
        in_specs=[
            pl.BlockSpec((br, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(x, cos.astype(jnp.float32), sin.astype(jnp.float32))


def rope_interleaved(x, **kw):
    """Reference-layout RoPE: pairs are (x[2i], x[2i+1]) (rope.cu:20-33).
    De-interleave at the XLA level, rotate with the half-split kernel,
    re-interleave."""
    S, D = x.shape
    xs = x.reshape(S, D // 2, 2)
    half_split = jnp.concatenate([xs[:, :, 0], xs[:, :, 1]], axis=-1)
    y = rope(half_split, **kw)
    return jnp.stack([y[:, :D // 2], y[:, D // 2:]], axis=-1).reshape(S, D)


def make_cos_sin(S, D, dtype=jnp.float32):
    pos = jnp.arange(S, dtype=jnp.float32)[:, None]
    j = jnp.arange(D // 2, dtype=jnp.float32)[None, :]
    freq = jnp.exp(j * (-2.0 * _LOG_THETA / D))
    ang = pos * freq
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def rope_ref(x):
    """XLA half-split reference."""
    S, D = x.shape
    cos, sin = make_cos_sin(S, D)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[:, :D // 2], xf[:, D // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                           axis=-1).astype(x.dtype)


def rope_interleaved_ref(x):
    S, D = x.shape
    cos, sin = make_cos_sin(S, D)
    xf = x.astype(jnp.float32).reshape(S, D // 2, 2)
    x1, x2 = xf[:, :, 0], xf[:, :, 1]
    return jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                     axis=-1).reshape(S, D).astype(x.dtype)


_VARIANTS = [
    ("f32", rope, jnp.float32, {}, rope_ref),
    ("f32_r64", rope, jnp.float32, {"block_rows": 64}, rope_ref),
    ("bf16", rope, jnp.bfloat16, {}, rope_ref),
    ("bf16_r128", rope, jnp.bfloat16, {"block_rows": 128}, rope_ref),
    ("f32_interleaved", rope_interleaved, jnp.float32, {}, rope_interleaved_ref),
]

for _sfx, _impl, _dt, _kw, _ref in _VARIANTS:
    def _fn(x, _impl=_impl, _dt=_dt, _kw=_kw, **kw):
        return _impl(x.astype(_dt), **{**_kw, **kw})
    register("rope", f"rope_{_sfx}", ref=_ref)(_fn)


def _cached_fn(x, **kw):
    S, D = x.shape
    cos, sin = make_cos_sin(S, D)
    return rope_cached(x, cos, sin, **kw)

register("rope", "rope_f32_cached", ref=rope_ref)(
    lambda x, **kw: _cached_fn(x.astype(jnp.float32), **kw))
register("rope", "rope_bf16_cached", ref=rope_ref)(
    lambda x, **kw: _cached_fn(x.astype(jnp.bfloat16), **kw))
