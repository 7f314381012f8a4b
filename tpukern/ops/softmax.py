"""Softmax suite: safe per-token, online (in-kernel and grid-streamed), global.

Reference: kernels/softmax/softmax.cu —
- per-token safe softmax (`*_per_token` variants, dispatch :429-581, one
  block per row, warp reduce for max/sum),
- online softmax (`online_safe_softmax_*`, :315-346, the arXiv 1805.02867
  single-pass (max, denominator) recurrence),
- grid-level global softmax with atomic + fence (:103-150) — no TPU analog
  for the atomic/fence trick, rebuilt as composed reduction kernels.

TPU design notes: rows map to sublanes, the hidden dim to lanes. All softmax
statistics accumulate in f32 regardless of input dtype (matching the
reference's `*_f16_f32` accumulator convention). Padding uses a large
negative finite value, not -inf, so exp() of fully-padded slots is exactly 0
without NaN risk.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import (LANES, cdiv, min_sublanes, round_up,
                          to_kernel_dtype, use_interpret)
from tpukern.core.registry import register
from tpukern.ops import reduce as _reduce
from tpukern.ops._ew import ew_call

NEG_BIG = -1e30


def _pad_cols(x, mult=LANES, fill=NEG_BIG):
    S, H = x.shape
    Hp = round_up(H, mult)
    if Hp != H:
        x = jnp.pad(x, ((0, 0), (0, Hp - H)), constant_values=fill)
    return x, H


def softmax_per_token(x, block_rows=None, interpret=None):
    """Safe softmax along the last dim of a 2-D array; full row in VMEM."""
    orig_dtype = x.dtype
    x = to_kernel_dtype(x)
    x, H = _pad_cols(x)
    S, Hp = x.shape
    br = block_rows or min_sublanes(x.dtype)
    br = min(br, round_up(S, min_sublanes(x.dtype)))

    def kernel(x_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        m = jnp.max(xf, axis=-1, keepdims=True)
        e = jnp.exp(xf - m)
        d = jnp.sum(e, axis=-1, keepdims=True)
        o_ref[...] = (e / d).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, Hp), x.dtype),
        grid=(cdiv(S, br),),
        in_specs=[pl.BlockSpec((br, Hp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, Hp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(x)
    return out[:, :H].astype(orig_dtype)


def online_softmax_per_token(x, block_rows=None, chunk=LANES, interpret=None):
    """Online-softmax per row: single streaming pass over column chunks
    maintaining the (max, denominator) pair, then a normalize pass.

    The in-kernel analog of online_safe_softmax_f32_per_token
    (softmax.cu:315-346): d_new = d*exp(m-m_new) + sum(exp(c-m_new)).
    """
    orig_dtype = x.dtype
    x = to_kernel_dtype(x)
    x, H = _pad_cols(x, mult=chunk)
    S, Hp = x.shape
    br = block_rows or min_sublanes(x.dtype)
    n_chunks = Hp // chunk

    def kernel(x_ref, o_ref):
        rows = x_ref.shape[0]

        def body(k, carry):
            m, d = carry
            # dynamic-slice the REF (supported) rather than a loaded array
            c = x_ref[:, pl.ds(k * chunk, chunk)].astype(jnp.float32)
            m_new = jnp.maximum(m, jnp.max(c, axis=-1, keepdims=True))
            d = d * jnp.exp(m - m_new) + jnp.sum(jnp.exp(c - m_new),
                                                 axis=-1, keepdims=True)
            return m_new, d

        m0 = jnp.full((rows, 1), NEG_BIG, jnp.float32)
        d0 = jnp.zeros((rows, 1), jnp.float32)
        m, d = jax.lax.fori_loop(0, n_chunks, body, (m0, d0))
        xf = x_ref[...].astype(jnp.float32)
        o_ref[...] = (jnp.exp(xf - m) / d).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, Hp), x.dtype),
        grid=(cdiv(S, br),),
        in_specs=[pl.BlockSpec((br, Hp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, Hp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(x)
    return out[:, :H].astype(orig_dtype)


def online_softmax_grid(x, block_rows=64, block_cols=512, interpret=None):
    """Grid-streamed online softmax: column blocks stream through VMEM while
    per-row (m, d) stats live in VMEM scratch; a second kernel normalizes.

    This is the HBM-streaming analog of the reference's grid-level softmax:
    rows far wider than VMEM are handled without ever holding a full row.
    """
    orig_dtype = x.dtype
    x = to_kernel_dtype(x)
    x, H = _pad_cols(x, mult=LANES)
    S, Hp = x.shape
    interp = use_interpret() if interpret is None else interpret
    br = min(block_rows, round_up(S, min_sublanes(x.dtype)))
    bc = min(block_cols, Hp)
    n_c = cdiv(Hp, bc)

    def stats_kernel(x_ref, m_ref, d_ref, ms_ref, ds_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            ms_ref[...] = jnp.full_like(ms_ref, NEG_BIG)
            ds_ref[...] = jnp.zeros_like(ds_ref)

        xf = x_ref[...].astype(jnp.float32)
        m_prev = ms_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(xf, axis=-1, keepdims=True))
        ds_ref[...] = (ds_ref[...] * jnp.exp(m_prev - m_new)
                       + jnp.sum(jnp.exp(xf - m_new), axis=-1, keepdims=True))
        ms_ref[...] = m_new

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            m_ref[...] = jnp.broadcast_to(ms_ref[...], m_ref.shape)
            d_ref[...] = jnp.broadcast_to(ds_ref[...], d_ref.shape)

    m, d = pl.pallas_call(
        stats_kernel,
        out_shape=(jax.ShapeDtypeStruct((S, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((S, LANES), jnp.float32)),
        grid=(cdiv(S, br), n_c),
        in_specs=[pl.BlockSpec((br, bc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((br, LANES), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((br, LANES), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((br, 1), jnp.float32),
                        pltpu.VMEM((br, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interp,
    )(x)

    def norm_kernel(x_ref, m_ref, d_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        o_ref[...] = (jnp.exp(xf - m_ref[:, :1]) / d_ref[:, :1]).astype(o_ref.dtype)

    out = pl.pallas_call(
        norm_kernel,
        out_shape=jax.ShapeDtypeStruct((S, Hp), x.dtype),
        grid=(cdiv(S, br), n_c),
        in_specs=[pl.BlockSpec((br, bc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((br, LANES), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((br, LANES), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, bc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interp,
    )(x, m, d)
    return out[:, :H].astype(orig_dtype)


def softmax_global(x, **kw):
    """Softmax over the entire tensor (reference softmax_f32 + `total`
    atomic, softmax.cu:103-150), rebuilt as composed reduction kernels.
    The traced m/t scalars enter the elementwise kernels as SMEM operands."""
    m = _reduce.max_all(x, **kw)
    e = ew_call(
        lambda a, m_: jnp.exp(a.astype(jnp.float32) - m_).astype(a.dtype),
        x, scalars=(m,), **kw)
    t = _reduce.sum_all(e, **kw)
    return ew_call(
        lambda a, t_: (a.astype(jnp.float32) / t_).astype(a.dtype),
        e, scalars=(t,), **kw)


def _ref_per_token(x):
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(x.dtype)


def _ref_global(x):
    return jax.nn.softmax(x.astype(jnp.float32).reshape(-1)).reshape(x.shape).astype(x.dtype)


_VARIANTS = [
    ("safe_f32_per_token", softmax_per_token, jnp.float32, {}),
    ("safe_f32_r64_per_token", softmax_per_token, jnp.float32, {"block_rows": 64}),
    ("safe_bf16_per_token", softmax_per_token, jnp.bfloat16, {}),
    ("safe_bf16_r128_per_token", softmax_per_token, jnp.bfloat16, {"block_rows": 128}),
    ("safe_f16_f32_per_token", softmax_per_token, jnp.float16, {}),
    ("online_f32_per_token", online_softmax_per_token, jnp.float32, {}),
    ("online_bf16_per_token", online_softmax_per_token, jnp.bfloat16, {}),
    ("online_f32_grid", online_softmax_grid, jnp.float32, {}),
    ("online_bf16_grid", online_softmax_grid, jnp.bfloat16, {}),
]

for _sfx, _impl, _dt, _kw in _VARIANTS:
    def _fn(x, _impl=_impl, _dt=_dt, _kw=_kw, **kw):
        return _impl(x.astype(_dt), **{**_kw, **kw})
    register("softmax", f"softmax_{_sfx}", ref=_ref_per_token)(_fn)

register("softmax", "softmax_f32_global", ref=_ref_global)(
    lambda x, **kw: softmax_global(x.astype(jnp.float32), **kw))
