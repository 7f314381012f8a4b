"""FlashAttention-2 backward: dQ and dK/dV Pallas kernels.

The reference library is forward-only; training frameworks need the
backward. Standard FA-2 backward structure (pallas_guide.md / boom guide
§7): save (q, k, v, o, lse) residuals, precompute di = sum(o * do, -1)
once, then two kernels with opposite iteration patterns:

- dQ:   for each Q block, stream KV blocks  (grid ..., qi, ki)
- dK/dV: for each KV block, stream Q blocks (grid ..., ki, qi)

Both recompute p = exp(q k^T * scale - lse) from the saved lse (no S^2
matrix was ever stored), and use ds = p * (dp - di) * scale. Gradients
accumulate in f32 output blocks (the accumulate-in-output design measured
fastest for the GEMM ladder — see ops/matmul.py).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import cdiv, use_interpret

NEG_BIG = -0.7 * 3.4e38


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, *,
               scale, causal, block_q, block_k):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    run = (qi + 1) * block_q - 1 >= ki * block_k if causal else True

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)
        if causal:
            rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    + qi * block_q)
            cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    + ki * block_k)
            p = jnp.where(cols <= rows, p, 0.0)

        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - di) * scale).astype(k.dtype)
        dq_ref[0, 0] += jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                dk_ref, dv_ref, *, scale, causal, block_q, block_k):
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    run = (qi + 1) * block_q - 1 >= ki * block_k if causal else True

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1].reshape(1, -1)
        di = di_ref[0, 0][:, :1].reshape(1, -1)

        # (bk, bq) = k q^T
        s_t = jax.lax.dot_general(
            k, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p_t = jnp.exp(s_t - lse)
        if causal:
            kv_rows = (jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
                       + ki * block_k)
            q_cols = (jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 1)
                      + qi * block_q)
            p_t = jnp.where(kv_rows <= q_cols, p_t, 0.0)

        dv_ref[0, 0] += jax.lax.dot_general(
            p_t.astype(do_ref.dtype), do_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dp^T = v do^T  (bk, bq)
        dp_t = jax.lax.dot_general(
            v.astype(jnp.float32), do,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds_t = (p_t * (dp_t - di) * scale).astype(q.dtype)
        dk_ref[0, 0] += jax.lax.dot_general(
            ds_t, q, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def flash_attention_bwd(q, k, v, o, lse, do, *, causal=False, sm_scale=None,
                        block_q=256, block_k=512, interpret=None):
    """dQ, dK, dV from saved residuals. Hq == Hkv here; GQA grouping is
    handled by the caller (sum dk/dv over the query-head group)."""
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    bq = min(block_q, Sq)
    bk = min(block_k, Skv)
    interp = use_interpret() if interpret is None else interpret

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    # 8-wide trailing dim for per-row stats (Mosaic block tiling rule)
    lse8 = jnp.broadcast_to(lse[..., None], (*lse.shape, 8))
    di8 = jnp.broadcast_to(di[..., None], (*di.shape, 8))

    def spec4(bs, idx):
        return pl.BlockSpec((1, 1, bs, D), idx, memory_space=pltpu.VMEM)

    def spec3(bs, idx):
        return pl.BlockSpec((1, 1, bs, 8),
                            lambda *a, _f=idx: (*_f(*a), 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=sm_scale, causal=causal,
                          block_q=bq, block_k=bk),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, D), jnp.float32),
        grid=(B, H, cdiv(Sq, bq), cdiv(Skv, bk)),
        in_specs=[
            spec4(bq, lambda b, h, i, j: (b, h, i, 0)),   # q
            spec4(bk, lambda b, h, i, j: (b, h, j, 0)),   # k
            spec4(bk, lambda b, h, i, j: (b, h, j, 0)),   # v
            spec4(bq, lambda b, h, i, j: (b, h, i, 0)),   # do
            spec3(bq, lambda b, h, i, j: (b, h, i)),      # lse
            spec3(bq, lambda b, h, i, j: (b, h, i)),      # di
        ],
        out_specs=spec4(bq, lambda b, h, i, j: (b, h, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interp,
    )(q, k, v, do, lse8, di8)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=sm_scale, causal=causal,
                          block_q=bq, block_k=bk),
        out_shape=(jax.ShapeDtypeStruct((B, H, Skv, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, Skv, D), jnp.float32)),
        grid=(B, H, cdiv(Skv, bk), cdiv(Sq, bq)),
        in_specs=[
            spec4(bq, lambda b, h, i, j: (b, h, j, 0)),   # q
            spec4(bk, lambda b, h, i, j: (b, h, i, 0)),   # k
            spec4(bk, lambda b, h, i, j: (b, h, i, 0)),   # v
            spec4(bq, lambda b, h, i, j: (b, h, j, 0)),   # do
            spec3(bq, lambda b, h, i, j: (b, h, j)),      # lse
            spec3(bq, lambda b, h, i, j: (b, h, j)),      # di
        ],
        out_specs=(spec4(bk, lambda b, h, i, j: (b, h, i, 0)),
                   spec4(bk, lambda b, h, i, j: (b, h, i, 0))),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interp,
    )(q, k, v, do, lse8, di8)

    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)
