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
LOG2E = math.log2(math.e)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, *rest,
               scale, causal, block_q, block_k, kv_len=None, use_exp2=True,
               window=None, softcap=None, has_segments=False):
    if has_segments:
        qseg_ref, kseg_ref, dq_ref = rest
    else:
        (dq_ref,) = rest
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    run = (qi + 1) * block_q - 1 >= ki * block_k if causal else True
    if window is not None:
        # block entirely below the band's lower edge contributes nothing
        run = jnp.logical_and(
            run, (ki + 1) * block_k - 1 >= qi * block_q - window + 1)
    # f32 tier: true-f32 MXU passes (TPU DEFAULT runs f32 dots via bf16)
    prec = None if use_exp2 else jax.lax.Precision.HIGHEST

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]  # pre-multiplied by log2(e)
        di = di_ref[0, 0][:, :1]

        # p = exp(s*scale - lse), recomputed in log2 space for the
        # half-precision tiers (fast native exp2; see ops/attention.py)
        s_raw = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec) * scale
        if softcap is not None:
            # forward: s_cap = cap*tanh(s_raw/cap); backward chains
            # d(s_cap)/d(s_raw) = 1 - tanh^2 into ds below
            t = jnp.tanh(s_raw * (1.0 / softcap))
            s = softcap * t * (LOG2E if use_exp2 else 1.0)
        else:
            s = s_raw * (LOG2E if use_exp2 else 1.0)
        p = (jnp.exp2 if use_exp2 else jnp.exp)(s - lse)
        if causal or window is not None or has_segments:
            rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    + qi * block_q)
            cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    + ki * block_k)
        if causal:
            p = jnp.where(cols <= rows, p, 0.0)
            if window is not None:
                p = jnp.where(cols >= rows - window + 1, p, 0.0)
        if has_segments:
            qseg = qseg_ref[0, 0].reshape(block_q, 1)
            kseg = kseg_ref[0, 0].reshape(1, block_k)
            # where-select (never multiply): fully-masked segment rows
            # carry lse = -inf, so unselected p entries can be inf/NaN
            p = jnp.where(qseg == kseg, p, 0.0)

        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        ds = p * (dp - di) * scale
        if softcap is not None:
            ds = ds * (1.0 - t * t)
        if kv_len is not None:
            # Undefined tail-block K/V columns: mask ds AFTER all
            # arithmetic (p alone isn't enough — 0 * inf garbage = NaN).
            tcols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                     + ki * block_k)
            ds = jnp.where(tcols < kv_len, ds, 0.0)
        dq_ref[0, 0] += jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, *rest,
                scale, causal, block_q, block_k, q_len=None, use_exp2=True,
                window=None, softcap=None, has_segments=False):
    if has_segments:
        qseg_ref, kseg_ref, dk_ref, dv_ref = rest
    else:
        dk_ref, dv_ref = rest
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    run = (qi + 1) * block_q - 1 >= ki * block_k if causal else True
    if window is not None:
        run = jnp.logical_and(
            run, (ki + 1) * block_k - 1 >= qi * block_q - window + 1)
    prec = None if use_exp2 else jax.lax.Precision.HIGHEST

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1].reshape(1, -1)  # pre-multiplied by log2e
        di = di_ref[0, 0][:, :1].reshape(1, -1)

        # (bk, bq) = k q^T, in log2 space for half-precision tiers
        s_raw = jax.lax.dot_general(
            k, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec) * scale
        if softcap is not None:
            t = jnp.tanh(s_raw * (1.0 / softcap))
            s_t = softcap * t * (LOG2E if use_exp2 else 1.0)
        else:
            s_t = s_raw * (LOG2E if use_exp2 else 1.0)
        p_t = (jnp.exp2 if use_exp2 else jnp.exp)(s_t - lse)
        if causal or q_len is not None or window is not None:
            q_cols = (jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 1)
                      + qi * block_q)
        if causal:
            kv_rows = (jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
                       + ki * block_k)
            p_t = jnp.where(kv_rows <= q_cols, p_t, 0.0)
            if window is not None:
                p_t = jnp.where(kv_rows >= q_cols - window + 1, p_t, 0.0)
        if has_segments:
            kseg = kseg_ref[0, 0].reshape(block_k, 1)
            qseg = qseg_ref[0, 0].reshape(1, block_q)
            p_t = jnp.where(kseg == qseg, p_t, 0.0)
        if q_len is not None:  # undefined tail-block Q columns
            p_t = jnp.where(q_cols < q_len, p_t, 0.0)

        dv_ref[0, 0] += jax.lax.dot_general(
            p_t.astype(do_ref.dtype), do_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        # dp^T = v do^T  (bk, bq)
        dp_t = jax.lax.dot_general(
            v.astype(jnp.float32), do,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        ds_t = p_t * (dp_t - di) * scale
        if softcap is not None:
            ds_t = ds_t * (1.0 - t * t)
        if q_len is not None:
            # mask again AFTER the arithmetic: di/lse carry undefined
            # padding in the tail Q columns and 0 * inf = NaN
            ds_t = jnp.where(q_cols < q_len, ds_t, 0.0)
        dk_ref[0, 0] += jax.lax.dot_general(
            ds_t.astype(q.dtype), q,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)


def _dq_t_kernel(qT_ref, k_ref, v_ref, doT_ref, lse_ref, di_ref, dqT_ref,
                 *, scale, causal, block_q, block_k, kv_len=None,
                 use_exp2=True):
    """Transposed-layout dQ body (D <= 64 fast path): scores and ds live
    as (bk, bq) and dQ accumulates as dq^T = k^T @ ds^T (D, bq) — the
    contraction runs block_k deep and the output block_q wide, so the
    accumulation matmul is full MXU rate where the standard layout's
    ds @ k is half-width at D=64 (same economics as the forward's
    transposed-PV kernel, ops/attention.py)."""
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        dqT_ref[...] = jnp.zeros_like(dqT_ref)

    run = (qi + 1) * block_q - 1 >= ki * block_k if causal else True
    prec = None if use_exp2 else jax.lax.Precision.HIGHEST

    def body(mask_causal):
        qT = qT_ref[0, 0]                 # (D, bq)
        k = k_ref[0, 0]                   # (bk, D)
        v = v_ref[0, 0]
        doT = doT_ref[0, 0].astype(jnp.float32)   # (D, bq)
        lse = lse_ref[0, 0][:1]           # (1, bq) lane rows
        di = di_ref[0, 0][:1]

        sT = jax.lax.dot_general(
            k, qT, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec
        ) * (scale * (LOG2E if use_exp2 else 1.0))     # (bk, bq)
        pT = (jnp.exp2 if use_exp2 else jnp.exp)(sT - lse)
        if mask_causal:
            kv_rows = (jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0)
                       + ki * block_k)
            q_cols = (jax.lax.broadcasted_iota(jnp.int32, sT.shape, 1)
                      + qi * block_q)
            pT = jnp.where(kv_rows <= q_cols, pT, 0.0)

        # dp^T[kv, q] = sum_d v[kv, d] do[q, d]
        dpT = jax.lax.dot_general(
            v.astype(jnp.float32), doT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dsT = pT * (dpT - di) * scale
        if kv_len is not None:
            kv_rows = (jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0)
                       + ki * block_k)
            dsT = jnp.where(kv_rows < kv_len, dsT, 0.0)
        # dq^T[d, q] = sum_kv k[kv, d] ds^T[kv, q]  — full MXU width
        dqT_ref[0, 0] += jax.lax.dot_general(
            k, dsT.astype(k.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    # diagonal specialization (see ops/attention.py): interior causal
    # blocks skip the mask chain via disjoint pl.when regions
    if causal:
        fully = (ki + 1) * block_k - 1 <= qi * block_q

        @pl.when(jnp.logical_and(run, fully))
        def _():
            body(False)

        @pl.when(jnp.logical_and(run, jnp.logical_not(fully)))
        def _():
            body(True)
    else:
        @pl.when(run)
        def _():
            body(False)


def _dkv_t_kernel(qT_ref, k_ref, v_ref, doT_ref, lse_ref, di_ref,
                  dkT_ref, dvT_ref, *, scale, causal, block_q, block_k,
                  q_len=None, use_exp2=True):
    """Transposed-output dK/dV body (D <= 64 fast path): p stays (bq, bk)
    but dK/dV accumulate transposed — dv^T = do^T @ p and
    dk^T = q^T @ ds run block_q-deep contractions with block_k-wide
    outputs (full MXU rate; the standard layout's p^T @ do / ds^T @ q
    have D-wide outputs, half rate at D=64)."""
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _():
        dkT_ref[...] = jnp.zeros_like(dkT_ref)
        dvT_ref[...] = jnp.zeros_like(dvT_ref)

    run = (qi + 1) * block_q - 1 >= ki * block_k if causal else True
    prec = None if use_exp2 else jax.lax.Precision.HIGHEST

    def body(mask_causal):
        qT = qT_ref[0, 0]                 # (D, bq)
        k = k_ref[0, 0]                   # (bk, D)
        v = v_ref[0, 0]
        doT = doT_ref[0, 0].astype(jnp.float32)   # (D, bq)
        lse = lse_ref[0, 0][:, :1]        # (bq, 1) sublane column
        di = di_ref[0, 0][:, :1]

        # s[q, kv] = sum_d q[q, d] k[kv, d] via the transposed q operand
        s = jax.lax.dot_general(
            qT, k, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec
        ) * (scale * (LOG2E if use_exp2 else 1.0))     # (bq, bk)
        p = (jnp.exp2 if use_exp2 else jnp.exp)(s - lse)
        if mask_causal or q_len is not None:
            q_rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                      + qi * block_q)
        if mask_causal:
            kv_cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                       + ki * block_k)
            p = jnp.where(kv_cols <= q_rows, p, 0.0)
        if q_len is not None:
            p = jnp.where(q_rows < q_len, p, 0.0)

        # dv^T[d, kv] = sum_q do[q, d] p[q, kv]  — full MXU width
        dvT_ref[0, 0] += jax.lax.dot_general(
            doT.astype(v.dtype), p.astype(v.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        # dp[q, kv] = sum_d do[q, d] v[kv, d]
        dp = jax.lax.dot_general(
            doT, v.astype(jnp.float32),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        ds = p * (dp - di) * scale
        if q_len is not None:
            ds = jnp.where(q_rows < q_len, ds, 0.0)
        # dk^T[d, kv] = sum_q q[q, d] ds[q, kv]  — full MXU width
        dkT_ref[0, 0] += jax.lax.dot_general(
            qT, ds.astype(qT.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    if causal:
        fully = (ki + 1) * block_k - 1 <= qi * block_q

        @pl.when(jnp.logical_and(run, fully))
        def _():
            body(False)

        @pl.when(jnp.logical_and(run, jnp.logical_not(fully)))
        def _():
            body(True)
    else:
        @pl.when(run)
        def _():
            body(False)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                      dq_ref, dk_ref, dv_ref, *, scale, causal, block_q,
                      block_k, q_len=None, kv_len=None, use_exp2=True,
                      dq_resident=True):
    """One-recompute fused backward: a single grid (B, H, ki, qi)
    computes dK/dV in their revisited output blocks AND accumulates dQ.

    dq_resident=True (D <= 128 at S = 8192): dQ is a whole-sequence f32
    output block that stays VMEM-resident for the entire (ki, qi) loop
    of one (b, h) — its BlockSpec index ignores both inner grid dims, so
    Pallas never flushes it mid-head.

    dq_resident=False (large D, VERDICT r3 item 6): dQ partials — one
    (bq, D) output block PER (ki, qi), laid out as a leading nK axis on
    the dq output and summed by XLA outside the kernel. Every block is
    written exactly once, so no output block is ever revisited. (A
    revisited read-modify-write dq block does NOT work compiled: Pallas
    TPU write-backs an output block when its index changes but does not
    re-fetch it on a later revisit — the accumulator comes back garbage;
    interpret mode models whole arrays and hides this. The partials
    layout is the same idiom splash's fused dkv kernel uses for its dq,
    splash_attention_kernel.py: dq_shape = (kv_seq_len // bkv, *q.shape).)
    Extra traffic is nK * Sq * D * 2 * itemsize bytes per (b, h)
    (partial write + reduce read) against an HBM the otherwise
    compute-bound kernel leaves idle (measured: BENCH_NOTES round 4).

    Why fused: the two-kernel design recomputes the score matrix twice
    (dq pass + dkv pass = 7 matmul passes); splash's fused backward
    recomputes once (5 passes) and measured 1.23x ahead on causal D=128
    (BENCH_NOTES round 3). Here the score space is (bk, bq) as in
    _dkv_kernel; the three accumulation matmuls (dv, dk, dq) all run
    block-deep contractions at full MXU rate. VMEM bound for the
    resident tier: Sq_p * D * 4 bytes (2 MB at D=64, S=8192) — the
    dispatcher gates on that budget and demotes to the revisited tier
    above it."""
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    run = (qi + 1) * block_q - 1 >= ki * block_k if causal else True

    if dq_resident:
        @pl.when(jnp.logical_and(ki == 0, qi == 0))
        def _():
            dq_ref[...] = jnp.zeros_like(dq_ref)
    elif causal:
        # every (ki, qi) owns one dq partial block; causal-skipped steps
        # must still define theirs
        @pl.when(jnp.logical_not(run))
        def _():
            dq_ref[...] = jnp.zeros_like(dq_ref)

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    prec = None if use_exp2 else jax.lax.Precision.HIGHEST

    def body(mask_causal):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1].reshape(1, -1)   # (1, bq), log2-scaled
        di = di_ref[0, 0][:, :1].reshape(1, -1)

        s_t = jax.lax.dot_general(
            k, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec
        ) * (scale * (LOG2E if use_exp2 else 1.0))   # (bk, bq)
        p_t = (jnp.exp2 if use_exp2 else jnp.exp)(s_t - lse)
        need_rows = mask_causal or kv_len is not None
        if mask_causal or q_len is not None:
            q_cols = (jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 1)
                      + qi * block_q)
        if need_rows:
            kv_rows = (jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
                       + ki * block_k)
        if mask_causal:
            p_t = jnp.where(kv_rows <= q_cols, p_t, 0.0)
        if q_len is not None:
            p_t = jnp.where(q_cols < q_len, p_t, 0.0)
        if kv_len is not None:
            # garbage K/V tail rows would otherwise enter dQ via ds^T @ k
            p_t = jnp.where(kv_rows < kv_len, p_t, 0.0)

        dv_ref[0, 0] += jax.lax.dot_general(
            p_t.astype(do_ref.dtype), do_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dp_t = jax.lax.dot_general(
            v.astype(jnp.float32), do,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        ds_t = p_t * (dp_t - di) * scale
        if q_len is not None:
            # di/lse tail columns are undefined: re-mask after arithmetic
            ds_t = jnp.where(q_cols < q_len, ds_t, 0.0)
        if kv_len is not None:
            ds_t = jnp.where(kv_rows < kv_len, ds_t, 0.0)
        dk_ref[0, 0] += jax.lax.dot_general(
            ds_t.astype(q.dtype), q,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        # dq[qi block] += ds^T @ k: bk-deep contraction, (bq, D) output
        dq_contrib = jax.lax.dot_general(
            ds_t.astype(k.dtype), k,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if dq_resident:
            dq_ref[0, 0, pl.ds(qi * block_q, block_q), :] += dq_contrib
        else:
            # this (ki, qi)'s own partial block: single write, no revisit
            dq_ref[0, 0] = dq_contrib.astype(dq_ref.dtype)

    if causal:
        fully = (ki + 1) * block_k - 1 <= qi * block_q

        @pl.when(jnp.logical_and(run, fully))
        def _():
            body(False)

        @pl.when(jnp.logical_and(run, jnp.logical_not(fully)))
        def _():
            body(True)
    else:
        @pl.when(run)
        def _():
            body(False)


# the resident whole-sequence dQ block of the fused backward must fit
# VMEM next to the tiles/intermediates: 4 MB covers D<=128 at S=8192;
# above it (or at D>128, whose wider tiles eat the headroom) the fused
# kernel switches dQ to per-(ki,qi) partials summed outside
FUSED_BWD_DQ_BUDGET = 4 * 2 ** 20

# HBM cap for the non-resident tier's dQ partials tensor
# (nK * B * H * Sq_p * D * itemsize); above it the auto dispatch falls
# back to the two-kernel design rather than materialize multi-GB scratch.
# Scaled to 1/4 of the device's HBM when the backend reports a limit
# (ADVICE r4: a fixed 4 GiB can OOM jobs already near capacity on
# smaller parts), else the 4 GiB v5e-calibrated default (16 GB / 4).
FUSED_BWD_PARTIALS_DEFAULT = 4 * 2 ** 30
_PARTIALS_BUDGET_CACHE = []


def fused_bwd_partials_budget():
    """Resolve the HBM budget for non-resident fused-backward dQ partials
    (cached after the first call). 1/4 of memory_stats()['bytes_limit']
    when the backend exposes it, else FUSED_BWD_PARTIALS_DEFAULT."""
    if not _PARTIALS_BUDGET_CACHE:
        budget = FUSED_BWD_PARTIALS_DEFAULT
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit", 0)
            if limit > 0:
                budget = limit // 4
        except Exception:
            pass  # CPU/interpret backends without memory_stats
        _PARTIALS_BUDGET_CACHE.append(budget)
    return _PARTIALS_BUDGET_CACHE[0]


def _bwd_fused(q, k, v, do, lse8, di8, *, B, H, D, Sq, Skv, Sq_p, Skv_p,
               bq, bk, sm_scale, causal, kv_len, q_len, use_exp2, interp,
               out_dtypes, dq_resident=True):
    """Single-pallas-call fused backward (see _bwd_fused_kernel)."""
    def spec4(bs, idx):
        return pl.BlockSpec((1, 1, bs, D), idx, memory_space=pltpu.VMEM)

    def spec3(bs, idx):
        return pl.BlockSpec((1, 1, bs, 8),
                            lambda *a, _f=idx: (*_f(*a), 0),
                            memory_space=pltpu.VMEM)

    nK = cdiv(Skv_p, bk)
    if dq_resident:
        # dq: whole padded sequence, index ignores ki/qi -> resident
        dq_spec = pl.BlockSpec((1, 1, Sq_p, D),
                               lambda b, h, i, j: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)
        dq_shape = jax.ShapeDtypeStruct((B, H, Sq_p, D), jnp.float32)
    else:
        # dq: one partial block per (ki, qi) on a leading nK axis —
        # every output block written exactly once (splash's fused-dkv
        # idiom); summed over nK by XLA below. Partials carry q.dtype
        # (f32 in = exact f32 partials; bf16 in = bf16, like splash).
        dq_spec = pl.BlockSpec((None, 1, 1, bq, D),
                               lambda b, h, i, j: (i, b, h, j, 0),
                               memory_space=pltpu.VMEM)
        dq_shape = jax.ShapeDtypeStruct((nK, B, H, Sq_p, D), q.dtype)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=sm_scale, causal=causal,
                          block_q=bq, block_k=bk, q_len=q_len,
                          kv_len=kv_len, use_exp2=use_exp2,
                          dq_resident=dq_resident),
        out_shape=(dq_shape,
                   jax.ShapeDtypeStruct((B, H, Skv_p, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, Skv_p, D), jnp.float32)),
        grid=(B, H, nK, cdiv(Sq_p, bq)),
        in_specs=[
            spec4(bq, lambda b, h, i, j: (b, h, j, 0)),   # q
            spec4(bk, lambda b, h, i, j: (b, h, i, 0)),   # k
            spec4(bk, lambda b, h, i, j: (b, h, i, 0)),   # v
            spec4(bq, lambda b, h, i, j: (b, h, j, 0)),   # do
            spec3(bq, lambda b, h, i, j: (b, h, j)),      # lse
            spec3(bq, lambda b, h, i, j: (b, h, j)),      # di
        ],
        out_specs=(
            dq_spec,
            spec4(bk, lambda b, h, i, j: (b, h, i, 0)),
            spec4(bk, lambda b, h, i, j: (b, h, i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
        interpret=interp,
    )(q, k, v, do, lse8, di8)
    if not dq_resident:
        dq = jnp.sum(dq.astype(jnp.float32), axis=0)
    return (dq[:, :, :Sq].astype(out_dtypes[0]),
            dk[:, :, :Skv].astype(out_dtypes[1]),
            dv[:, :, :Skv].astype(out_dtypes[2]))


def flash_attention_bwd(q, k, v, o, lse, do, *, causal=False, sm_scale=None,
                        block_q=None, block_k=None, transposed=None,
                        fused=None, window=None, softcap=None,
                        segment_ids=None, interpret=None):
    """dQ, dK, dV from saved residuals. Hq == Hkv here; GQA grouping is
    handled by the caller (sum dk/dv over the query-head group).
    transposed: None = auto (transposed-layout kernels at D <= 64),
    True/False forces the choice. window/softcap/segment_ids mirror the
    forward's features (ops/attention.py) and run on the standard-layout
    kernels (the transposed twins stay the plain fast path).

    HBM footprint note: the fused default at D > 128 (or Sq*D*4 > 4 MB)
    takes the non-resident dQ tier, which materializes an HBM partials
    tensor of ceil(Skv/bk) * B * H * Sq_padded * D * q.itemsize bytes
    (~1-2 GB at the D=256/512 flagship shapes) plus one XLA reduce pass.
    The auto path caps this at fused_bwd_partials_budget() — 1/4 of
    device HBM when the backend reports it — and falls back to the
    two-kernel design beyond; jobs running near HBM capacity can force
    fused=False to avoid the scratch entirely."""
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    featured_early = (window is not None or softcap is not None
                      or segment_ids is not None)
    fused_explicit = fused is not None
    if fused is None:
        # fused one-recompute kernel (see _bwd_fused_kernel) whenever the
        # caller didn't force a layout or ask for featured masks. D <= 128
        # (at S <= 8192) keeps the whole-sequence dQ block VMEM-resident;
        # above that budget dQ demotes to HBM-revisited per-q-block
        # accumulation, measured 1.36-1.38x ahead of the two-kernel design
        # at both D = 256 and D = 512, causal and not (tools/fa_bwd_tune.py
        # --cases fused256/fused512, BENCH_NOTES round 4).
        fused = not featured_early and transposed is None
    # v5e sweeps (tools/fa_bwd_tune.py, BENCH_NOTES round 3): grid-step
    # overhead dominates small blocks exactly as in the forward — the
    # round-2 (256,512) default left HALF the backward's throughput on
    # the table (44.6 -> 75.9 TFLOPS-equiv at the D=64 flagship,
    # 83.2 -> 123.3 at D=128; the fused kernel adds another ~8% at
    # (512,1024)). (1024,1024)+ fails to compile on the fused path (the
    # resident dQ block eats its share of VMEM) and (1024,2048)+ on the
    # two-kernel path; larger D shrinks blocks to keep the f32 score/ds
    # tiles in budget.
    if block_q is None:
        block_q = (512 if fused
                   else 1024 if D <= 128 else 512 if D <= 256 else 256)
    if block_k is None:
        block_k = 1024 if D <= 256 else 512
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    if window is not None:
        assert causal, "sliding window requires causal=True"
    featured = (window is not None or softcap is not None
                or segment_ids is not None)
    bq = min(block_q, Sq)
    bk = min(block_k, Skv)
    interp = use_interpret() if interpret is None else interpret

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    # half-precision tiers recompute p via exp2; pre-scale lse to log2
    use_exp2 = jnp.dtype(q.dtype) != jnp.float32
    if use_exp2:
        lse = lse * LOG2E
    # 8-wide trailing dim for per-row stats (Mosaic block tiling rule)
    lse8 = jnp.broadcast_to(lse[..., None], (*lse.shape, 8))
    di8 = jnp.broadcast_to(di[..., None], (*di.shape, 8))

    # Zero-pad non-block-multiple sequence lengths (defined tail data) and
    # mask the padded positions in-kernel (kv_len / q_len): see the
    # forward's tail handling in ops/attention.py.
    Sq_p, Skv_p = -(-Sq // bq) * bq, -(-Skv // bk) * bk
    if Sq_p != Sq:
        pad4 = ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0))
        q, do = jnp.pad(q, pad4), jnp.pad(do, pad4)
        lse8, di8 = (jnp.pad(t, pad4) for t in (lse8, di8))
    if Skv_p != Skv:
        pad4 = ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0))
        k, v = jnp.pad(k, pad4), jnp.pad(v, pad4)
    kv_len = Skv if Skv_p != Skv else None
    q_len = Sq if Sq_p != Sq else None

    # packed-sequence masks: pad q/kv segments with DISTINCT sentinels so
    # padded rows and columns never match anything (belt and braces with
    # the q_len/kv_len tail masks)
    has_segments = segment_ids is not None
    if has_segments:
        # (B, n_blocks, 1, bs) so the (1, 1, 1, bs) BlockSpec's trailing
        # dims match the array exactly (Mosaic sublane rule; same layout
        # trick as ops/cross_entropy.py targets)
        q_seg, kv_seg = segment_ids
        q_seg = jnp.pad(q_seg.astype(jnp.int32), ((0, 0), (0, Sq_p - Sq)),
                        constant_values=-1
                        ).reshape(B, Sq_p // bq, 1, bq)
        kv_seg = jnp.pad(kv_seg.astype(jnp.int32),
                         ((0, 0), (0, Skv_p - Skv)), constant_values=-2
                         ).reshape(B, Skv_p // bk, 1, bk)

    def spec4(bs, idx):
        return pl.BlockSpec((1, 1, bs, D), idx, memory_space=pltpu.VMEM)

    def spec3(bs, idx):
        return pl.BlockSpec((1, 1, bs, 8),
                            lambda *a, _f=idx: (*_f(*a), 0),
                            memory_space=pltpu.VMEM)

    def spec_seg(bs, idx):
        return pl.BlockSpec((1, 1, 1, bs),
                            lambda *a, _f=idx: (*_f(*a), 0, 0),
                            memory_space=pltpu.VMEM)

    assert not (fused and featured), \
        "window/softcap/segment_ids need the two-kernel standard layout"
    if fused:
        # whole-sequence dQ block stays VMEM-resident when it fits the
        # budget; otherwise dQ switches to per-(ki,qi) partials summed
        # outside the kernel (see _bwd_fused_kernel). D > 128 always
        # takes the partials tier: its wider k/v/dk/dv tiles eat the
        # VMEM headroom the budget assumes (measured: a 4 MB resident
        # dQ at D=256 S=4096 compiles to 17.2 MB total and OOMs, while
        # the partials tier wins ~1.3x at D=256 anyway).
        dq_resident = D <= 128 and Sq_p * D * 4 <= FUSED_BWD_DQ_BUDGET
        partial_bytes = (cdiv(Skv_p, bk) * B * H * Sq_p * D
                         * jnp.dtype(q.dtype).itemsize)
        if (not dq_resident
                and partial_bytes > fused_bwd_partials_budget()):
            # very long non-resident sequences would materialize a
            # multi-GB partials tensor; the two-kernel design is the
            # honest fallback there (auto path only — a caller forcing
            # fused=True gets a clear error instead of an HBM OOM)
            if fused_explicit:
                raise ValueError(
                    f"fused backward dQ partials need {partial_bytes} "
                    f"bytes of HBM (budget {fused_bwd_partials_budget()}); "
                    f"use fused=False")
            fused = False
    if fused:
        return _bwd_fused(
            q, k, v, do, lse8, di8, B=B, H=H, D=D, Sq=Sq, Skv=Skv,
            Sq_p=Sq_p, Skv_p=Skv_p, bq=bq, bk=bk, sm_scale=sm_scale,
            causal=causal, kv_len=kv_len, q_len=q_len, use_exp2=use_exp2,
            interp=interp, out_dtypes=(q.dtype, k.dtype, v.dtype),
            dq_resident=dq_resident)
    if transposed is None:
        transposed = D <= 64 and not featured
    assert not (transposed and featured), \
        "window/softcap/segment_ids need the standard-layout kernels"
    if transposed:
        # transposed-layout twins: the three half-MXU-width matmuls of the
        # standard layout (ds@k, p^T@do, ds^T@q — all D-wide) become
        # block-wide at full rate; see _dq_t_kernel/_dkv_t_kernel
        return _bwd_transposed(
            q, k, v, do, lse8, di8, B=B, H=H, D=D, Sq=Sq, Skv=Skv,
            Sq_p=Sq_p, Skv_p=Skv_p, bq=bq, bk=bk, sm_scale=sm_scale,
            causal=causal, kv_len=kv_len, q_len=q_len,
            use_exp2=use_exp2, interp=interp,
            out_dtypes=(q.dtype, k.dtype, v.dtype))

    feat = dict(window=window, softcap=softcap, has_segments=has_segments)
    dq_in = [q, k, v, do, lse8, di8]
    dq_specs = [
        spec4(bq, lambda b, h, i, j: (b, h, i, 0)),   # q
        spec4(bk, lambda b, h, i, j: (b, h, j, 0)),   # k
        spec4(bk, lambda b, h, i, j: (b, h, j, 0)),   # v
        spec4(bq, lambda b, h, i, j: (b, h, i, 0)),   # do
        spec3(bq, lambda b, h, i, j: (b, h, i)),      # lse
        spec3(bq, lambda b, h, i, j: (b, h, i)),      # di
    ]
    if has_segments:
        dq_in += [q_seg, kv_seg]
        dq_specs += [spec_seg(bq, lambda b, h, i, j: (b, i)),
                     spec_seg(bk, lambda b, h, i, j: (b, j))]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=sm_scale, causal=causal,
                          block_q=bq, block_k=bk, kv_len=kv_len,
                          use_exp2=use_exp2, **feat),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq_p, D), jnp.float32),
        grid=(B, H, cdiv(Sq_p, bq), cdiv(Skv_p, bk)),
        in_specs=dq_specs,
        out_specs=spec4(bq, lambda b, h, i, j: (b, h, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interp,
    )(*dq_in)

    dkv_specs = [
        spec4(bq, lambda b, h, i, j: (b, h, j, 0)),   # q
        spec4(bk, lambda b, h, i, j: (b, h, i, 0)),   # k
        spec4(bk, lambda b, h, i, j: (b, h, i, 0)),   # v
        spec4(bq, lambda b, h, i, j: (b, h, j, 0)),   # do
        spec3(bq, lambda b, h, i, j: (b, h, j)),      # lse
        spec3(bq, lambda b, h, i, j: (b, h, j)),      # di
    ]
    if has_segments:
        dkv_specs += [spec_seg(bq, lambda b, h, i, j: (b, j)),
                      spec_seg(bk, lambda b, h, i, j: (b, i))]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=sm_scale, causal=causal,
                          block_q=bq, block_k=bk, q_len=q_len,
                          use_exp2=use_exp2, **feat),
        out_shape=(jax.ShapeDtypeStruct((B, H, Skv_p, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, Skv_p, D), jnp.float32)),
        grid=(B, H, cdiv(Skv_p, bk), cdiv(Sq_p, bq)),
        in_specs=dkv_specs,
        out_specs=(spec4(bk, lambda b, h, i, j: (b, h, i, 0)),
                   spec4(bk, lambda b, h, i, j: (b, h, i, 0))),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interp,
    )(*dq_in)

    return (dq[:, :, :Sq].astype(q.dtype), dk[:, :, :Skv].astype(k.dtype),
            dv[:, :, :Skv].astype(v.dtype))


def _bwd_transposed(q, k, v, do, lse8, di8, *, B, H, D, Sq, Skv, Sq_p,
                    Skv_p, bq, bk, sm_scale, causal, kv_len, q_len,
                    use_exp2, interp, out_dtypes):
    """D <= 64 backward via the transposed-layout kernels. Inputs arrive
    already padded to block multiples; lse8/di8 are the (B,H,Sq_p,8)
    sublane-major stats (lse pre-scaled by log2e for half precision)."""
    qT = jnp.swapaxes(q, -1, -2)                  # (B, H, D, Sq_p)
    doT = jnp.swapaxes(do, -1, -2)
    # lane-major stats for the dq kernel: (B, H, 8, Sq_p), row 0 live
    lse_row = jnp.swapaxes(lse8, -1, -2)
    di_row = jnp.swapaxes(di8, -1, -2)

    def specT(bs, idx):
        return pl.BlockSpec((1, 1, D, bs), idx, memory_space=pltpu.VMEM)

    def spec4(bs, idx):
        return pl.BlockSpec((1, 1, bs, D), idx, memory_space=pltpu.VMEM)

    def spec_row(bs, idx):
        return pl.BlockSpec((1, 1, 8, bs), idx, memory_space=pltpu.VMEM)

    def spec_col(bs, idx):
        return pl.BlockSpec((1, 1, bs, 8),
                            lambda *a, _f=idx: (*_f(*a), 0),
                            memory_space=pltpu.VMEM)

    dqT = pl.pallas_call(
        functools.partial(_dq_t_kernel, scale=sm_scale, causal=causal,
                          block_q=bq, block_k=bk, kv_len=kv_len,
                          use_exp2=use_exp2),
        out_shape=jax.ShapeDtypeStruct((B, H, D, Sq_p), jnp.float32),
        grid=(B, H, cdiv(Sq_p, bq), cdiv(Skv_p, bk)),
        in_specs=[
            specT(bq, lambda b, h, i, j: (b, h, 0, i)),   # qT
            spec4(bk, lambda b, h, i, j: (b, h, j, 0)),   # k
            spec4(bk, lambda b, h, i, j: (b, h, j, 0)),   # v
            specT(bq, lambda b, h, i, j: (b, h, 0, i)),   # doT
            spec_row(bq, lambda b, h, i, j: (b, h, 0, i)),  # lse rows
            spec_row(bq, lambda b, h, i, j: (b, h, 0, i)),  # di rows
        ],
        out_specs=specT(bq, lambda b, h, i, j: (b, h, 0, i)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interp,
    )(qT, k, v, doT, lse_row, di_row)

    dkT, dvT = pl.pallas_call(
        functools.partial(_dkv_t_kernel, scale=sm_scale, causal=causal,
                          block_q=bq, block_k=bk, q_len=q_len,
                          use_exp2=use_exp2),
        out_shape=(jax.ShapeDtypeStruct((B, H, D, Skv_p), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, D, Skv_p), jnp.float32)),
        grid=(B, H, cdiv(Skv_p, bk), cdiv(Sq_p, bq)),
        in_specs=[
            specT(bq, lambda b, h, i, j: (b, h, 0, j)),   # qT
            spec4(bk, lambda b, h, i, j: (b, h, i, 0)),   # k
            spec4(bk, lambda b, h, i, j: (b, h, i, 0)),   # v
            specT(bq, lambda b, h, i, j: (b, h, 0, j)),   # doT
            spec_col(bq, lambda b, h, i, j: (b, h, j)),   # lse cols
            spec_col(bq, lambda b, h, i, j: (b, h, j)),   # di cols
        ],
        out_specs=(specT(bk, lambda b, h, i, j: (b, h, 0, i)),
                   specT(bk, lambda b, h, i, j: (b, h, 0, i))),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interp,
    )(qT, k, v, doT, lse8, di8)

    dq = jnp.swapaxes(dqT, -1, -2)[:, :, :Sq].astype(out_dtypes[0])
    dk = jnp.swapaxes(dkT, -1, -2)[:, :, :Skv].astype(out_dtypes[1])
    dv = jnp.swapaxes(dvT, -1, -2)[:, :, :Skv].astype(out_dtypes[2])
    return dq, dk, dv
