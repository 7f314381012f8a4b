"""Fused linear + softmax cross-entropy: the LM-head loss without logits.

Reference role: the reference computes its transformer loss the unfused
way (materialize logits, log_softmax, gather) — there is no CE kernel to
port. This family exists because on TPU the LM head is where the HBM goes:
at (N tokens, vocab V) the logits tensor is N*V*4 bytes (a 8192x128k f32
logits block is 4 GiB) and the unfused path writes it, reads it for the
max, reads it again for the sum, and once more for the gather. The fused
kernel streams vocab-column blocks of the head GEMM through the SAME
online-(max, denominator) recurrence the flash-attention family uses
(ops/softmax.py online variants, arXiv 1805.02867) and keeps only one
(block_n, block_v) score tile in VMEM — logits never touch HBM, forward
OR backward (the backward recomputes the score tile chunk-wise against
the saved row lse, exactly like FA-2's backward recomputes p).

Layouts match the flagship model's head: x (N, D) activations, w (D, V)
head weights, logits = x @ w. Statistics are f32; by default the score
tile lives in log2 space (x arrives pre-scaled by log2(e), same trick as
ops/attention.py) so the VPU uses its fast exp2.

Gradient masking: tokens with target < 0 (ignore_index) contribute zero
loss AND zero gradient.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import cdiv, round_up, to_kernel_dtype, use_interpret
from tpukern.core.registry import register

NEG_BIG = -0.7 * 3.4e38
LOG2E = float(np.log2(np.e))
LN2 = float(np.log(2.0))


def cross_entropy_ref(x, w, targets):
    """Dense reference: per-token -log softmax(x @ w)[target]; 0 where
    target < 0. HIGHEST-precision matmul — this is the correctness
    oracle (XLA's default f32 matmul on TPU is bf16-pass truncated)."""
    logits = jnp.matmul(x.astype(jnp.float32), w.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    t = jnp.take_along_axis(logits, jnp.maximum(targets, 0)[:, None],
                            axis=-1)[:, 0]
    return jnp.where(targets < 0, 0.0, lse - t)


def _ce_fwd_kernel(x_ref, w_ref, tgt_ref, loss_ref, lse_ref,
                   m_ref, l_ref, t_ref, *, block_v, n_v, vocab,
                   use_exp2):
    ji = pl.program_id(1)
    exp_fn = jnp.exp2 if use_exp2 else jnp.exp

    @pl.when(ji == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_BIG)
        l_ref[...] = jnp.zeros_like(l_ref)
        t_ref[...] = jnp.zeros_like(t_ref)

    prec = None if use_exp2 else jax.lax.Precision.HIGHEST
    s = jax.lax.dot_general(
        x_ref[...], w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ji * block_v
    if vocab % block_v:
        # V tail: the out-of-range w columns are undefined block padding
        s = jnp.where(cols < vocab, s, NEG_BIG)
    tgt = tgt_ref[0, 0].reshape(-1, 1)
    t_ref[:, :1] += jnp.sum(jnp.where(cols == tgt, s, 0.0),
                            axis=-1, keepdims=True)
    m_prev = m_ref[:, :1]
    m_next = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = exp_fn(m_prev - m_next)
    l_ref[:, :1] = (alpha * l_ref[:, :1]
                    + jnp.sum(exp_fn(s - m_next), axis=-1, keepdims=True))
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)

    @pl.when(ji == n_v - 1)
    def _():
        l = l_ref[:, :1]
        lse = m_ref[:, :1] + (jnp.log2(l) if use_exp2 else jnp.log(l))
        loss = lse - t_ref[:, :1]
        if use_exp2:
            loss = loss * LN2  # log2 units -> nats
        loss = jnp.where(tgt_ref[0, 0].reshape(-1, 1) < 0, 0.0, loss)
        loss_ref[...] = jnp.broadcast_to(loss, loss_ref.shape)
        lse_ref[...] = jnp.broadcast_to(lse, lse_ref.shape)


def _ce_dx_kernel(x_ref, w_ref, tgt_ref, lse_ref, g_ref, dx_ref, *,
                  block_v, n_v, vocab, use_exp2):
    """dx = (g * (softmax - onehot)) @ w^T, accumulated in the output
    block across vocab-column steps (accumulate-in-output, ops/matmul.py
    design note)."""
    ji = pl.program_id(1)
    exp_fn = jnp.exp2 if use_exp2 else jnp.exp

    @pl.when(ji == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    prec = None if use_exp2 else jax.lax.Precision.HIGHEST
    wk = w_ref[...]
    if vocab % block_v:
        # the V-tail block's out-of-range w columns are undefined padding;
        # they contract into dx below (0 * garbage = NaN), so zero them
        wcols = (jax.lax.broadcasted_iota(jnp.int32, wk.shape, 1)
                 + ji * block_v)
        wk = jnp.where(wcols < vocab, wk, 0)
    s = jax.lax.dot_general(
        x_ref[...], wk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ji * block_v
    if vocab % block_v:
        s = jnp.where(cols < vocab, s, NEG_BIG)
    tgt = tgt_ref[0, 0].reshape(-1, 1)
    p = exp_fn(s - lse_ref[:, :1])
    dlog = p - jnp.where(cols == tgt, 1.0, 0.0)
    # per-token cotangent; rows with target < 0 get zero gradient
    dlog = dlog * jnp.where(tgt < 0, 0.0, g_ref[:, :1])
    dx_ref[...] += jax.lax.dot_general(
        dlog.astype(w_ref.dtype), wk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _ce_dw_kernel(x_ref, w_ref, tgt_ref, lse_ref, g_ref, dw_ref, *,
                  block_v, vocab, use_exp2):
    """dw = x^T @ (g * (softmax - onehot)), accumulated in the output
    block across token steps. Padded token rows carry g == 0 so they
    drop out without an explicit row mask."""
    ji = pl.program_id(0)  # vocab-column block (owns the output tile)
    ni = pl.program_id(1)  # token block (innermost)
    exp_fn = jnp.exp2 if use_exp2 else jnp.exp

    @pl.when(ni == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    prec = None if use_exp2 else jax.lax.Precision.HIGHEST
    s = jax.lax.dot_general(
        x_ref[...], w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ji * block_v
    if vocab % block_v:
        s = jnp.where(cols < vocab, s, NEG_BIG)
    tgt = tgt_ref[0, 0].reshape(-1, 1)
    p = exp_fn(s - lse_ref[:, :1])
    dlog = p - jnp.where(cols == tgt, 1.0, 0.0)
    dlog = dlog * jnp.where(tgt < 0, 0.0, g_ref[:, :1])
    dw_ref[...] += jax.lax.dot_general(
        x_ref[...], dlog.astype(x_ref.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _prep(x, targets, block_n, use_exp2):
    """Pre-scale into log2 space, zero-pad tokens to the block multiple,
    pad targets with the ignore sentinel."""
    N, D = x.shape
    Np = round_up(N, block_n)
    xs = x * (jnp.asarray(LOG2E, x.dtype) if use_exp2 else 1)
    if Np != N:
        xs = jnp.pad(xs, ((0, Np - N), (0, 0)))
    # (n_blocks, 1, bn) so the (1, 1, bn) BlockSpec's trailing dims match
    # the array exactly (Mosaic wants lane/sublane blocks of 128/8 k or
    # full width; bn may be 64 and n_blocks is unconstrained)
    tgt = jnp.pad(targets.astype(jnp.int32), (0, Np - N),
                  constant_values=-1).reshape(Np // block_n, 1, block_n)
    return xs, tgt, Np


def _ce_blocks(D, V, block_n, block_v, itemsize):
    """Pick (bn, bv) from a hardware-measured preference ladder, demoting
    until the VMEM model fits (the pallas_calls raise vmem_limit_bytes to
    100 MB). v5e sweep at (8192, 2048, 32k): bf16 peaks at big blocks
    (512x2048: 179 TFLOPS, 91% MFU — the wide bv amortizes the VPU online
    pass); f32 (Precision.HIGHEST, 6-pass) prefers 256x1024."""
    if block_n and block_v:
        return block_n, block_v
    ladder = ([(512, 2048), (256, 2048), (256, 1024), (256, 512),
               (128, 512), (128, 256), (64, 256)] if itemsize <= 2 else
              [(256, 1024), (256, 512), (128, 512), (128, 256), (64, 256)])
    budget = 64 * 1024 * 1024
    for bn, bv in ladder:
        if block_n and bn != block_n or block_v and bv != block_v:
            continue
        need = (2 * (bn * D + D * bv) * itemsize   # pipelined operands
                + 3 * bn * bv * 4                  # s/p/dlog f32 tiles
                + 3 * bn * 128 * 4                 # fwd stat scratch
                + max(bn * D, D * bv) * 4)         # bwd f32 accumulator
        if need <= budget:
            return bn, bv
    return block_n or 64, block_v or 256


def fused_cross_entropy(x, w, targets, *, block_n=None, block_v=None,
                        use_exp2=None, return_lse=False, interpret=None):
    """Per-token CE loss of logits = x @ w without materializing logits.

    x: (N, D) activations; w: (D, V) head; targets: (N,) int32 (negative
    = ignored: zero loss, zero gradient). Returns f32 (N,) losses
    (optionally with the (N,) natural-log lse). Differentiable wrt x and
    w via Pallas backward kernels (chunk-wise recompute against the
    saved lse)."""
    N, D = x.shape
    Dw, V = w.shape
    assert Dw == D, f"x (N,{D}) vs w ({Dw},V)"
    assert targets.shape == (N,), f"targets must be ({N},)"
    if use_exp2 is None:
        use_exp2 = x.dtype != jnp.float32
    bn, bv = _ce_blocks(D, V, block_n, block_v,
                        to_kernel_dtype(x).dtype.itemsize)
    bn = min(bn, round_up(N, 8))
    bv = min(bv, round_up(V, 128))
    cfg = (bn, bv, bool(use_exp2),
           use_interpret() if interpret is None else interpret)
    x, w = to_kernel_dtype(x), to_kernel_dtype(w)
    if return_lse:
        # stats path (split-vocab combines, perplexity): direct kernel
        # call, not differentiable (the custom-vjp core only carries the
        # loss cotangent)
        loss, (_, _, _, lse) = _ce_fwd(cfg, x, w, targets)
        return loss, lse[:N, 0] * (LN2 if use_exp2 else 1.0)
    return _fused_ce_core(cfg, x, w, targets)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_ce_core(cfg, x, w, targets):
    return _ce_fwd(cfg, x, w, targets)[0]


def _ce_fwd(cfg, x, w, targets):
    bn, bv, use_exp2, interpret = cfg
    N, D = x.shape
    V = w.shape[1]
    xs, tgt, Np = _prep(x, targets, bn, use_exp2)
    n_v = cdiv(V, bv)
    kernel = functools.partial(_ce_fwd_kernel, block_v=bv, n_v=n_v,
                               vocab=V, use_exp2=use_exp2)
    stat = pl.BlockSpec((bn, 8), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    loss, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Np, 8), jnp.float32),
                   jax.ShapeDtypeStruct((Np, 8), jnp.float32)),
        grid=(Np // bn, n_v),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(stat, stat),
        scratch_shapes=[
            pltpu.VMEM((bn, 128), jnp.float32),   # m
            pltpu.VMEM((bn, 128), jnp.float32),   # l
            pltpu.VMEM((bn, 128), jnp.float32),   # target logit
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * N * D * V),
            bytes_accessed=int(x.size * x.dtype.itemsize
                               + w.size * w.dtype.itemsize),
            transcendentals=int(N * V),
        ),
        interpret=interpret,
    )(xs, w, tgt)
    # residuals keep the PADDED pre-scaled x and the log2-space lse so the
    # backward kernels read them verbatim
    return loss[:N, 0], (xs, w, tgt, lse)


def _ce_bwd(cfg, res, g):
    bn, bv, use_exp2, interpret = cfg
    xs, w, tgt, lse = res
    Np, D = xs.shape
    V = w.shape[1]
    N = g.shape[0]
    n_v = cdiv(V, bv)
    gp = jnp.broadcast_to(
        jnp.pad(g.astype(jnp.float32), (0, Np - N))[:, None], (Np, 8))
    x_spec = pl.BlockSpec((bn, D), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((D, bv), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((1, 1, bn), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((bn, 8), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_ce_dx_kernel, block_v=bv, n_v=n_v, vocab=V,
                          use_exp2=use_exp2),
        out_shape=jax.ShapeDtypeStruct((Np, D), jnp.float32),
        grid=(Np // bn, n_v),
        in_specs=[x_spec, w_spec, t_spec, stat, stat],
        out_specs=pl.BlockSpec((bn, D), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * N * D * V), bytes_accessed=int(
                xs.size * xs.dtype.itemsize + w.size * w.dtype.itemsize
                + Np * D * 4),
            transcendentals=int(N * V)),
        interpret=interpret,
    )(xs, w, tgt, lse, gp)
    # dw = x^T @ dlog needs x in NATURAL units; xs carries a log2(e)
    # factor, so fold the inverse (ln 2) into the cotangent instead of
    # keeping a second copy of x
    gw = gp * (LN2 if use_exp2 else 1.0)
    dw = pl.pallas_call(
        functools.partial(_ce_dw_kernel, block_v=bv, vocab=V,
                          use_exp2=use_exp2),
        out_shape=jax.ShapeDtypeStruct((D, round_up(V, bv)), jnp.float32),
        grid=(n_v, Np // bn),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bv), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, bv), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * N * D * V), bytes_accessed=int(
                xs.size * xs.dtype.itemsize + w.size * w.dtype.itemsize
                + D * V * 4),
            transcendentals=int(N * V)),
        interpret=interpret,
    )(xs, w, tgt, lse, gw)[:, :V]
    # dx rows past N belong to padding (their g is 0 but the raw rows are
    # garbage p-products); slice them off. The log2(e) pre-scale of xs is
    # part of d(loss)/d(x2) -> chain through d(x2)/d(x) = log2(e)... which
    # is already folded: dx was computed against w (no x involved), and
    # dlog used g unscaled, so dx is exact in natural units.
    return (dx[:N].astype(xs.dtype), dw.astype(w.dtype),
            np.zeros((N,), dtype=jax.dtypes.float0))


_fused_ce_core.defvjp(_ce_fwd, _ce_bwd)


def chunked_cross_entropy(x, w, targets, *, chunk=2048):
    """Pure-XLA streaming baseline: lax.scan over vocab-column chunks of
    the head GEMM keeps one (N, chunk) logits slab live instead of the
    full (N, V) tensor. Differentiable by construction (scan transpose).
    """
    N, D = x.shape
    V = w.shape[1]
    Vp = round_up(V, chunk)
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, Vp - V)))
    xf = x.astype(jnp.float32)
    tgt = targets[:, None]

    def step(carry, args):
        m, l, t = carry
        w_c, off = args
        s = xf @ w_c  # (N, chunk)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + off
        s = jnp.where(cols < V, s, NEG_BIG)
        t = t + jnp.sum(jnp.where(cols == tgt, s, 0.0), axis=-1,
                        keepdims=True)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new), axis=-1,
                                             keepdims=True)
        return (m_new, l, t), None

    w_chunks = wp.reshape(D, Vp // chunk, chunk).transpose(1, 0, 2)
    offs = jnp.arange(Vp // chunk, dtype=jnp.int32) * chunk
    init = (jnp.full((N, 1), NEG_BIG, jnp.float32),
            jnp.zeros((N, 1), jnp.float32),
            jnp.zeros((N, 1), jnp.float32))
    (m, l, t), _ = jax.lax.scan(step, init, (w_chunks, offs))
    loss = (m + jnp.log(l) - t)[:, 0]
    return jnp.where(targets < 0, 0.0, loss)


# ---------------------------------------------------------------------------
# registry

def _reg(name, dt, **kw):
    @register("cross_entropy", name, ref=cross_entropy_ref,
              flops=lambda x, w, t: 2 * x.shape[0] * x.shape[1] * w.shape[1],
              doc=f"fused linear+CE, {np.dtype(dt).name}")
    def run(x, w, targets, **over):
        return fused_cross_entropy(x.astype(dt), w.astype(dt), targets,
                                   **{**kw, **over})
    return run


_reg("fused_bf16", jnp.bfloat16)
_reg("fused_f32", jnp.float32)


@register("cross_entropy", "chunked_xla", ref=cross_entropy_ref,
          flops=lambda x, w, t: 2 * x.shape[0] * x.shape[1] * w.shape[1],
          tags=("baseline",), doc="lax.scan streaming baseline")
def _chunked(x, w, targets, **kw):
    return chunked_cross_entropy(x, w, targets, **kw)


@register("cross_entropy", "dense_xla", ref=cross_entropy_ref,
          flops=lambda x, w, t: 2 * x.shape[0] * x.shape[1] * w.shape[1],
          tags=("baseline",),
          doc="materialized-logits baseline (the reference's loss path)")
def _dense(x, w, targets, **kw):
    """Default-precision materialized path (what a production XLA loss
    does): full (N, V) logits in HBM, log_softmax, gather."""
    logits = x.astype(jnp.float32) @ w.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    t = jnp.take_along_axis(logp, jnp.maximum(targets, 0)[:, None],
                            axis=-1)[:, 0]
    return jnp.where(targets < 0, 0.0, -t)
