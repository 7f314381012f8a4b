"""Weight-only int8 GEMM (w8a16): int8 weights, bf16/f32 activations.

The serving stack already quantizes the KV cache (ops/paged_attention.py
int8 pools); this family quantizes the other big HBM consumer — the
weight matrices. Decode-shaped GEMMs (M of a few tokens against a
(K, N) weight slab) are pure weight-bandwidth bound, so storing w as
int8 + per-column f32 scales halves the bytes per step and should
approach a 2x decode speedup; prefill-shaped GEMMs are MXU-bound and
should hold parity. The reference's quantization story stops at dtype
conversion micro-kernels (SURVEY §2: f32/f16/bf16/fp8/i8 pack kernels,
kernels/nvidia-nsight f32x4 studies); the end-to-end quantized-GEMM tier
is built here the TPU way instead: the int8 block is upcast to the
activation dtype on the VPU *after* the DMA (so HBM sees int8) and fed
straight to the MXU, with the per-column scale folded in once on the
final K step.

Per-column (output-channel) scales: y[m, n] = (sum_k x[m,k] q[k,n]) * s[n]
— exact w.r.t. the dequantized weights, so the kernel is bit-comparable
against an XLA dequant-then-dot reference, and the only approximation is
the quantization itself (symmetric absmax / 127 per column).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core.config import use_interpret
from tpukern.core.registry import register


def quantize_weights(w, axis=0):
    """Symmetric per-output-column int8 quantization: w (K, N) ->
    (q int8 (K, N), scale f32 (N,)) with q * scale ~= w."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def matmul_w8a16(x, w_q, scale, *, block_m=1024, block_n=None,
                 block_k=None, out_dtype=None, force_kernel=False,
                 interpret=None):
    """x (M, K) bf16/f32 @ dequant(w_q (K, N) int8, scale (N,)) -> (M, N).

    Exact vs (w_q * scale) matmul at the activation dtype's MXU
    precision; the scale multiply happens once per output element on the
    last K step, not per dequantized weight.

    Dispatch tier (measured, tools/gmm_tune.py + the round-4 interleaved
    A/B at the window edge): M <= 128 (decode-shaped) calls are
    weight-bandwidth bound — the Pallas kernel reads int8 at ~676 GB/s =
    1.9x the bf16-weights rate and 1.02-1.11x XLA's own fused
    dequant-dot across M in {1..128}. From M = 256 up the call turns
    MXU-bound and XLA's dequant-fused emitter wins (162 vs 150 TFLOPS at
    M=256, 181 vs 166 at 4096^3), so M > 128 routes to jnp.dot with an
    inline dequant XLA fuses into the operand read. (Round-3's M <= 256
    window shipped a measured 0.91x loss at M=256 — BENCH_NOTES round-4
    boundary entry.)
    """
    M, K = x.shape
    Kw, N = w_q.shape
    assert Kw == K and w_q.dtype == jnp.int8
    out_dtype = out_dtype or x.dtype
    compute_dtype = x.dtype

    if M > 128 and not force_kernel:
        cd = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
        w = w_q.astype(cd) * scale[None, :].astype(cd)
        return jnp.dot(x, w, preferred_element_type=jnp.float32
                       ).astype(out_dtype)

    if block_n is None:
        block_n = 1024
    if block_k is None:
        # decode shapes profit from deeper K blocks (fewer, fatter DMAs:
        # 16x1024x1024 measured best); forced large-M kernel calls keep
        # 512 (the 1024-deep block loses its VMEM residency there)
        block_k = 1024 if M <= 128 else 512

    bm = min(block_m, M)
    bn = min(block_n, N)
    # contraction tails aren't masked here: pick the largest 128-multiple
    # divisor of K (same fallback rule as grouped_matmul._pick_block)
    bk = K
    if K > block_k:
        for cand in range(block_k, 127, -128):
            if K % cand == 0:
                bk = cand
                break
        else:
            # no 128-multiple divisor <= block_k: bk=K would put whole
            # (bm, K) + (K, bn) slabs in VMEM — a silent VMEM blowup for
            # prime-ish K. Fail loudly instead (pad K to a 128 multiple
            # upstream, or pass a block_k that divides K).
            raise ValueError(
                f"matmul_w8a16: K={K} has no multiple-of-128 divisor <= "
                f"block_k={block_k}; the contraction tail is unmasked, so "
                f"K must be divisible by some 128-multiple block. Pad K "
                f"or pass block_k dividing K.")
    nI, nJ, nK = -(-M // bm), -(-N // bn), K // bk

    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        wd = w_ref[...].astype(compute_dtype)  # VPU upcast post-DMA
        acc_ref[...] += lax.dot_general(
            x_ref[...], wd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)

    cost = pl.CostEstimate(
        flops=int(2 * M * N * K),
        bytes_accessed=int(M * K * x.dtype.itemsize + K * N
                           + M * N * jnp.dtype(out_dtype).itemsize),
        transcendentals=0,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=(nI, nJ, nK),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=use_interpret() if interpret is None else interpret,
    )(x, w_q, scale.reshape(1, N).astype(jnp.float32))


# ---------------------------------------------------------------- registry

def _dequant_ref(x, w_q, scale, **_):
    # XLA baseline: materialize the dequantized weights, then dot —
    # pays the full-width weight read the kernel avoids
    w = w_q.astype(x.dtype) * scale[None, :].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _flops(x, w_q, scale, **_):
    return 2 * x.shape[0] * x.shape[1] * w_q.shape[1]


def _wbytes(x, w_q, scale, **_):
    # decode shapes are weight-read bound: count the weight slab
    return w_q.size * w_q.dtype.itemsize


register("matmul_w8a16", "w8a16", ref=_dequant_ref, flops=_flops,
         bytes_moved=_wbytes)(matmul_w8a16)
register("matmul_w8a16", "w8a16_dequant_xla", ref=_dequant_ref,
         flops=_flops, bytes_moved=lambda x, w_q, s, **_: 2 * w_q.size,
         tags=("baseline",))(_dequant_ref)


# (the unquantized-bf16-weights baseline is timed in bench/ops.py with
# pre-materialized weights — materializing them inside a registered
# variant would bill the dequant to the baseline's clock)
