"""Differentiable wrappers around the Pallas forward kernels.

pallas_call has no automatic autodiff; production kernels pair a Pallas
forward with a custom VJP (pallas_guide.md "Patterns: Custom VJP"). Round-1
policy: forwards run the Pallas kernels; backwards are exact math expressed
with the same kernels where cheap (matmul: two GEMMs; rope: inverse
rotation) and XLA-recompute elsewhere (rms_norm; attention — see
ops/attention.flash_attention_trainable). Dedicated Pallas backward kernels
(flash-attention dKV/dQ) are a planned tier.
"""

import functools

import jax
import jax.numpy as jnp

from tpukern.ops import matmul as _mm
from tpukern.ops import rmsnorm as _rn
from tpukern.ops import rope as _rope
from tpukern.ops.attention import flash_attention_trainable  # noqa: F401


def _mm_cfg(M, K, N):
    # accumulate-in-output is the fast design (see ops/matmul.py); for
    # non-f32 inputs it emits a dual-output epilogue automatically
    return dict(block_m=min(512, M), block_n=min(512, N),
                block_k=min(512, K), acc_in_out=True)


@jax.custom_vjp
def matmul_t(a, b):
    """C = A @ B on the MXU; backward = two more MXU GEMMs."""
    M, K = a.shape
    N = b.shape[1]
    return _mm.matmul(a, b, **_mm_cfg(M, K, N))


def _matmul_t_fwd(a, b):
    return matmul_t(a, b), (a, b)


def _matmul_t_bwd(res, g):
    a, b = res
    M, K = a.shape
    N = b.shape[1]
    # dA[M,K] = g[M,N] @ B^T -> TN GEMM with B as (K,N) second operand
    da = _mm.matmul(g, b, trans_b=True, **_mm_cfg(M, N, K))
    # dB[K,N] = A^T[K,M] @ g[M,N]
    db = _mm.matmul(a.T, g, **_mm_cfg(K, M, N))
    return da.astype(a.dtype), db.astype(b.dtype)


matmul_t.defvjp(_matmul_t_fwd, _matmul_t_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm_t(x, g, eps=1e-5):
    # eps is nondiff/static: under jit a plain argument would become a
    # traced scalar, which the Pallas kernel cannot close over.
    return _rn.rms_norm(x, g=g, eps=eps)


def _rms_fwd(x, g, eps):
    return rms_norm_t(x, g, eps), (x, g)


def _rms_bwd(eps, res, dy):
    x, g = res
    _, vjp = jax.vjp(lambda x_, g_: _rn.rms_norm_ref(x_, g=g_, eps=eps), x, g)
    dx, dg = vjp(dy)
    return dx, dg


rms_norm_t.defvjp(_rms_fwd, _rms_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def rope_t(x, seq_len):
    """Batched half-split RoPE on (N*seq_len, D) rows; backward is the
    inverse rotation (rotations are orthogonal)."""
    return _rope.rope_batched(x, seq_len)


def _rope_fwd(x, seq_len):
    return rope_t(x, seq_len), None


def _rope_bwd(seq_len, _, dy):
    return (_rope.rope_batched(dy, seq_len, sign=-1.0),)


rope_t.defvjp(_rope_fwd, _rope_bwd)
