"""GEMV: matrix-vector product y = A @ x.

Reference: kernels/sgemv/sgemv.cu:32-87 (sgemv_{k32_f32,k128_f32x4,k16_f32},
warp-per-row tilings specialized by K) and kernels/hgemv/hgemv.cu (same in
f16).

TPU design: matvec is bandwidth-bound — the MXU would idle at N=1 — so the
main variants are VPU broadcast-multiply + row-sum over (BM, K) tiles of A
with the vector resident in VMEM. The reference's per-K warp tilings map to
the K-tiling axis: `k_full` keeps the whole row resident (K <= ~16k),
`k_tiled` streams K blocks with an accumulator (the k16/k32/k128 analog).
An `mxu` variant does (BM,K)@(K,1) on the MXU for comparison.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import (LANES, cdiv, min_sublanes, round_up,
                          to_kernel_dtype, use_interpret)
from tpukern.core.registry import register


def gemv(A, x, block_m=256, block_k=None, mode="vpu", interpret=None):
    """y[M] = A[M,K] @ x[K]; f32 accumulation. f16 inputs are
    storage-only on TPU and upcast at the XLA boundary."""
    A, x = to_kernel_dtype(A), to_kernel_dtype(x)
    M, K = A.shape
    bm = min(block_m, round_up(M, min_sublanes(A.dtype)))
    bk = K if block_k is None else min(block_k, K)
    n_k = cdiv(K, bk)
    x2 = x.reshape(1, K)

    def kernel(a_ref, x_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        a = a_ref[...].astype(jnp.float32)
        v = x_ref[...].astype(jnp.float32)
        if mode == "mxu":
            part = jnp.dot(a, v.T, preferred_element_type=jnp.float32)
        else:
            part = jnp.sum(a * v, axis=1, keepdims=True)
        acc_ref[...] += part

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
        grid=(cdiv(M, bm), n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=use_interpret() if interpret is None else interpret,
    )(A, x2)
    return out.reshape(M)


def gemv_ref(A, x):
    return jnp.dot(A.astype(jnp.float32), x.astype(jnp.float32))


_VARIANTS = [
    ("f32_k_full", jnp.float32, dict()),
    ("f32_k512", jnp.float32, dict(block_k=512)),
    ("f32_k2048", jnp.float32, dict(block_k=2048)),
    ("f32_mxu", jnp.float32, dict(mode="mxu")),
    ("bf16_k_full", jnp.bfloat16, dict()),
    ("bf16_k512", jnp.bfloat16, dict(block_k=512)),
    ("bf16_mxu", jnp.bfloat16, dict(mode="mxu")),
    ("f16_k_full", jnp.float16, dict()),
    ("f16_k512", jnp.float16, dict(block_k=512)),
]

for _sfx, _dt, _kw in _VARIANTS:
    def _fn(A, x, _dt=_dt, _kw=_kw, **kw):
        return gemv(A.astype(_dt), x.astype(_dt), **{**_kw, **kw})
    register("gemv", f"gemv_{_sfx}", ref=gemv_ref)(_fn)
