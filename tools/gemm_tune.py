"""GEMM block-shape tuner: sweep Pallas configs against XLA on the real
TPU (the stages/swizzle sweep role, kernels/hgemm/hgemm.py:363+).

Interleaves an XLA re-measure every few configs so tunnel phase drift is
visible in the log. Also carries a pinned-operand diagnostic kernel that
reuses one A/B tile for the whole grid: its TFLOPS is the pure
MXU+grid-overhead ceiling with no HBM input streaming, which separates
"DMA not overlapped" from "per-step overhead" when tuning.

Usage: python tools/gemm_tune.py [--mnk 4096]
"""

import argparse
import functools
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pinned_accio(a, b, *, bm, bn, bk):
    """Diagnostic: same accumulate-in-output loop, but A/B index maps are
    constant so no input block ever refetches — pure compute ceiling."""
    M, K = a.shape
    N = b.shape[1]

    def kernel(a_ref, b_ref, o_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid=(M // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(a, b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mnk", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    from tpukern.harness.bench import device_time
    from tpukern.ops.matmul import matmul

    M = N = K = args.mnk
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    flops = 2 * M * N * K

    def t(fn):
        return flops / device_time(fn, a, b, iters_lo=8,
                                   iters_hi=args.iters) / 1e12

    def xla_f32(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def xla_bf16(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    acc = dict(acc_in_out=True)
    configs = [
        ("pinned_1024x1024x512", functools.partial(
            pinned_accio, bm=1024, bn=1024, bk=512)),
        ("accio_1024x1024x512", dict(block_m=1024, block_n=1024,
                                     block_k=512, **acc)),
        ("accio_la3_1024x1024x512", dict(block_m=1024, block_n=1024,
                                         block_k=512, lookahead=True,
                                         buffer_count=3, **acc)),
        ("accio_la2_1024x1024x512", dict(block_m=1024, block_n=1024,
                                         block_k=512, lookahead=True,
                                         buffer_count=2, **acc)),
        ("accio_b3_1024x1024x512", dict(block_m=1024, block_n=1024,
                                        block_k=512, buffer_count=3, **acc)),
        ("accio_la3_512x1024x512", dict(block_m=512, block_n=1024,
                                        block_k=512, lookahead=True,
                                        buffer_count=3, **acc)),
        ("accio_512x1024x1024", dict(block_m=512, block_n=1024,
                                     block_k=1024, **acc)),
        ("accio_la3_512x1024x1024", dict(block_m=512, block_n=1024,
                                         block_k=1024, lookahead=True,
                                         buffer_count=3, **acc)),
        ("accio_512x512x2048", dict(block_m=512, block_n=512,
                                    block_k=2048, **acc)),
        ("bf16_la3_1024x1024x512", dict(block_m=1024, block_n=1024,
                                        block_k=512, lookahead=True,
                                        buffer_count=3)),
        ("bf16_la3_512x1024x512", dict(block_m=512, block_n=1024,
                                       block_k=512, lookahead=True,
                                       buffer_count=3)),
    ]

    print(f"xla_f32out      {t(xla_f32):7.1f} TFLOPS", flush=True)
    print(f"xla_bf16out     {t(xla_bf16):7.1f} TFLOPS", flush=True)
    for i, (name, cfg) in enumerate(configs):
        try:
            fn = cfg if callable(cfg) else (
                lambda a, b, _c=cfg: matmul(a, b, **_c))
            v = t(fn)
            print(f"{name:<28} {v:7.1f} TFLOPS", flush=True)
        except Exception as e:
            print(f"{name:<28} FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        if i % 3 == 2:
            print(f"  [recheck] xla_f32out {t(xla_f32):7.1f} TFLOPS",
                  flush=True)


if __name__ == "__main__":
    main()
