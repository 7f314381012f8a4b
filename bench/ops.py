"""Small-op benchmark driver — the per-dir <op>.py harness analog.

Runs every registered variant of the memory-bound op families at
reference-style shapes (S, K in {1024, 2048, 4096}^2 —
kernels/elementwise/elementwise.py:63), reporting GB/s + roofline fraction.

Usage: python bench/ops.py [--family elementwise] [--S 4096] [--K 4096]
       [--check]
"""

import argparse
import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import tpukern.ops  # noqa: F401
from tpukern.core import registry
from tpukern.harness import pretty_print_line, run_benchmark

EW_FAMILIES = ["elementwise", "relu", "elu", "gelu", "swish", "sigmoid",
               "hardswish", "hardshrink"]
ROW_FAMILIES = ["softmax", "layer_norm", "rms_norm", "rope"]


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="", help="filter family")
    p.add_argument("--S", type=int, default=4096)
    p.add_argument("--K", type=int, default=4096)
    p.add_argument("--check", action="store_true")
    p.add_argument("--iters", type=int, default=20)
    return p.parse_args()


def bench_family(family, args, rng):
    vs = registry.variants(family)
    if not vs:
        return
    pretty_print_line(f"{family} (S={args.S}, K={args.K})")
    nargs = 2 if family == "elementwise" else 1
    x_f = rng.standard_normal((args.S, args.K))
    for name, v in sorted(vs.items()):
        dt = (jnp.bfloat16 if "bf16" in name else
              jnp.float16 if "f16" in name else jnp.float32)
        xs = [jnp.asarray(x_f, dt) for _ in range(nargs)]
        nbytes = (nargs + 1) * args.S * args.K * xs[0].dtype.itemsize
        fn = jax.jit(v.fn)
        try:
            run_benchmark(fn, *xs, tag=name, bytes_moved=nbytes,
                          iters=args.iters,
                          ref=v.ref if args.check else None,
                          check=args.check)
        except Exception as e:
            print(f"{name:<34} SKIP ({type(e).__name__}: {e})")


def bench_reduce(args, rng):
    pretty_print_line(f"reduce / dot_product (N={args.S * args.K})")
    from tpukern.ops import dot_product as dp
    from tpukern.ops import reduce as red
    x_f = rng.choice([-1.0, -0.5, 0.0, 0.5, 1.0], (args.S, args.K))
    for sfx, in_dt, acc_dt, br in red._SUM_VARIANTS:
        x = jnp.asarray(x_f, in_dt)
        nbytes = x.size * x.dtype.itemsize
        fn = jax.jit(lambda x_, _a=acc_dt, _b=br:
                     red.sum_all(x_, acc_dtype=_a, block_rows=_b))
        try:
            run_benchmark(fn, x, tag=f"sum_{sfx}", bytes_moved=nbytes,
                          iters=args.iters)
        except Exception as e:
            print(f"sum_{sfx:<30} SKIP ({type(e).__name__}: {e})")
    for sfx, in_dt, br in dp._VARIANTS:
        a = jnp.asarray(x_f, in_dt)
        b = jnp.asarray(x_f, in_dt)
        fn = jax.jit(lambda a_, b_, _b=br: dp.dot_prod(a_, b_, block_rows=_b))
        try:
            run_benchmark(fn, a, b, tag=f"dot_{sfx}",
                          bytes_moved=2 * a.size * a.dtype.itemsize,
                          iters=args.iters)
        except Exception as e:
            print(f"dot_{sfx:<30} SKIP ({type(e).__name__}: {e})")


def bench_misc(args, rng):
    from tpukern.ops import embedding as emb
    from tpukern.ops import gemv as gv
    from tpukern.ops import histogram as hist
    from tpukern.ops import transpose as tr

    pretty_print_line("transpose")
    x = jnp.asarray(rng.standard_normal((args.S, args.K)), jnp.float32)
    for name, v in sorted(registry.variants("transpose").items()):
        fn = jax.jit(v.fn)
        try:
            run_benchmark(fn, x, tag=name,
                          bytes_moved=2 * x.size * 4, iters=args.iters)
        except Exception as e:
            print(f"{name:<34} SKIP ({type(e).__name__}: {e})")

    pretty_print_line("embedding (V=32768, D=512, S=8192)")
    w = jnp.asarray(rng.standard_normal((32768, 512)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 32768, 8192), jnp.int32)
    for name, v in sorted(registry.variants("embedding").items()):
        if "onehot" in name:
            continue  # vocab too large for VMEM-resident weight
        fn = jax.jit(v.fn)
        try:
            run_benchmark(fn, idx, w, tag=name,
                          bytes_moved=2 * 8192 * 512 * 4, iters=args.iters)
        except Exception as e:
            print(f"{name:<34} SKIP ({type(e).__name__}: {e})")

    pretty_print_line("histogram (N=1M, bins=256)")
    xh = jnp.asarray(rng.integers(0, 256, 1 << 20), jnp.int32)
    for name, v in sorted(registry.variants("histogram").items()):
        fn = jax.jit(lambda x_, _f=v.fn: _f(x_, 256))
        try:
            run_benchmark(fn, xh, tag=name, bytes_moved=xh.size * 4,
                          iters=args.iters)
        except Exception as e:
            print(f"{name:<34} SKIP ({type(e).__name__}: {e})")

    pretty_print_line("gemv (M=4096, K=4096)")
    A = rng.standard_normal((4096, 4096))
    xv = rng.standard_normal(4096)
    for sfx, dt, kwd in gv._VARIANTS:
        Aj, xj = jnp.asarray(A, dt), jnp.asarray(xv, dt)
        fn = jax.jit(lambda a_, x_, _k=dict(kwd): gv.gemv(a_, x_, **_k))
        try:
            run_benchmark(fn, Aj, xj, tag=f"gemv_{sfx}",
                          bytes_moved=Aj.size * Aj.dtype.itemsize,
                          iters=args.iters)
        except Exception as e:
            print(f"gemv_{sfx:<29} SKIP ({type(e).__name__}: {e})")


def bench_cross_entropy(args, rng):
    """LM-head loss: compute-bound (2*N*D*V flops) but the interesting
    number is that fused never materializes the (N, V) logits."""
    N, D, V = 8192, 2048, 32768
    pretty_print_line(f"cross_entropy (N={N}, D={D}, V={V})")
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, V)) * 0.02, jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    for name, v in sorted(registry.variants("cross_entropy").items()):
        fn = jax.jit(v.fn)
        # everything except fused_f32 runs bf16-precision matmuls (the
        # fused bf16 kernel by dtype, the XLA baselines by TPU default
        # f32-matmul truncation), so check at the bf16 tolerance vs the
        # HIGHEST-precision oracle
        cdt = jnp.float32 if name == "fused_f32" else jnp.bfloat16
        try:
            run_benchmark(fn, x, w, tgt, tag=name,
                          flops=2 * N * D * V, iters=args.iters,
                          ref=v.ref if args.check else None,
                          check=args.check, check_dtype=cdt)
        except Exception as e:
            print(f"{name:<34} SKIP ({type(e).__name__}: {e})")


def bench_grouped_matmul(args, rng):
    """MoE expert GEMM: (T, K) tokens sorted by expert x (E, K, N)
    expert weights, balanced and skewed splits. FLOPs scale with T, not
    with padded capacity."""
    T, K, N, E = 8192, 2048, 1408, 8
    from tpukern.ops.grouped_matmul import tgmm
    x_f = rng.standard_normal((T, K))
    w_f = rng.standard_normal((E, K, N)) * 0.05
    splits = {
        "balanced": [T // E] * E,
        "skewed": [T // 2, T // 4, T // 8, T // 16, T // 32, T // 64,
                   T // 128, T - (T // 2 + T // 4 + T // 8 + T // 16 +
                                  T // 32 + T // 64 + T // 128)],
    }
    for split_name, sizes in splits.items():
        pretty_print_line(
            f"grouped_matmul (T={T}, K={K}, N={N}, E={E}, {split_name})")
        gs = jnp.asarray(sizes, jnp.int32)
        for name, v in sorted(registry.variants("grouped_matmul").items()):
            dt = jnp.bfloat16 if "bf16" in name else jnp.float32
            xs = jnp.asarray(x_f, dt)
            if name.startswith("tgmm"):
                dy = jnp.asarray(rng.standard_normal((T, N)), dt)
                fn = jax.jit(lambda a, b, g: tgmm(a, b, g))
                fargs = (xs, dy, gs)
            else:
                ws = jnp.asarray(w_f, dt)
                fn = jax.jit(v.fn)
                fargs = (xs, ws, gs)
            # tgmm contracts 8192 rows per output element: f32 rtol 1e-5
            # flags pure accumulation-order noise (~1e-4 abs on ~30-range
            # values), so check the long contraction at the relaxed tier
            cdt = jnp.bfloat16 if name.startswith("tgmm") else None
            try:
                run_benchmark(fn, *fargs, tag=f"{name}",
                              flops=2 * T * K * N, iters=args.iters,
                              ref=v.ref if args.check else None,
                              check=args.check, check_dtype=cdt)
            except Exception as e:
                print(f"{name:<34} SKIP ({type(e).__name__}: {e})")


def bench_w8a16(args, rng):
    """Weight-only int8 GEMM. Decode shape (M=16) is weight-bandwidth
    bound — int8 weights should approach 2x over bf16; prefill shape
    (M=4096) is MXU-bound — expect parity."""
    from tpukern.ops.matmul_w8a16 import matmul_w8a16, quantize_weights
    K, N = 4096, 4096
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    w_q, scale = quantize_weights(w)
    w_q, scale = jax.device_put(w_q), jax.device_put(scale)
    w_bf16 = jax.device_put((w_q.astype(jnp.float32)
                             * scale[None, :]).astype(jnp.bfloat16))
    for M in (16, 4096):
        pretty_print_line(f"matmul_w8a16 (M={M}, K={K}, N={N})")
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        wbytes = w_q.size
        kern = jax.jit(functools.partial(
            matmul_w8a16, block_m=min(512, M)))
        dq_xla = jax.jit(lambda x, q, s: jnp.dot(
            x, q.astype(jnp.bfloat16) * s[None, :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(x.dtype))
        bf16_xla = jax.jit(lambda x, w: jnp.dot(
            x, w, preferred_element_type=jnp.float32).astype(x.dtype))
        for tag, fn, fa, nb in (
                ("w8a16", kern, (x, w_q, scale), wbytes),
                ("w8a16_dequant_xla", dq_xla, (x, w_q, scale), wbytes),
                ("bf16_weights_xla", bf16_xla, (x, w_bf16), 2 * wbytes)):
            try:
                run_benchmark(fn, *fa, tag=tag, flops=2 * M * K * N,
                              bytes_moved=nb if M == 16 else None,
                              iters=args.iters)
            except Exception as e:
                print(f"{tag:<34} SKIP ({type(e).__name__}: {e})")


def bench_sampling(args, rng):
    """Decode-shaped sampling: (B, V) logits -> (B,) token ids. Pure
    HBM-read bound (one pass over the logits for the fused kernels)."""
    B, V = 64, 131072
    pretty_print_line(f"sampling (B={B}, V={V})")
    logits = jnp.asarray(rng.standard_normal((B, V)) * 2, jnp.float32)
    for name, v in sorted(registry.variants("sampling").items()):
        fn = jax.jit(v.fn)
        try:
            run_benchmark(fn, logits, tag=name,
                          bytes_moved=v.bytes_moved, iters=args.iters,
                          ref=v.ref if args.check else None,
                          check=args.check)
        except Exception as e:
            print(f"{name:<34} SKIP ({type(e).__name__}: {e})")


def main():
    args = get_args()
    rng = np.random.default_rng(0)
    fams = ([args.family] if args.family else
            EW_FAMILIES + ROW_FAMILIES + ["reduce", "misc",
                                          "cross_entropy", "sampling",
                                          "grouped_matmul", "matmul_w8a16"])
    for fam in fams:
        if fam == "reduce":
            bench_reduce(args, rng)
        elif fam == "misc":
            bench_misc(args, rng)
        elif fam == "grouped_matmul":
            bench_grouped_matmul(args, rng)
        elif fam == "matmul_w8a16":
            bench_w8a16(args, rng)
        elif fam == "cross_entropy":
            bench_cross_entropy(args, rng)
        elif fam == "sampling":
            bench_sampling(args, rng)
        elif fam in ROW_FAMILIES:
            bench_family(fam, args, rng)
        else:
            bench_family(fam, args, rng)


if __name__ == "__main__":
    main()
