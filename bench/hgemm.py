"""HGEMM benchmark driver — the kernels/hgemm/hgemm.py analog.

Sweeps MNK, times every matmul variant (incl. the XLA/cuBLAS-role
baseline), tracks the best TFLOPS per shape, prints a top-k league table,
and optionally plots TFLOPS curves (reference hgemm.py:195-275).

Usage: python bench/hgemm.py [--mnk 4096] [--sweep] [--variants hgemm_*]
       [--check] [--plot out.png] [--iters 20]
"""

import argparse
import sys
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import tpukern.ops  # noqa: F401
from tpukern.core import registry
from tpukern.harness import pretty_print_line, run_benchmark


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mnk", type=int, default=4096)
    p.add_argument("--sweep", action="store_true",
                   help="sweep M=N=K over 1024..8192")
    p.add_argument("--sweep-fine", action="store_true",
                   help="fine sweep M=N=K 256..--max-mnk step 256: best "
                        "tpukern config vs XLA, TFLOPS curve (the "
                        "reference's 256-step MNK sweep, hgemm.py:277-281)")
    p.add_argument("--max-mnk", type=int, default=8192,
                   help="fine-sweep upper bound (reference flagship sizes "
                        "run to 16384, kernels/hgemm/README.md:158-186)")
    p.add_argument("--sizes", default="",
                   help="comma list of M=N=K sizes: targeted --sweep-fine "
                        "over just these (e.g. the odd 4352-class)")
    p.add_argument("--variants", default="",
                   help="substring filter on variant names")
    p.add_argument("--check", action="store_true")
    p.add_argument("--plot", default="")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--topk", type=int, default=8)
    p.add_argument("--trace", default="",
                   help="capture an xprof trace to this dir")
    return p.parse_args()


def sweep_fine(args):
    """256-step shape sweep, best-config tpukern vs XLA, optional plot.
    Uses the jitter-scalar timing mode (see harness.bench.device_time) so
    neither side pays a materialized perturbation pass."""
    from tpukern.harness.bench import device_peaks, device_time
    from tpukern.ops.matmul import hgemm

    peak = device_peaks()["bf16_tflops"]
    rng = np.random.default_rng(0)
    sizes = ([int(s) for s in args.sizes.split(",")] if args.sizes
             else list(range(256, args.max_mnk + 1, 256)))
    rows = []
    for s in sizes:
        a = jnp.asarray(rng.standard_normal((s, s)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((s, s)), jnp.bfloat16)
        fl = 2 * s ** 3

        def pk(a, b, **kw):
            return hgemm(a, b, **kw)   # shape-aware auto blocks

        def xla(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        def t(fn, jit):
            for _ in range(2):
                v = fl / device_time(fn, a, b, iters_lo=8, iters_hi=40,
                                     jitter_kw="jitter" if jit else None
                                     ) / 1e12
                if v <= 1.03 * peak:   # discard slope glitches above peak
                    return v
            return float("nan")

        try:
            tp = t(pk, True)
        except Exception as e:
            print(f"# {s}: tpukern failed {type(e).__name__}", flush=True)
            tp = float("nan")
        tx = t(xla, False)
        rows.append((s, tp, tx))
        print(f"MNK={s:<6} tpukern {tp:7.1f}  xla {tx:7.1f}  "
              f"ratio {100 * tp / tx:6.1f}%", flush=True)

    if args.plot:
        import os
        os.makedirs(os.path.dirname(args.plot) or ".", exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(10, 5))
        plt.plot([r[0] for r in rows], [r[1] for r in rows],
                 label="tpukern hgemm (auto blocks)",
                 marker="o", ms=3)
        plt.plot([r[0] for r in rows], [r[2] for r in rows],
                 label="XLA dot_general bf16-out", marker="s", ms=3)
        plt.xlabel("M = N = K")
        plt.ylabel("TFLOPS")
        plt.title("BF16 GEMM, TPU v5e: tpukern vs XLA (256-step sweep)")
        plt.legend()
        plt.grid(alpha=0.3)
        plt.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"saved {args.plot}")


def main():
    import contextlib
    args = get_args()
    if args.sweep_fine:
        sweep_fine(args)
        return
    stack = contextlib.ExitStack()
    if args.trace:
        from tpukern.harness.profiling import trace
        stack.enter_context(trace(args.trace))
    shapes = ([(s, s, s) for s in (1024, 2048, 4096, 6144, 8192)]
              if args.sweep else [(args.mnk,) * 3])
    variants = registry.variants("matmul")
    if args.variants:
        variants = {k: v for k, v in variants.items() if args.variants in k}

    rng = np.random.default_rng(0)
    stats = defaultdict(list)  # name -> [(mnk, tflops)]

    for (M, N, K) in shapes:
        pretty_print_line(f"M={M} N={N} K={K}")
        a_f32 = rng.standard_normal((M, K))
        b_f32 = rng.standard_normal((K, N))
        for name, v in sorted(variants.items()):
            a = jnp.asarray(a_f32)
            b = jnp.asarray(b_f32.T if "tn" in name else b_f32)
            fn = jax.jit(v.fn)
            try:
                r = run_benchmark(fn, a, b, tag=name, flops=2 * M * N * K,
                                  iters=args.iters, warmup=args.warmup,
                                  ref=v.ref if args.check else None,
                                  check=args.check)
                stats[name].append((M, r.tflops))
            except Exception as e:
                print(f"{name:<34} SKIP ({type(e).__name__}: {e})")
        del a_f32, b_f32

    stack.close()
    pretty_print_line("top-k by peak TFLOPS")
    league = sorted(((max(t for _, t in rows), n) for n, rows in stats.items()),
                    reverse=True)
    for tf, n in league[:args.topk]:
        print(f"{n:<34} {tf:8.2f} TFLOPS")

    if args.plot:
        import os
        os.makedirs(os.path.dirname(args.plot) or ".", exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(10, 6))
        for tf, n in league[:args.topk]:
            rows = stats[n]
            plt.plot([m for m, _ in rows], [t for _, t in rows], label=n,
                     marker="o")
        plt.xlabel("M=N=K")
        plt.ylabel("TFLOPS")
        plt.legend(fontsize=7)
        plt.grid(alpha=0.3)
        plt.title("tpukern GEMM ladder")
        plt.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"saved {args.plot}")


if __name__ == "__main__":
    main()
