"""FlashAttention benchmark driver — the flash_attn_mma.py analog.

Sweeps (B, H, N, D), times every attention variant against the XLA SDPA /
unfused baselines, with the reference's --check tolerance gate
(flash_attn_mma.py:401-425) and its 5-term FLOPs model (:191-221 — here
simply 4*B*H*Sq*Skv*D for QK^T + PV, halved when causal).

Usage: python bench/flash_attn.py [--B 1] [--H 8] [--N 4096] [--D 64]
       [--sweep] [--causal] [--check] [--variants mha_]
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
from tpukern.ops.attention import MAX_HEADDIM


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=1)
    p.add_argument("--H", type=int, default=8)
    p.add_argument("--N", type=int, default=4096)
    p.add_argument("--D", type=int, default=64)
    p.add_argument("--sweep", action="store_true",
                   help="sweep N in 1k..8k and D in {64,128,256,512}")
    p.add_argument("--sweep-plot", action="store_true",
                   help="TFLOPS-vs-S curve per D tier (64..512) vs tuned "
                        "splash, saved to bench/plots/fa_sweep*.png (the "
                        "reference's published benchmark grid, "
                        "flash_attn_mma.py:431-434)")
    p.add_argument("--plot", default=None,
                   help="plot path; defaults to bench/plots/"
                        "fa_sweep[_causal].png per --causal")
    p.add_argument("--sweep-passes", type=int, default=1,
                   help="best-of-N interleaved passes per sweep-plot point")
    p.add_argument("--causal", action="store_true")
    p.add_argument("--check", action="store_true")
    p.add_argument("--check-all", action="store_true",
                   help="with --check: also dump an 8x8 output slice per "
                        "variant next to the reference slice "
                        "(flash_attn_mma.py --check-all analog)")
    p.add_argument("--no-rand-q", action="store_true",
                   help="q = all-ones (deterministic triage input)")
    p.add_argument("--no-rand-k", action="store_true",
                   help="k = all-ones")
    p.add_argument("--no-rand-v", action="store_true",
                   help="v = all-ones")
    p.add_argument("--range-k", action="store_true",
                   help="k[..., s, :] = s / N ramp along the sequence "
                        "(makes attention output position-decodable, "
                        "flash_attn_mma.py:353-381 analog)")
    p.add_argument("--variants", default="")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--trace", default="",
                   help="capture an xprof trace to this dir")
    return p.parse_args()


def sweep_plot(args):
    """The reference's benchmark-grid analog: one TFLOPS-vs-S curve per
    head-dim tier, tpukern auto-dispatch vs TUNED splash (best over its
    two best block configs per point). (B, H) per tier follow the
    round-2 flagship shapes (BENCH_NOTES)."""
    from tpukern.harness.bench import device_time
    from tpukern.ops.attention import flash_attention, splash_baseline

    tiers = {64: (4, 48), 128: (4, 16), 256: (2, 8), 512: (1, 8)}
    seqs = (1024, 2048, 4096, 8192)
    causal = args.causal
    rng = np.random.default_rng(args.seed)
    results = {}  # (D, S) -> {"tpukern": tf, "splash": tf}
    for D, (B, H) in tiers.items():
        for S in seqs:
            q, k, v = (jnp.asarray(rng.standard_normal((B, H, S, D)),
                                   jnp.bfloat16) for _ in range(3))
            fl = 4 * B * H * S * S * D // (2 if causal else 1)

            def t(fn):
                tf = fl / device_time(fn, q, k, v, iters_lo=4,
                                      iters_hi=12) / 1e12
                # v5e bf16 peak is 197 TFLOPS: a sample above it is a
                # tunnel timing glitch, not a fast kernel — discard it
                # so best-of-passes can never freeze impossible physics
                # (the same gate as bench.py / tools/fa_cfg_ab.py)
                return tf if tf <= 197.0 else 0.0

            # best over --sweep-passes interleaved passes per point: both
            # sides sampled adjacently each pass, so thin margins aren't
            # tunnel-phase artifacts (the ~3% drift band, BENCH_NOTES)
            row = {}
            for _ in range(args.sweep_passes):
                try:
                    row["tpukern"] = max(
                        row.get("tpukern", 0.0),
                        t(lambda q, k, v: flash_attention(
                            q, k, v, causal=causal)))
                except Exception as e:
                    print(f"# D={D} S={S} tpukern FAIL {str(e)[:80]}",
                          flush=True)
                for (bq, bkv) in ((1024, 2048), (512, 1024)):
                    try:
                        row["splash"] = max(
                            row.get("splash", 0.0),
                            t(lambda q, k, v, _bq=bq, _bkv=bkv:
                              splash_baseline(q, k, v, causal=causal,
                                              block_q=_bq, block_kv=_bkv)))
                    except Exception:
                        pass
            results[(D, S)] = row
            pk, sp = row.get("tpukern"), row.get("splash")
            r = f"  ratio {pk / sp:5.2f}x" if pk and sp else ""
            print(f"D={D:<4} S={S:<5} tpukern {pk or float('nan'):6.1f} "
                  f"splash_tuned {sp or float('nan'):6.1f} TFLOPS{r}",
                  flush=True)

    if args.plot:
        import os
        os.makedirs(os.path.dirname(args.plot) or ".", exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 4, figsize=(16, 4), sharex=True)
        for ax, (D, (B, H)) in zip(axes, tiers.items()):
            for name, marker in (("tpukern", "o"), ("splash", "s")):
                ys = [results.get((D, s), {}).get(name) for s in seqs]
                ax.plot(seqs, ys, marker=marker, ms=4,
                        label="tpukern FA" if name == "tpukern"
                        else "splash (tuned)")
            ax.set_title(f"D={D} (B={B}, H={H})")
            ax.set_xlabel("S")
            ax.set_xscale("log", base=2)
            ax.grid(alpha=0.3)
        axes[0].set_ylabel("TFLOPS")
        axes[0].legend(fontsize=8)
        fig.suptitle(
            f"FlashAttention forward, TPU v5e, bf16"
            f"{' causal' if causal else ''}: tpukern vs tuned splash")
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"saved {args.plot}")


def main():
    import contextlib
    args = get_args()
    if args.sweep_plot:
        if args.plot is None:
            args.plot = ("bench/plots/fa_sweep_causal.png" if args.causal
                         else "bench/plots/fa_sweep.png")
        sweep_plot(args)
        return
    stack = contextlib.ExitStack()
    if args.trace:
        from tpukern.harness.profiling import trace
        stack.enter_context(trace(args.trace))
    cases = ([(args.B, args.H, n, d)
              for n in (1024, 2048, 4096, 8192)
              for d in (64, 128, 256, 512)]
             if args.sweep else [(args.B, args.H, args.N, args.D)])
    variants = registry.variants("attention")
    if args.variants:
        pats = args.variants.split(",")
        variants = {k: v for k, v in variants.items()
                    if any(p in k for p in pats)}

    rng = np.random.default_rng(args.seed)
    for (B, H, N, D) in cases:
        pretty_print_line(f"B={B} H={H} N={N} D={D} causal={args.causal}")
        q = (np.ones((B, H, N, D)) if args.no_rand_q
             else rng.standard_normal((B, H, N, D)))
        if args.range_k:
            k = np.broadcast_to(
                (np.arange(N, dtype=np.float64) / N)[None, None, :, None],
                (B, H, N, D)).copy()
        elif args.no_rand_k:
            k = np.ones((B, H, N, D))
        else:
            k = rng.standard_normal((B, H, N, D))
        v_ = (np.ones((B, H, N, D)) if args.no_rand_v
              else rng.standard_normal((B, H, N, D)))
        flops = 4 * B * H * N * N * D // (2 if args.causal else 1)
        for name, var in sorted(variants.items()):
            if MAX_HEADDIM.get(name, 1024) < D:
                print(f"{name:<34} SKIP (D={D} > max headdim)")
                continue
            dt = (jnp.float16 if "f16" in name and "bf16" not in name else
                  jnp.float32 if "f32" in name else jnp.bfloat16)
            qj, kj, vj = (jnp.asarray(x, dt) for x in (q, k, v_))
            fn = jax.jit(lambda q_, k_, v__, _f=var.fn:
                         _f(q_, k_, v__, causal=args.causal))
            try:
                run_benchmark(fn, qj, kj, vj, tag=name, flops=flops,
                              iters=args.iters,
                              ref=(lambda q_, k_, v__, _r=var.ref:
                                   _r(q_, k_, v__, causal=args.causal))
                              if args.check else None,
                              check=args.check)
                if args.check_all:
                    # 8-row output slice next to the reference slice
                    # (flash_attn_mma.py --check-all dump analog)
                    out = np.asarray(fn(qj, kj, vj), np.float32)
                    refv = np.asarray(
                        var.ref(qj, kj, vj, causal=args.causal),
                        np.float32)
                    np.set_printoptions(precision=4, suppress=True,
                                        linewidth=120)
                    print(f"  {name} out[0,0,:8,:8]:\n{out[0, 0, :8, :8]}")
                    print(f"  ref  out[0,0,:8,:8]:\n{refv[0, 0, :8, :8]}")
            except Exception as e:
                print(f"{name:<34} SKIP ({type(e).__name__}: "
                      f"{str(e)[:120]})")
    stack.close()


if __name__ == "__main__":
    main()
