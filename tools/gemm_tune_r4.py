"""Round-4 GEMM headline tuner.

Goal (VERDICT r3 item 1): find a config that beats best-XLA at 4096^3
(>=100% best / >=98% floor), or confirm 4096^3 is a structural loss and
certify a shape where the win is demonstrable (12288^3 measured 101.0%,
3328^3 measured 105.4% in round 3).

Unexplored corners this sweep covers at 4096^3:
  - bigger blocks that halve the grid-step count (per-step overhead is
    the measured binding constraint, docs/profiling.md): (1024,1024,1024),
    (2048,1024,512), (1024,2048,512), (2048,512,512)
  - pipeline-depth knobs on the big blocks (buffer_count=3, lookahead)
  - matmul_kpipe at the same big tiles (K inside the kernel: nK fewer
    grid steps)

Timing = jitter-mode on-device slope (same methodology as bench.py);
XLA baselines re-timed inside every pass so ratios are same-phase.

Usage: python tools/gemm_tune_r4.py [--mnk 4096] [--passes 2] [--confirm]
  --confirm: skip the sweep; run known-best configs at 3328/4096/12288
             interleaved with XLA for certified-shape selection.
"""

import argparse
import functools
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def make_timer(flops, iters=(8, 40)):
    from tpukern.harness.bench import device_time

    def t(fn, a, b, jitter):
        sec = device_time(fn, a, b, iters_lo=iters[0], iters_hi=iters[1],
                          jitter_kw="jitter" if jitter else None)
        return flops / sec / 1e12
    return t


def xla_f32(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def xla_bf16(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32
                   ).astype(jnp.bfloat16)


def sweep(mnk, passes, iters):
    from tpukern.ops.matmul import matmul, matmul_kpipe

    M = N = K = mnk
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    t = make_timer(2 * M * N * K, iters)

    def mm(**cfg):
        return lambda a, b, **kw: matmul(a, b, **cfg, **kw)

    def kp(**cfg):
        return lambda a, b, **kw: matmul_kpipe(a, b, **cfg, **kw)

    configs = [
        # incumbent
        ("scr_1024x1024x512", mm(block_m=1024, block_n=1024, block_k=512)),
        # halve the grid-step count
        ("scr_1024x1024x1024", mm(block_m=1024, block_n=1024, block_k=1024)),
        ("scr_2048x1024x512", mm(block_m=2048, block_n=1024, block_k=512)),
        ("scr_1024x2048x512", mm(block_m=1024, block_n=2048, block_k=512)),
        ("scr_2048x512x512", mm(block_m=2048, block_n=512, block_k=512)),
        ("acc_1024x1024x1024", mm(block_m=1024, block_n=1024, block_k=1024,
                                  acc_in_out=True)),
        # pipeline depth on the best tiles
        ("scr_b3_1024x1024x512", mm(block_m=1024, block_n=1024, block_k=512,
                                    buffer_count=3)),
        ("scr_la3_2048x1024x512", mm(block_m=2048, block_n=1024, block_k=512,
                                     buffer_count=3, lookahead=True)),
        ("eag_2048x1024x512", mm(block_m=2048, block_n=1024, block_k=512,
                                 eager_store=True)),
        # K inside the kernel
        ("kpipe_1024x1024x512", kp(block_m=1024, block_n=1024, block_k=512)),
        ("kpipe_2048x1024x512", kp(block_m=2048, block_n=1024, block_k=512)),
        ("kpipe_1024x1024x1024", kp(block_m=1024, block_n=1024,
                                    block_k=1024)),
    ]

    for p in range(1, passes + 1):
        bx = max(t(xla_f32, a, b, False), t(xla_bf16, a, b, False))
        print(f"[pass{p}] xla_best {bx:7.1f} TFLOPS", flush=True)
        for name, fn in configs:
            try:
                v = t(fn, a, b, True)
                print(f"[pass{p}] {name:<24} {v:7.1f} TFLOPS "
                      f"({100 * v / bx:5.1f}% of pass-open xla)", flush=True)
            except Exception as e:
                print(f"[pass{p}] {name:<24} FAIL {type(e).__name__}: "
                      f"{str(e)[:110]}", flush=True)
        bx2 = max(t(xla_f32, a, b, False), t(xla_bf16, a, b, False))
        print(f"[pass{p}] xla_best(close) {bx2:7.1f} TFLOPS", flush=True)


def confirm(passes, iters):
    """Known-best config vs XLA at the three candidate certified shapes,
    strictly interleaved (XLA, kernel, XLA, kernel) per shape per pass."""
    from tpukern.ops.matmul import matmul
    from tpukern.ops.matmul import auto_blocks

    shapes = [3328, 4096, 12288]
    data = {}
    rng = np.random.default_rng(0)
    for s in shapes:
        a = jnp.asarray(rng.standard_normal((s, s)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((s, s)), jnp.bfloat16)
        data[s] = (a, b)

    for p in range(1, passes + 1):
        for s in shapes:
            a, b = data[s]
            t = make_timer(2 * s ** 3, iters)
            cfg = auto_blocks(s, s, s)
            fn = lambda a, b, _c=cfg, **kw: matmul(a, b, **_c, **kw)
            bx = max(t(xla_f32, a, b, False), t(xla_bf16, a, b, False))
            v = t(fn, a, b, True)
            bx2 = max(t(xla_f32, a, b, False), t(xla_bf16, a, b, False))
            base = max(bx, bx2)
            print(f"[pass{p}] {s}^3 auto={cfg} pk {v:7.1f} "
                  f"xla {bx:7.1f}/{bx2:7.1f} -> {100 * v / base:5.1f}%",
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mnk", type=int, default=4096)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--iters", type=int, nargs=2, default=(8, 40))
    ap.add_argument("--confirm", action="store_true")
    args = ap.parse_args()
    if args.confirm:
        confirm(args.passes, tuple(args.iters))
    else:
        sweep(args.mnk, args.passes, tuple(args.iters))


if __name__ == "__main__":
    main()
