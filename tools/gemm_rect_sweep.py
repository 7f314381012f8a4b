"""Non-square GEMM sweep (VERDICT r3 item 9): decode-shaped (M << N,K)
and rectangular prefill/MLP shapes vs best-XLA, same-phase interleaved.

The reference benchmarks M, N, K as independent axes
(/root/reference/kernels/hgemm/hgemm.py:277-306); every repo sweep so
far was cubic M=N=K. This sweep covers the off-diagonal shapes where
auto_blocks' analytic roofline model is least validated: token-decode
GEMMs (tiny M, the w8a16 family's bf16 anchor case) and the
transformer MLP rectangles.

Usage: python tools/gemm_rect_sweep.py [--passes 2]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from tpukern.harness.bench import device_time
from tpukern.ops.matmul import hgemm, auto_blocks


# (M, N, K) — decode rows first, then MLP/attention rectangles
SHAPES = [
    (8, 4096, 4096),
    (32, 4096, 4096),
    (128, 4096, 4096),
    (256, 14336, 4096),
    (64, 8192, 8192),
    (4096, 14336, 4096),    # MLP up-proj
    (4096, 4096, 14336),    # MLP down-proj
    (16384, 2048, 2048),    # tall-skinny output
    (2048, 2048, 16384),    # deep-K reduction
    (8192, 1024, 8192),     # narrow-N
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--shapes", default="",
                    help="comma list of MxNxK to run (default: all)")
    args = ap.parse_args()
    shapes = SHAPES
    if args.shapes:
        shapes = [tuple(int(x) for x in s.split("x"))
                  for s in args.shapes.split(",")]

    def t(fn, a, b, jitter=False):
        return device_time(fn, a, b, iters_lo=8, iters_hi=40,
                           jitter_kw="jitter" if jitter else None)

    print(f"{'M':>6} {'N':>6} {'K':>6} {'blocks':>16} "
          f"{'tpukern':>9} {'xla':>9} {'ratio':>7}")
    rows = []
    for (M, N, K) in shapes:
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        fl = 2 * M * N * K
        ab = auto_blocks(M, N, K)
        blk = f"{ab['block_m']}x{ab['block_n']}x{ab['block_k']}"
        best_pk, best_xla = 0.0, 0.0
        best_ratio = 0.0
        for _ in range(args.passes):
            try:
                sec_pk = t(hgemm, a, b, jitter=True)
            except Exception as e:  # noqa: BLE001 — log compile failures
                print(f"  pk FAIL: {type(e).__name__}: {str(e)[:90]}")
                break
            sec_xla = t(lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16), a, b)
            pk, xla = fl / sec_pk / 1e12, fl / sec_xla / 1e12
            if pk > 197.0 or xla > 197.0:
                # above the v5e bf16 peak: tunnel timing glitch — void
                # the pass (same gate as bench.py / fa tooling)
                print(f"  # pass voided: pk {pk:.1f} / xla {xla:.1f} "
                      f"TFLOPS exceeds the 197 roofline", flush=True)
                continue
            best_ratio = max(best_ratio, pk / xla)  # same-phase pair
            best_pk, best_xla = max(best_pk, pk), max(best_xla, xla)
        rows.append((M, N, K, blk, best_pk, best_xla, best_ratio))
        print(f"{M:>6} {N:>6} {K:>6} {blk:>16} "
              f"{best_pk:>9.1f} {best_xla:>9.1f} {100 * best_ratio:>6.1f}%",
              flush=True)
    worst = min((r[-1] for r in rows if r[-1]), default=0)
    print(f"\nworst same-phase ratio: {100 * worst:.1f}%")


if __name__ == "__main__":
    main()
