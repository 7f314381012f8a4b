"""Small-S causal dispatch probe (VERDICT r4 item 5 / ADVICE r4 item 1).

At S == block_k the causal grid has a single KV block, so the
diagonal-quadrant body replaces 100% of the work instead of
specializing a 1/Tc fraction: round 4's unified causal default took
(D=64, S=1024) from 65.5 to 45.8 TFLOPS (-30%). But the same round's
grid shows the quadrant body apparently HELPING single-block D>=256
points (79.0 / 76.7 TFLOPS) — conflated there with a block re-tune.
This probe isolates the factors per (D, S<=2048) class: auto dispatch,
diag forced on/off, and small-block alternatives, each measured in the
same interleaved pass next to the tuned-splash anchors.

Usage: python tools/fa_smalls_probe.py [--passes N] [--seqs 1024,2048]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp


TIERS = {64: (4, 48), 128: (4, 16), 256: (2, 8), 512: (1, 8)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--seqs", default="1024")
    ap.add_argument("--dims", default="64,128,256,512")
    args = ap.parse_args()

    from tpukern.harness.bench import device_time
    from tpukern.ops.attention import flash_attention, splash_baseline

    seqs = [int(s) for s in args.seqs.split(",")]
    dims = [int(d) for d in args.dims.split(",")]
    rng = np.random.default_rng(42)

    for D in dims:
        B, H = TIERS[D]
        for S in seqs:
            q, k, v = (jnp.asarray(rng.standard_normal((B, H, S, D)),
                                   jnp.bfloat16) for _ in range(3))
            fl = 4 * B * H * S * S * D // 2

            def t(fn):
                return fl / device_time(fn, q, k, v, iters_lo=4,
                                        iters_hi=12) / 1e12

            def std(tag, **kw):
                return (tag, lambda q, k, v: flash_attention(
                    q, k, v, causal=True, **kw))

            cands = [
                std("auto"),
                std("diag_on", block_q=1024, block_k=1024,
                    diag_quadrant=True),
                std("diag_off", block_q=1024, block_k=1024,
                    diag_quadrant=False),
                # two KV blocks -> one interior block amortizes the diag
                std("512x512_diag", block_q=512, block_k=512,
                    diag_quadrant=True),
                std("512x512", block_q=512, block_k=512,
                    diag_quadrant=False),
                std("1024x512", block_q=1024, block_k=512),
                ("splash_1024x2048", lambda q, k, v: splash_baseline(
                    q, k, v, causal=True, block_q=1024, block_kv=2048)),
                ("splash_512x1024", lambda q, k, v: splash_baseline(
                    q, k, v, causal=True, block_q=512, block_kv=1024)),
            ]

            best, dead = {}, set()
            for p in range(args.passes):
                for name, fn in cands:
                    if name in dead:
                        continue
                    try:
                        v_t = t(fn)
                        best[name] = max(best.get(name, 0.0), v_t)
                    except Exception as e:
                        print(f"  D={D} S={S} {name}: FAIL {str(e)[:90]}",
                              flush=True)
                        dead.add(name)
            base = max((v for n, v in best.items()
                        if n.startswith("splash")), default=0.0)
            print(f"== D={D} S={S} (B={B} H={H})", flush=True)
            for name, v_t in sorted(best.items(), key=lambda kv: -kv[1]):
                r = f" ({v_t / base * 100:.1f}% of splash)" if base else ""
                print(f"  {name}: {v_t:6.1f} TFLOPS{r}", flush=True)


if __name__ == "__main__":
    main()
