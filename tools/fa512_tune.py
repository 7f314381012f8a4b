"""Large-D FlashAttention tuning: the (1,8,4096,512) non-causal shape
where round 2 trailed tuned splash 164.5 vs 166.5 TFLOPS (VERDICT r2
item 3). Interleaved same-phase measurement: every pass re-times the
splash baselines next to each candidate so tunnel phase drift cancels.

Usage: python tools/fa512_tune.py [--passes N] [--causal]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--B", type=int, default=1)
    ap.add_argument("--H", type=int, default=8)
    ap.add_argument("--S", type=int, default=4096)
    ap.add_argument("--D", type=int, default=512)
    args = ap.parse_args()

    from tpukern.harness.bench import device_time
    from tpukern.ops.attention import (flash_attention, splash_baseline)

    B, H, S, D = args.B, args.H, args.S, args.D
    causal = args.causal
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    fl = 4 * B * H * S * S * D // (2 if causal else 1)

    def t(fn):
        return fl / device_time(fn, q, k, v, iters_lo=4, iters_hi=12) / 1e12

    def std(bq, bk, **kw):
        return (f"std({bq},{bk}){'+'.join(kw) if kw else ''}",
                lambda q, k, v: flash_attention(
                    q, k, v, causal=causal, block_q=bq, block_k=bk, **kw))

    def spl(bq, bkv):
        return (f"splash({bq},{bkv})",
                lambda q, k, v: splash_baseline(
                    q, k, v, causal=causal, block_q=bq, block_kv=bkv))

    cands = [
        spl(1024, 2048),          # the round-2 "tuned splash" config
        std(512, 1024),           # round-2 best: 164.5
        spl(512, 1024),
        std(1024, 512),
        std(512, 1024, duo=True),
        std(256, 2048),
        std(1024, 1024),
        std(512, 2048),
        std(512, 1536),
        std(256, 1024, duo=True),
    ]

    best = {}
    dead = set()
    for p in range(args.passes):
        print(f"== pass {p + 1} B={B} H={H} S={S} D={D} causal={causal}",
              flush=True)
        for name, fn in cands:
            if name in dead:
                continue
            try:
                v_t = t(fn)
                best[name] = max(best.get(name, 0.0), v_t)
                print(f"  {name}: {v_t:6.1f} TFLOPS", flush=True)
            except Exception as e:
                print(f"  {name}: FAIL {str(e)[:100]}", flush=True)
                dead.add(name)
    print("== best over passes", flush=True)
    base = max((v for n, v in best.items() if n.startswith("splash")),
               default=0.0)
    for name, v_t in sorted(best.items(), key=lambda kv: -kv[1]):
        r = f" ({v_t / base * 100:.1f}% of best splash)" if base else ""
        print(f"  {name}: {v_t:6.1f} TFLOPS{r}", flush=True)


if __name__ == "__main__":
    main()
