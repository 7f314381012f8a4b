"""Adjacent-pair config-vs-config A/B for flash_attention dispatch
decisions (VERDICT r4 items 5/6): times N candidate kernel configs +
the tuned splash anchors back-to-back inside each sample, so every
candidate sees the same tunnel phase. Verdict material for per-(D,S)
dispatch-table entries; a candidate only displaces the default if it
wins the pairwise ratio on EVERY sample (the w8a16-boundary protocol,
BENCH_NOTES round 4).

Rows above the 197 TFLOPS bf16 roofline are timing glitches and void
the whole sample (every config's number that round is discarded).

Usage:
  python tools/fa_cfg_ab.py --B 1 --H 8 --S 1024 --D 512 --causal \
      --cfgs auto,1024x1024,512x512 [--samples 6]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

ROOF_TFLOPS = 197.0  # v5e bf16 peak; above this the timing is broken


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, required=True)
    ap.add_argument("--H", type=int, required=True)
    ap.add_argument("--S", type=int, required=True)
    ap.add_argument("--D", type=int, required=True)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--cfgs", default="auto,512x512")
    ap.add_argument("--samples", type=int, default=6)
    args = ap.parse_args()

    from tpukern.harness.bench import device_time
    from tpukern.ops.attention import flash_attention, splash_baseline

    B, H, S, D, causal = args.B, args.H, args.S, args.D, args.causal
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, S, D)),
                           jnp.bfloat16) for _ in range(3))
    fl = 4 * B * H * S * S * D // (2 if causal else 1)

    def mk(cfg):
        if cfg == "auto":
            return lambda q, k, v: flash_attention(q, k, v, causal=causal)
        # "1024x1024d" forces diag_quadrant=True, "...n" forces it off
        dq = None
        if cfg.endswith(("d", "n")):
            dq, cfg = cfg.endswith("d"), cfg[:-1]
        bq, bk = (int(x) for x in cfg.split("x"))
        return lambda q, k, v: flash_attention(
            q, k, v, causal=causal, block_q=bq, block_k=bk,
            diag_quadrant=dq)

    cands = {c: mk(c) for c in args.cfgs.split(",")}
    cands["splash_512x1024"] = lambda q, k, v: splash_baseline(
        q, k, v, causal=causal, block_q=512, block_kv=1024)
    cands["splash_1024x2048"] = lambda q, k, v: splash_baseline(
        q, k, v, causal=causal, block_q=1024, block_kv=2048)

    kept = {c: [] for c in cands}
    n_void = 0
    for i in range(args.samples):
        row = {}
        for c, fn in cands.items():
            try:
                row[c] = fl / device_time(fn, q, k, v,
                                          iters_lo=8, iters_hi=24) / 1e12
            except Exception as e:
                print(f"  {c}: FAIL {str(e)[:80]}", flush=True)
                row[c] = 0.0
        if any(tf > ROOF_TFLOPS for tf in row.values()):
            bad = {c: round(tf, 1) for c, tf in row.items()
                   if tf > ROOF_TFLOPS}
            print(f"sample {i + 1}: VOID (>{ROOF_TFLOPS:.0f} TFLOPS "
                  f"glitch: {bad})", flush=True)
            n_void += 1
            continue
        for c, tf in row.items():
            kept[c].append(tf)
        print("sample %d: %s" % (
            i + 1, "  ".join(f"{c} {tf:6.1f}" for c, tf in row.items())),
            flush=True)

    print(f"== B={B} H={H} S={S} D={D} causal={causal} "
          f"({len(kept['auto']) if 'auto' in kept else 0} kept, "
          f"{n_void} void)", flush=True)
    for c, vals in sorted(kept.items(),
                          key=lambda kv: -(min(kv[1]) if kv[1] else 0)):
        if not vals:
            continue
        print(f"  {c}: min {min(vals):6.1f}  med "
              f"{sorted(vals)[len(vals) // 2]:6.1f}  max {max(vals):6.1f}",
              flush=True)


if __name__ == "__main__":
    main()
