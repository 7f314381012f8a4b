"""Adjacent-pair A/B re-adjudication for thin FA margins (VERDICT r4
item 6): any published win inside 1.10x sits within the documented ~3%
tunnel phase band, so it gets the same protocol that settled the round-4
w8a16 boundary — >= 6 adjacent interleaved samples per side, per-sample
ratios published with their range, verdict from the worst sample.

Forward samples time production flash_attention auto-dispatch against
BOTH tuned splash configs back-to-back (per-sample baseline = the faster
splash). Backward samples time flash_attention_bwd auto against the
best external estimate (vjp - fwd, both splash and jax-flash anchors)
in the same phase.

Usage:
  python tools/fa_ab.py --mode fwd --B 4 --H 16 --S 1024 --D 128 --causal
  python tools/fa_ab.py --mode bwd --B 4 --H 16 --S 8192 --D 128 --causal
"""

import argparse
import math
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["fwd", "bwd"], required=True)
    ap.add_argument("--B", type=int, required=True)
    ap.add_argument("--H", type=int, required=True)
    ap.add_argument("--S", type=int, required=True)
    ap.add_argument("--D", type=int, required=True)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--samples", type=int, default=6)
    args = ap.parse_args()

    from tpukern.harness.bench import device_time
    from tpukern.ops.attention import flash_attention, splash_baseline
    from tpukern.ops.attention_bwd import flash_attention_bwd

    B, H, S, D, causal = args.B, args.H, args.S, args.D, args.causal
    rng = np.random.default_rng(0)
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, S, D)),
                               jnp.bfloat16) for _ in range(4))
    fwd_fl = 4 * B * H * S * S * D // (2 if causal else 1)
    bwd_fl = int(2.5 * fwd_fl)

    if args.mode == "fwd":
        def pk(q, k, v):
            return flash_attention(q, k, v, causal=causal)

        spl_cfgs = ((1024, 2048), (512, 1024))

        def sample():
            t_pk = device_time(pk, q, k, v, iters_lo=4, iters_hi=12)
            ts = []
            for bq, bkv in spl_cfgs:
                try:  # large-D shapes VMEM-OOM the 2048-KV splash config
                    ts.append(device_time(
                        lambda q, k, v, _bq=bq, _bkv=bkv:
                        splash_baseline(q, k, v, causal=causal,
                                        block_q=_bq, block_kv=_bkv),
                        q, k, v, iters_lo=4, iters_hi=12))
                except Exception as e:
                    print(f"  # splash {bq}x{bkv} fail: {str(e)[:70]}",
                          flush=True)
            return t_pk, min(ts), fwd_fl
    else:
        fb = 512 if D >= 512 else 1024
        o, lse = flash_attention(q, k, v, causal=causal,
                                 return_stats=True, block_q=fb, block_k=fb)

        def pk_bwd(q, k, v, o, lse, do):
            return flash_attention_bwd(q, k, v, o, lse, do, causal=causal)

        bl = 1024 if D <= 128 else 512 if D == 256 else 256
        from jax.experimental.pallas.ops.tpu import (
            flash_attention as _jax_fa)
        bs = _jax_fa.BlockSizes(
            block_q=bl, block_k_major=bl, block_k=bl, block_b=1,
            block_q_major_dkv=bl, block_k_major_dkv=bl,
            block_k_dkv=bl, block_q_dkv=bl,
            block_k_major_dq=bl, block_k_dq=bl, block_q_dq=bl)

        def jaxfa(q, k, v):
            return _jax_fa.flash_attention(
                q, k, v, causal=causal, sm_scale=1.0 / math.sqrt(D),
                block_sizes=bs)

        def splash(q, k, v):
            from jax.experimental.pallas.ops.tpu.splash_attention import (
                splash_attention_kernel as _sak,
                splash_attention_mask as _sam)
            mask = (_sam.CausalMask((S, S)) if causal
                    else _sam.FullMask((S, S)))
            mh = _sam.MultiHeadMask([mask] * H)
            sbs = _sak.BlockSizes(
                block_q=bl, block_kv=bl, block_kv_compute=bl,
                block_q_dkv=bl, block_kv_dkv=bl, block_kv_dkv_compute=bl,
                block_q_dq=bl, block_kv_dq=bl)
            kern = _sak.make_splash_mha(mh, block_sizes=sbs,
                                        head_shards=1, q_seq_shards=1)
            sm = 1.0 / math.sqrt(D)
            return jax.vmap(kern)((q * sm).astype(q.dtype), k, v)

        baselines = {"splash": splash, "jaxfa": jaxfa}

        def sample():
            t_pk = device_time(pk_bwd, q, k, v, o, lse, do,
                               iters_lo=2, iters_hi=8)
            ests = []
            for f in baselines.values():
                def vjp_fn(q, k, v, do, _f=f):
                    out, pull = jax.vjp(_f, q, k, v)
                    return pull(do)
                try:
                    t_f = device_time(f, q, k, v, iters_lo=2, iters_hi=8)
                    t_v = device_time(vjp_fn, q, k, v, do,
                                      iters_lo=2, iters_hi=8)
                    if t_v > t_f:
                        ests.append(t_v - t_f)
                except Exception as e:
                    print(f"  # baseline fail: {str(e)[:80]}", flush=True)
            return t_pk, min(ests), bwd_fl

    ratios = []
    for i in range(args.samples):
        t_pk, t_base, fl = sample()
        r = t_base / t_pk
        ratios.append(r)
        print(f"sample {i + 1}: pk {fl / t_pk / 1e12:6.1f} TFLOPS-eq, "
              f"base {fl / t_base / 1e12:6.1f} -> ratio {r:.3f}x",
              flush=True)
    print(f"== {args.mode} B={B} H={H} S={S} D={D} causal={causal}: "
          f"ratios [{min(ratios):.3f}, {max(ratios):.3f}], "
          f"median {sorted(ratios)[len(ratios) // 2]:.3f}, "
          f"verdict {'WIN' if min(ratios) > 1.0 else 'NOT-SETTLED'} "
          f"(worst sample {min(ratios):.3f}x)", flush=True)


if __name__ == "__main__":
    main()
