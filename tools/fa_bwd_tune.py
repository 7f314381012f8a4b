"""FlashAttention BACKWARD tuner (VERDICT r2 item 4): block sweep for
the Pallas dQ/dKV kernels at the flagship shapes, measured against the
autodiff of the external tuned baselines in the same tunnel phase.

Timing covers the backward only (residuals precomputed): for tpukern
that is flash_attention_bwd(q, k, v, o, lse, do) including the di
precompute; for the baselines it is the VJP apply of the full kernel
minus nothing (their fwd+bwd) — so the baseline rows also report the
fwd-subtracted estimate (bwd ~= vjp - fwd) for an apples-to-apples view.

TFLOPS-equiv basis: bwd_flops = 2.5 * fwd_flops (5 S^2 D matmuls vs 2),
fwd_flops = 4 B H Sq Skv D (halved for causal).

Usage: python tools/fa_bwd_tune.py [--passes N] [--cases small|flag|all]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--cases", default="flag",
                    choices=["flag", "d128", "all", "refgrad", "fused",
                             "fused256", "fused512", "bwdgrid"])
    ap.add_argument("--no-causal", action="store_true",
                    help="bwdgrid: run the non-causal grid instead")
    args = ap.parse_args()

    from tpukern.harness.bench import device_time
    from tpukern.ops.attention import (flash_attention, attention_ref,
                                       splash_baseline)
    from tpukern.ops.attention_bwd import flash_attention_bwd

    def run_case(B, H, S, D, causal, blocks, passes, with_refgrad=False):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        do = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        # untimed: just produces o/lse for the backward candidates.
        # (1024,1024) f32 score tiles overflow VMEM at D=512.
        fb = 512 if D >= 512 else 1024
        o, lse = flash_attention(q, k, v, causal=causal, return_stats=True,
                                 block_q=fb, block_k=fb)
        fwd_fl = 4 * B * H * S * S * D // (2 if causal else 1)
        bwd_fl = int(2.5 * fwd_fl)

        cands = {}
        for (bq, bk, tr) in blocks:
            if tr == "auto":  # production dispatch, no block override
                cands["pk_bwd(auto)"] = (
                    "bwd", lambda q, k, v, o, lse, do: flash_attention_bwd(
                        q, k, v, o, lse, do, causal=causal))
                continue
            if tr == "F":  # fused one-recompute kernel
                nm = f"pk_bwd({bq},{bk})F"
                cands[nm] = ("bwd", lambda q, k, v, o, lse, do, _bq=bq,
                             _bk=bk: flash_attention_bwd(
                                 q, k, v, o, lse, do, causal=causal,
                                 block_q=_bq, block_k=_bk, fused=True))
                continue
            nm = f"pk_bwd({bq},{bk}){'T' if tr else ''}"
            cands[nm] = ("bwd", lambda q, k, v, o, lse, do, _bq=bq, _bk=bk,
                         _tr=tr: flash_attention_bwd(
                             q, k, v, o, lse, do, causal=causal,
                             block_q=_bq, block_k=_bk, transposed=_tr,
                             fused=False))

        # external baselines: time fwd alone and the full vjp, then report
        # vjp - fwd as the backward estimate. 1024-class blocks VMEM-OOM
        # their backwards at D >= 256 (BENCH_NOTES round 4), so the
        # baseline block class shrinks with D to give them a real anchor.
        import math
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
            # splash with explicit backward blocks (its vjp refuses to
            # run without them)
            from jax.experimental.pallas.ops.tpu.splash_attention import (
                splash_attention_kernel as _sak,
                splash_attention_mask as _sam)
            S = q.shape[2]
            mask = (_sam.CausalMask((S, S)) if causal
                    else _sam.FullMask((S, S)))
            mh = _sam.MultiHeadMask([mask] * q.shape[1])
            bs = _sak.BlockSizes(
                block_q=bl, block_kv=bl, block_kv_compute=bl,
                block_q_dkv=bl, block_kv_dkv=bl,
                block_kv_dkv_compute=bl,
                block_q_dq=bl, block_kv_dq=bl)
            kern = _sak.make_splash_mha(mh, block_sizes=bs, head_shards=1,
                                        q_seq_shards=1)
            sm = 1.0 / math.sqrt(D)
            return jax.vmap(kern)((q * sm).astype(q.dtype), k, v)

        for nm, f in (("jax_flash_tuned", jaxfa), ("splash_tuned", splash)):
            def vjp_fn(q, k, v, do, _f=f):
                out, pull = jax.vjp(_f, q, k, v)
                return pull(do)
            cands[nm + "_fwd"] = ("fwd", lambda q, k, v, _f=f: _f(q, k, v))
            cands[nm + "_vjp"] = ("vjp", vjp_fn)

        if with_refgrad:
            # XLA autodiff of the unfused reference (materializes the S^2
            # score matrix both directions) — only fits small shapes
            def ref_vjp(q, k, v, do):
                out, pull = jax.vjp(
                    lambda q, k, v: attention_ref(q, k, v, causal=causal),
                    q, k, v)
                return pull(do)
            cands["xla_autodiff_ref_vjp"] = ("vjp", ref_vjp)

        best = {}
        dead = set()
        for p in range(passes):
            print(f"== pass {p + 1} B={B} H={H} S={S} D={D} "
                  f"causal={causal}", flush=True)
            for nm, (kind, f) in cands.items():
                if nm in dead:
                    continue
                a = ((q, k, v, o, lse, do) if kind == "bwd" else
                     (q, k, v, do) if kind == "vjp" else (q, k, v))
                try:
                    t = device_time(f, *a, iters_lo=2, iters_hi=8)
                    best[nm] = min(best.get(nm, 1e9), t)
                    fl = {"bwd": bwd_fl, "vjp": fwd_fl + bwd_fl,
                          "fwd": fwd_fl}[kind]
                    print(f"  {nm}: {t * 1e3:8.2f} ms  "
                          f"{fl / t / 1e12:6.1f} TFLOPS-equiv", flush=True)
                except Exception as e:
                    print(f"  {nm}: FAIL {str(e)[:100]}", flush=True)
                    dead.add(nm)

        print("== summary (best over passes)", flush=True)
        for nm in sorted(best):
            if nm.endswith("_vjp") and nm.replace("_vjp", "_fwd") in best:
                sub = best[nm] - best[nm.replace("_vjp", "_fwd")]
                print(f"  {nm} - fwd = {sub * 1e3:8.2f} ms  "
                      f"{bwd_fl / sub / 1e12:6.1f} TFLOPS-equiv (bwd est)",
                      flush=True)
            elif nm.startswith("pk_bwd"):
                print(f"  {nm}: {best[nm] * 1e3:8.2f} ms  "
                      f"{bwd_fl / best[nm] / 1e12:6.1f} TFLOPS-equiv",
                      flush=True)

    flag_blocks = [
        (256, 512, None),      # round-2 default (the 42.1 baseline config)
        (512, 512, None),
        (512, 1024, None),
        (1024, 1024, None),
        (1024, 2048, None),
        (2048, 1024, None),
        (512, 1024, True),
        (1024, 1024, True),
        (1024, 2048, True),
        (2048, 2048, True),
    ]
    fused_blocks = [
        (512, 512, "F"),
        (512, 1024, "F"),
        (1024, 512, "F"),
        (1024, 1024, "F"),
        (1024, 2048, "F"),
        (1024, 1024, None),    # best two-kernel config, same-phase anchor
    ]
    if args.cases in ("flag", "all"):
        run_case(4, 48, 8192, 64, False, flag_blocks, args.passes)
        run_case(4, 48, 8192, 64, True, flag_blocks, args.passes)
    if args.cases in ("d128", "all"):
        d128 = [(bq, bk, tr) for (bq, bk, tr) in flag_blocks if tr is None]
        run_case(4, 16, 8192, 128, False, d128, args.passes)
        run_case(4, 16, 8192, 128, True, d128, args.passes)
    if args.cases in ("fused", "all"):
        run_case(4, 48, 8192, 64, False, fused_blocks, args.passes)
        run_case(4, 48, 8192, 64, True, fused_blocks, args.passes)
        run_case(4, 16, 8192, 128, False, fused_blocks, args.passes)
        run_case(4, 16, 8192, 128, True, fused_blocks, args.passes)
    if args.cases in ("fused256", "all"):
        # large-D fused tier (VERDICT r3 item 6): resident dQ exceeds the
        # VMEM budget at D=256 S=8192, so the fused kernel accumulates dQ
        # in HBM-revisited per-q-block outputs (attention_bwd.py)
        f256 = [
            (256, 1024, "F"),
            (512, 1024, "F"),
            (512, 512, "F"),
            (256, 2048, "F"),
            (512, 1024, None),   # two-kernel anchors (D=256 defaults)
            (512, 2048, None),
        ]
        run_case(4, 16, 8192, 256, False, f256, args.passes)
        run_case(4, 16, 8192, 256, True, f256, args.passes)
    if args.cases in ("fused512",):
        f512 = [
            (256, 512, "F"),
            (256, 1024, "F"),
            (512, 512, "F"),
            (256, 512, None),    # two-kernel anchors (D=512 defaults)
            (256, 1024, None),
        ]
        run_case(1, 8, 8192, 512, False, f512, args.passes)
        run_case(1, 8, 8192, 512, True, f512, args.passes)
    if args.cases in ("bwdgrid",):
        # published backward grid (VERDICT r3 item 3): the production
        # auto-dispatch backward vs tuned-external vjp-minus-fwd at every
        # head-dim tier; causal by default (--no-causal for the twin).
        # (B, H) per tier follow the forward sweep (bench/flash_attn.py).
        tiers = {64: (4, 48), 128: (4, 16), 256: (2, 8), 512: (1, 8)}
        for D, (B, H) in tiers.items():
            for S in (2048, 8192):
                run_case(B, H, S, D, not args.no_causal,
                         [(None, None, "auto")], args.passes)
    if args.cases in ("refgrad", "all"):
        # small shape where XLA autodiff of the unfused reference fits
        run_case(4, 8, 2048, 64, False,
                 [(256, 512, None), (1024, 1024, None), (1024, 1024, True)],
                 args.passes, with_refgrad=True)


if __name__ == "__main__":
    main()
