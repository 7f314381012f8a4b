"""FlashAttention block tuner: per-(S, D) x causal block sweep on the
real TPU, against the tuned external baselines. Produces the numbers
behind flash_attention's shape-aware defaults (the stage/swizzle-cache
analog, kernels/hgemm/hgemm.py:71-82).

Usage: python tools/fa_tune.py [--quick]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from tpukern.core import registry
    from tpukern.harness.bench import device_time
    from tpukern.ops.attention import flash_attention, flash_attention_tpv

    cases = [
        # (B, H, S, D, causal, candidate (bq, bk) list)
        (4, 48, 8192, 64, False, [(1024, 2048), (2048, 1024), (1024, 1024)]),
        (4, 48, 8192, 64, True, [(1024, 1024), (2048, 512), (512, 2048),
                                 (2048, 1024)]),
        (4, 16, 8192, 128, False, [(1024, 1024), (1024, 2048), (512, 2048)]),
        (4, 16, 8192, 128, True, [(1024, 1024), (2048, 512)]),
        (2, 8, 8192, 256, False, [(512, 1024), (1024, 512), (512, 512)]),
        (2, 8, 8192, 256, True, [(512, 1024), (1024, 512)]),
        (1, 8, 4096, 512, False, [(256, 512), (512, 512), (512, 256)]),
        (1, 8, 4096, 512, True, [(512, 256), (256, 512)]),
    ]
    if args.quick:
        cases = cases[:2]

    rng = np.random.default_rng(0)
    for (B, H, S, D, causal, blocks) in cases:
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        fl = 4 * B * H * S * S * D // (2 if causal else 1)

        def t(fn):
            return fl / device_time(fn, q, k, v, iters_lo=4,
                                    iters_hi=12) / 1e12

        print(f"== B={B} H={H} S={S} D={D} causal={causal}", flush=True)
        for (bq, bk) in blocks:
            try:
                v_t = t(lambda q, k, v, _bq=bq, _bk=bk: flash_attention(
                    q, k, v, causal=causal, block_q=_bq, block_k=_bk))
                print(f"  splitq ({bq},{bk}): {v_t:6.1f} TFLOPS", flush=True)
            except Exception as e:
                print(f"  splitq ({bq},{bk}): FAIL {str(e)[:80]}",
                      flush=True)
        if D <= 256:  # transposed-PV twin (the D<=64 dispatch winner)
            for (bq, bk) in blocks:
                try:
                    v_t = t(lambda q, k, v, _bq=bq, _bk=bk:
                            flash_attention_tpv(q, k, v, causal=causal,
                                                block_q=_bq, block_k=_bk))
                    print(f"  tpv ({bq},{bk}): {v_t:6.1f} TFLOPS",
                          flush=True)
                except Exception as e:
                    print(f"  tpv ({bq},{bk}): FAIL {str(e)[:80]}",
                          flush=True)
        for base in ("mha_splash_tuned", "mha_jax_flash"):
            try:
                var = registry.get("attention", base)
                v_t = t(lambda q, k, v, _f=var.fn: _f(q, k, v,
                                                      causal=causal))
                print(f"  {base}: {v_t:6.1f} TFLOPS", flush=True)
            except Exception as e:
                print(f"  {base}: FAIL {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
