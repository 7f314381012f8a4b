"""Headline benchmark: BF16 HGEMM at 4096^3 as % of XLA dot_general.

North-star (BASELINE.json): >=95% of XLA `dot_general` throughput. Prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Sweeps the flagship Pallas matmul over block configs (the TPU analog of the
reference's stages/swizzle sweep, kernels/hgemm/hgemm.py:363+) and reports
the best against the XLA baseline.
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn, *args):
    from tpukern.harness.bench import device_time
    return device_time(fn, *args, iters_lo=8, iters_hi=40)


def main():
    from tpukern.ops.matmul import matmul

    M = N = K = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    flops = 2 * M * N * K

    xla = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
    t_xla = _time(xla, a, b)
    xla_tflops = flops / t_xla / 1e12

    configs = [
        dict(block_m=512, block_n=1024, block_k=512),
        dict(block_m=512, block_n=512, block_k=512),
        dict(block_m=256, block_n=1024, block_k=512),
        dict(block_m=512, block_n=1024, block_k=1024),
        dict(block_m=1024, block_n=1024, block_k=512),
        dict(block_m=512, block_n=2048, block_k=512),
        dict(block_m=256, block_n=512, block_k=1024),
    ]
    best = (0.0, None)
    for cfg in configs:
        try:
            fn = lambda a, b, _c=cfg: matmul(a, b, **_c)
            t = _time(fn, a, b)
            tf = flops / t / 1e12
            print(f"# {cfg} -> {tf:.1f} TFLOPS", file=sys.stderr)
            if tf > best[0]:
                best = (tf, cfg)
        except Exception as e:  # keep sweeping on compile failures
            print(f"# {cfg} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    pct = 100.0 * best[0] / xla_tflops
    print(f"# best {best[1]} -> {best[0]:.1f} TFLOPS; "
          f"XLA {xla_tflops:.1f} TFLOPS", file=sys.stderr)
    print(json.dumps({
        "metric": "hgemm_bf16_4096_pct_of_xla",
        "value": round(pct, 2),
        "unit": "%",
        "vs_baseline": round(pct / 95.0, 4),
    }))


if __name__ == "__main__":
    main()
