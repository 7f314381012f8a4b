"""Headline benchmark: BF16 HGEMM at 4096^3 — best tpukern config vs best
XLA dot_general config.

North-star (BASELINE.json): >=95% of XLA `dot_general` throughput. Prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value =
100 * best_tpukern_TFLOPS / best_XLA_TFLOPS over both output dtypes
(bf16-out and f32-out), i.e. best-vs-best at identical input contract
(bf16 x bf16 inputs, f32 accumulation).

Timing is the on-device fori_loop slope method (harness.bench.device_time)
— host wall-clock is unreliable through the remote TPU tunnel. The sweep
is the TPU analog of the reference's stages/swizzle sweep
(kernels/hgemm/hgemm.py:363+).
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def _time(fn, *args, retries=3):
    import time as _time_mod
    from tpukern.harness.bench import device_time
    last = None
    for attempt in range(retries + 1):
        try:
            return device_time(fn, *args, iters_lo=8, iters_hi=40)
        except Exception as e:  # transient remote-compile 500s happen
            last = e
            if attempt < retries:
                _time_mod.sleep(20)  # let the compile server recover
    raise last


def main():
    from tpukern.ops.matmul import matmul

    M = N = K = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    flops = 2 * M * N * K

    def tf(t):
        return flops / t / 1e12

    xla_candidates = {
        "xla_bf16out": lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        "xla_f32out": lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32),
    }
    best_xla = (0.0, None)
    for name, fn in xla_candidates.items():
        try:
            t = tf(_time(fn, a, b))
            print(f"# {name} -> {t:.1f} TFLOPS", file=sys.stderr)
            best_xla = max(best_xla, (t, name))
        except Exception as e:
            print(f"# {name} failed: {e}", file=sys.stderr)

    pallas_candidates = {
        "accio_f32out_1024x1024x512": dict(
            block_m=1024, block_n=1024, block_k=512, acc_in_out=True),
        "accio_f32out_1024x1024x512_fused": dict(
            block_m=1024, block_n=1024, block_k=512, acc_in_out=True,
            input_fusion=True),
        "accio_f32out_2048x512x512": dict(
            block_m=2048, block_n=512, block_k=512, acc_in_out=True),
        "accio_f32out_512x1024x512": dict(
            block_m=512, block_n=1024, block_k=512, acc_in_out=True),
        "scratch_bf16out_1024x1024x512": dict(
            block_m=1024, block_n=1024, block_k=512),
        "stage_bf16out_1024x1024x1024": dict(
            block_m=1024, block_n=1024, block_k=1024),
        "accio_bf16out_512x1024x512": dict(
            block_m=512, block_n=1024, block_k=512, acc_in_out=True,
            out_dtype=jnp.bfloat16),
    }
    best_pk = (0.0, None)
    for name, cfg in pallas_candidates.items():
        try:
            t = tf(_time(lambda a, b, _c=cfg: matmul(a, b, **_c), a, b))
            print(f"# {name} -> {t:.1f} TFLOPS", file=sys.stderr)
            best_pk = max(best_pk, (t, name))
        except Exception as e:
            print(f"# {name} failed: {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr)

    print(f"# best tpukern: {best_pk[1]} {best_pk[0]:.1f} TFLOPS; "
          f"best XLA: {best_xla[1]} {best_xla[0]:.1f} TFLOPS",
          file=sys.stderr)
    pct = 100.0 * best_pk[0] / max(best_xla[0], 1e-9)
    print(json.dumps({
        "metric": "hgemm_bf16_4096_best_pct_of_best_xla",
        "value": round(pct, 2),
        "unit": "%",
        "vs_baseline": round(pct / 95.0, 4),
    }))


if __name__ == "__main__":
    main()
