"""Serving throughput bench: prefill latency + on-device decode tok/s.

The reference has no serving stack to benchmark; this is the end-to-end
driver for ours (models/serving.py). Per KV-cache tier (bf16, int8) it
measures, on one chip:

- prefill latency for a (B, prompt) batch (causal FA-2 over the prompt
  + page writes),
- steady-state decode: N decode steps chained in ONE on-device lax.scan
  (token feedback via argmax), so the number is kernel throughput, not
  host/tunnel RPC latency — the axon tunnel adds ~26 ms per dispatch,
  which would swamp a per-step loop.

Usage: python bench/serving.py [--preset small|7bish] [--B 8]
       [--prompt 512] [--steps 32]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpukern.harness import pretty_print_line
from tpukern.harness.bench import device_time
from tpukern.models import Config
from tpukern.models import serving
from tpukern.models.transformer import init_params

PRESETS = {
    # one-chip toy: compiles fast over the tunnel
    "small": Config(vocab=32768, d_model=1024, n_layers=4, n_heads=8,
                    n_kv_heads=4, d_ff=4096, max_seq=4096,
                    param_dtype=jnp.bfloat16),
    # ~0.9B-param single-chip shape (7B-like ratios, scaled to v5e HBM)
    "7bish": Config(vocab=32768, d_model=2048, n_layers=16, n_heads=16,
                    n_kv_heads=8, d_ff=8192, max_seq=4096,
                    param_dtype=jnp.bfloat16),
}


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="small", choices=sorted(PRESETS))
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--prompt", type=int, default=512)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--pages-per-seq", type=int, default=16)
    p.add_argument("--tiers", default="bf16,int8,w8a16,w8a16+int8")
    return p.parse_args()


def bench_tier(cfg, args, params, prompt, dtype, tag, w8a16=False):
    B = args.B
    if w8a16:
        params = serving.quantize_model_weights(params)
    cache = serving.init_cache(cfg, B, args.pages_per_seq, 128, dtype=dtype)

    # first positional arg must be an array (device_time perturbs it to
    # defeat loop hoisting), so tokens lead and the params pytree follows
    prefill_fn = jax.jit(
        lambda t, p, c: serving.prefill(p, cfg, t, c))
    t_pre = device_time(prefill_fn, prompt, params, cache)
    logits, cache = prefill_fn(prompt, params, cache)
    tok0 = jnp.argmax(logits, -1).astype(jnp.int32)

    def chain(tok, params, cache):
        def body(carry, _):
            tok, cache = carry
            logits, cache = serving.decode_step(params, cfg, tok, cache)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), None
        (tok, cache), _ = jax.lax.scan(body, (tok, cache), None,
                                       length=args.steps)
        return tok, cache.lengths

    chain_fn = jax.jit(chain)
    t_chain = device_time(chain_fn, tok0, params, cache)
    per_step_ms = t_chain / args.steps * 1e3
    toks = B * args.steps / t_chain
    print(f"{tag:<14} prefill({B}x{args.prompt}) {t_pre * 1e3:8.2f} ms   "
          f"decode {per_step_ms:7.3f} ms/step   {toks:9.0f} tok/s")
    return dict(tier=tag, prefill_ms=t_pre * 1e3,
                decode_ms_per_step=per_step_ms, tok_s=toks)


def main():
    args = get_args()
    cfg = PRESETS[args.preset]
    n_params = (cfg.vocab * cfg.d_model * 2          # embed + head
                + cfg.n_layers * (
                    cfg.d_model * cfg.d_model * 2    # wq, wo
                    + cfg.d_model * cfg.n_kv_heads * cfg.head_dim * 2
                    + cfg.d_model * cfg.d_ff * 2))   # w1, w2
    pretty_print_line(
        f"serving [{args.preset}] ~{n_params / 1e9:.2f}B params, B={args.B}, "
        f"prompt={args.prompt}, ctx={args.pages_per_seq * 128}")
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab, (args.B, args.prompt)),
                         jnp.int32)
    # tier -> (KV-cache dtype, weight-only-int8 flag); w8a16 tiers halve
    # the weight HBM bytes per decode step (ops/matmul_w8a16.py)
    tiers = {"bf16": (jnp.bfloat16, False), "int8": (jnp.int8, False),
             "fp8": (jnp.float8_e4m3fn, False),
             "w8a16": (jnp.bfloat16, True), "w8a16+int8": (jnp.int8, True)}
    for name in args.tiers.split(","):
        try:
            dt, wq = tiers[name]
            bench_tier(cfg, args, params, prompt, dt, name, w8a16=wq)
        except Exception as e:
            print(f"{name:<14} SKIP ({type(e).__name__}: {str(e)[:120]})")


if __name__ == "__main__":
    main()
