"""Teaching example: serving at scale — quantized KV tiers and
tensor-parallel batching on a virtual device mesh.

Builds on examples/serving_pipeline.py with the features a production
deployment layers on top of plain continuous batching:

  1. int8 KV cache tier — pages store 1-byte values with per-token
     scales (2x context per HBM byte; on TPU the score matmul runs
     s8s8s32 on the MXU and decode is FASTER than bf16 — BENCH_NOTES),
  2. chunked prefill — long prompts stream in C-token pieces through
     the prefix-prefill kernel, so admission memory is O(C), and
  3. tensor parallelism — TPContinuousBatcher shard_maps the same
     scheduler over a ("tp",) mesh (Megatron param splits, kv-head-
     sharded page pools, two psums per layer), emitting streams
     IDENTICAL to the single-device batcher.

Run: JAX_PLATFORMS=cpu python examples/serving_scaled.py
(uses 2 virtual CPU devices; the same code runs on real TPU meshes).
"""

import os
import sys

sys.path.insert(0, ".")

os.environ.setdefault("XLA_FLAGS", "")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=2"

import numpy as np

import jax

# the exact-equality checks below compare streams from DIFFERENT kernels
# (whole-prompt flash prefill vs chunked prefix-prefill; single- vs
# multi-device psum orders) — run on the f32 CPU backend where they are
# bit-stable. Ambient JAX_PLATFORMS pins (e.g. a TPU tunnel
# sitecustomize) ignore env overrides, so force it post-import.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh

from tpukern.models import Config
from tpukern.models.batcher import ContinuousBatcher, TPContinuousBatcher
from tpukern.models.transformer import init_params

CFG = Config(vocab=128, d_model=128, n_layers=1, n_heads=4, n_kv_heads=2,
             d_ff=128, max_seq=512)


def main():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, CFG.vocab, n).astype(np.int32)
               for n in (21, 11)]
    reqs = [(i, p) for i, p in enumerate(prompts)]
    kw = dict(n_slots=2, pages_per_seq=2, page_size=128,
              max_new_tokens=3, prompt_buckets=(64,))

    # reference: plain bf16 single-device continuous batching
    base = ContinuousBatcher(params, CFG, **kw).run(list(reqs))

    # 1. int8 KV tier: quantized pools behind the same generate API.
    # Streams may legitimately differ within quantization tolerance;
    # the FIRST token comes from the (unquantized) prefill logits and
    # must match.
    from tpukern.models import serving
    p0 = jnp.asarray(prompts[0][None])
    g16 = np.asarray(serving.generate(params, CFG, p0, n_steps=3,
                                      pages_per_seq=2))[0]
    g8 = np.asarray(serving.generate(params, CFG, p0, n_steps=3,
                                     pages_per_seq=2,
                                     cache_dtype=jnp.int8))[0]
    assert g8[0] == g16[0]
    print("int8 KV tier: first token matches bf16;",
          dict(bf16=g16.tolist(), int8=g8.tolist()))

    # 2. chunked prefill: identical streams, O(chunk) admission memory
    chunked = ContinuousBatcher(params, CFG, chunked_prefill=8,
                                **kw).run(list(reqs))
    assert chunked == base
    print("chunked prefill (C=8): streams identical to whole-prompt")

    # 3. tensor parallelism over a 2-device mesh: identical streams
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    tp = TPContinuousBatcher(params, CFG, mesh=mesh, **kw).run(list(reqs))
    assert tp == base
    print("tensor-parallel batcher (tp=2): streams identical")

    print("OK")


if __name__ == "__main__":
    main()
