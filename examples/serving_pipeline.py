"""Teaching example: the full serving pipeline on a tiny model.

Walks the whole path the library ships for inference — paged KV cache,
continuous batching, and speculative decoding — end to end on a toy
transformer, and checks the two invariants that make these features safe
to deploy:

  1. continuous batching emits exactly what isolated generation emits
     (admission of one request never perturbs another), and
  2. speculative decoding emits exactly what target-only greedy emits
     (the draft model changes latency, never tokens).

Run: JAX_PLATFORMS=cpu python examples/serving_pipeline.py
(interpret-mode Pallas; the same code runs compiled on TPU).
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from tpukern.models import Config
from tpukern.models import serving
from tpukern.models.batcher import ContinuousBatcher
from tpukern.models.speculative import speculative_generate
from tpukern.models.transformer import init_params

TARGET = Config(vocab=64, d_model=128, n_layers=2, n_heads=4,
                n_kv_heads=2, d_ff=256, max_seq=512)
DRAFT = Config(vocab=64, d_model=64, n_layers=1, n_heads=2,
               n_kv_heads=2, d_ff=128, max_seq=512)


def main():
    params = init_params(TARGET, jax.random.key(0))
    draft = init_params(DRAFT, jax.random.key(1))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, TARGET.vocab, n).astype(np.int32)
               for n in (12, 20, 7)]

    # -- isolated generation (the oracle) --------------------------------
    refs = []
    for p in prompts:
        out = serving.generate(params, TARGET, jnp.asarray(p[None]),
                               n_steps=5, pages_per_seq=2, page_size=128)
        refs.append(list(np.asarray(out)[0]))
    print("isolated greedy:", refs)

    # -- continuous batching: 3 requests through 2 shared slots ----------
    cb = ContinuousBatcher(params, TARGET, n_slots=2, pages_per_seq=2,
                           page_size=128, max_new_tokens=5,
                           prompt_buckets=(32,))
    finished = cb.run([(i, p) for i, p in enumerate(prompts)])
    print("continuous batching:", [finished[i] for i in range(3)])
    assert [finished[i] for i in range(3)] == refs, "admission perturbed a slot!"

    # -- speculative decoding: draft proposes, target verifies ------------
    out, stats = speculative_generate(
        params, TARGET, draft, DRAFT, jnp.asarray(prompts[0][None]),
        n_steps=5, gamma=3, pages_per_seq=2, page_size=128,
        return_stats=True)
    print(f"speculative: {list(np.asarray(out)[0])} "
          f"(acceptance {stats.acceptance_rate:.0%}, "
          f"{stats.rounds} rounds for 5 tokens)")
    assert list(np.asarray(out)[0]) == refs[0], "speculation changed tokens!"

    print("OK")


if __name__ == "__main__":
    main()
