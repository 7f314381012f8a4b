"""Teaching example: end-to-end training loop on the flagship model.

The reference's `kernels/transformer/` directory is EMPTY (a placeholder);
this is what fills it the TPU way — a complete train-eval-checkpoint loop
on the library's own kernels (flash attention, GEMM, rmsnorm, rope all via
their custom-VJP trainable wrappers):

  init -> adamw train steps on a toy copy task -> loss drops ->
  orbax checkpoint save/restore -> restored params resume bit-identically.

The config turns on the production-memory levers so the example doubles
as their smoke test: fused_loss (ops/cross_entropy.py — logits never
materialize), remat (per-layer jax.checkpoint), and accum_steps=2
gradient accumulation in the step.

Run: JAX_PLATFORMS=cpu python examples/train_tiny.py
(interpret-mode Pallas; the same code runs compiled on TPU, and the
sharded twin of this loop is models.make_sharded_train_step — see
__graft_entry__.dryrun_multichip for the dp/tp/sp mesh version.)
"""

import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tpukern.models import Config, init_params, make_train_step
from tpukern.models import checkpoint

CFG = Config(vocab=32, d_model=64, n_layers=2, n_heads=2, n_kv_heads=2,
             d_ff=128, max_seq=64, fused_loss=True, remat=True)


def batch(rng, B=8, S=32):
    """Echo task: the target at each position is the input token itself —
    learnable through the embed->head path alone, so the loss drops
    within a few dozen steps even at toy scale."""
    toks = rng.integers(1, CFG.vocab, (B, S)).astype(np.int32)
    return jnp.asarray(toks), jnp.asarray(toks)


def main():
    rng = np.random.default_rng(0)
    params = init_params(CFG, jax.random.key(0))
    tx = optax.adamw(1e-2)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(CFG, tx, accum_steps=2))

    first = last = None
    for i in range(40):
        tokens, targets = batch(rng)
        params, opt_state, loss = step(params, opt_state, tokens, targets)
        if i == 0:
            first = float(loss)
        last = float(loss)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):.4f}")
    print(f"loss {first:.4f} -> {last:.4f}")
    assert last < first * 0.5, "echo task failed to learn"

    with tempfile.TemporaryDirectory() as d:
        checkpoint.save(d + "/ckpt", params, opt_state, step=40)
        state = checkpoint.restore(d + "/ckpt")
        assert int(state["step"]) == 40
        same = jax.tree.map(
            lambda a, b: bool(jnp.array_equal(a, b)), params,
            state["params"])
        assert all(jax.tree.leaves(same)), "restore was not bit-exact"
    print("checkpoint round-trip exact")
    print("OK")


if __name__ == "__main__":
    main()
