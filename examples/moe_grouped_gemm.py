"""Teaching example: dropless MoE on the grouped-GEMM Pallas kernel.

The reference's MoE/distributed story is a set of 0-byte placeholder
files; the TPU-native version is a ragged per-expert GEMM — megablocks
without the padding. This example shows the three MoE execution tiers
side by side on the same routed batch and checks they agree:

  1. moe_block           — dense dispatch (every expert sees every
                           token under a mask): the correctness oracle.
  2. moe_block_dropless  — tokens sorted by expert, lax.ragged_dot
                           (XLA's grouped-GEMM primitive).
  3. moe_block_dropless(use_kernel=True)
                         — the library's Pallas grouped-GEMM
                           (ops/grouped_matmul.py): a SMEM tile table
                           maps (m-block, expert) work items, so ONE
                           compile serves ANY routing split, and FLOPs
                           scale with the routed token count.

Then it takes a gradient step through tier 3's custom VJP (Pallas dx +
dw kernels) and confirms it matches autodiff through tier 2.

Run: JAX_PLATFORMS=cpu python examples/moe_grouped_gemm.py
(interpret-mode Pallas; identical code compiles on TPU.)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax

# interpret-mode demo: ambient JAX_PLATFORMS pins (the TPU tunnel
# sitecustomize) override the env var, so force CPU post-import the way
# examples/serving_scaled.py does
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tpukern.models.moe import init_moe_params, moe_block_dropless
from tpukern.ops.grouped_matmul import gmm

D, FF, E, T = 64, 128, 4, 256


def main():
    params = init_moe_params(jax.random.key(0), D, FF, E)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)

    ragged = moe_block_dropless(x, params, k=2)
    kernel = moe_block_dropless(x, params, k=2, use_kernel=True)
    err = float(jnp.max(jnp.abs(ragged - kernel)))
    print(f"dropless ragged_dot vs grouped-GEMM kernel: max|err|={err:.2e}")
    assert err < 1e-4

    # one compile, any routing: hand the SAME jitted gmm a balanced and
    # a fully skewed split
    w = params["w1"]
    f = jax.jit(lambda x, w, gs: gmm(x, w, gs, block_m=64, block_n=128,
                                     block_k=64))
    balanced = jnp.asarray([T // E] * E, jnp.int32)
    skewed = jnp.asarray([T, 0, 0, 0], jnp.int32)
    for name, gs in (("balanced", balanced), ("skewed", skewed)):
        got = f(x, w, gs)
        want = jax.lax.ragged_dot(x, w, gs)
        e = float(jnp.max(jnp.abs(got - want)))
        print(f"gmm one-compile split={name:<9} max|err|={e:.2e}")
        assert e < 1e-4

    # gradients through the custom VJP == autodiff through ragged_dot
    def loss(p, use_kernel):
        out = moe_block_dropless(x, p, k=2, use_kernel=use_kernel)
        return jnp.mean(out ** 2)

    gk = jax.grad(lambda p: loss(p, True))(params)
    gr = jax.grad(lambda p: loss(p, False))(params)
    gerr = max(float(jnp.max(jnp.abs(gk[n] - gr[n])))
               for n in ("router", "w1", "w2"))
    print(f"custom-VJP grads vs ragged_dot autodiff: max|err|={gerr:.2e}")
    assert gerr < 1e-4

    print("OK")


if __name__ == "__main__":
    main()
