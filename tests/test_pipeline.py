"""GPipe pipeline parallelism over a pp mesh axis: forward equivalence
and exact gradients vs the sequential single-device layer stack."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpukern.parallel.pipeline import pipeline_forward, stack_stage_params

D = 32
L = 8   # total layers == number of pp stages x layers per stage


def layer_fn(lp, x):
    return x + jax.nn.gelu(x @ lp["w"] + lp["b"])


def _params(rng):
    layers = [dict(w=jnp.asarray(rng.standard_normal((D, D)) * 0.3,
                                 jnp.float32),
                   b=jnp.asarray(rng.standard_normal((D,)) * 0.1,
                                 jnp.float32))
              for _ in range(L)]
    return stack_stage_params(layers)


def _seq_ref(stacked, x):
    for l in range(L):
        x = layer_fn(jax.tree.map(lambda p: p[l], stacked), x)
    return x


def test_pipeline_forward_matches_sequential(rng):
    stacked = _params(rng)
    x = jnp.asarray(rng.standard_normal((8, 16, D)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()), axis_names=("pp",))

    def local(params, x):
        return pipeline_forward(layer_fn, params, x, pp_axis="pp",
                                n_micro=4)

    out = shard_map(local, mesh=mesh, in_specs=(P("pp"), P()),
                    out_specs=P(), check_vma=False)(stacked, x)
    ref = _seq_ref(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pipeline_grads_match_sequential(rng):
    """Backward through the scan + ppermute schedule gives the exact
    per-stage parameter gradients (no spurious pp-factor under
    check_vma=False — see parallel/spmd_grads)."""
    stacked = _params(rng)
    x = jnp.asarray(rng.standard_normal((8, 16, D)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()), axis_names=("pp",))

    def local(params, x):
        def loss(p):
            out = pipeline_forward(layer_fn, p, x, pp_axis="pp", n_micro=2)
            return jnp.sum(out ** 2)
        l, g = jax.value_and_grad(loss)(params)
        return lax.pmean(l, "pp"), g

    loss, grads = shard_map(
        local, mesh=mesh, in_specs=(P("pp"), P()),
        out_specs=(P(), P("pp")), check_vma=False)(stacked, x)

    def loss_ref(p):
        return jnp.sum(_seq_ref(p, x) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(stacked)
    np.testing.assert_allclose(float(loss), float(l_ref), rtol=1e-5)
    # the gradients are EXACT in f64 (verified: 1e-16 relative); in f32
    # the sum(out^2) loss amplifies cancellation, so compare relative to
    # the gradient magnitude rather than elementwise
    for k in ("w", "b"):
        g, r = np.asarray(grads[k]), np.asarray(g_ref[k])
        scale = np.max(np.abs(r))
        np.testing.assert_allclose(g / scale, r / scale,
                                   rtol=0, atol=1e-6, err_msg=k)


def test_pipeline_multi_layer_stages(rng):
    """More layers than stages: each pp shard applies its local slice of
    the stack in order."""
    stacked = _params(rng)  # 8 layers over 4 stages -> 2 layers/stage
    x = jnp.asarray(rng.standard_normal((4, 8, D)), jnp.float32)
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, axis_names=("pp",))

    def local(params, x):
        return pipeline_forward(layer_fn, params, x, pp_axis="pp",
                                n_micro=2)

    out = shard_map(local, mesh=mesh, in_specs=(P("pp"), P()),
                    out_specs=P(), check_vma=False)(stacked, x)
    ref = _seq_ref(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
