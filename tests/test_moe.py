"""Expert-parallel MoE block: ep-sharded output == single-device output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpukern.models.moe import (aux_load_balance_loss, init_moe_params,
                                moe_block)

D, FF, E = 64, 128, 8


@pytest.fixture(scope="module")
def setup(request):
    params = init_moe_params(jax.random.key(0), D, FF, E)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, D)), jnp.float32)
    return params, x


def test_ep_matches_dense(setup):
    params, x = setup
    ref = moe_block(x, params)  # single device, all experts

    devs = np.array(jax.devices())
    mesh = Mesh(devs, axis_names=("ep",))
    ep = len(devs)

    def local_fn(x, router, w1, w2):
        return moe_block(x, dict(router=router, w1=w1, w2=w2),
                         ep_axis="ep", ep_size=ep)

    out = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P("ep"), P("ep")),
        out_specs=P(), check_vma=False,
    )(x, params["router"], params["w1"], params["w2"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_grads_flow(setup):
    params, x = setup

    def loss(params):
        out = moe_block(x, params)
        return jnp.sum(out ** 2) + 0.01 * aux_load_balance_loss(x, params)

    g = jax.grad(loss)(params)
    for name in ("router", "w1", "w2"):
        assert np.isfinite(np.asarray(g[name])).all()
    # router must receive gradient through the gate + aux loss
    assert float(jnp.max(jnp.abs(g["router"]))) > 0
