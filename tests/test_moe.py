"""Expert-parallel MoE blocks: dense-dispatch and capacity-dispatch tiers.

Covers: ep-sharded output == single-device output (both tiers), top-k
routing vs an explicit reference, capacity-overflow token dropping, and
routed-FLOP scaling (the expert operand is capacity-sized, not T x E)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpukern.models.moe import (aux_load_balance_loss, expert_capacity,
                                init_moe_params, init_shared_expert,
                                moe_block, moe_block_dropless,
                                moe_block_topk, moe_dispatch, router_z_loss,
                                shared_expert)

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


def _topk_ref(x, params, k):
    """Explicit (no-capacity) top-k MoE reference."""
    logits = jnp.dot(x, params["router"])
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topk_p, topk_e = jax.lax.top_k(probs, k)
    if k > 1:
        topk_p = topk_p / jnp.sum(topk_p, axis=-1, keepdims=True)
    out = jnp.zeros_like(x)
    for t in range(x.shape[0]):
        for i in range(k):
            e = int(topk_e[t, i])
            h = jax.nn.gelu(x[t] @ params["w1"][e])
            out = out.at[t].add(float(topk_p[t, i]) * (h @ params["w2"][e]))
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_topk_matches_reference(k, setup):
    params, x = setup
    # capacity large enough that nothing drops
    out = moe_block_topk(x, params, k=k, capacity_factor=float(E))
    ref = _topk_ref(x, params, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [1, 2])
def test_topk_ep_matches_single(k, setup):
    """all_to_all capacity dispatch over an 8-way ep mesh, tokens sharded
    over ep == the single-device block on the full batch."""
    params, _ = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, D)), jnp.float32)
    devs = np.array(jax.devices())
    mesh = Mesh(devs, axis_names=("ep",))

    # per-shard capacity must match the single-device run's total capacity
    # so no assignment drops differently: cf scaled by the shard count
    ref = moe_block_topk(x, params, k=k, capacity_factor=float(E))

    def local_fn(x, router, w1, w2):
        return moe_block_topk(x, dict(router=router, w1=w1, w2=w2),
                              k=k, capacity_factor=float(E), ep_axis="ep")

    out = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("ep"), P(), P("ep"), P("ep")),
        out_specs=P("ep"), check_vma=False,
    )(x, params["router"], params["w1"], params["w2"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_capacity_drops_tokens(setup):
    """Over-capacity assignments are dropped (zero contribution), the
    switch-transformer semantics."""
    params, x = setup
    # rig the router so every token picks expert 0
    rigged = dict(params)
    rigged["router"] = jnp.zeros_like(params["router"]).at[0, 0].set(100.0)
    xx = jnp.abs(x) + 0.1  # make x @ router[:,0] strictly positive
    out = moe_block_topk(xx, rigged, k=1, capacity_factor=0.25)
    C = expert_capacity(xx.shape[0], E, k=1, capacity_factor=0.25)
    assert C < xx.shape[0]
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    # first C tokens routed, the rest dropped -> exactly zero rows
    assert (norms[:C] > 0).all()
    np.testing.assert_allclose(norms[C:], 0.0, atol=1e-7)


def test_routed_flop_scaling(setup):
    """Expert compute operands are capacity-sized (E, C, d) with
    C ~ k*T*cf/E — FLOPs scale with routed tokens, NOT with E x T
    (the round-1 dense-dispatch stub scaled with every expert seeing
    every token)."""
    params, x = setup
    T = x.shape[0]
    x_slots, combine = moe_dispatch(x, params, k=1, capacity_factor=1.0)
    C = expert_capacity(T, E, k=1, capacity_factor=1.0)
    assert x_slots.shape == (E, C, D)
    assert combine.shape == (T, E, C)
    # total expert-FFN row count is E*C ~ T*cf (rounded), not E*T
    assert E * C <= 2 * T + 8 * E
    assert E * C < E * T


@pytest.mark.parametrize("k", [1, 2])
def test_dropless_matches_reference(k, setup):
    """ragged_dot token-group tier == the explicit no-capacity top-k
    reference (dropless by construction)."""
    params, x = setup
    out = moe_block_dropless(x, params, k=k)
    ref = _topk_ref(x, params, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dropless_skewed_routing(setup):
    """Every token routed to one expert: capacity tiers would drop most
    tokens; the dropless tier must process all of them."""
    params, x = setup
    rigged = dict(params)
    rigged["router"] = jnp.zeros_like(params["router"]).at[0, 3].set(100.0)
    out = moe_block_dropless(x, rigged, k=1)
    ref = _topk_ref(x, rigged, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert (np.linalg.norm(np.asarray(out), axis=-1) > 0).all()


@pytest.mark.parametrize("k", [1, 2])
def test_dropless_kernel_tier(k, setup):
    """use_kernel=True (ops/grouped_matmul.py) == the ragged_dot tier,
    values and grads."""
    params, x = setup
    out = moe_block_dropless(x, params, k=k, use_kernel=True)
    ref = moe_block_dropless(x, params, k=k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss(p, use_kernel):
        return jnp.sum(moe_block_dropless(x, p, k=k,
                                          use_kernel=use_kernel) ** 2)

    gk = jax.grad(loss)(params, True)
    gr = jax.grad(loss)(params, False)
    for name in ("router", "w1", "w2"):
        np.testing.assert_allclose(np.asarray(gk[name]),
                                   np.asarray(gr[name]),
                                   rtol=1e-3, atol=1e-3)


def test_dropless_grads_flow(setup):
    params, x = setup

    def loss(p):
        out = moe_block_dropless(x, p, k=2)
        return jnp.sum(out ** 2) + 0.01 * router_z_loss(x, p)

    g = jax.grad(loss)(params)
    for name in ("router", "w1", "w2"):
        assert np.isfinite(np.asarray(g[name])).all()
    assert float(jnp.max(jnp.abs(g["router"]))) > 0
    assert float(jnp.max(jnp.abs(g["w1"]))) > 0


def test_shared_expert_and_z_loss(setup):
    params, x = setup
    sp = init_shared_expert(jax.random.key(1), D, FF)
    dense = shared_expert(x, sp)
    assert dense.shape == x.shape
    # shared expert is routing-independent: permuting tokens permutes out
    perm = np.random.default_rng(2).permutation(x.shape[0])
    np.testing.assert_allclose(np.asarray(shared_expert(x[perm], sp)),
                               np.asarray(dense)[perm], rtol=1e-5,
                               atol=1e-5)
    z = router_z_loss(x, params)
    assert np.isfinite(float(z)) and float(z) >= 0
    # z-loss pushes router logits toward zero: scaled-up router has
    # strictly larger z-loss
    big = dict(params, router=params["router"] * 10.0)
    assert float(router_z_loss(x, big)) > float(z)


def test_topk_grads_flow(setup):
    params, x = setup

    def loss(p):
        out = moe_block_topk(x, p, k=2, capacity_factor=2.0)
        return jnp.sum(out ** 2) + 0.01 * aux_load_balance_loss(x, p)

    g = jax.grad(loss)(params)
    for name in ("router", "w1", "w2"):
        assert np.isfinite(np.asarray(g[name])).all()
    assert float(jnp.max(jnp.abs(g["router"]))) > 0
    assert float(jnp.max(jnp.abs(g["w1"]))) > 0
