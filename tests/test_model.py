"""Flagship transformer: forward parity, gradients, sharded training step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpukern.models import (Config, forward, init_params, loss_fn,
                            make_sharded_train_step, make_train_step,
                            param_specs)

CFG = Config(vocab=128, d_model=128, n_layers=1, n_heads=4, n_kv_heads=2,
             d_ff=256, max_seq=64)


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab, (2, 64)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, CFG.vocab, (2, 64)), jnp.int32)
    return params, tokens, targets


def test_forward_shapes(setup):
    params, tokens, _ = setup
    logits = forward(params, tokens, CFG)
    assert logits.shape == (2, 64, CFG.vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_train_step_reduces_loss(setup):
    params, tokens, targets = setup
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = make_train_step(CFG, tx)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, tokens, targets)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sharded_train_step(setup):
    params, tokens, targets = setup
    # tp must divide n_kv_heads (=2): use a (4 dp, 2 tp) mesh
    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, axis_names=("dp", "tp"))
    specs = param_specs(CFG)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, jnp.ndarray))
    tx = optax.adamw(1e-3)
    opt_state = jax.jit(tx.init)(params)
    tokens = jax.device_put(jnp.concatenate([tokens] * 2),
                            NamedSharding(mesh, P("dp", None)))
    targets = jax.device_put(jnp.concatenate([targets] * 2),
                             NamedSharding(mesh, P("dp", None)))
    step = make_sharded_train_step(CFG, tx, mesh)
    params2, opt_state, loss = step(params, opt_state, tokens, targets)
    assert np.isfinite(float(loss))

    # sharded loss matches single-device loss on the same (duplicated) batch
    params_local = init_params(CFG, jax.random.key(0))
    ref_loss = loss_fn(params_local, tokens, targets, CFG)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-2)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    ge.dryrun_multichip(8)


def test_sharded_train_step_sp(setup):
    """dp/tp/sp mesh: sequence-parallel loss matches single-device loss."""
    params, tokens, targets = setup
    devs = np.array(jax.devices()).reshape(2, 2, 2)
    mesh = Mesh(devs, axis_names=("dp", "tp", "sp"))
    specs = param_specs(CFG)
    params_sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, jnp.ndarray))
    tx = optax.adamw(1e-3)
    opt_state = jax.jit(tx.init)(params_sharded)
    data_spec = NamedSharding(mesh, P("dp", "sp"))
    tokens_s = jax.device_put(jnp.concatenate([tokens] * 2), data_spec)
    targets_s = jax.device_put(jnp.concatenate([targets] * 2), data_spec)
    step = make_sharded_train_step(CFG, tx, mesh)
    _, _, loss = step(params_sharded, opt_state, tokens_s, targets_s)
    assert np.isfinite(float(loss))
    ref_loss = loss_fn(params, tokens_s, targets_s, CFG)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-2)
