"""Checkpoint save/restore round-trip for the flagship model."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpukern.models import Config, init_params
from tpukern.models import checkpoint as ckpt

CFG = Config(vocab=64, d_model=64, n_layers=1, n_heads=2, n_kv_heads=2,
             d_ff=128, max_seq=32)


def test_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    params = init_params(CFG, jax.random.key(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    path = tmp_path / "ckpt"
    ckpt.save(path, params, opt_state, step=7)
    state = ckpt.restore(path)
    assert int(state["step"]) == 7
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state arrays round-trip too
    n_opt = len(jax.tree.leaves(opt_state))
    assert len(jax.tree.leaves(state["opt_state"])) == n_opt


def test_sharded_restore(tmp_path):
    """Restore directly onto a (dp, tp) mesh: the `like` path places every
    param with its target NamedSharding (elastic resume onto a different
    topology than the one that saved)."""
    pytest.importorskip("orbax.checkpoint")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tpukern.models import param_specs

    params = init_params(CFG, jax.random.key(0))
    path = tmp_path / "ckpt_sharded"
    ckpt.save(path, params, step=3)  # saved UNSHARDED

    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, axis_names=("dp", "tp"))
    specs = param_specs(CFG)
    like = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, jnp.ndarray))
    state = ckpt.restore(
        path, like={"params": like,
                    "step": jax.ShapeDtypeStruct((), np.int64)})
    for a, b, s in zip(jax.tree.leaves(params),
                       jax.tree.leaves(state["params"]),
                       jax.tree.leaves(specs,
                                       is_leaf=lambda x: isinstance(x, P))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding.spec == s  # landed with the requested sharding
