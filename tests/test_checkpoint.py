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


def test_zero1_reshard_resume(tmp_path):
    """Elastic resume across topologies: train 2 steps on a {dp:2, tp:2}
    mesh with ZeRO-1 (adam moments dp-sharded), async-save, then restore
    the full train state onto a {tp:4} mesh AND onto a single device.
    Params and moments must be bit-identical after the reshard, and the
    loss curve must continue where it left off."""
    pytest.importorskip("orbax.checkpoint")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tpukern.models import (make_sharded_train_step, make_train_step,
                                param_specs, shard_opt_state, zero1_specs)

    cfg = Config(vocab=64, d_model=64, n_layers=1, n_heads=4,
                 n_kv_heads=4, d_ff=128, max_seq=32)
    params = init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab, (4, 32)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab, (4, 32)), jnp.int32)
    tx = optax.adam(1e-2)
    specs = param_specs(cfg)

    devs = np.array(jax.devices())
    mesh_a = Mesh(devs[:4].reshape(2, 2), axis_names=("dp", "tp"))
    put = lambda tree, ss, mesh: jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree, ss, is_leaf=lambda x: isinstance(x, jnp.ndarray))

    p = put(params, specs, mesh_a)
    s = shard_opt_state(jax.jit(tx.init)(p), p, zero1_specs(cfg, mesh_a),
                        specs, mesh_a)
    step_a = make_sharded_train_step(cfg, tx, mesh_a, zero1=True)
    data_a = NamedSharding(mesh_a, P("dp", None))
    tok_a, tgt_a = jax.device_put(tokens, data_a), jax.device_put(
        targets, data_a)
    p, s, _ = step_a(p, s, tok_a, tgt_a)
    p, s, _ = step_a(p, s, tok_a, tgt_a)

    path = tmp_path / "ckpt_zero1"
    handle = ckpt.save(path, p, s, step=2, wait=False)  # async save
    # the no-checkpoint continuation (ground-truth loss curve)
    p_c, s_c, l3 = step_a(p, s, tok_a, tgt_a)
    _, _, l4 = step_a(p_c, s_c, tok_a, tgt_a)
    ckpt.finalize(handle)

    def assert_identical(restored_params, restored_opt):
        for a, b in zip(jax.tree.leaves(p),
                        jax.tree.leaves(restored_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(restored_opt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # --- restore onto {tp:4} (different mesh shape than the save) ---
    mesh_b = Mesh(devs[:4].reshape(1, 4), axis_names=("dp", "tp"))
    like_b = ckpt.train_state_like(cfg, tx, mesh=mesh_b, zero1=True)
    st = ckpt.restore(path, like=like_b)
    assert int(st["step"]) == 2
    assert_identical(st["params"], st["opt_state"])
    for leaf, want in zip(jax.tree.leaves(st["params"]),
                          jax.tree.leaves(specs,
                                          is_leaf=lambda x:
                                          isinstance(x, P))):
        assert leaf.sharding.spec == want  # landed resharded, on-device
    step_b = make_sharded_train_step(cfg, tx, mesh_b, zero1=True)
    data_b = NamedSharding(mesh_b, P("dp", None))
    pb, sb, l3b = step_b(st["params"], st["opt_state"],
                         jax.device_put(tokens, data_b),
                         jax.device_put(targets, data_b))
    _, _, l4b = step_b(pb, sb, jax.device_put(tokens, data_b),
                       jax.device_put(targets, data_b))
    # same trajectory as the uncheckpointed run (cross-mesh f32
    # reassociation + adam noise bounds the tolerance, not exactness)
    np.testing.assert_allclose(float(l3b), float(l3), rtol=1e-4)
    np.testing.assert_allclose(float(l4b), float(l4), rtol=1e-4)

    # --- restore onto a single device ---
    like_1 = ckpt.train_state_like(cfg, tx, mesh=None)
    st1 = ckpt.restore(path, like=like_1)
    assert_identical(st1["params"], st1["opt_state"])
    step_1 = make_train_step(cfg, tx)
    p1, s1, l31 = step_1(st1["params"], st1["opt_state"], tokens, targets)
    np.testing.assert_allclose(float(l31), float(l3), rtol=1e-4)


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
