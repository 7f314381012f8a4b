"""Checkpoint/resume for the flagship model (orbax-backed, resharding).

The reference has no training loop and therefore no checkpointing
(SURVEY.md §5: "Checkpoint / resume: none"); its nearest analog is reusing
prebuilt extensions to skip rebuilds. A TPU training framework needs the
real thing:

- save/restore of the (params, opt_state, step) train state;
- **async save** (`save(..., wait=False)`) so the train loop overlaps the
  HBM->disk drain with the next steps;
- **mesh resharding on restore**: a state saved from a {dp,tp} mesh with
  ZeRO-1 dp-sharded optimizer moments restores onto a different topology
  ({tp:4}, single device, ...) — orbax reads each shard's byte range
  directly into its target device placement, so restore cost scales with
  the *target* layout, not the source one. `train_state_like` builds the
  restore skeleton (shapes/dtypes/NamedShardings) for any target mesh
  from the Config alone, including the zero1 layout of the optimizer
  moments, so resume needs no live copy of the old state.
"""

import jax
import jax.numpy as jnp
import numpy as np


def save(path, params, opt_state=None, step=0, wait=True):
    """Save train state to `path` (a directory).

    wait=False starts the save in the background and returns the
    checkpointer; call `.wait_until_finished()` on it (or `finalize`)
    before reading the checkpoint or exiting the process. Device->host
    transfer happens before this returns either way (the arrays may be
    donated/overwritten by subsequent train steps)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    state = {"params": params, "step": np.int64(step)}
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckptr.save(str(path), args=ocp.args.StandardSave(state), force=True)
    if wait:
        ckptr.wait_until_finished()
        return None
    return ckptr


def finalize(ckptr):
    """Block until an async `save(..., wait=False)` has hit disk."""
    if ckptr is not None:
        ckptr.wait_until_finished()


def restore(path, like=None):
    """Restore train state. `like` (same-structure pytree of
    jax.ShapeDtypeStruct with target shardings) restores directly onto
    devices when given; build it with `train_state_like` to resume on a
    different mesh than the one that saved."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(str(path), like)
    return ckptr.restore(str(path))


def train_state_like(cfg, tx=None, mesh=None, zero1=False, dp_axis="dp"):
    """Restore skeleton for (params, opt_state, step) on a target mesh.

    Shapes/dtypes come from tracing init_params (and tx.init) — no live
    arrays are materialized. With a mesh, every param gets its
    param_specs NamedSharding; optimizer-state moments get the matching
    zero1 spec (dp-sharded) when zero1=True, else the param spec, and
    non-param leaves (step counters) replicate. mesh=None produces an
    unsharded (single-device) skeleton.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpukern.models.transformer import (init_params, param_specs,
                                            zero1_specs)

    params_like = jax.eval_shape(
        lambda: init_params(cfg, jax.random.key(0)))
    specs = param_specs(cfg)

    single = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def with_spec(x, s):
        if mesh is None:
            # explicit single-device placement (orbax warns + slow-paths
            # on sharding-free skeletons restored cross-topology)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=single)
        return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                    sharding=NamedSharding(mesh, s))

    like = {
        "params": jax.tree.map(with_spec, params_like, specs),
        "step": jax.ShapeDtypeStruct((), np.int64),
    }
    if tx is None:
        return like

    opt_like = jax.eval_shape(tx.init, params_like)
    if mesh is None:
        like["opt_state"] = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=single), opt_like)
        return like

    # moments mirror param shapes: give each opt leaf the spec of the
    # param with its shape (zero1 spec when requested — the layout
    # make_sharded_train_step(zero1=True) pins), scalars replicate
    use = (zero1_specs(cfg, mesh, axis=dp_axis) if zero1
           and dp_axis in mesh.axis_names else specs)
    by_shape = {}
    for p, s in zip(jax.tree.leaves(params_like),
                    jax.tree.leaves(use,
                                    is_leaf=lambda x: isinstance(x, P))):
        by_shape.setdefault(p.shape, s)
    like["opt_state"] = jax.tree.map(
        lambda x: with_spec(x, by_shape.get(x.shape, P())), opt_like)
    return like
