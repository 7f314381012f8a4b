"""Checkpoint/resume for the flagship model (orbax-backed).

The reference has no training loop and therefore no checkpointing
(SURVEY.md §5: "Checkpoint / resume: none"); its nearest analog is reusing
prebuilt extensions to skip rebuilds. A TPU training framework needs the
real thing: save/restore of the (params, opt_state, step) train state with
orbax, sharding-aware on restore.
"""

import jax
import numpy as np


def save(path, params, opt_state=None, step=0):
    """Save train state to `path` (a directory)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = {"params": params, "step": np.int64(step)}
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckptr.save(str(path), state, force=True)
    ckptr.wait_until_finished()


def restore(path, like=None):
    """Restore train state. `like` (same-structure pytree of arrays with
    target shardings) restores directly onto devices when given."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(str(path), like)
    return ckptr.restore(str(path))
