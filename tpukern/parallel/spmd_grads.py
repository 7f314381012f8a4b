"""Replication-correct collective markers for shard_map(check_vma=False).

With replication tracking off, the transpose of lax.psum is psum, so a
replicated cotangent flowing back through a forward psum picks up a
spurious x(axis_size) factor (round-1 ADVICE found exactly this making
tp-sharded grads tp-x too large). These custom-VJP markers implement the
semantics check_vma=True's pbroadcast/pvary pair would give:

  psum_invariant: forward psum; backward identity (the output cotangent
      is replicated over the axis, so pbroadcast — not psum — is the true
      transpose).
  enter_varying:  forward identity at the boundary where a replicated
      value enters axis-sharded compute; backward psums the per-shard
      cotangent contributions (the pvary transpose).
"""

import functools

import jax
from jax import lax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_invariant(x, axis):
    return lax.psum(x, axis)


def _psum_inv_fwd(x, axis):
    return lax.psum(x, axis), None


def _psum_inv_bwd(axis, _, g):
    return (g,)


psum_invariant.defvjp(_psum_inv_fwd, _psum_inv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def enter_varying(x, axis):
    return x


def _ev_fwd(x, axis):
    return x, None


def _ev_bwd(axis, _, g):
    return (lax.psum(g, axis),)


enter_varying.defvjp(_ev_fwd, _ev_bwd)
