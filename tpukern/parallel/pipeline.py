"""Pipeline parallelism ("pp" mesh axis): GPipe-style microbatch schedule.

The reference is single-GPU (SURVEY.md §2.5) — its distributed story is a
set of 0-byte placeholder files. This module provides the TPU-native
pipeline-parallel tier: transformer layers are stacked and sharded over a
"pp" mesh axis (each shard owns n_layers/pp consecutive stages), and
microbatches stream through the stages with lax.ppermute hops between
neighbors over ICI.

Schedule: the classic GPipe fill-drain. With P stages and M microbatches
there are M + P - 1 ticks; at tick t, stage s runs microbatch t - s (or a
bubble). Every shard executes the same traced program (SPMD): bubbles
compute on placeholder data and their results are discarded, so the code
stays branch-free for XLA. Backward is jax.grad straight through the
scan + ppermute (the transpose of ppermute is the reversed permutation),
giving 1F1B-equivalent gradients without a hand-written schedule.
"""

import jax
import jax.numpy as jnp
from jax import lax

from tpukern.parallel.spmd_grads import psum_invariant


def stack_stage_params(layers):
    """Stack a list of identically-structured per-layer param pytrees
    along a new leading axis (so the stack can be sharded P("pp") and
    each pp shard receives its own contiguous slice of layers)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_forward(layer_fn, stage_params, h, *, pp_axis, n_micro):
    """Run h (B, ...) through all pipeline stages.

    layer_fn(layer_params, x) applies ONE layer. stage_params holds this
    shard's layers stacked on a leading axis (L_local, ...). Under
    shard_map, every pp shard calls this with the same h (stage 0's input)
    and the function returns the final stage's output, replicated over pp.
    """
    P = lax.axis_size(pp_axis)
    stage = lax.axis_index(pp_axis)
    B = h.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    micro = h.reshape(n_micro, mb, *h.shape[1:])

    def apply_stage(x):
        L = jax.tree.leaves(stage_params)[0].shape[0]
        for l in range(L):  # static local layer count
            x = layer_fn(jax.tree.map(lambda p: p[l], stage_params), x)
        return x

    fwd = [(i, (i + 1) % P) for i in range(P)]

    def tick(carry, t):
        act, outs = carry
        # stage 0 injects microbatch t (clamped; bubbles feed stale data
        # whose results are never collected)
        inject = micro[jnp.clip(t, 0, n_micro - 1)]
        x_in = jnp.where(stage == 0, inject, act)
        y = apply_stage(x_in)
        # the last stage finished microbatch t - (P - 1)
        out_i = t - (P - 1)
        outs = lax.cond(
            out_i >= 0,
            lambda o: lax.dynamic_update_index_in_dim(
                o, y, jnp.clip(out_i, 0, n_micro - 1), 0),
            lambda o: o, outs)
        # hand activations to the next stage
        act = lax.ppermute(y, pp_axis, fwd)
        return (act, outs), None

    outs0 = jnp.zeros_like(micro)
    (_, outs), _ = lax.scan(tick, (micro[0], outs0),
                            jnp.arange(n_micro + P - 1))
    # only the last stage collected real outputs; replicate them. The
    # psum_invariant marker keeps the backward exact under
    # check_vma=False (a raw psum's transpose would inflate the
    # replicated cotangent by the pp size).
    outs = psum_invariant(
        jnp.where(stage == P - 1, outs, jnp.zeros_like(outs)), pp_axis)
    return outs.reshape(B, *h.shape[1:])
