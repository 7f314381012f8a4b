"""Expert-parallel MoE feed-forward block (the "ep" mesh axis).

The reference has no model layer at all; tpukern's flagship transformer
covers dp/tp/sp (models/transformer.py). This module adds the remaining
classic parallelism axis: a top-1 (switch-style) mixture-of-experts FFN
whose experts are sharded over an "ep" mesh axis.

Design (dense-dispatch expert parallelism): each ep shard owns
E_local = E / ep_size experts; every shard evaluates its own experts on
all tokens under the routing mask and the results combine with a psum —
expert WEIGHTS and expert FLOPs are sharded, token routing needs no
all_to_all, and there is no capacity-overflow token dropping. Gradients
flow to the router through the gate probability (straight-through top-1,
the standard switch-transformer estimator).
"""

import jax
import jax.numpy as jnp
from jax import lax

from tpukern.ops.trainable import matmul_t


def init_moe_params(key, d_model, d_ff, n_experts, dtype=jnp.float32):
    kr, k1, k2 = jax.random.split(key, 3)
    scale = 0.02
    return dict(
        router=(jax.random.normal(kr, (d_model, n_experts)) * scale
                ).astype(dtype),
        w1=(jax.random.normal(k1, (n_experts, d_model, d_ff)) * scale
            ).astype(dtype),
        w2=(jax.random.normal(k2, (n_experts, d_ff, d_model)) * scale
            ).astype(dtype),
    )


def moe_param_specs():
    """PartitionSpecs: experts sharded over "ep", router replicated."""
    from jax.sharding import PartitionSpec as P
    return dict(router=P(), w1=P("ep", None, None), w2=P("ep", None, None))


def moe_block(x, params, ep_axis=None, ep_size=1):
    """x (T, d) -> (T, d). params' w1/w2 hold the LOCAL expert slice when
    ep_axis is set (E_local = E_total / ep_size)."""
    T, d = x.shape
    e_local = params["w1"].shape[0]
    e_total = e_local * ep_size

    logits = jnp.dot(x, params["router"][:, :e_total])       # (T, E)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    choice = jnp.argmax(probs, axis=-1)                      # (T,)
    gate = jnp.max(probs, axis=-1)[:, None].astype(x.dtype)  # (T, 1)

    offset = (lax.axis_index(ep_axis) * e_local) if ep_axis else 0

    out = jnp.zeros_like(x)
    for e in range(e_local):  # static, small
        mask = (choice == offset + e)[:, None].astype(x.dtype)
        h = jax.nn.gelu(matmul_t(x, params["w1"][e]))
        out = out + mask * matmul_t(h, params["w2"][e])
    out = out * gate
    if ep_axis is not None:
        out = lax.psum(out, ep_axis)
    return out


def aux_load_balance_loss(x, params, ep_size=1):
    """Switch-transformer load-balance auxiliary loss: E * sum_e f_e * p_e
    (fraction of tokens routed to e times mean router prob of e)."""
    e_total = params["w1"].shape[0] * ep_size
    logits = jnp.dot(x, params["router"][:, :e_total])
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    choice = jnp.argmax(probs, axis=-1)
    frac = jnp.mean(jax.nn.one_hot(choice, e_total), axis=0)
    mean_p = jnp.mean(probs, axis=0)
    return e_total * jnp.sum(frac * mean_p)
