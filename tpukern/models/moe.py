"""Expert-parallel MoE feed-forward blocks (the "ep" mesh axis).

The reference has no model layer at all — its distributed story is ten
0-byte placeholder files naming the collective set, including
others/pytorch/distributed/test_all_to_all.py. This module makes that
placeholder real the TPU way: a GShard/Switch-style mixture-of-experts
FFN whose experts are sharded over an "ep" mesh axis and whose tokens are
exchanged with lax.all_to_all over ICI.

Two dispatch strategies:

- moe_block (dense dispatch): every ep shard evaluates its local experts
  on ALL tokens under the routing mask and psums. No token dropping and
  no all_to_all, but FLOPs scale with E_local — a correctness-first tier
  kept for small expert counts and as the test oracle.
- moe_block_topk (capacity dispatch, the production tier): top-k routing
  with a static per-expert capacity C = ceil(k*T*cf/E); tokens are packed
  into (E, C, d) slots via one-hot dispatch/combine einsums (XLA-friendly
  static shapes, no scatter), all_to_all'd so each shard runs ONLY its
  local experts on ONLY the tokens routed to them, then all_to_all'd back
  and combined with the gate weights. Expert FLOPs scale with routed
  capacity, not with E_local x T. Over-capacity tokens are dropped
  (standard switch-transformer semantics).
"""

import math

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
    """Dense-dispatch tier: x (T, d) -> (T, d). params' w1/w2 hold the
    LOCAL expert slice when ep_axis is set (E_local = E_total / ep_size).
    Top-1 (switch) routing, no capacity limit, no token dropping."""
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


def expert_capacity(n_tokens, n_experts, k=1, capacity_factor=1.25):
    """Static per-expert slot count: C = ceil(k * T * cf / E), rounded up
    to a sublane multiple so the (C, d) expert operand tiles cleanly."""
    c = math.ceil(k * n_tokens * capacity_factor / n_experts)
    return max(8, -(-c // 8) * 8)


def moe_dispatch(x, params, *, k=1, capacity_factor=1.25, e_total=None,
                 renorm=True):
    """Route x (T, d) into capacity slots.

    Returns (x_slots (E, C, d), combine (T, E, C) f32): x_slots[e, c] is
    the c-th token accepted by expert e (zeros for empty slots); combine
    carries the gate weight of each (token, expert, slot) assignment and
    is zero for dropped (over-capacity) assignments.
    """
    T, d = x.shape
    E = e_total or params["w1"].shape[0]
    C = expert_capacity(T, E, k=k, capacity_factor=capacity_factor)

    logits = jnp.dot(x, params["router"][:, :E])
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topk_p, topk_e = lax.top_k(probs, k)                     # (T, k)
    if renorm and k > 1:
        topk_p = topk_p / jnp.sum(topk_p, axis=-1, keepdims=True)

    combine = jnp.zeros((T, E, C), jnp.float32)
    counts = jnp.zeros((1, E), jnp.float32)
    for i in range(k):  # k is tiny and static
        m = jax.nn.one_hot(topk_e[:, i], E, dtype=jnp.float32)  # (T, E)
        # zero-based queue position of each token within its expert,
        # earlier choices (previous i rounds) have priority via `counts`
        pos = jnp.cumsum(m, axis=0) - m + counts
        pos_i = jnp.sum(pos * m, axis=1)                        # (T,)
        counts = counts + jnp.sum(m, axis=0, keepdims=True)
        keep = (pos_i < C).astype(jnp.float32)
        g = topk_p[:, i] * keep                                 # (T,)
        slot = jax.nn.one_hot(pos_i.astype(jnp.int32), C,
                              dtype=jnp.float32)                # (T, C)
        combine = combine + g[:, None, None] * m[:, :, None] * slot[:, None, :]

    dispatch = (combine > 0).astype(x.dtype)                    # (T, E, C)
    x_slots = jnp.einsum("tec,td->ecd", dispatch, x)
    return x_slots, combine


def moe_block_topk(x, params, *, k=1, capacity_factor=1.25, ep_axis=None,
                   renorm=True):
    """Capacity-dispatch expert parallelism: x (T_local, d) -> (T_local, d).

    Under shard_map the token dim must be sharded over ep_axis (each ep
    member routes its own tokens); params' w1/w2 hold the local expert
    slice. The two all_to_all calls ride the ICI mesh axis.
    """
    e_local = params["w1"].shape[0]
    ep = lax.axis_size(ep_axis) if ep_axis else 1
    E = e_local * ep

    x_slots, combine = moe_dispatch(
        x, params, k=k, capacity_factor=capacity_factor, e_total=E,
        renorm=renorm)                                   # (E, C, d)

    if ep_axis is not None:
        # slots for expert-group j go to ep member j; each member receives
        # its own experts' slots from every member: (E_local, ep*C, d)
        x_slots = lax.all_to_all(x_slots, ep_axis, split_axis=0,
                                 concat_axis=1, tiled=True)

    ys = []
    for e in range(e_local):  # static, small: the hot path stays on the
        h = jax.nn.gelu(matmul_t(x_slots[e], params["w1"][e]))  # library's
        ys.append(matmul_t(h, params["w2"][e]))                 # GEMM kernel
    y_slots = jnp.stack(ys)

    if ep_axis is not None:
        # route results back to the tokens' home shards: (E, C, d)
        y_slots = lax.all_to_all(y_slots, ep_axis, split_axis=1,
                                 concat_axis=0, tiled=True)

    out = jnp.einsum("tec,ecd->td", combine,
                     y_slots.astype(jnp.float32))
    return out.astype(x.dtype)


def moe_block_dropless(x, params, *, k=1, renorm=True, use_kernel=False):
    """Dropless (token-group) tier: x (T, d) -> (T, d), no capacity limit
    and no dropped tokens.

    MegaBlocks-style grouped computation the XLA way: replicate each
    token k times, sort the T*k rows by their routed expert, and run the
    expert FFN as two `lax.ragged_dot` grouped GEMMs (group_sizes =
    tokens per expert) — the TPU-native grouped-GEMM primitive, so
    expert FLOPs scale with T*k exactly, independent of how skewed the
    routing is. Static shapes throughout (argsort + bincount); the
    gather/unsort are XLA one-hot-free gathers.

    Single-shard tier (experts replicated): ragged group sizes are data-
    dependent, so the static-split all_to_all of moe_block_topk cannot
    carry them over an ep axis; capacity dispatch remains the ep tier.
    """
    T, d = x.shape
    E = params["w1"].shape[0]

    logits = jnp.dot(x, params["router"][:, :E])
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topk_p, topk_e = lax.top_k(probs, k)                     # (T, k)
    if renorm and k > 1:
        topk_p = topk_p / jnp.sum(topk_p, axis=-1, keepdims=True)

    expert_flat = topk_e.reshape(-1)                         # (T*k,)
    gate_flat = topk_p.reshape(-1)                           # (T*k,)
    order = jnp.argsort(expert_flat)                         # stable
    token_of = order // k                                    # source row
    xs = x[token_of]                                         # (T*k, d)
    group_sizes = jnp.bincount(expert_flat, length=E).astype(jnp.int32)

    if use_kernel:
        # library grouped-GEMM kernel (ops/grouped_matmul.py) — same
        # contraction, Pallas forward + Pallas dx/dw in the VJP
        from tpukern.ops.grouped_matmul import grouped_matmul
        h = jax.nn.gelu(grouped_matmul(xs, params["w1"], group_sizes))
        ys = grouped_matmul(h.astype(x.dtype), params["w2"], group_sizes)
    else:
        h = jax.nn.gelu(lax.ragged_dot(xs, params["w1"], group_sizes))
        ys = lax.ragged_dot(h.astype(x.dtype), params["w2"], group_sizes)

    w = gate_flat[order].astype(jnp.float32)[:, None]        # (T*k, 1)
    out = jnp.zeros((T, d), jnp.float32).at[token_of].add(
        ys.astype(jnp.float32) * w)
    return out.astype(x.dtype)


def init_shared_expert(key, d_model, d_ff, dtype=jnp.float32):
    """DeepSeek-style always-on shared expert (dense FFN beside the
    routed experts)."""
    k1, k2 = jax.random.split(key)
    return dict(
        w1=(jax.random.normal(k1, (d_model, d_ff)) * 0.02).astype(dtype),
        w2=(jax.random.normal(k2, (d_ff, d_model)) * 0.02).astype(dtype),
    )


def shared_expert(x, sp):
    """Dense FFN applied to every token; add to the routed output."""
    return matmul_t(jax.nn.gelu(matmul_t(x, sp["w1"])), sp["w2"])


def router_z_loss(x, params, e_total=None):
    """Router z-loss (ST-MoE): mean logsumexp(logits)^2 — keeps router
    logits small so the softmax stays in a well-conditioned range."""
    E = e_total or params["w1"].shape[0]
    logits = jnp.dot(x, params["router"][:, :E]).astype(jnp.float32)
    return jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)


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
