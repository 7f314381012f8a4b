"""Ring attention: context-parallel FA-2 over an ICI mesh axis.

The TPU-native answer to the reference's long-context story. The reference
extends context per-chip by shrinking SMEM per KV tile (share-kv,
share-qkv, tiling-qk — kernels/flash-attn/README.md:154-163); on TPU the
natural extension axis is MORE CHIPS: shard the KV sequence over a mesh
axis and rotate KV shards around the ring with ppermute while each chip
runs the split-Q Pallas kernel on the shard in front of it. Online-softmax
statistics (lse) make the cross-shard combine exact — the same recurrence
the kernel uses per tile (flash_attn_mma_split_q.cu:532-560), applied at
shard granularity.
"""

import functools

import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpukern.ops.attention import NEG_BIG, flash_attention


def _combine(o1, lse1, o2, lse2):
    """Merge two partial attentions via their log-sum-exp stats."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)[..., None]
    w2 = jnp.exp(lse2 - m)[..., None]
    denom = w1 + w2
    o = (o1 * w1 + o2 * w2) / jnp.where(denom == 0.0, 1.0, denom)
    return o, m + jnp.log(jnp.maximum(w1 + w2, 1e-37))[..., 0]


def ring_attention(q, k, v, mesh, axis="sp", causal=False, sm_scale=None,
                   block_q=128, block_k=128):
    """Attention with q, k, v (B, H, S, D) sequence-sharded over `axis`.

    Each step: run the local FA-2 kernel against the KV shard currently
    held, merge via lse, then ppermute KV to the next neighbor — compute
    and ICI transfer overlap across steps.
    """
    n = mesh.shape[axis]

    def local_fn(q, k, v):
        rank = lax.axis_index(axis)
        perm = [(i, (i + 1) % n) for i in range(n)]

        fa = functools.partial(flash_attention, sm_scale=sm_scale,
                               block_q=block_q, block_k=block_k,
                               return_stats=True)

        def empty_partial(q):
            B, H, S, D = q.shape
            return (jnp.zeros_like(q, jnp.float32),
                    jnp.full((B, H, S), NEG_BIG, jnp.float32))

        def step(carry, i):
            o_acc, lse_acc, k_cur, v_cur = carry
            src = (rank - i) % n
            if causal:
                # src < rank: full attention; src == rank: causal diag
                # block; src > rank: entirely masked -> skip.
                o_p, lse_p = lax.cond(
                    src == rank,
                    lambda: fa(q, k_cur, v_cur, causal=True),
                    lambda: lax.cond(
                        src < rank,
                        lambda: fa(q, k_cur, v_cur, causal=False),
                        lambda: empty_partial(q)),
                )
            else:
                o_p, lse_p = fa(q, k_cur, v_cur, causal=False)
            o_acc, lse_acc = _combine(o_acc, lse_acc,
                                      o_p.astype(jnp.float32), lse_p)
            k_nxt = lax.ppermute(k_cur, axis, perm)
            v_nxt = lax.ppermute(v_cur, axis, perm)
            return (o_acc, lse_acc, k_nxt, v_nxt), None

        o0, lse0 = empty_partial(q)
        (o, lse, _, _), _ = lax.scan(step, (o0, lse0, k, v),
                                     jnp.arange(n))
        return o.astype(q.dtype)

    spec = P(None, None, axis, None)
    return shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v)
