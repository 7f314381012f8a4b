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

Backward (context-parallel training): a second ring pass. Each step runs
the Pallas FA-2 backward kernels (ops/attention_bwd.py) on the KV shard
currently in front of this chip, using the GLOBAL lse/o residuals (the
FA-2 backward recomputes p = exp(s - lse) against the full-softmax lse,
so per-shard contributions are exact); dq accumulates locally while
dk/dv accumulate in buffers that TRAVEL with their k/v shards — after n
rotations every dk/dv buffer is back at its home shard.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpukern.ops.attention import (flash_attention,
                                   flash_attention_carry_init,
                                   flash_attention_finalize)
from tpukern.ops.attention_bwd import flash_attention_bwd


def _ring_fwd(q, k, v, *, axis, n, causal, sm_scale, block_q, block_k):
    """One ring pass; returns (o, lse) for the local q shard.

    The cross-shard softmax combine rides INSIDE the Pallas kernel: each
    step passes the running (acc, m, l) online-softmax state in as the
    kernel's initial scratch and takes the updated state out
    (flash_attention's carry interface) — no per-step XLA-level
    exp/renormalize pass over the (B, H, S, D) output."""
    rank = lax.axis_index(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    fa = functools.partial(flash_attention, sm_scale=sm_scale,
                           block_q=block_q, block_k=block_k,
                           return_carry=True)

    def step(carry, i):
        acc, m, l, k_cur, v_cur = carry
        src = (rank - i) % n
        if causal:
            # src < rank: full attention; src == rank: causal diag
            # block; src > rank: entirely masked -> carry unchanged.
            acc, m, l = lax.cond(
                src == rank,
                lambda: fa(q, k_cur, v_cur, causal=True,
                           carry=(acc, m, l)),
                lambda: lax.cond(
                    src < rank,
                    lambda: fa(q, k_cur, v_cur, causal=False,
                               carry=(acc, m, l)),
                    lambda: (acc, m, l)),
            )
        else:
            acc, m, l = fa(q, k_cur, v_cur, causal=False,
                           carry=(acc, m, l))
        k_nxt = lax.ppermute(k_cur, axis, perm)
        v_nxt = lax.ppermute(v_cur, axis, perm)
        return (acc, m, l, k_nxt, v_nxt), None

    (acc, m, l, _, _), _ = lax.scan(
        step, (*flash_attention_carry_init(q), k, v), jnp.arange(n))
    return flash_attention_finalize(acc, m, l, with_lse=True)


def _ring_bwd(q, k, v, o, lse, do, *, axis, n, causal, sm_scale,
              block_q, block_k):
    """Second ring pass: per-shard Pallas FA-2 backward vs the global
    (combined) o/lse residuals; dk/dv accumulators travel with their
    k/v shards around the ring back to their home chip."""
    rank = lax.axis_index(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    fb = functools.partial(flash_attention_bwd, sm_scale=sm_scale,
                           block_q=block_q, block_k=block_k)

    def zeros():
        return (jnp.zeros(q.shape, jnp.float32),
                jnp.zeros(k.shape, jnp.float32),
                jnp.zeros(v.shape, jnp.float32))

    def step(carry, i):
        dq_acc, k_cur, v_cur, dk_acc, dv_acc = carry
        src = (rank - i) % n

        def run(causal_flag):
            def f():
                dq_p, dk_p, dv_p = fb(q, k_cur, v_cur, o, lse, do,
                                      causal=causal_flag)
                return (dq_p.astype(jnp.float32),
                        dk_p.astype(jnp.float32),
                        dv_p.astype(jnp.float32))
            return f

        if causal:
            dq_p, dk_p, dv_p = lax.cond(
                src == rank, run(True),
                lambda: lax.cond(src < rank, run(False), zeros))
        else:
            dq_p, dk_p, dv_p = run(False)()

        dq_acc = dq_acc + dq_p
        dk_acc = dk_acc + dk_p
        dv_acc = dv_acc + dv_p
        k_cur = lax.ppermute(k_cur, axis, perm)
        v_cur = lax.ppermute(v_cur, axis, perm)
        dk_acc = lax.ppermute(dk_acc, axis, perm)
        dv_acc = lax.ppermute(dv_acc, axis, perm)
        return (dq_acc, k_cur, v_cur, dk_acc, dv_acc), None

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    (dq, _, _, dk, dv), _ = lax.scan(
        step, (dq0, k, v, dk0, dv0), jnp.arange(n))
    # n rotations = the traveling accumulators are home again
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def ring_attention(q, k, v, mesh, axis="sp", causal=False, sm_scale=None,
                   block_q=None, block_k=None):
    """Attention with q, k, v (B, H, S, D) sequence-sharded over `axis`.

    Each step: run the local FA-2 kernel against the KV shard currently
    held, merge via lse, then ppermute KV to the next neighbor — compute
    and ICI transfer overlap across steps. Differentiable: the backward
    is a second ring pass through the Pallas FA-2 backward kernels.
    """
    n = mesh.shape[axis]
    cfg = dict(axis=axis, n=n, causal=causal, sm_scale=sm_scale,
               block_q=block_q, block_k=block_k)
    # backward kernels keep their own tuned defaults for whichever
    # block the caller left unset (an explicit choice is preserved)
    bwd_cfg = dict(cfg)
    if block_q is None:
        bwd_cfg["block_q"] = 256
    if block_k is None:
        bwd_cfg["block_k"] = 512

    @jax.custom_vjp
    def local_fn(q, k, v):
        o, _ = _ring_fwd(q, k, v, **cfg)
        return o.astype(q.dtype)

    def local_fwd(q, k, v):
        o, lse = _ring_fwd(q, k, v, **cfg)
        o = o.astype(q.dtype)
        return o, (q, k, v, o, lse)

    def local_bwd(res, do):
        q, k, v, o, lse = res
        return _ring_bwd(q, k, v, o, lse, do, **bwd_cfg)

    local_fn.defvjp(local_fwd, local_bwd)

    spec = P(None, None, axis, None)
    return shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v)
