"""Ulysses-style (DeepSpeed-Ulysses) sequence-parallel attention.

The second context-parallel strategy beside ring attention
(parallel/ring_attention.py), with the opposite communication shape:

- ring: KV shards ROTATE (n-1 ppermute hops of the KV shard size);
  attention state chains through the kernel carry. Comm scales with
  n * |KV|/n per chip; compute overlaps transfers.
- ulysses: two all_to_all transposes. Tokens arrive S-sharded; the first
  all_to_all re-shards heads across the axis while gathering the FULL
  sequence per head (S-sharding -> H-sharding), each chip runs the plain
  FA-2 kernel on its H/n heads over the whole sequence, and the second
  all_to_all restores S-sharding. Comm is 2 transposes of the activation
  size; attention itself needs no cross-chip math at all.

Ulysses needs n | H (heads divide over the axis); ring has no such
constraint but pays n kernel launches. Both produce bitwise-identical
math to single-chip attention (no lse combination needed here at all).

Differentiable: pure jnp/lax ops + the trainable FA wrapper, so autodiff
just works (the transposes' adjoints are the reverse all_to_alls).
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpukern.ops.attention import (flash_attention,
                                   flash_attention_trainable)


def _local(q, k, v, *, axis, causal, sm_scale, trainable):
    """Per-chip body: q/k/v arrive (B, H, S_local, D) sequence-sharded."""
    # S-sharded -> H-sharded with the full sequence: split heads over the
    # axis, concat the sequence shards (axis member i holds heads
    # [i*H/n, (i+1)*H/n) of every token)
    q, k, v = (lax.all_to_all(t, axis, split_axis=1, concat_axis=2,
                              tiled=True) for t in (q, k, v))
    if trainable:
        o = flash_attention_trainable(q, k, v, causal=causal,
                                      sm_scale=sm_scale)
    else:
        o = flash_attention(q, k, v, causal=causal, sm_scale=sm_scale)
    # H-sharded -> S-sharded back
    return lax.all_to_all(o, axis, split_axis=2, concat_axis=1,
                          tiled=True)


def ulysses_attention(q, k, v, mesh, axis="sp", causal=False,
                      sm_scale=None, trainable=False):
    """Attention with q, k, v (B, H, S, D) sequence-sharded over `axis`.

    Requires H % mesh.shape[axis] == 0. trainable=True routes through the
    custom-VJP Pallas forward+backward pair for gradient support.
    """
    n = mesh.shape[axis]
    H, Hkv, S = q.shape[1], k.shape[1], q.shape[2]
    assert H % n == 0 and Hkv % n == 0, (
        f"ulysses needs q heads ({H}) AND kv heads ({Hkv}) divisible by "
        f"the {axis!r} axis ({n}); use ring_attention otherwise")
    assert S % n == 0, f"sequence ({S}) must divide over {axis!r} ({n})"

    def local_fn(q, k, v):
        return _local(q, k, v, axis=axis, causal=causal,
                      sm_scale=sm_scale, trainable=trainable)

    spec = P(None, None, axis, None)
    return shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v)
