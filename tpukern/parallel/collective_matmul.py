"""Collective matmul: communication/compute-overlapped tensor-parallel GEMM.

The classic TPU latency-hiding technique (the "collective matmul" /
"overlapped all-gather matmul" recipe): instead of a blocking
`all_gather(x)` followed by one big local matmul, rotate the activation
shards around the ICI ring with `lax.ppermute` one chunk per step and
multiply each chunk as it arrives. Each step's (M/n)-row matmul runs on
the MXU while the next chunk is in flight on the ICI link, so the
transfer cost is hidden behind compute whenever
FLOPs_per_chunk / MXU_rate > bytes_per_chunk / ICI_rate.

The reference (a single-GPU kernel zoo) has no analog — its distributed
layer is ten 0-byte placeholder files (SURVEY.md §2.5). This module is
the TPU-native fulfilment of that intent at the level the hardware
rewards: hand-scheduled overlap on the ring, which is exactly what
XLA's own `--xla_tpu_enable_async_collective_permute` +
latency-hiding-scheduler does for Megatron-style layers, expressed
explicitly so it can be studied and benchmarked.

Two primitives (both differentiable — pure lax ops, `ppermute`'s
transpose is the inverse permutation):

- `all_gather_matmul`:  y = all_gather(x) @ w_local
  (Megatron COLUMN-parallel layer with sequence-parallel input: x arrives
  row/sequence-sharded, w output-column-sharded; y leaves column-sharded.)
- `matmul_reduce_scatter`:  y = reduce_scatter(x_local @ w_local)
  (ROW-parallel layer: x feature-sharded, w input-row-sharded; partial
  products are ring-reduced one output row-chunk per step; y leaves
  row/sequence-sharded.)

Chaining the two gives the standard sequence-parallel transformer MLP:
h = gelu(all_gather_matmul(x, w1)); y = matmul_reduce_scatter(h, w2)
with only sequence-sharded activations ever materialized.

`bidirectional=True` splits every traveling chunk in half and rotates the
halves in opposite directions, using both ICI links of the ring axis at
once — same total bytes, half the serial hop latency (the scaling-book
refinement). Requires n >= 2; falls back to unidirectional at n == 1.
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P


def _dot(a, b, acc_dtype):
    return lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=acc_dtype)


def all_gather_matmul(x, w, mesh, axis, *, bidirectional=True,
                      acc_dtype=jnp.float32):
    """y = all_gather(x, axis) @ w, overlapped chunk-by-chunk.

    Global shapes: x (M, K) sharded (axis, None); w (K, N) sharded
    (None, axis); returns y (M, N) sharded (None, axis) — every device
    computes all M rows for its N/n output columns, consuming each
    arriving x chunk immediately instead of waiting for the full gather.

    M must divide by n (and by 2n for the bidirectional ring).
    """
    n = mesh.shape[axis]
    M, K = x.shape
    K2, N = w.shape
    assert K == K2, f"contract mismatch: x K={K}, w K={K2}"
    assert M % n == 0, f"M ({M}) must divide over {axis!r} ({n})"
    m_loc = M // n
    bidirectional = bidirectional and n > 1 and m_loc % 2 == 0
    out_dtype = acc_dtype if acc_dtype is not None else x.dtype

    def body(xs, ws):
        # xs (m_loc, K), ws (K, N/n)
        i = lax.axis_index(axis)
        fwd = [(d, (d + 1) % n) for d in range(n)]
        bwd = [((d + 1) % n, d) for d in range(n)]
        out = jnp.zeros((M, ws.shape[1]), out_dtype)

        if not bidirectional:
            cur = xs
            for s in range(n):
                src = (i - s) % n  # whose chunk we hold after s hops
                out = lax.dynamic_update_slice_in_dim(
                    out, _dot(cur, ws, acc_dtype).astype(out_dtype),
                    src * m_loc, axis=0)
                if s < n - 1:
                    cur = lax.ppermute(cur, axis, fwd)
            return out

        # both ring directions at once: top half of each shard travels
        # forward, bottom half backward — each link carries half the bytes
        half = m_loc // 2
        cur_f = xs[:half]
        cur_b = xs[half:]
        for s in range(n):
            src_f = (i - s) % n
            src_b = (i + s) % n
            out = lax.dynamic_update_slice_in_dim(
                out, _dot(cur_f, ws, acc_dtype).astype(out_dtype),
                src_f * m_loc, axis=0)
            out = lax.dynamic_update_slice_in_dim(
                out, _dot(cur_b, ws, acc_dtype).astype(out_dtype),
                src_b * m_loc + half, axis=0)
            if s < n - 1:
                cur_f = lax.ppermute(cur_f, axis, fwd)
                cur_b = lax.ppermute(cur_b, axis, bwd)
        return out

    return shard_map(body, mesh=mesh,
                     in_specs=(P(axis, None), P(None, axis)),
                     out_specs=P(None, axis), check_vma=False)(x, w)


def matmul_reduce_scatter(x, w, mesh, axis, *, acc_dtype=jnp.float32):
    """y = reduce_scatter(x @ w over the contraction shards), overlapped.

    Global shapes: x (M, K) sharded (None, axis); w (K, N) sharded
    (axis, None); returns y (M, N) sharded (axis, None). Device i's local
    product xs @ ws is a FULL (M, N) partial sum; instead of materializing
    it and calling psum_scatter, the ring algorithm computes it one
    (M/n)-row chunk per step and accumulates into a traveling accumulator:
    the chunk destined for device j starts at j+1 and gathers every
    device's contribution on its way around the ring. Compute of step s+1
    overlaps the transfer of step s.

    M must divide by n.
    """
    n = mesh.shape[axis]
    M, K = x.shape
    Kw, N = w.shape
    assert K == Kw, f"contract mismatch: x K={K}, w global K={Kw}"
    assert M % n == 0, f"M ({M}) must divide over {axis!r} ({n})"
    m_loc = M // n
    out_dtype = acc_dtype if acc_dtype is not None else x.dtype

    def body(xs, ws):
        # xs (M, K/n), ws (K/n, N)
        i = lax.axis_index(axis)
        fwd = [(d, (d + 1) % n) for d in range(n)]

        def chunk(c):
            rows = lax.dynamic_slice_in_dim(xs, c * m_loc, m_loc, axis=0)
            return _dot(rows, ws, acc_dtype).astype(out_dtype)

        # step s: device i holds the traveling chunk (i - s - 1) mod n,
        # adds its own contribution, forwards; after n steps device i has
        # chunk i with every device's partial summed in.
        acc = chunk((i - 1) % n)
        for s in range(1, n):
            acc = lax.ppermute(acc, axis, fwd)
            acc = acc + chunk((i - s - 1) % n)
        return acc

    return shard_map(body, mesh=mesh,
                     in_specs=(P(None, axis), P(axis, None)),
                     out_specs=P(axis, None), check_vma=False)(x, w)


def tp_mlp(x, w1, w2, mesh, axis, *, activation=jax.nn.gelu,
           bidirectional=True):
    """Sequence-parallel transformer MLP built from the two primitives:

    x (S, E) sequence-sharded -> all_gather_matmul -> h (S, F) F-sharded
    -> activation -> matmul_reduce_scatter -> y (S, E) sequence-sharded.

    w1 (E, F) sharded (None, axis); w2 (F, E) sharded (axis, None). The
    full activation h is never replicated and neither matmul waits on a
    blocking collective.
    """
    h = all_gather_matmul(x, w1, mesh, axis, bidirectional=bidirectional)
    h = activation(h).astype(x.dtype)
    return matmul_reduce_scatter(h, w2, mesh, axis).astype(x.dtype)
