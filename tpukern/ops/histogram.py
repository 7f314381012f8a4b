"""Histogram: integer bincount.

Reference: kernels/histogram/histogram.cu:18-26 — histogram_{i32,i32x4} via
per-thread `atomicAdd` into global bins.

TPU design: no cross-block atomics exist. The rebuild streams value blocks
ONCE through a sequential grid dimension while the whole histogram lives as
a (bin_chunks, 128) accumulator in the VMEM output block; counts come from
a vectorized compare-and-sum (each value block is compared against a
128-bin lane vector per chunk — the VPU equivalent of 128 parallel atomic
counters). Round 1 re-read the value stream once per 128-bin chunk
(O(N * bins/128) HBM traffic); the multi-chunk accumulator makes it a
single O(N) pass regardless of bin count.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import LANES, cdiv, round_up, use_interpret
from tpukern.core.registry import register


def _padded_rows_fill(x, block_rows, fill):
    """Flatten to (rows, LANES) with BOTH the lane tail and the row pad
    filled with `fill` (as_rows zero-pads the tail, which a histogram would
    miscount as bin 0)."""
    n = x.size
    rows = round_up(cdiv(n, LANES), block_rows)
    xf = jnp.pad(x.reshape(-1), (0, rows * LANES - n), constant_values=fill)
    return xf.reshape(rows, LANES)


def histogram(x, num_bins, block_rows=32, interpret=None):
    """Count occurrences of each value in [0, num_bins) in int32 array x.

    Single pass over the values: grid = (value blocks,), accumulating
    into the full (chunk_rows, 128) histogram held in the output block
    (accumulate-in-output, the ops/matmul.py design).
    """
    x2 = _padded_rows_fill(x.astype(jnp.int32), block_rows, -1)  # -1 never counted
    n_vblocks = x2.shape[0] // block_rows
    n_bchunks = cdiv(num_bins, LANES)
    chunk_rows = round_up(n_bchunks, 8)  # min i32 tile is (8, 128)

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        v = x_ref[...]  # (block_rows, 128)
        for c in range(n_bchunks):  # static; all chunks in ONE value pass
            bin_ids = (jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                       + c * LANES)
            eq = (v[:, :, None] == bin_ids[None, :, :].reshape(1, 1, LANES))
            o_ref[c, :] += jnp.sum(eq.astype(jnp.int32), axis=(0, 1))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((chunk_rows, LANES), jnp.int32),
        grid=(n_vblocks,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk_rows, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=use_interpret() if interpret is None else interpret,
    )(x2)
    return out.reshape(-1)[:num_bins]


def histogram_sorted(x, num_bins):
    """O(N log N) sort-based tier: bin-count independent of the bin count
    (the better asymptotics for very large histograms); XLA sort +
    searchsorted, no compare-per-bin work."""
    xs = jnp.sort(x.reshape(-1))
    edges = jnp.arange(num_bins + 1, dtype=xs.dtype)
    idx = jnp.searchsorted(xs, edges, side="left")
    return jnp.diff(idx).astype(jnp.int32)


def histogram_ref(x, num_bins):
    return jnp.bincount(x.reshape(-1), length=num_bins).astype(jnp.int32)


register("histogram", "histogram_i32", ref=histogram_ref)(
    lambda x, num_bins, **kw: histogram(x, num_bins, **kw))
register("histogram", "histogram_i32_r128", ref=histogram_ref)(
    lambda x, num_bins, **kw: histogram(x, num_bins, block_rows=128, **kw))
register("histogram", "histogram_i32_sorted", ref=histogram_ref,
         tags=("baseline",))(
    lambda x, num_bins, **kw: histogram_sorted(x, num_bins))
