"""Histogram: integer bincount.

Reference: kernels/histogram/histogram.cu:18-26 — histogram_{i32,i32x4} via
per-thread `atomicAdd` into global bins.

TPU design: no cross-block atomics exist. The rebuild streams value blocks
through a sequential grid dimension while a per-bin-chunk accumulator lives
in VMEM scratch; counts come from a vectorized compare-and-sum (each value
block is compared against a 128-bin lane vector — the VPU equivalent of 128
parallel atomic counters). Grid = (bin chunks, value blocks), value axis
innermost so the scratch accumulates across all values before moving to the
next bin chunk.
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
    """Count occurrences of each value in [0, num_bins) in int32 array x."""
    x2 = _padded_rows_fill(x.astype(jnp.int32), block_rows, -1)  # -1 never counted
    n_vblocks = x2.shape[0] // block_rows
    bins_p = round_up(num_bins, LANES)
    n_bchunks = bins_p // LANES

    def kernel(x_ref, o_ref, acc_ref):
        j = pl.program_id(0)   # bin chunk
        i = pl.program_id(1)   # value block

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        v = x_ref[...]  # (block_rows, 128)
        bin_ids = (jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                   + j * LANES)
        # (rows, lanes, bins) compare, summed over values -> (1, bins)
        eq = (v[:, :, None] == bin_ids[None, :, :].reshape(1, 1, LANES))
        acc_ref[...] += jnp.sum(eq.astype(jnp.int32), axis=(0, 1),
                                keepdims=False).reshape(1, LANES)

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, bins_p), jnp.int32),
        grid=(n_bchunks, n_vblocks),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda j, i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, LANES), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=use_interpret() if interpret is None else interpret,
    )(x2)
    return out.reshape(-1)[:num_bins]


def histogram_ref(x, num_bins):
    return jnp.bincount(x.reshape(-1), length=num_bins).astype(jnp.int32)


register("histogram", "histogram_i32", ref=histogram_ref)(
    lambda x, num_bins, **kw: histogram(x, num_bins, **kw))
register("histogram", "histogram_i32_r128", ref=histogram_ref)(
    lambda x, num_bins, **kw: histogram(x, num_bins, block_rows=128, **kw))
