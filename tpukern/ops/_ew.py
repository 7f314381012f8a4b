"""Shared elementwise kernel template.

The reference stamps each elementwise op into 6 variants via C macros over
vector width (f32, f32x4, f16, f16x2, f16x8, f16x8_pack — e.g.
kernels/elementwise/elementwise.cu:24-118, kernels/relu/relu.cu). On TPU the
analogous variant axis is the per-block tile height in sublane multiples:
wider tiles amortize grid/pipeline overhead exactly like wider per-thread
loads amortize instruction overhead on GPU. We stamp 6 tiers per op:

    f32_r8 / f32_r64 / f32_r256      (f32 min tile 8x128 and multiples)
    bf16_r16 / bf16_r128 / bf16_r512 (bf16 min tile 16x128 and multiples)

All variants flatten the input to (rows, 128) lanes (core.tiling.as_rows)
and run a 1-D grid of row blocks fully resident in VMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import (LANES, as_rows, cdiv, from_rows, to_kernel_dtype,
                          use_interpret)
from tpukern.core.registry import register

# (suffix, dtype, block_rows) — the 6-tier ladder.
EW_TIERS = (
    ("f32_r8", jnp.float32, 8),
    ("f32_r64", jnp.float32, 64),
    ("f32_r256", jnp.float32, 256),
    ("bf16_r16", jnp.bfloat16, 16),
    ("bf16_r128", jnp.bfloat16, 128),
    ("bf16_r512", jnp.bfloat16, 512),
)


def ew_call(op, *xs, scalars=(), block_rows: int = 256, interpret=None):
    """Apply an n-ary elementwise op via a Pallas VPU kernel.

    `op` maps n same-shape blocks (plus any scalar operands, passed last)
    to one block. Works on any input shape. Traced scalars MUST go through
    `scalars` — kernels cannot close over traced values.
    """
    x0 = xs[0]
    orig_dtype = x0.dtype
    xs = tuple(to_kernel_dtype(x) for x in xs)
    n = x0.size
    rows = cdiv(n, LANES)
    xs2 = [as_rows(x) for x in xs]
    block_rows = min(block_rows, rows)
    grid = (cdiv(rows, block_rows),)
    n_arr = len(xs2)
    s_args = [jnp.asarray(s, jnp.float32).reshape(1) for s in scalars]

    def kernel(*refs):
        arr_refs = refs[:n_arr]
        s_refs = refs[n_arr:n_arr + len(s_args)]
        out_ref = refs[-1]
        vals = [r[0] for r in s_refs]
        out_ref[...] = op(*[r[...] for r in arr_refs], *vals)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), xs[0].dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in xs2
        ] + [
            pl.BlockSpec(memory_space=pltpu.SMEM) for _ in s_args
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=use_interpret() if interpret is None else interpret,
    )(*xs2, *s_args)
    return from_rows(out, x0.shape, n).astype(orig_dtype)


def _ew_bytes(nargs):
    def bytes_moved(*xs, **_):
        return (nargs + 1) * xs[0].size * xs[0].dtype.itemsize
    return bytes_moved


def stamp_ew_variants(family: str, opname: str, op, ref, nargs: int = 1):
    """Register the 6-tier variant ladder for one elementwise op."""
    for suffix, dtype, block_rows in EW_TIERS:
        name = f"{opname}_{suffix}"

        def fn(*xs, _op=op, _br=block_rows, _dt=dtype, **kw):
            xs = tuple(x.astype(_dt) for x in xs)
            return ew_call(_op, *xs, block_rows=_br, **kw)

        register(family, name, ref=ref, bytes_moved=_ew_bytes(nargs),
                 doc=f"{opname} ({dtype.__name__}, {block_rows}x{LANES} blocks)")(fn)
    return ew_call
