"""Matrix transpose: tiled 2-D transpose with grid-traversal variants.

Reference: kernels/mat-transpose/mat_transpose.cu:29-236 — 11 kernels:
col2row/row2col x {scalar,x4} x {1d,2d}, `diagonal2d` (diagonal block
reordering for DRAM-bank balance), shared-mem tiles + bank-conflict-free
padding. The swizzle study (kernels/swizzle/mat_trans_swizzle.cu) adds XOR
smem swizzles.

TPU design: there is no banked shared memory, so the smem/bcf/XOR variants'
job (conflict-free transposed access) is done by Mosaic's in-register tile
rotations — `block.T` inside the kernel is a hardware-supported relayout.
What DOES carry over is the *grid traversal order*: row-major vs col-major
output walking (col2row vs row2col) and the diagonal block reordering for
HBM channel balance (`diagonal2d`), expressed here as BlockSpec index_map
remappings instead of blockIdx arithmetic.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import cdiv, min_sublanes, use_interpret
from tpukern.core.registry import register


def transpose(x, block=(128, 128), order="row", interpret=None):
    """out[j, i] = x[i, j] with (bm, bn) tiles.

    order: 'row'  — walk input tiles row-major (reference col2row),
           'col'  — walk input tiles col-major (reference row2col),
           'diag' — diagonal block reordering (reference diagonal2d,
                    mat_transpose.cu:~150): tile (i,j) -> ((i+j) % nI, j).
    """
    M, N = x.shape
    bm, bn = block
    nI, nJ = cdiv(M, bm), cdiv(N, bn)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    if order == "row":
        in_map = lambda i, j: (i, j)
        out_map = lambda i, j: (j, i)
        grid = (nI, nJ)
    elif order == "col":
        in_map = lambda j, i: (i, j)
        out_map = lambda j, i: (j, i)
        grid = (nJ, nI)
    elif order == "diag":
        def in_map(i, j):
            return ((i + j) % nI, j)

        def out_map(i, j):
            return (j, (i + j) % nI)
        grid = (nI, nJ)
    else:
        raise ValueError(order)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, M), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((bm, bn), in_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, bm), out_map, memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=use_interpret() if interpret is None else interpret,
    )(x)


def transpose_ref(x):
    return x.T


_VARIANTS = [
    ("f32_row", jnp.float32, (128, 128), "row"),
    ("f32_col", jnp.float32, (128, 128), "col"),
    ("f32_diag", jnp.float32, (128, 128), "diag"),
    ("f32_row_b256", jnp.float32, (256, 256), "row"),
    ("f32_row_b512", jnp.float32, (512, 512), "row"),
    ("bf16_row", jnp.bfloat16, (128, 128), "row"),
    ("bf16_diag", jnp.bfloat16, (128, 128), "diag"),
    ("bf16_row_b256", jnp.bfloat16, (256, 256), "row"),
]

for _sfx, _dt, _blk, _ord in _VARIANTS:
    def _fn(x, _dt=_dt, _blk=_blk, _ord=_ord, **kw):
        return transpose(x.astype(_dt), block=_blk, order=_ord, **kw)
    register("transpose", f"transpose_{_sfx}", ref=transpose_ref)(_fn)
