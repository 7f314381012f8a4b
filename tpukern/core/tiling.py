"""Tiling math for TPU: lane/sublane rules, 2-D row packing helpers.

TPU VPU operates on (8, 128) vector registers; the last dim is always 128
lanes, the minimum sublane count depends on dtype packing (f32: 8, bf16: 16,
int8/fp8: 32). This is the TPU analog of the reference's vector-width ladder
(f32 -> f32x4 -> f16x2 -> f16x8 -> 128-bit packed loads, see
kernels/elementwise/elementwise.cu:14-18): instead of widening per-thread
loads, we widen the per-block tile in sublane multiples.
"""

import jax.numpy as jnp

LANES = 128


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


_SUBLANES = {
    4: 8,   # f32 / i32
    2: 16,  # bf16 / f16
    1: 32,  # int8 / fp8
}


def min_sublanes(dtype) -> int:
    """Minimum sublane count for a dtype (packing rule)."""
    return _SUBLANES[jnp.dtype(dtype).itemsize]


def min_tile(dtype) -> tuple[int, int]:
    """Minimum (sublane, lane) tile for a dtype."""
    return (min_sublanes(dtype), LANES)


def as_rows(x, lanes: int = LANES):
    """Flatten any array to (rows, lanes), zero-padding the tail.

    The generic layout for elementwise/VPU kernels: every element maps to one
    (sublane, lane) slot; grid iterates over row blocks.
    """
    n = x.size
    rows = cdiv(n, lanes)
    pad = rows * lanes - n
    xf = x.reshape(-1)
    if pad:
        xf = jnp.pad(xf, (0, pad))
    return xf.reshape(rows, lanes)


def from_rows(y, shape, size=None):
    """Inverse of as_rows: strip padding and restore original shape."""
    n = size if size is not None else 1
    if size is None:
        for d in shape:
            n *= d
    return y.reshape(-1)[:n].reshape(shape)


def pad_to_multiple_2d(x, row_mult: int, col_mult: int = LANES):
    """Zero-pad a 2-D array so both dims are tile multiples."""
    r, c = x.shape
    rp, cp = round_up(r, row_mult), round_up(c, col_mult)
    if (rp, cp) != (r, c):
        x = jnp.pad(x, ((0, rp - r), (0, cp - c)))
    return x
