"""Elementwise vector add — the template op for the whole elementwise suite.

Reference: kernels/elementwise/elementwise.cu (6 variants
elementwise_add_{f32,f32x4,f16,f16x2,f16x8,f16x8_pack}, bindings :122-177)
and its harness kernels/elementwise/elementwise.py.
"""

import jax.numpy as jnp

from tpukern.ops._ew import ew_call, stamp_ew_variants


def add(x, y, **kw):
    """c = a + b via the Pallas VPU template."""
    return ew_call(lambda a, b: a + b, x, y, **kw)


def mul(x, y, **kw):
    return ew_call(lambda a, b: a * b, x, y, **kw)


stamp_ew_variants("elementwise", "add", lambda a, b: a + b, jnp.add, nargs=2)
stamp_ew_variants("elementwise", "mul", lambda a, b: a * b, jnp.multiply, nargs=2)
