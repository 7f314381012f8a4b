"""Activation suite: relu, elu, gelu, swish, sigmoid, hardswish, hardshrink.

Reference: one directory per op, 6 vector-width variants each —
kernels/relu/relu.cu, kernels/elu/elu.cu, kernels/gelu/gelu.cu (tanh
approximation), kernels/swish/swish.cu, kernels/sigmoid/sigmoid.cu,
kernels/hardswish/hardswish.cu, kernels/hardshrink/hardshrink.cu.

On TPU these all stamp from the shared VPU template (ops/_ew.py); math runs
on the VPU via jnp/jax.nn inside the kernel. Reference parameters kept:
ELU alpha=1.0, hardshrink lambda=0.5, gelu uses the tanh approximation.
"""

import math

import jax
import jax.numpy as jnp

from tpukern.ops._ew import ew_call, stamp_ew_variants

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


def _relu(x):
    return jnp.maximum(x, 0)


def _elu(x, alpha=1.0):
    # all math incl. the compare in f32: Mosaic cannot legalize bf16
    # vector comparisons (arith.cmpf on bf16)
    xf = x.astype(jnp.float32)
    return jnp.where(xf > 0, xf, alpha * (jnp.exp(xf) - 1.0)).astype(x.dtype)


def _gelu_tanh(x):
    xf = x.astype(jnp.float32)
    inner = _SQRT_2_OVER_PI * (xf + 0.044715 * xf * xf * xf)
    return (0.5 * xf * (1.0 + jnp.tanh(inner))).astype(x.dtype)


def _sigmoid(x):
    return jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _swish(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _hardswish(x):
    xf = x.astype(jnp.float32)
    return (xf * jnp.clip(xf + 3.0, 0.0, 6.0) / 6.0).astype(x.dtype)


def _hardshrink(x, lambd=0.5):
    xf = x.astype(jnp.float32)  # f32 compare (no bf16 cmpf in Mosaic)
    return jnp.where((xf > lambd) | (xf < -lambd), xf,
                     jnp.zeros_like(xf)).astype(x.dtype)


_ACTS = {
    "relu": (_relu, lambda x: jnp.maximum(x, 0)),
    "elu": (_elu, lambda x: jax.nn.elu(x.astype(jnp.float32)).astype(x.dtype)),
    "gelu": (_gelu_tanh,
             lambda x: jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)),
    "swish": (_swish, lambda x: jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)),
    "sigmoid": (_sigmoid, lambda x: jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)),
    "hardswish": (_hardswish,
                  lambda x: jax.nn.hard_swish(x.astype(jnp.float32)).astype(x.dtype)),
    "hardshrink": (_hardshrink,
                   lambda x: jnp.where((x > 0.5) | (x < -0.5), x, jnp.zeros_like(x))),
}

for _name, (_op, _ref) in _ACTS.items():
    stamp_ew_variants(_name, _name, _op, _ref, nargs=1)


def relu(x, **kw):
    return ew_call(_relu, x, **kw)


def elu(x, **kw):
    return ew_call(_elu, x, **kw)


def gelu(x, **kw):
    return ew_call(_gelu_tanh, x, **kw)


def swish(x, **kw):
    return ew_call(_swish, x, **kw)


def sigmoid(x, **kw):
    return ew_call(_sigmoid, x, **kw)


def hardswish(x, **kw):
    return ew_call(_hardswish, x, **kw)


def hardshrink(x, **kw):
    return ew_call(_hardshrink, x, **kw)
