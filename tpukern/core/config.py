"""Runtime configuration: interpret-mode selection.

Pallas TPU kernels run compiled (Mosaic) on TPU and in interpreter mode on
CPU. Tests run on a virtual CPU mesh (see tests/conftest.py); benchmarks run
compiled on real TPU. This module picks the default automatically, with an
env override for debugging (TPUKERN_INTERPRET=0/1).
"""

import functools
import os

import jax
import jax.numpy as jnp


@functools.cache
def use_interpret() -> bool:
    env = os.environ.get("TPUKERN_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() != "tpu"


# Mosaic (the TPU kernel compiler) has no f16 ALU and v5e has no fp8
# compute: these dtypes are STORAGE-ONLY for tpukern kernels. Variants
# declared in them round through the dtype at the XLA boundary and compute
# in f32 inside the kernel (documented deviation from the reference's true
# f16/fp8 arithmetic; TPU's native half type is bf16).
STORAGE_ONLY_DTYPES = frozenset(
    jnp.dtype(d).name for d in
    (jnp.float16, jnp.float8_e4m3fn, jnp.float8_e5m2))


def kernel_dtype(dt):
    """The dtype a kernel actually computes in for a declared dtype."""
    if jnp.dtype(dt).name in STORAGE_ONLY_DTYPES:
        return jnp.float32
    return jnp.dtype(dt)


def to_kernel_dtype(x):
    """Round an array through its storage dtype, upcasting if the kernel
    cannot compute in it."""
    kdt = kernel_dtype(x.dtype)
    return x.astype(kdt) if kdt != x.dtype else x
