"""Softmax suite: safe/online/grid/global variants vs jax.nn.softmax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401
from tpukern.core.tolerances import check_all_close
from tpukern.ops import softmax as sm

SHAPES = [(128, 512), (100, 130), (16, 2048)]


@pytest.mark.parametrize("sfx,impl,dt,kw", sm._VARIANTS)
@pytest.mark.parametrize("shape", SHAPES)
def test_per_token_variants(sfx, impl, dt, kw, shape, rng):
    x = jnp.asarray(rng.standard_normal(shape) * 3, dt)
    out = impl(x, **kw)
    ref = jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(dt)
    assert out.shape == shape
    check_all_close(out, ref, dtype=dt, name=sfx)
    # rows sum to 1
    s = np.asarray(out, np.float64).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=0.05 if dt == jnp.bfloat16 else 1e-3)


def test_global_softmax(rng):
    x = jnp.asarray(rng.standard_normal((64, 256)) * 2, jnp.float32)
    out = sm.softmax_global(x)
    ref = jax.nn.softmax(x.reshape(-1)).reshape(x.shape)
    check_all_close(out, ref, dtype=jnp.float32, rtol=1e-4, atol=1e-6)


def test_grid_online_wide_row(rng):
    # wider than one block: streams 8 column blocks
    x = jnp.asarray(rng.standard_normal((64, 4096)), jnp.float32)
    out = sm.online_softmax_grid(x, block_rows=32, block_cols=512)
    ref = jax.nn.softmax(x, axis=-1)
    check_all_close(out, ref, dtype=jnp.float32, name="grid_online")
