"""Layer-norm / RMS-norm variant matrices vs XLA references."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401
from tpukern.ops import layernorm as ln
from tpukern.ops import rmsnorm as rn

_TOL = {"float32": 1e-4, "bfloat16": 5e-2, "float16": 5e-3}

SHAPES = [(64, 512), (33, 300)]


def _check(out, ref, in_dt, acc_dt, name):
    # tolerance keyed on the LEAST precise dtype in the path (input,
    # accumulator, output)
    t = max(_TOL[jnp.dtype(in_dt).name], _TOL[jnp.dtype(acc_dt).name])
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=t, atol=t, err_msg=name)


@pytest.mark.parametrize("sfx,in_dt,acc_dt,br", ln._VARIANTS)
@pytest.mark.parametrize("shape", SHAPES)
def test_layer_norm(sfx, in_dt, acc_dt, br, shape, rng):
    x = jnp.asarray(rng.standard_normal(shape), in_dt)
    out = ln.layer_norm(x, g=1.5, b=0.3, acc_dtype=acc_dt, block_rows=br)
    ref = ln.layer_norm_ref(x, g=1.5, b=0.3)
    _check(out, ref, in_dt, acc_dt, sfx)


@pytest.mark.parametrize("sfx,in_dt,acc_dt,br", rn._VARIANTS)
def test_rms_norm(sfx, in_dt, acc_dt, br, rng):
    x = jnp.asarray(rng.standard_normal((64, 384)), in_dt)
    out = rn.rms_norm(x, g=2.0, acc_dtype=acc_dt, block_rows=br)
    ref = rn.rms_norm_ref(x, g=2.0)
    _check(out, ref, in_dt, acc_dt, sfx)


def test_vector_affine(rng):
    x = jnp.asarray(rng.standard_normal((32, 256)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(256), jnp.float32)
    b = jnp.asarray(rng.standard_normal(256), jnp.float32)
    out = ln.layer_norm(x, g=g, b=b)
    ref = ln.layer_norm_ref(x, g=g, b=b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    out2 = rn.rms_norm(x, g=g)
    ref2 = rn.rms_norm_ref(x, g=g)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-4)
