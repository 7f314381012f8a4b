"""Reductions + dot product: dtype/accumulator matrix vs f64 references."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401
from tpukern.ops import dot_product as dp
from tpukern.ops import reduce as red

_REL = {"float32": 1e-5, "bfloat16": 3e-2, "float16": 1e-2,
        "int32": 0.0}


def _exact_vals(rng, shape):
    """Values exactly representable in every dtype incl. fp8."""
    return rng.choice([-1.0, -0.5, 0.0, 0.5, 1.0], size=shape)


@pytest.mark.parametrize("sfx,in_dt,acc_dt,br", red._SUM_VARIANTS)
def test_sum_variants(sfx, in_dt, acc_dt, br, rng):
    x = jnp.asarray(_exact_vals(rng, (300, 200)), in_dt)
    out = red.sum_all(x, acc_dtype=acc_dt, block_rows=br)
    ref = np.asarray(x, np.float64).sum()
    rel = _REL.get(jnp.dtype(acc_dt).name, 3e-1)  # fp8 accs looser
    if jnp.issubdtype(acc_dt, jnp.integer):
        assert int(out) == int(ref)
    else:
        assert abs(float(out) - ref) <= max(abs(ref) * rel, rel * 100)


@pytest.mark.parametrize("sfx,in_dt,acc_dt,br", red._MAX_VARIANTS)
def test_max_variants(sfx, in_dt, acc_dt, br, rng):
    x = jnp.asarray(_exact_vals(rng, (100, 150)), in_dt)
    out = red.max_all(x, acc_dtype=acc_dt, block_rows=br)
    ref = np.asarray(x, np.float64).max()
    assert float(out) == pytest.approx(ref, abs=1e-6)


@pytest.mark.parametrize("sfx,in_dt,br", dp._VARIANTS)
def test_dot_product(sfx, in_dt, br, rng):
    a = jnp.asarray(_exact_vals(rng, (200, 130)), in_dt)
    b = jnp.asarray(_exact_vals(rng, (200, 130)), in_dt)
    out = dp.dot_prod(a, b, block_rows=br)
    ref = (np.asarray(a, np.float64) * np.asarray(b, np.float64)).sum()
    assert abs(float(out) - ref) <= max(abs(ref), 10.0) * 1e-4
