"""Elementwise + activation suites vs XLA references (all variants)."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401  (registers everything)
from tpukern.core import registry
from tpukern.core.tolerances import check_all_close

EW_FAMILIES = ["elementwise", "relu", "elu", "gelu", "swish", "sigmoid",
               "hardswish", "hardshrink"]

# (256,256) -> 512 lane-rows: every tier gets >=1 full block and the
# r8/r64 tiers get many grid steps; (63,130) exercises the padded tail.
# Interpret-mode cost scales with grid steps (the old (1024,1024) shape
# ran the r8 tier as 1024 serial Python steps — 170s for this file).
SHAPES = [(256, 256), (63, 130)]


def _dtype_of(name):
    return jnp.bfloat16 if "bf16" in name else jnp.float32


@pytest.mark.parametrize("family", EW_FAMILIES)
@pytest.mark.parametrize("shape", SHAPES)
def test_all_variants(family, shape, rng):
    vs = registry.variants(family)
    assert len(vs) >= 6, f"{family}: expected >=6 variants, got {len(vs)}"
    for name, v in vs.items():
        dt = _dtype_of(name)
        nargs = 2 if family == "elementwise" else 1
        args = [jnp.asarray(rng.standard_normal(shape), dt)
                for _ in range(nargs)]
        out = v.fn(*args)
        ref = v.ref(*args)
        assert out.shape == shape
        assert out.dtype == dt
        check_all_close(out, ref, dtype=dt, name=f"{family}.{name}")


def test_add_matches_shapes(rng):
    from tpukern.ops.elementwise import add
    for shape in [(8,), (1000,), (5, 7, 11)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        y = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        np.testing.assert_allclose(np.asarray(add(x, y)),
                                   np.asarray(x + y), rtol=1e-6)
