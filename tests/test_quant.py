"""Int8 quantize/dequantize round-trip + stochastic rounding stats."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401
from tpukern.ops import quant


def test_quantize_matches_ref(rng):
    x = jnp.asarray(rng.standard_normal((64, 256)) * 3, jnp.float32)
    v, s = quant.quantize_int8(x)
    v_ref, s_ref = quant.quantize_ref(x)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
    # rounding at .5 boundaries may differ by 1
    assert np.abs(np.asarray(v, np.int32) - np.asarray(v_ref, np.int32)).max() <= 1


def test_roundtrip_error_bounded(rng):
    x = jnp.asarray(rng.standard_normal((32, 512)), jnp.float32)
    v, s = quant.quantize_int8(x)
    y = quant.dequantize_int8(v, s)
    # max error is half a quantization step per row
    step = np.asarray(s)[:, None]
    assert (np.abs(np.asarray(y) - np.asarray(x)) <= 0.51 * step + 1e-6).all()


def test_quantize_fp8_matches_ref(rng):
    x = jnp.asarray(rng.standard_normal((64, 256)) * 3, jnp.float32)
    v, s = quant.quantize_fp8(x)
    v_ref, s_ref = quant.quantize_fp8_ref(x)
    assert v.dtype == jnp.float8_e4m3fn
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(v, np.float32),
                                  np.asarray(v_ref, np.float32))


def test_fp8_roundtrip_error_bounded(rng):
    x = jnp.asarray(rng.standard_normal((32, 512)), jnp.float32)
    v, s = quant.quantize_fp8(x)
    y = np.asarray(v, np.float32) * np.asarray(s)[:, None]
    # e4m3 relative step is 2^-3 within a binade; scaled absmax ~448
    err = np.abs(y - np.asarray(x))
    bound = np.maximum(np.abs(np.asarray(x)) * 2.0 ** -3,
                       np.asarray(s)[:, None] * 2.0 ** -9)
    assert (err <= bound + 1e-6).all()


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="pltpu PRNG (prng_random_bits/stochastic_round) has no "
           "interpret-mode implementation")
def test_stochastic_rounding_unbiased():
    # rows with absmax 1.27 -> scale 0.01; 0.505 scales to 50.5 (a midpoint)
    x = np.full((8, 128), 0.505, np.float32)
    x[:, 0] = 1.27
    x = jnp.asarray(x)
    vals = []
    for seed in range(16):
        v, s = quant.quantize_int8(x, seed=seed, stochastic=True)
        y = np.asarray(quant.dequantize_int8(v, s))
        vals.append(y[:, 1:])  # the midpoint slots
    mean = np.stack(vals).mean()
    spread = np.stack(vals).std()
    # unbiased around 0.505 and actually randomized (not constant)
    assert abs(mean - 0.505) < 0.002
    assert spread > 1e-4
