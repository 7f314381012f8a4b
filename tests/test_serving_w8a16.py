"""Weight-only int8 (w8a16) serving tier.

quantize_model_weights swaps every projection matrix for an int8 +
per-column-scale pair and the serving forward routes them through the
w8a16 kernel. The tier's error budget is the weight quantization only,
so prefill/decode logits must stay close to full precision, and the
greedy stream must be deterministic and prefix-agree with it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukern.models import Config, init_params
from tpukern.models import serving

CFG = Config(vocab=128, d_model=128, n_layers=2, n_heads=4, n_kv_heads=2,
             d_ff=256, max_seq=512)


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.key(0))
    qparams = serving.quantize_model_weights(params)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab, (2, 48)), jnp.int32)
    return params, qparams, prompt


def test_quantized_tree_shape(setup):
    params, qparams, _ = setup
    for k in ("wq", "wk", "wv", "wo", "w1", "w2"):
        leaf = qparams["layers"][0][k]
        assert leaf["q"].dtype == jnp.int8
        assert leaf["s"].shape == (params["layers"][0][k].shape[1],)
    assert qparams["head"]["q"].dtype == jnp.int8
    # embedding and norms untouched
    assert qparams["embed"].dtype == params["embed"].dtype
    assert qparams["layers"][0]["ln1"].dtype == params["layers"][0]["ln1"].dtype


def test_prefill_logits_close(setup):
    params, qparams, prompt = setup
    ref_logits = None
    for p in (params, qparams):
        cache = serving.init_cache(CFG, prompt.shape[0], pages_per_seq=2,
                                   page_size=128, dtype=jnp.float32)
        logits, _ = serving.prefill(p, CFG, prompt, cache)
        if ref_logits is None:
            ref_logits = np.asarray(logits, np.float64)
        else:
            got = np.asarray(logits, np.float64)
            denom = max(1.0, float(np.abs(ref_logits).max()))
            assert np.abs(ref_logits - got).max() / denom < 0.1


def test_decode_logits_close(setup):
    params, qparams, prompt = setup
    out = {}
    for name, p in (("full", params), ("w8a16", qparams)):
        cache = serving.init_cache(CFG, prompt.shape[0], pages_per_seq=2,
                                   page_size=128, dtype=jnp.float32)
        logits, cache = serving.prefill(p, CFG, prompt, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        logits2, _ = serving.decode_step(p, CFG, tok, cache)
        out[name] = np.asarray(logits2, np.float64)
    denom = max(1.0, float(np.abs(out["full"]).max()))
    assert np.abs(out["full"] - out["w8a16"]).max() / denom < 0.1


def test_generate_deterministic_and_tracks_full(setup):
    params, qparams, prompts = setup
    prompt = jnp.asarray(prompts[0][None])
    ref = serving.generate(params, CFG, prompt, n_steps=8,
                           pages_per_seq=2, page_size=128)
    out = serving.generate(qparams, CFG, prompt, n_steps=8,
                           pages_per_seq=2, page_size=128)
    out2 = serving.generate(qparams, CFG, prompt, n_steps=8,
                            pages_per_seq=2, page_size=128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    r, o = np.asarray(ref)[0], np.asarray(out)[0]
    agree = 0
    while agree < len(r) and r[agree] == o[agree]:
        agree += 1
    assert agree >= 4, (r, o)


def test_w8a16_composes_with_int8_kv(setup):
    """Quantized weights + quantized KV cache in the same stack."""
    _, qparams, prompts = setup
    prompt = jnp.asarray(prompts[0][None])
    out = serving.generate(qparams, CFG, prompt, n_steps=4,
                           pages_per_seq=2, page_size=128,
                           cache_dtype=jnp.int8)
    assert out.shape == (1, 4)
    assert (np.asarray(out) >= 0).all()
