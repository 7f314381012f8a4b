"""FlashAttention-2 family vs unfused reference (the reference's --check
mode, flash_attn_mma.py:401-425)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401
from tpukern.core import registry
from tpukern.ops import attention as attn

_TOL = {"float32": dict(rtol=1e-4, atol=1e-4),
        "bfloat16": dict(rtol=3e-2, atol=3e-2),
        "float16": dict(rtol=5e-3, atol=5e-3)}


def _qkv(rng, B, H, S, D, dt, Hkv=None):
    Hkv = Hkv or H
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), dt)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), dt)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), dt)
    return q, k, v


@pytest.mark.parametrize("name", sorted(registry.variants("attention")))
@pytest.mark.parametrize("causal", [False, True])
def test_attention_variants(name, causal, rng):
    v = registry.get("attention", name)
    if "tpu-only" in v.tags and jax.default_backend() != "tpu":
        pytest.skip("TPU-only baseline kernel")
    dt = (jnp.float16 if "f16" in name and "bf16" not in name else
          jnp.float32 if "f32" in name else jnp.bfloat16)
    q, k, vv = _qkv(rng, 1, 2, 512, 64, dt)
    out = v.fn(q, k, vv, causal=causal)
    ref = attn.attention_ref(q, k, vv, causal=causal)
    t = _TOL[jnp.dtype(out.dtype).name]
    if "accbf16" in name:   # low-precision accumulator tier (acc-f16 twin)
        t = dict(rtol=1e-1, atol=1e-1)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               err_msg=name, **t)


def test_gqa(rng):
    q, k, v = _qkv(rng, 2, 8, 256, 64, jnp.bfloat16, Hkv=2)
    out = attn.flash_attention(q, k, v, causal=True)
    ref = attn.attention_ref(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=3e-2, atol=3e-2)


def test_large_headdim(rng):
    q, k, v = _qkv(rng, 1, 1, 256, 512, jnp.bfloat16)
    out = attn.flash_attention(q, k, v)
    ref = attn.attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=3e-2, atol=3e-2)


def test_stats_and_combine(rng):
    """Splitting KV across two shards + lse-combine == full attention
    (the context-parallel correction formula)."""
    q, k, v = _qkv(rng, 1, 2, 256, 64, jnp.float32)
    half = 128
    o1, lse1 = attn.flash_attention(q, k[:, :, :half], v[:, :, :half],
                                    return_stats=True)
    o2, lse2 = attn.flash_attention(q, k[:, :, half:], v[:, :, half:],
                                    return_stats=True)
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)[..., None]
    w2 = jnp.exp(lse2 - m)[..., None]
    combined = (o1 * w1 + o2 * w2) / (w1 + w2)
    ref = attn.attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(combined), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_trainable_grads(rng):
    q, k, v = _qkv(rng, 1, 2, 128, 64, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(attn.flash_attention_trainable(q, k, v, True) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(attn.attention_ref(q, k, v, causal=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_alibi(rng):
    q, k, v = _qkv(rng, 1, 4, 256, 64, jnp.float32)
    slopes = jnp.asarray([2.0 ** (-i) for i in range(1, 5)], jnp.float32)
    out = attn.flash_attention(q, k, v, causal=True, alibi_slopes=slopes)
    ref = attn.attention_ref(q, k, v, causal=True, alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_prefill_with_cache(rng):
    """Chunked prefill: queries attend to a KV-cache prefix + themselves."""
    B, H, D = 1, 2, 64
    S_cache, S_new = 256, 128
    kc = jnp.asarray(rng.standard_normal((B, H, S_cache, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, H, S_cache, D)), jnp.float32)
    q, kn, vn = _qkv(rng, B, H, S_new, D, jnp.float32)
    out = attn.prefill_attention(q, kc, vc, kn, vn)
    k_all = jnp.concatenate([kc, kn], axis=2)
    v_all = jnp.concatenate([vc, vn], axis=2)
    ref = attn.attention_ref_offset(q, k_all, v_all, causal_offset=S_cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_trainable_grads_gqa(rng):
    """Pallas backward kernels with GQA head grouping."""
    q, k, v = _qkv(rng, 1, 4, 128, 64, jnp.float32, Hkv=2)

    def loss(q, k, v):
        return jnp.sum(attn.flash_attention_trainable(q, k, v, True) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(attn.attention_ref(q, k, v, causal=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
