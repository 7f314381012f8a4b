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


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("Sq,Skv", [(256, 192), (320, 448), (192, 512)])
def test_tail_shapes(causal, Sq, Skv, rng):
    """Non-block-multiple sequence lengths: the KV tail must be masked out
    of the online-softmax statistics (round-1 ADVICE: unmasked tails made
    the whole output NaN)."""
    B, H, D = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    if causal and Sq > Skv:
        pytest.skip("causal with Sq > Skv leaves rows with no visible KV")
    off = Skv - Sq if causal else 0
    out = attn.flash_attention(q, k, v, causal=causal, causal_offset=off,
                               block_q=128, block_k=128)
    ref = (attn.attention_ref_offset(q, k, v, causal_offset=off) if causal
           else attn.attention_ref(q, k, v))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_tail_shapes_stats(rng):
    """Tail masking with return_stats: lse must also be exact."""
    q = jnp.asarray(rng.standard_normal((1, 2, 192, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 320, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 320, 64)), jnp.float32)
    o, lse = attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                  return_stats=True)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(64.0)
    lse_ref = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_carry_chain_matches_single_call(dtype, rng):
    """carry/return_carry: chaining the kernel over two KV halves (the
    in-kernel ring-attention combine) == one call over the full KV."""
    B, H, S, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, H, 2 * S, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, 2 * S, D)), dtype)
    full, lse_full = attn.flash_attention(q, k, v, block_q=128,
                                          block_k=128, return_stats=True)
    carry = attn.flash_attention_carry_init(q)
    for half in (slice(0, S), slice(S, 2 * S)):
        carry = attn.flash_attention(q, k[:, :, half], v[:, :, half],
                                     block_q=128, block_k=128,
                                     carry=carry, return_carry=True)
    o, lse = attn.flash_attention_finalize(*carry, dtype=dtype,
                                           with_lse=True)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(o, np.float32),
                               np.asarray(full, np.float32),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_full),
                               rtol=1e-5, atol=1e-3)


def test_carry_neutral_init_is_identity(rng):
    """A single carried call from the neutral carry == the plain call."""
    q = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    plain = attn.flash_attention(q, k, v, block_q=128, block_k=128)
    carry = attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                 carry=attn.flash_attention_carry_init(q),
                                 return_carry=True)
    o = attn.flash_attention_finalize(*carry)
    np.testing.assert_allclose(np.asarray(o), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gqa", [False, True])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("alibi", [False, True])
def test_multi_kv_block_recurrence(gqa, causal, alibi, rng):
    """S >> block_k: many KV grid steps exercise the m/l rescale loop
    (round-1 CI ran most variants at a single KV step — VERDICT weak #4)."""
    B, H, S, D = 1, 4, 1024, 64
    q, k, v = _qkv(rng, B, H, S, D, jnp.float32, Hkv=2 if gqa else H)
    slopes = (jnp.asarray([2.0 ** (-i) for i in range(1, H + 1)],
                          jnp.float32) if alibi else None)
    out = attn.flash_attention(q, k, v, causal=causal, alibi_slopes=slopes,
                               block_q=256, block_k=128)
    ref = attn.attention_ref(q, k, v, causal=causal, alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_prefill_offset_multiblock(rng):
    """causal_offset with several KV blocks per Q block."""
    B, H, D = 1, 2, 64
    S_cache, S_new = 384, 256
    kc = jnp.asarray(rng.standard_normal((B, H, S_cache, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, H, S_cache, D)), jnp.float32)
    q, kn, vn = _qkv(rng, B, H, S_new, D, jnp.float32)
    out = attn.prefill_attention(q, kc, vc, kn, vn, block_q=128, block_k=128)
    k_all = jnp.concatenate([kc, kn], axis=2)
    v_all = jnp.concatenate([vc, vn], axis=2)
    ref = attn.attention_ref_offset(q, k_all, v_all, causal_offset=S_cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("offset_blocks", [0, 2])
@pytest.mark.parametrize("stats", [False, True])
def test_causal_diag_quadrant(offset_blocks, stats, rng):
    """The bq==bk aligned-causal diagonal block takes the 2-half quadrant
    decomposition (_fa_kernel.body_diag, skips 25% of diagonal-block MXU
    work); pin it across several diagonal blocks, with GQA, an aligned
    causal_offset, and the stats output, against the unfused reference."""
    B, H, D, bq = 1, 4, 64, 128
    off = offset_blocks * bq
    Sq, Skv = 512, 512 + off
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, 2, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 2, Skv, D)), jnp.float32)
    out = attn.flash_attention(q, k, v, causal=True, causal_offset=off,
                               block_q=bq, block_k=bq, return_stats=stats)
    if stats:
        out, lse = out
        assert lse.shape[:3] == (B, H, Sq)
    ref = attn.attention_ref_offset(q, jnp.repeat(k, 2, 1),
                                    jnp.repeat(v, 2, 1), causal_offset=off)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_multiblock_gqa(causal, rng):
    """Backward kernels at S >= 4 blocks with GQA grouping."""
    q, k, v = _qkv(rng, 1, 4, 1024, 64, jnp.float32, Hkv=2)

    def loss(q, k, v):
        return jnp.sum(
            attn.flash_attention_trainable(q, k, v, causal) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(attn.attention_ref(q, k, v, causal=causal) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_bwd_tail_shapes(rng):
    """Backward with non-block-multiple Sq and Skv (tail masking in the
    dq / dkv kernels)."""
    from tpukern.ops.attention_bwd import flash_attention_bwd
    B, H, Sq, Skv, D = 1, 2, 320, 192, 64
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    o, lse = attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                  return_stats=True)
    dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, do,
                                     block_q=128, block_k=128)

    def f(q, k, v):
        return attn.attention_ref(q, k, v)

    _, vjp = jax.vjp(f, q, k, v)
    dq_r, dk_r, dv_r = vjp(do)
    for a, b, nm in ((dq, dq_r, "dq"), (dk, dk_r, "dk"), (dv, dv_r, "dv")):
        assert np.isfinite(np.asarray(a)).all(), nm
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_fused_revisit_dq(causal, monkeypatch, rng):
    """Large-D fused tier (VERDICT r3 item 6): when the whole-sequence
    dQ block exceeds the VMEM budget, the fused kernel writes per-(ki,qi)
    dQ partial blocks summed outside (dq_resident=False; a revisited
    read-modify-write output block is NOT re-fetched by compiled Pallas —
    splash's partials idiom is the correct one). Force the tier by
    shrinking the budget so small shapes exercise it, including a
    non-block-multiple tail."""
    import tpukern.ops.attention_bwd as ab
    monkeypatch.setattr(ab, "FUSED_BWD_DQ_BUDGET", 1024)
    for Sq, Skv in ((512, 512), (320, 192)):
        B, H, D = 1, 2, 64
        q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
        do = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
        if causal and Sq != Skv:
            continue
        o, lse = attn.flash_attention(q, k, v, causal=causal, block_q=128,
                                      block_k=128, return_stats=True)
        dq, dk, dv = ab.flash_attention_bwd(
            q, k, v, o, lse, do, causal=causal, fused=True,
            block_q=128, block_k=128)

        def f(q, k, v):
            return attn.attention_ref(q, k, v, causal=causal)

        _, vjp = jax.vjp(f, q, k, v)
        dq_r, dk_r, dv_r = vjp(do)
        for a, b, nm in ((dq, dq_r, "dq"), (dk, dk_r, "dk"),
                         (dv, dv_r, "dv")):
            assert np.isfinite(np.asarray(a)).all(), nm
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3, err_msg=nm)


def test_headdim_limit_enforced(rng):
    """MAX_HEADDIM capability table raises a clear error (round-1 ADVICE:
    the table was declared but never consulted)."""
    q, k, v = _qkv(rng, 1, 1, 128, 256, jnp.bfloat16)
    with pytest.raises(ValueError, match="head dim"):
        registry.get("attention", "mha_splitq_bf16_hyper").fn(q, k, v)


@pytest.mark.parametrize("window", [64, 100, 256])
def test_sliding_window(window, rng):
    """Sliding-window causal attention == explicit banded-mask reference;
    out-of-band blocks are skipped (FLOPs ~ S*window)."""
    B, H, S, D = 1, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    out = attn.flash_attention(q, k, v, causal=True, window=window,
                               block_q=128, block_k=128)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
    rows = np.arange(S)[:, None]
    cols = np.arange(S)[None, :]
    band = (cols <= rows) & (cols >= rows - window + 1)
    s = jnp.where(jnp.asarray(band), s, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_carry_chain_default_blocks_tpv(dtype, rng):
    """Carry chaining through the auto-dispatched transposed-PV kernel
    (default blocks, D=64) == one full call."""
    B, H, S, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, H, 2 * S, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, 2 * S, D)), dtype)
    full = attn.flash_attention(q, k, v)
    carry = attn.flash_attention_carry_init(q)
    for half in (slice(0, S), slice(S, 2 * S)):
        carry = attn.flash_attention(q, k[:, :, half], v[:, :, half],
                                     carry=carry, return_carry=True)
    o = attn.flash_attention_finalize(*carry, dtype=dtype)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(o, np.float32),
                               np.asarray(full, np.float32),
                               rtol=tol, atol=tol)


def test_window_offset_gqa_tails(rng):
    """The full feature stack at once — GQA grouping, causal_offset
    (prefill), sliding window, and non-block-multiple Sq/Skv — matches a
    dense banded reference (mirrors the hardware shakedown case)."""
    import math
    B, Hq, Hkv, Sq, Skv, D, off, W = 1, 4, 2, 300, 500, 64, 200, 150
    q = jnp.asarray(rng.standard_normal((B, Hq, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, Skv, D)), jnp.float32)
    out = attn.flash_attention(q, k, v, causal=True, causal_offset=off,
                               window=W, block_q=128, block_k=128)
    g = Hq // Hkv
    kf = jnp.repeat(k, g, axis=1)
    vf = jnp.repeat(v, g, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kf) / math.sqrt(D)
    rows = np.arange(Sq)[:, None]
    cols = np.arange(Skv)[None, :]
    band = (cols <= rows + off) & (cols >= rows + off - W + 1)
    s = jnp.where(jnp.asarray(band), s, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), vf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_segment_ids(causal, dtype, rng):
    """Packed-sequence masking == unfused reference, multi-KV-block grid,
    segment boundaries deliberately unaligned with the 128-blocks."""
    B, H, S, D = 2, 2, 512, 64
    q, k, v = _qkv(rng, B, H, S, D, dtype)
    # 3 packed docs with odd boundaries + a trailing pad segment
    bounds = [0, 200, 333, 480, S]
    seg = np.zeros((B, S), np.int32)
    for i in range(len(bounds) - 1):
        seg[:, bounds[i]:bounds[i + 1]] = i
    seg[1] = np.roll(seg[1], 57)  # different packing per batch row
    seg_j = jnp.asarray(seg)
    out = attn.flash_attention(q, k, v, causal=causal,
                               segment_ids=(seg_j, seg_j),
                               block_q=128, block_k=128)
    ref = attn.attention_ref(q, k, v, causal=causal,
                             segment_ids=(seg_j, seg_j))
    t = _TOL[jnp.dtype(out.dtype).name]
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64), **t)


def test_segment_ids_dead_rows(rng):
    """Rows whose segment matches no kv output exactly 0 (not garbage)."""
    B, H, S, D = 1, 1, 256, 64
    q, k, v = _qkv(rng, B, H, S, D, jnp.float32)
    q_seg = jnp.full((B, S), 7, jnp.int32).at[:, :128].set(0)
    kv_seg = jnp.zeros((B, S), jnp.int32)  # only segment 0 exists in kv
    out = attn.flash_attention(q, k, v, segment_ids=(q_seg, kv_seg),
                               block_q=128, block_k=128)
    assert np.all(np.asarray(out[:, :, 128:]) == 0.0)
    ref = attn.attention_ref(q, k, v,
                             segment_ids=(q_seg, kv_seg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_segment_ids_tails(rng):
    """Segments + non-block-multiple Sq/Skv (XLA-boundary padding uses
    non-matching sentinels)."""
    B, H, D = 1, 2, 64
    Sq, Skv = 200, 328
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    q_seg = jnp.asarray((np.arange(Sq)[None] >= 100).astype(np.int32))
    kv_seg = jnp.asarray((np.arange(Skv)[None] >= 160).astype(np.int32))
    out = attn.flash_attention(q, k, v, segment_ids=(q_seg, kv_seg),
                               block_q=128, block_k=128)
    ref = attn.attention_ref(q, k, v, segment_ids=(q_seg, kv_seg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_softcap(dtype, rng):
    """Gemma-style tanh logit capping == reference, causal and not, with
    a cap small enough to actually bend the logits."""
    B, H, S, D = 1, 2, 384, 64
    q, k, v = _qkv(rng, B, H, S, D, dtype)
    for causal in (False, True):
        out = attn.flash_attention(q, k, v, causal=causal, softcap=5.0,
                                   block_q=128, block_k=128)
        ref = attn.attention_ref(q, k, v, causal=causal, softcap=5.0)
        t = _TOL[jnp.dtype(out.dtype).name]
        np.testing.assert_allclose(np.asarray(out, np.float64),
                                   np.asarray(ref, np.float64), **t)


@pytest.mark.parametrize("causal", [False, True])
def test_duo_multiblock(causal, rng):
    """Split-softmax (duo) tier: two independent per-block chains merged
    in-kernel must equal the single-chain kernel across several KV grid
    steps, with GQA grouping."""
    B, H, S, D = 1, 4, 1024, 128
    q, k, v = _qkv(rng, B, H, S, D, jnp.float32, Hkv=2)
    out = attn.flash_attention(q, k, v, causal=causal, duo=True,
                               block_q=256, block_k=256)
    ref = attn.attention_ref(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_duo_tails_offset(rng):
    """duo with non-block-multiple Skv (a whole chain half can be fully
    masked by kv_len — the merge's underflow-to-zero self-healing) and a
    causal offset."""
    B, H, D = 1, 2, 64
    # Skv mod 256 = 104 < 128: the LAST block's second chain half is
    # entirely beyond kv_len — exercises the fully-masked-half merge
    Sq, Skv, off = 192, 360, 168
    q = jnp.asarray(rng.standard_normal((B, H, Sq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Skv, D)), jnp.float32)
    out = attn.flash_attention(q, k, v, causal=True, causal_offset=off,
                               duo=True, block_q=128, block_k=256)
    ref = attn.attention_ref_offset(q, k, v, causal_offset=off)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_softcap_with_segments(rng):
    """softcap composes with segment masking (cap before mask)."""
    B, H, S, D = 1, 1, 256, 64
    q, k, v = _qkv(rng, B, H, S, D, jnp.float32)
    seg = jnp.asarray((np.arange(S)[None] >= 130).astype(np.int32))
    out = attn.flash_attention(q, k, v, causal=True, softcap=8.0,
                               segment_ids=(seg, seg),
                               block_q=128, block_k=128)
    ref = attn.attention_ref(q, k, v, causal=True, softcap=8.0,
                             segment_ids=(seg, seg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def _grad_pair(loss, loss_ref, args, rtol=1e-3, atol=1e-3):
    g = jax.grad(loss, argnums=tuple(range(len(args))))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    for i, (a, b) in enumerate(zip(g, g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol,
                                   err_msg=f"grad arg {i}")


@pytest.mark.parametrize("window", [64, 100])
def test_trainable_grads_window(window, rng):
    """Sliding-window backward: dq/dk/dv == banded-mask autodiff, at a
    block-straddling window and S >> block (multi-KV-step recurrence)."""
    q, k, v = _qkv(rng, 1, 2, 1024, 64, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(attn.flash_attention_trainable(
            q, k, v, True, None, window) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attn.attention_ref(q, k, v, causal=True,
                                          window=window) ** 2)

    _grad_pair(loss, loss_ref, (q, k, v))


def test_trainable_grads_softcap(rng):
    """Gemma-style softcap backward: the tanh derivative chains into ds."""
    q, k, v = _qkv(rng, 1, 2, 256, 64, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(attn.flash_attention_trainable(
            q, k, v, True, None, None, 30.0) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attn.attention_ref(q, k, v, causal=True,
                                          softcap=30.0) ** 2)

    _grad_pair(loss, loss_ref, (q, k, v))


def test_trainable_grads_segments(rng):
    """Packed-sequence backward: segment masking in dq/dk/dv, including a
    padding segment that matches nothing (zero output AND zero grads)."""
    B, H, S, D = 1, 2, 256, 64
    q, k, v = _qkv(rng, B, H, S, D, jnp.float32)
    seg = np.zeros((B, S), np.int32)
    seg[:, 100:200] = 1
    seg[:, 200:] = 2
    seg[:, 240:] = -7  # padding: matches nothing (kv pad sentinel is -2)
    segs = (jnp.asarray(seg), jnp.asarray(seg))

    def loss(q, k, v):
        return jnp.sum(attn.flash_attention_trainable(
            q, k, v, True, None, None, None, segs) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attn.attention_ref(q, k, v, causal=True,
                                          segment_ids=segs) ** 2)

    _grad_pair(loss, loss_ref, (q, k, v))


def test_trainable_grads_window_softcap_gqa_tails(rng):
    """The full featured-backward stack at once: sliding window + softcap
    + GQA + non-block-multiple tails."""
    B, Hq, Hkv, S, D = 1, 4, 2, 640, 64
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)) * 0.5, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(attn.flash_attention_trainable(
            q, k, v, True, None, 96, 25.0, None) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attn.attention_ref(
            q, k, v, causal=True, window=96, softcap=25.0) ** 2)

    _grad_pair(loss, loss_ref, (q, k, v))


def test_attention_sinks(rng):
    """StreamingLLM attention sinks: with a sliding window, the first
    `sinks` key positions stay visible to every query (and their blocks
    are not skipped by the window band optimization)."""
    B, H, S, D, W, SINKS = 1, 2, 512, 64, 64, 4
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    out = attn.flash_attention(q, k, v, causal=True, window=W,
                               sinks=SINKS, block_q=128, block_k=128)
    ref = attn.attention_ref(q, k, v, causal=True, window=W, sinks=SINKS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # the sinks must actually matter (rows far past the window)
    base = attn.flash_attention(q, k, v, causal=True, window=W,
                                block_q=128, block_k=128)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-3


def test_causal_small_s_large_d_default(rng):
    """Round-5 per-(D,S) causal dispatch class: at D >= 512 and
    Sq <= 1024 the default blocks drop to 512x512 (6-adjacent-sample
    A/B, tools/fa_cfg_ab.py: 512x512 min 71.2 > 1024-default max 65.8
    TFLOPS on every sample). The defaulted path must stay numerically
    exact vs the reference, and must differ from the forced-1024 path
    only in schedule (identical outputs)."""
    B, H, S, D = 1, 1, 1024, 512
    q = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.float32)
    out = attn.flash_attention(q, k, v, causal=True)  # defaulted blocks
    ref = attn.attention_ref(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    forced = attn.flash_attention(q, k, v, causal=True,
                                  block_q=1024, block_k=1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(forced),
                               rtol=2e-4, atol=2e-4)


def test_causal_single_block_diag_mxu_class(rng):
    """Round-5 gate refinement: at a SINGLE KV block the quadrant body
    is auto-enabled only for the MXU-bound head dims (D >= 256, where
    it wins every adjacent A/B sample: 75.2-76.8 vs 61.3-65.5 TFLOPS at
    D=256 S=1024) and stays off for the VPU-bound ones. Pin both
    defaulted paths numerically against the reference."""
    B, H, S = 1, 1, 1024
    for D in (128, 256):
        q = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3,
                        jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3,
                        jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3,
                        jnp.float32)
        out = attn.flash_attention(q, k, v, causal=True)
        ref = attn.attention_ref(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
