"""Paged-KV decode attention vs XLA gather reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401
from tpukern.ops import paged_attention as pa


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_paged_decode(dtype, rng):
    B, Hq, Hkv, D = 2, 4, 2, 64
    page_size, pages_per_seq, P = 16, 8, 32
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), dtype)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)), dtype)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)), dtype)
    lengths = jnp.asarray([100, 37], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32)
    out = pa.paged_attention(q, k_pages, v_pages, lengths, table,
                             pages_per_block=4)
    ref = pa.paged_attention_ref(q, k_pages, v_pages, lengths, table)
    tol = 1e-4 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=tol, atol=tol)


def test_paged_decode_gqa_group1(rng):
    # Hq == Hkv (group of 1)
    B, H, D = 1, 2, 64
    page_size, pages_per_seq, P = 16, 4, 8
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((H, P, page_size, D)), jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((H, P, page_size, D)), jnp.float32)
    lengths = jnp.asarray([50], jnp.int32)
    table = jnp.asarray(np.arange(pages_per_seq)[None], jnp.int32)
    out = pa.paged_attention(q, k_pages, v_pages, lengths, table,
                             pages_per_block=2)
    ref = pa.paged_attention_ref(q, k_pages, v_pages, lengths, table)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_paged_decode_fp8_kv(rng):
    """fp8(e4m3)-quantized KV pages: same 1-byte DMA traffic as int8 with
    tapered precision; decode output within quantization tolerance."""
    from tpukern.ops.paged_attention import (paged_attention_quantized,
                                             paged_attention_ref,
                                             quantize_pages)
    B, Hq, Hkv, D = 2, 4, 2, 64
    page, P, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    lengths = jnp.asarray([300, 450], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq], jnp.int32
    ).reshape(B, pages_per_seq)

    kq, ks = quantize_pages(k_pages, "fp8")
    vq, vs = quantize_pages(v_pages, "fp8")
    assert kq.dtype == jnp.float8_e4m3fn and ks.shape == (Hkv, P, page)
    out = paged_attention_quantized(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table,
        pages_per_block=2)
    ref = paged_attention_ref(q, k_pages, v_pages, lengths, table)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=7e-2, atol=7e-2)


def test_paged_decode_int8_kv(rng):
    """int8-quantized KV pages: decode output within quantization+bf16
    tolerance of the float reference (the int8-KV-cache serving path)."""
    from tpukern.ops.paged_attention import (paged_attention_quantized,
                                             paged_attention_ref,
                                             quantize_pages)
    B, Hq, Hkv, D = 2, 4, 2, 64
    page, P, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    lengths = jnp.asarray([300, 450], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq], jnp.int32
    ).reshape(B, pages_per_seq)

    kq, ks = quantize_pages(k_pages)
    vq, vs = quantize_pages(v_pages)
    assert kq.dtype == jnp.int8 and ks.shape == (Hkv, P, page)
    out = paged_attention_quantized(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table,
        pages_per_block=2)
    ref = paged_attention_ref(q, k_pages, v_pages, lengths, table)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=5e-2, atol=5e-2)


def test_paged_decode_sliding_window(rng):
    """Windowed decode == reference restricted to the last W tokens."""
    import math
    B, Hq, Hkv, D = 2, 4, 2, 64
    page_size, pages_per_seq, P = 16, 8, 32
    W = 40
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    lengths = jnp.asarray([100, 37], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32)
    out = pa.paged_attention(q, k_pages, v_pages, lengths, table,
                             pages_per_block=2, window=W)
    # reference over the full history with positions < length - W masked
    Hk, _, _, _ = k_pages.shape
    S = pages_per_seq * page_size
    k_seq = k_pages[:, table].transpose(1, 0, 2, 3, 4).reshape(B, Hkv, S, D)
    v_seq = v_pages[:, table].transpose(1, 0, 2, 3, 4).reshape(B, Hkv, S, D)
    qf = q.reshape(B, Hkv, Hq // Hkv, D)
    s = jnp.einsum("bhgd,bhkd->bhgk", qf, k_seq) / math.sqrt(D)
    pos = jnp.arange(S)[None, None, None, :]
    lb = lengths[:, None, None, None]
    s = jnp.where((pos < lb) & (pos >= lb - W), s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhgk,bhkd->bhgd", p, v_seq).reshape(B, Hq, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_paged_prefix_prefill(rng):
    """Multi-token causal attention vs pages (prefix_prefill analog):
    token t of a T-token chunk sees positions [0, length - T + t]."""
    B, Hq, Hkv, D, T = 2, 4, 2, 64, 8
    page_size, pages_per_seq, P = 16, 8, 32
    q = jnp.asarray(rng.standard_normal((B, Hq, T, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    lengths = jnp.asarray([100, 37], jnp.int32)  # include the T new toks
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32)
    out = pa.paged_prefill_attention(q, k_pages, v_pages, lengths, table,
                                     pages_per_block=2)
    ref = pa.paged_prefill_ref(q, k_pages, v_pages, lengths, table)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_paged_prefix_prefill_matches_decode_at_t1(rng):
    """T=1 degenerates to the single-token decode kernel's semantics."""
    B, Hq, Hkv, D = 2, 4, 2, 64
    page_size, pages_per_seq, P = 16, 4, 8
    q = jnp.asarray(rng.standard_normal((B, Hq, 1, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    lengths = jnp.asarray([30, 51], jnp.int32)
    table = jnp.asarray(np.arange(B * pages_per_seq).reshape(B, -1),
                        jnp.int32)
    out = pa.paged_prefill_attention(q, k_pages, v_pages, lengths, table,
                                     pages_per_block=2)[:, :, 0]
    ref = pa.paged_attention(q[:, :, 0], k_pages, v_pages, lengths, table,
                             pages_per_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_paged_decode_int8_kv_mxu(rng):
    """s8s8s32 score path: q row-quantized at the boundary, the QK dot
    runs entirely in int8 on the MXU; output within the int8-KV
    tolerance plus q's ~0.4% row quantization error."""
    from tpukern.ops.paged_attention import (paged_attention_quantized,
                                             paged_attention_ref,
                                             quantize_pages)
    B, Hq, Hkv, D = 2, 4, 2, 64
    page, P, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    lengths = jnp.asarray([300, 450], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq], jnp.int32
    ).reshape(B, pages_per_seq)

    kq, ks = quantize_pages(k_pages)
    vq, vs = quantize_pages(v_pages)
    out = paged_attention_quantized(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table,
        pages_per_block=2, q_int8=True)
    ref = paged_attention_ref(q, k_pages, v_pages, lengths, table)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(ref, np.float64),
                               rtol=6e-2, atol=6e-2)
    # and it must stay close to the cast-dequant int8 path (same pages)
    base = paged_attention_quantized(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table,
        pages_per_block=2)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               np.asarray(base, np.float64),
                               rtol=3e-2, atol=3e-2)


def test_paged_decode_int8_pv(rng):
    """All-int8 MXU decode: pv_int8 quantizes the softmax row on-chip
    (after folding V's per-token scale) and contracts it s8s8s32 against
    the raw int8 V pages — no (bk, D) V cast. Output within the int8-KV
    tolerance plus ~7-bit p resolution."""
    from tpukern.ops.paged_attention import (paged_attention_quantized,
                                             paged_attention_ref,
                                             quantize_pages)
    B, Hq, Hkv, D = 2, 4, 2, 64
    page, P, pages_per_seq = 128, 16, 4
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    lengths = jnp.asarray([300, 450], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq], jnp.int32
    ).reshape(B, pages_per_seq)

    kq, ks = quantize_pages(k_pages)
    vq, vs = quantize_pages(v_pages)
    ref = paged_attention_ref(q, k_pages, v_pages, lengths, table)
    base = paged_attention_quantized(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table,
        pages_per_block=2)
    for q_int8 in (False, True):
        out = paged_attention_quantized(
            q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table,
            pages_per_block=2, q_int8=q_int8, pv_int8=True)
        np.testing.assert_allclose(np.asarray(out, np.float64),
                                   np.asarray(ref, np.float64),
                                   rtol=7e-2, atol=7e-2)
        # and it must stay close to the cast-dequant int8 path
        np.testing.assert_allclose(np.asarray(out, np.float64),
                                   np.asarray(base, np.float64),
                                   rtol=4e-2, atol=4e-2)


def test_paged_decode_alibi(rng):
    """ALiBi decode (prefix_prefill_alibi analog): linear position bias
    slope_h * (k_pos - q_pos) per q head, across a GQA group's rows."""
    B, Hq, Hkv, D = 2, 8, 2, 64
    page_size, pages_per_seq, P = 16, 8, 32
    slopes = pa.default_alibi_slopes(Hq)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    lengths = jnp.asarray([100, 37], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32)
    out = pa.paged_attention(q, k_pages, v_pages, lengths, table,
                             pages_per_block=4, alibi_slopes=slopes)
    ref = pa.paged_attention_ref(q, k_pages, v_pages, lengths, table,
                                 alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # bias must actually matter: the unbiased output differs
    base = pa.paged_attention(q, k_pages, v_pages, lengths, table,
                              pages_per_block=4)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-3


def test_paged_prefix_prefill_alibi(rng):
    """ALiBi in the multi-token prefix-prefill kernel: per-(head, token)
    bias relative to each query row's own position."""
    B, Hq, Hkv, D, T = 2, 4, 2, 64, 8
    page_size, pages_per_seq, P = 16, 8, 32
    slopes = pa.default_alibi_slopes(Hq)
    q = jnp.asarray(rng.standard_normal((B, Hq, T, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    lengths = jnp.asarray([100, 37], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32)
    out = pa.paged_prefill_attention(q, k_pages, v_pages, lengths, table,
                                     pages_per_block=2,
                                     alibi_slopes=slopes)
    ref = pa.paged_prefill_ref(q, k_pages, v_pages, lengths, table,
                               alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # T=1 degenerates to the decode kernel's alibi semantics
    out1 = pa.paged_prefill_attention(
        q[:, :, :1], k_pages, v_pages, lengths, table,
        pages_per_block=2, alibi_slopes=slopes)[:, :, 0]
    dec = pa.paged_attention(q[:, :, 0], k_pages, v_pages, lengths, table,
                             pages_per_block=2, alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(dec),
                               rtol=1e-4, atol=1e-4)


def test_paged_decode_alibi_int8_kv(rng):
    """ALiBi composes with the quantized-page decode path."""
    B, Hq, Hkv, D = 2, 4, 2, 64
    page, P, pages_per_seq = 128, 16, 4
    slopes = pa.default_alibi_slopes(Hq)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page, D)),
                          jnp.float32)
    lengths = jnp.asarray([300, 450], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq], jnp.int32
    ).reshape(B, pages_per_seq)
    kq, ks = pa.quantize_pages(k_pages)
    vq, vs = pa.quantize_pages(v_pages)
    ref = pa.paged_attention_ref(q, k_pages, v_pages, lengths, table,
                                 alibi_slopes=slopes)
    for q_int8, tol in ((False, 5e-2), (True, 6e-2)):
        out = pa.paged_attention_quantized(
            q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table,
            pages_per_block=2, q_int8=q_int8, alibi_slopes=slopes)
        np.testing.assert_allclose(np.asarray(out, np.float64),
                                   np.asarray(ref, np.float64),
                                   rtol=tol, atol=tol)


def _fill_ring(k_full, ring_tokens, page_size, L):
    """Lay the last tokens of an absolute (Hkv, L, D) stream into a ring
    pool (Hkv, ring_pages, page, D): slot s holds the newest token with
    position == s (mod ring_tokens)."""
    Hkv, _, D = k_full.shape
    pool = np.zeros((Hkv, ring_tokens // page_size, page_size, D),
                    k_full.dtype)
    for p in range(max(0, L - ring_tokens), L):
        s = p % ring_tokens
        pool[:, s // page_size, s % page_size] = k_full[:, p]
    return pool


def test_paged_decode_ring(rng):
    """Rolling-buffer decode: a ring pool holding only the last
    ring_tokens positions gives the same windowed output as a full-size
    pool, after the sequence has wrapped several times."""
    B, Hq, Hkv, D = 2, 4, 2, 64
    page_size, W = 16, 40
    ring_pages = 4                       # ring = 64 tokens >= W
    L = np.array([150, 73])              # both well past one lap
    full_pages_per_seq = 16              # 256 tokens, no wrap
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_full = rng.standard_normal((B, Hkv, 256, D)).astype(np.float32)
    v_full = rng.standard_normal((B, Hkv, 256, D)).astype(np.float32)

    ring_tokens = ring_pages * page_size
    # pools are (Hkv, P, page, D) with P = B * ring_pages, seq b owning
    # pages [b*rp, (b+1)*rp): stack over b on axis 1 then flatten
    kr = np.stack([_fill_ring(k_full[b], ring_tokens, page_size, L[b])
                   for b in range(B)], axis=1).reshape(
        Hkv, B * ring_pages, page_size, D)
    vr = np.stack([_fill_ring(v_full[b], ring_tokens, page_size, L[b])
                   for b in range(B)], axis=1).reshape(
        Hkv, B * ring_pages, page_size, D)
    rtable = jnp.arange(B * ring_pages, dtype=jnp.int32).reshape(B, ring_pages)

    kf = np.zeros((Hkv, B * full_pages_per_seq, page_size, D), np.float32)
    vf = np.zeros_like(kf)
    for b in range(B):
        kf[:, b * full_pages_per_seq:(b + 1) * full_pages_per_seq] = (
            k_full[b].reshape(Hkv, full_pages_per_seq, page_size, D))
        vf[:, b * full_pages_per_seq:(b + 1) * full_pages_per_seq] = (
            v_full[b].reshape(Hkv, full_pages_per_seq, page_size, D))
    ftable = jnp.arange(B * full_pages_per_seq, dtype=jnp.int32).reshape(
        B, full_pages_per_seq)

    lengths = jnp.asarray(L, jnp.int32)
    out_ring = pa.paged_attention(q, jnp.asarray(kr), jnp.asarray(vr),
                                  lengths, rtable, pages_per_block=2,
                                  window=W, ring=True)
    out_full = pa.paged_attention(q, jnp.asarray(kf), jnp.asarray(vf),
                                  lengths, ftable, pages_per_block=2,
                                  window=W)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               rtol=1e-4, atol=1e-4)

    # first-lap case (L < ring): unwritten slots must mask away
    lengths2 = jnp.asarray([30, 12], jnp.int32)
    kr2 = np.stack([_fill_ring(k_full[b], ring_tokens, page_size,
                               int(lengths2[b])) for b in range(B)], 1
                    ).reshape(Hkv, B * ring_pages, page_size, D)
    vr2 = np.stack([_fill_ring(v_full[b], ring_tokens, page_size,
                               int(lengths2[b])) for b in range(B)], 1
                    ).reshape(Hkv, B * ring_pages, page_size, D)
    out_ring2 = pa.paged_attention(q, jnp.asarray(kr2), jnp.asarray(vr2),
                                   lengths2, rtable, pages_per_block=2,
                                   window=W, ring=True)
    out_full2 = pa.paged_attention(q, jnp.asarray(kf), jnp.asarray(vf),
                                   lengths2, ftable, pages_per_block=2,
                                   window=W)
    np.testing.assert_allclose(np.asarray(out_ring2),
                               np.asarray(out_full2),
                               rtol=1e-4, atol=1e-4)


def test_paged_prefix_prefill_ring(rng):
    """Rolling-buffer prefix-prefill (the speculative-verify step over a
    ring cache) matches the full-pool windowed kernel."""
    B, Hq, Hkv, D, T = 2, 4, 2, 64, 4
    page_size, W = 16, 40
    ring_pages, full_pps = 4, 16
    L = np.array([150, 73])              # includes the T chunk tokens
    q = jnp.asarray(rng.standard_normal((B, Hq, T, D)), jnp.float32)
    k_full = rng.standard_normal((B, Hkv, 256, D)).astype(np.float32)
    v_full = rng.standard_normal((B, Hkv, 256, D)).astype(np.float32)

    ring_tokens = ring_pages * page_size
    kr = np.stack([_fill_ring(k_full[b], ring_tokens, page_size, L[b])
                   for b in range(B)], 1).reshape(
        Hkv, B * ring_pages, page_size, D)
    vr = np.stack([_fill_ring(v_full[b], ring_tokens, page_size, L[b])
                   for b in range(B)], 1).reshape(
        Hkv, B * ring_pages, page_size, D)
    rtable = jnp.arange(B * ring_pages, dtype=jnp.int32).reshape(B, ring_pages)
    kf = np.zeros((Hkv, B * full_pps, page_size, D), np.float32)
    vf = np.zeros_like(kf)
    for b in range(B):
        kf[:, b * full_pps:(b + 1) * full_pps] = k_full[b].reshape(
            Hkv, full_pps, page_size, D)
        vf[:, b * full_pps:(b + 1) * full_pps] = v_full[b].reshape(
            Hkv, full_pps, page_size, D)
    ftable = jnp.arange(B * full_pps, dtype=jnp.int32).reshape(B, full_pps)

    lengths = jnp.asarray(L, jnp.int32)
    out_ring = pa.paged_prefill_attention(
        q, jnp.asarray(kr), jnp.asarray(vr), lengths, rtable,
        pages_per_block=2, window=W, ring=True)
    out_full = pa.paged_prefill_attention(
        q, jnp.asarray(kf), jnp.asarray(vf), lengths, ftable,
        pages_per_block=2, window=W)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               rtol=1e-4, atol=1e-4)


def test_paged_prefix_prefill_int8_kv(rng):
    """int8-quantized pages in the multi-token prefix-prefill kernel,
    cast-dequant and s8s8s32-MXU score paths — both within quantization
    tolerance of the float reference."""
    B, Hq, Hkv, D, T = 2, 4, 2, 64, 8
    page_size, pages_per_seq, P = 128, 4, 16
    q = jnp.asarray(rng.standard_normal((B, Hq, T, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    lengths = jnp.asarray([300, 45], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32)
    kq, ks = pa.quantize_pages(k_pages)
    vq, vs = pa.quantize_pages(v_pages)
    ref = pa.paged_prefill_ref(q, k_pages, v_pages, lengths, table)
    for q_int8, pv_int8, tol in ((False, False, 5e-2),
                                 (True, False, 6e-2),
                                 (False, True, 7e-2),
                                 (True, True, 7e-2)):
        out = pa.paged_prefill_attention_quantized(
            q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table,
            pages_per_block=2, q_int8=q_int8, pv_int8=pv_int8)
        np.testing.assert_allclose(np.asarray(out, np.float64),
                                   np.asarray(ref, np.float64),
                                   rtol=tol, atol=tol)


def test_paged_decode_sinks(rng):
    """Windowed decode with attention sinks: the first `sinks` positions
    stay visible in addition to the window (StreamingLLM)."""
    import math
    B, Hq, Hkv, D = 2, 4, 2, 64
    page_size, pages_per_seq, P = 16, 8, 32
    W, SINKS = 40, 4
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    v_pages = jnp.asarray(rng.standard_normal((Hkv, P, page_size, D)),
                          jnp.float32)
    lengths = jnp.asarray([100, 37], jnp.int32)
    table = jnp.asarray(
        rng.permutation(P)[: B * pages_per_seq].reshape(B, pages_per_seq),
        jnp.int32)
    out = pa.paged_attention(q, k_pages, v_pages, lengths, table,
                             pages_per_block=2, window=W, sinks=SINKS)
    S = pages_per_seq * page_size
    k_seq = k_pages[:, table].transpose(1, 0, 2, 3, 4).reshape(B, Hkv, S, D)
    v_seq = v_pages[:, table].transpose(1, 0, 2, 3, 4).reshape(B, Hkv, S, D)
    qf = q.reshape(B, Hkv, Hq // Hkv, D)
    s = jnp.einsum("bhgd,bhkd->bhgk", qf, k_seq) / math.sqrt(D)
    pos = jnp.arange(S)[None, None, None, :]
    lb = lengths[:, None, None, None]
    keep = (pos < lb) & ((pos >= lb - W) | (pos < SINKS))
    s = jnp.where(keep, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhgk,bhkd->bhgd", p, v_seq).reshape(B, Hq, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # sinks must matter for the long sequence
    base = pa.paged_attention(q, k_pages, v_pages, lengths, table,
                              pages_per_block=2, window=W)
    assert np.abs(np.asarray(out[0]) - np.asarray(base[0])).max() > 1e-3


def _fill_ring_sinks(k_full, ring_tokens, page_size, L, sinks):
    """Ring layout with pinned sink slots: position p < sinks lives at
    slot p forever; later positions rotate through the remaining
    R = ring_tokens - sinks slots."""
    Hkv, _, D = k_full.shape
    R = ring_tokens - sinks
    pool = np.zeros((Hkv, ring_tokens // page_size, page_size, D),
                    k_full.dtype)
    for p in range(min(sinks, L)):
        pool[:, p // page_size, p % page_size] = k_full[:, p]
    for p in range(max(sinks, L - R), L):
        s = sinks + (p - sinks) % R
        pool[:, s // page_size, s % page_size] = k_full[:, p]
    return pool


def test_paged_decode_ring_sinks(rng):
    """Ring cache with pinned attention sinks: a 64-slot ring (4 sink
    slots + 60 rotating) matches the full-pool windowed+sinks decode
    after wrapping."""
    import math
    B, Hq, Hkv, D = 2, 4, 2, 64
    page_size, W, SINKS = 16, 40, 4
    ring_pages, full_pps = 4, 16
    L = np.array([150, 73])
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_full = rng.standard_normal((B, Hkv, 256, D)).astype(np.float32)
    v_full = rng.standard_normal((B, Hkv, 256, D)).astype(np.float32)
    ring_tokens = ring_pages * page_size
    kr = np.stack([_fill_ring_sinks(k_full[b], ring_tokens, page_size,
                                    L[b], SINKS) for b in range(B)],
                  1).reshape(Hkv, B * ring_pages, page_size, D)
    vr = np.stack([_fill_ring_sinks(v_full[b], ring_tokens, page_size,
                                    L[b], SINKS) for b in range(B)],
                  1).reshape(Hkv, B * ring_pages, page_size, D)
    rtable = jnp.arange(B * ring_pages, dtype=jnp.int32).reshape(
        B, ring_pages)
    kf = np.zeros((Hkv, B * full_pps, page_size, D), np.float32)
    vf = np.zeros_like(kf)
    for b in range(B):
        kf[:, b * full_pps:(b + 1) * full_pps] = k_full[b].reshape(
            Hkv, full_pps, page_size, D)
        vf[:, b * full_pps:(b + 1) * full_pps] = v_full[b].reshape(
            Hkv, full_pps, page_size, D)
    ftable = jnp.arange(B * full_pps, dtype=jnp.int32).reshape(B, full_pps)
    lengths = jnp.asarray(L, jnp.int32)
    out_ring = pa.paged_attention(q, jnp.asarray(kr), jnp.asarray(vr),
                                  lengths, rtable, pages_per_block=2,
                                  window=W, sinks=SINKS, ring=True)
    out_full = pa.paged_attention(q, jnp.asarray(kf), jnp.asarray(vf),
                                  lengths, ftable, pages_per_block=2,
                                  window=W, sinks=SINKS)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               rtol=1e-4, atol=1e-4)

    # prefix-prefill twin over the same wrapped ring
    T = 4
    qt = jnp.asarray(rng.standard_normal((B, Hq, T, D)), jnp.float32)
    pr = pa.paged_prefill_attention(qt, jnp.asarray(kr), jnp.asarray(vr),
                                    lengths, rtable, pages_per_block=2,
                                    window=W, sinks=SINKS, ring=True)
    pf = pa.paged_prefill_attention(qt, jnp.asarray(kf), jnp.asarray(vf),
                                    lengths, ftable, pages_per_block=2,
                                    window=W, sinks=SINKS)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pf),
                               rtol=1e-4, atol=1e-4)
