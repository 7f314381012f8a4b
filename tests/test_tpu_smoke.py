"""Compiled-on-hardware smoke lane (VERDICT r2 item 10).

Interpret-mode CI cannot catch Mosaic lowering bugs — round 2 found the
paged-pool lane-alignment and f32-precision issues only by driving
compiled kernels on the chip. This file freezes that ad-hoc shakedown
into a repeatable lane:

    TPUKERN_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu -q

(~18 cases, a few minutes incl. remote compiles; the default CPU lane
skips it via the marker/env guard.) Shapes are small-but-edgy: GQA,
causal offsets, non-block-multiple tails, windows+sinks, paged int8/
ring, fused CE grads, sampling determinism — the paths where Mosaic
diverges from interpret mode.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("TPUKERN_TEST_PLATFORM") != "tpu",
        reason="on-device lane (set TPUKERN_TEST_PLATFORM=tpu)"),
]


def _rng():
    return np.random.default_rng(7)


def _mk(shape, dtype=jnp.bfloat16, rng=None):
    rng = rng or _rng()
    return jnp.asarray(rng.standard_normal(shape), dtype)


def _maxdiff(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b.astype(jnp.float32))))


# ---------------------------------------------------------------- attention

def test_fa_gqa_offset_tails():
    from tpukern.ops.attention import attention_ref_offset, flash_attention
    rng = _rng()
    q = _mk((1, 4, 700, 64), rng=rng)
    k = _mk((1, 2, 900, 64), rng=rng)
    v = _mk((1, 2, 900, 64), rng=rng)
    out = flash_attention(q, k, v, causal=True, causal_offset=200,
                          block_q=256, block_k=256)
    kf = jnp.repeat(k, 2, axis=1)
    vf = jnp.repeat(v, 2, axis=1)
    ref = attention_ref_offset(q, kf, vf, causal_offset=200)
    assert _maxdiff(out, ref) < 5e-3


def test_fa_tpv_dispatch_tails():
    from tpukern.ops.attention import attention_ref, flash_attention
    rng = _rng()
    q, k, v = (_mk((1, 2, 320, 64), rng=rng) for _ in range(3))
    out = flash_attention(q, k, v, causal=True)  # dispatches to tpv
    # bf16 band: outputs are O(1), so one output ULP is 2^-7 = 0.0078
    assert _maxdiff(out, attention_ref(q, k, v, causal=True)) < 1.5e-2


def test_fa_window_sinks():
    from tpukern.ops.attention import attention_ref, flash_attention
    rng = _rng()
    q, k, v = (_mk((1, 2, 512, 64), rng=rng) for _ in range(3))
    out = flash_attention(q, k, v, causal=True, window=100, sinks=16,
                          block_q=256, block_k=256)
    ref = attention_ref(q, k, v, causal=True, window=100, sinks=16)
    assert _maxdiff(out, ref) < 1.5e-2  # bf16 output band (2 ULP)


def test_fa_d256_tails():
    from tpukern.ops.attention import attention_ref, flash_attention
    rng = _rng()
    q, k, v = (_mk((1, 1, 384, 256), rng=rng) for _ in range(3))
    out = flash_attention(q, k, v, block_q=256, block_k=256)
    assert _maxdiff(out, attention_ref(q, k, v)) < 5e-3


def test_fa_softcap_segments():
    from tpukern.ops.attention import attention_ref, flash_attention
    rng = _rng()
    q, k, v = (_mk((1, 2, 512, 64), rng=rng) for _ in range(3))
    seg = (jnp.asarray(rng.integers(0, 2, (1, 512)), jnp.int32),
           jnp.asarray(rng.integers(0, 2, (1, 512)), jnp.int32))
    out = flash_attention(q, k, v, softcap=20.0, segment_ids=seg,
                          block_q=256, block_k=256)
    ref = attention_ref(q, k, v, softcap=20.0, segment_ids=seg)
    assert _maxdiff(out, ref) < 5e-3


def test_fa_trainable_backward_gqa_tails():
    from tpukern.ops.attention import (attention_ref,
                                       flash_attention_trainable)
    rng = _rng()
    q = _mk((1, 4, 320, 64), rng=rng)
    k = _mk((1, 2, 320, 64), rng=rng)
    v = _mk((1, 2, 320, 64), rng=rng)

    def loss(f):
        return lambda q, k, v: jnp.sum(f(q, k, v, True) * 0.01)

    g = jax.grad(loss(lambda q, k, v, c: flash_attention_trainable(
        q, k, v, c)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda q, k, v, c: attention_ref(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), causal=c)), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        scale = max(1e-3, float(jnp.max(jnp.abs(b.astype(jnp.float32)))))
        assert _maxdiff(a, b) / scale < 3e-2


# ---------------------------------------------------------- paged attention

def _paged_setup(dtype=jnp.bfloat16, D=128):
    rng = _rng()
    B, Hq, Hkv = 2, 4, 2
    page, P, pps = 128, 16, 8
    q = _mk((B, Hq, D), rng=rng)
    k_pages = _mk((Hkv, P, page, D), rng=rng)
    v_pages = _mk((Hkv, P, page, D), rng=rng)
    lengths = jnp.asarray([900, 700], jnp.int32)
    table = jnp.asarray(rng.permutation(P)[:B * pps],
                        jnp.int32).reshape(B, pps)
    return q, k_pages, v_pages, lengths, table


def test_paged_decode_bf16():
    from tpukern.ops.paged_attention import (paged_attention,
                                             paged_attention_ref)
    q, kp, vp, lengths, table = _paged_setup()
    out = paged_attention(q, kp, vp, lengths, table)
    ref = paged_attention_ref(q, kp, vp, lengths, table)
    assert _maxdiff(out, ref) < 5e-3


def test_paged_decode_int8_mxu():
    from tpukern.ops.paged_attention import (paged_attention_quantized,
                                             paged_attention_ref,
                                             quantize_pages)
    q, kp, vp, lengths, table = _paged_setup()
    kq, ks = quantize_pages(kp)
    vq, vs = quantize_pages(vp)
    out = paged_attention_quantized(q, kq, ks, vq, vs, lengths, table,
                                    q_int8=True)
    ref = paged_attention_ref(q, kp, vp, lengths, table)
    assert _maxdiff(out, ref) < 2e-2  # int8 quantization band


def test_serving_ring_window_sinks():
    from tpukern.models.serving import Config, generate
    from tpukern.models.transformer import init_params
    cfg = Config(n_layers=2, n_heads=4, n_kv_heads=2, d_model=256,
                 vocab=256, window=192, sinks=16)
    rng = _rng()
    prompts = jnp.asarray(rng.integers(1, 255, (2, 48)), jnp.int32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    toks = generate(params, cfg, prompts, n_steps=8, ring=True,
                    pages_per_seq=2)
    assert toks.shape == (2, 8)


def test_fused_cross_entropy_grads():
    from tpukern.ops.cross_entropy import (cross_entropy_ref,
                                           fused_cross_entropy)
    rng = _rng()
    x = _mk((640, 256), rng=rng)
    w = _mk((256, 1024), rng=rng)
    t = jnp.asarray(rng.integers(0, 1024, (640,)), jnp.int32)

    def f(fn):
        return lambda x, w: jnp.mean(fn(x, w, t))

    lf, gf = jax.value_and_grad(f(fused_cross_entropy),
                                argnums=(0, 1))(x, w)
    lr, gr = jax.value_and_grad(f(cross_entropy_ref),
                                argnums=(0, 1))(x, w)
    # relative: the mean loss is ~ln(V) ~ 7 and inputs are bf16
    assert abs(float(lf) - float(lr)) / abs(float(lr)) < 2e-2
    for a, b in zip(gf, gr):
        scale = max(1e-3, float(jnp.max(jnp.abs(b.astype(jnp.float32)))))
        assert _maxdiff(a, b) / scale < 3e-2


def test_sampling_deterministic_topk():
    from tpukern.ops.sampling import sample, topk_threshold
    rng = _rng()
    logits = _mk((8, 4096), jnp.float32, rng)
    t1 = sample(logits, seed=11, top_k=40)
    t2 = sample(logits, seed=11, top_k=40)
    assert bool(jnp.all(t1 == t2))
    thr = topk_threshold(logits, 40)
    kth = jax.lax.top_k(logits, 40)[0][:, -1]
    assert bool(jnp.all(thr == kth))


# ------------------------------------------------------------------- matmul

def test_matmul_odd_k_tail_mask():
    # exercises the in-kernel K-overhang mask (round 3) compiled on
    # hardware: K=777 with block_k=256 overhangs by 247 columns
    from tpukern.ops.matmul import matmul
    rng = _rng()
    a = _mk((512, 777), rng=rng)
    b = _mk((777, 640), rng=rng)
    out = matmul(a, b, block_m=256, block_n=256, block_k=256)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    assert _maxdiff(out, ref) / scale < 2e-2


def test_matmul_accio_f32_odd():
    from tpukern.ops.matmul import matmul
    rng = _rng()
    a = _mk((300, 500), jnp.float32, rng)
    b = _mk((500, 260), jnp.float32, rng)
    out = matmul(a, b, block_m=128, block_n=128, block_k=128,
                 acc_in_out=True)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32)
    assert _maxdiff(out, ref) / float(jnp.max(jnp.abs(ref))) < 1e-5


def test_hgemm_auto_blocks_odd():
    from tpukern.ops.matmul import hgemm
    rng = _rng()
    a = _mk((1111, 1280), rng=rng)
    b = _mk((1280, 999), rng=rng)
    out = hgemm(a, b)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32
                  ).astype(jnp.bfloat16)
    assert _maxdiff(out, ref) / float(jnp.max(jnp.abs(
        ref.astype(jnp.float32)))) < 2e-2


# ----------------------------------------------------------------- row ops

def test_norms_odd_rows():
    from tpukern.ops.layernorm import layer_norm, layer_norm_ref
    from tpukern.ops.rmsnorm import rms_norm, rms_norm_ref
    rng = _rng()
    x = _mk((193, 512), jnp.float32, rng)
    assert _maxdiff(layer_norm(x, 0.5, 0.1), layer_norm_ref(x, 0.5, 0.1)) \
        < 1e-4
    assert _maxdiff(rms_norm(x, 0.5), rms_norm_ref(x, 0.5)) < 1e-4


def test_rope_odd_rows():
    from tpukern.ops.rope import rope, rope_ref
    rng = _rng()
    x = _mk((77, 128), jnp.float32, rng)
    assert _maxdiff(rope(x), rope_ref(x)) < 1e-5


def test_gemv_odd_k():
    from tpukern.ops.gemv import gemv
    rng = _rng()
    a = _mk((512, 300), jnp.float32, rng)
    x = _mk((300,), jnp.float32, rng)
    ref = a @ x
    assert _maxdiff(gemv(a, x), ref) / float(jnp.max(jnp.abs(ref))) < 1e-4


def test_softmax_online_tails():
    from tpukern.ops.softmax import online_softmax_per_token
    rng = _rng()
    x = _mk((300, 1000), jnp.float32, rng)
    assert _maxdiff(online_softmax_per_token(x),
                    jax.nn.softmax(x, axis=-1)) < 1e-5


def test_w8a16_dispatch_boundary():
    # both sides of the measured dispatch window (BENCH_NOTES round-4
    # M-sweep/boundary probe) compiled on hardware: the kernel tier and
    # the XLA dequant-dot tier must agree with the f32 dequant reference,
    # and force_kernel must pin the Pallas path at a large M that the
    # auto dispatch routes to XLA.
    from tpukern.ops.matmul_w8a16 import matmul_w8a16, quantize_weights
    rng = _rng()
    w = jnp.asarray(rng.standard_normal((1024, 768)) * 0.05, jnp.float32)
    q, s = quantize_weights(w)
    ref_w = q.astype(jnp.float32) * s[None, :]
    for M in (8, 64, 512):
        x = _mk((M, 1024), rng=rng)
        ref = jnp.dot(x.astype(jnp.float32), ref_w)
        scale = float(jnp.max(jnp.abs(ref)))
        auto = matmul_w8a16(x, q, s)
        forced = matmul_w8a16(x, q, s, force_kernel=True)
        assert _maxdiff(auto, ref) / scale < 2e-2
        assert _maxdiff(forced, ref) / scale < 2e-2


def test_gmm_skewed_groups():
    # grouped GEMM compiled on hardware with a skewed router split
    # including an empty group (the tile-table path interpret CI covers;
    # Mosaic lowering of the masked-merge chain is only proven here)
    from tpukern.ops.grouped_matmul import gmm
    rng = _rng()
    T, K, N, E = 1024, 512, 640, 4
    x = _mk((T, K), rng=rng)
    w = jnp.asarray(rng.standard_normal((E, K, N)) * 0.05, jnp.bfloat16)
    gs = jnp.asarray([600, 0, 24, 400], jnp.int32)
    out = gmm(x, w, gs, block_m=256, block_n=256, block_k=256)
    # reference: per-group dense matmul on the f32 upcast
    starts = np.concatenate([[0], np.cumsum(np.asarray(gs))])
    ref = np.zeros((T, N), np.float32)
    for e in range(E):
        seg = slice(int(starts[e]), int(starts[e + 1]))
        ref[seg] = (np.asarray(x, np.float32)[seg]
                    @ np.asarray(w[e], np.float32))
    scale = float(np.max(np.abs(ref))) or 1.0
    assert _maxdiff(out, jnp.asarray(ref)) / scale < 2e-2
