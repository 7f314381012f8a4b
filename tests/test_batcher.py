"""Continuous batching: staggered admission over shared slots produces
the same greedy tokens as isolated per-request generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukern.models import Config
from tpukern.models import serving
from tpukern.models.batcher import ContinuousBatcher
from tpukern.models.transformer import init_params

CFG = Config(vocab=128, d_model=128, n_layers=2, n_heads=4, n_kv_heads=2,
             d_ff=256, max_seq=512)
N_NEW = 6


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, CFG.vocab, n).astype(np.int32)
               for n in (17, 40, 9)]
    return params, prompts


def _reference_tokens(params, prompt):
    """Isolated single-request greedy generation via serving.generate."""
    out = serving.generate(params, CFG, jnp.asarray(prompt[None]),
                           n_steps=N_NEW, pages_per_seq=2, page_size=128)
    return list(np.asarray(out)[0])


def test_matches_isolated_generation(setup):
    """2 slots, 3 requests: the third is admitted mid-stream when a slot
    frees up; every request's tokens == its isolated generation."""
    params, prompts = setup
    refs = [_reference_tokens(params, p) for p in prompts]

    cb = ContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                           page_size=128, max_new_tokens=N_NEW,
                           prompt_buckets=(64,))
    finished = cb.run([(i, p) for i, p in enumerate(prompts)])

    assert set(finished) == {0, 1, 2}
    for i, ref in enumerate(refs):
        assert finished[i] == ref, (i, finished[i], ref)


def test_slot_reuse_and_masking(setup):
    """A freed slot is reused; slots decoding while another admits are
    unaffected (the admission-isolation property continuous batching
    needs)."""
    params, prompts = setup
    cb = ContinuousBatcher(params, CFG, n_slots=1, pages_per_seq=2,
                           page_size=128, max_new_tokens=3,
                           prompt_buckets=(64,))
    cb.add_request("a", prompts[0])
    assert cb.free_slots() == []
    while cb.active.any():
        cb.step()
    assert "a" in cb.finished and len(cb.finished["a"]) == 3
    # slot freed -> admit again
    slot = cb.add_request("b", prompts[2])
    assert slot == 0
    while cb.active.any():
        cb.step()
    assert len(cb.finished["b"]) == 3


def test_eos_frees_slot(setup):
    """EOS terminates a request before the token budget."""
    params, prompts = setup
    ref = _reference_tokens(params, prompts[0])
    eos = ref[2]  # force an early stop at the 3rd generated token
    cb = ContinuousBatcher(params, CFG, n_slots=1, pages_per_seq=2,
                           page_size=128, max_new_tokens=N_NEW,
                           prompt_buckets=(64,), eos_id=int(eos))
    cb.run([("x", prompts[0])])
    assert cb.finished["x"] == ref[:3]


def test_speculative_batcher_matches_isolated(setup):
    """Batched speculative decoding (per-slot acceptance) emits exactly
    the isolated greedy tokens for every request — while admitting the
    third request mid-stream through 2 shared slots."""
    from tpukern.models.batcher import SpeculativeBatcher

    params, prompts = setup
    draft_cfg = Config(vocab=CFG.vocab, d_model=64, n_layers=1,
                       n_heads=2, n_kv_heads=2, d_ff=128, max_seq=512)
    draft = init_params(draft_cfg, jax.random.key(7))
    refs = [_reference_tokens(params, p) for p in prompts]

    sb = SpeculativeBatcher(params, CFG, draft, draft_cfg, n_slots=2,
                            pages_per_seq=2, gamma=3, page_size=128,
                            max_new_tokens=N_NEW, prompt_buckets=(64,))
    finished = sb.run([(i, p) for i, p in enumerate(prompts)])
    assert set(finished) == {0, 1, 2}
    for i, ref in enumerate(refs):
        assert finished[i] == ref, (i, finished[i], ref)


def test_speculative_batcher_self_draft(setup):
    """Draft == target: every slot fully accepts every round (gamma+1
    tokens per slot per step), still token-exact."""
    from tpukern.models.batcher import SpeculativeBatcher

    params, prompts = setup
    refs = [_reference_tokens(params, p) for p in prompts[:2]]
    sb = SpeculativeBatcher(params, CFG, params, CFG, n_slots=2,
                            pages_per_seq=2, gamma=3, page_size=128,
                            max_new_tokens=N_NEW, prompt_buckets=(64,))
    sb.add_request(0, prompts[0])
    sb.add_request(1, prompts[1])
    steps = 0
    while sb.active.any():
        sb.step()
        steps += 1
    for i, ref in enumerate(refs):
        assert sb.finished[i] == ref, (i, sb.finished[i], ref)
    # full acceptance -> ceil(6 / (gamma+1)) = 2 rounds, not 6
    assert steps == 2


def test_speculative_batcher_eos(setup):
    """EOS mid-accepted-prefix frees the slot with the right tokens."""
    from tpukern.models.batcher import SpeculativeBatcher

    params, prompts = setup
    ref = _reference_tokens(params, prompts[0])
    eos = ref[2]
    sb = SpeculativeBatcher(params, CFG, params, CFG, n_slots=1,
                            pages_per_seq=2, gamma=3, page_size=128,
                            max_new_tokens=N_NEW, prompt_buckets=(64,),
                            eos_id=int(eos))
    sb.run([("x", prompts[0])])
    assert sb.finished["x"] == ref[:3]


def test_pages_per_block_length_hint():
    """The length-aware pick: largest power-of-two batch that fits the
    live page range (and divides the pool)."""
    from tpukern.models.serving import _pages_per_block

    assert _pages_per_block(16) == 8                 # no hint: largest
    assert _pages_per_block(16, max_live_pages=16) == 8
    assert _pages_per_block(16, max_live_pages=8) == 8
    assert _pages_per_block(16, max_live_pages=5) == 4
    assert _pages_per_block(16, max_live_pages=3) == 2
    assert _pages_per_block(16, max_live_pages=1) == 1
    assert _pages_per_block(16, max_live_pages=0) == 1
    assert _pages_per_block(2, max_live_pages=7) == 2  # capped by pool


def test_short_context_picks_small_ppb(setup):
    """A batcher over a deep page pool must not DMA 8-page blocks for a
    17-token prompt — and the tokens must not change with the pick."""
    params, prompts = setup
    ref = _reference_tokens(params, prompts[0])

    cb = ContinuousBatcher(params, CFG, n_slots=1, pages_per_seq=8,
                           page_size=128, max_new_tokens=N_NEW,
                           prompt_buckets=(64,))
    cb.add_request("a", prompts[0])
    assert cb._pick_ppb(cb.host_len[cb.active].max() + 1) == 1
    while cb.active.any():
        cb.step()
    # only the short-context variant was ever compiled
    assert set(cb._decode_fns) == {1}
    assert cb.finished["a"] == ref


def test_speculative_batcher_sampled_self_draft(setup):
    """Sampled acceptance, draft == target: p/q = 1 at every position,
    so every round fully accepts (gamma+1 tokens/slot/round)."""
    from tpukern.models.batcher import SpeculativeBatcher

    params, prompts = setup
    sb = SpeculativeBatcher(params, CFG, params, CFG, n_slots=2,
                            pages_per_seq=2, gamma=3, page_size=128,
                            max_new_tokens=N_NEW, prompt_buckets=(64,),
                            greedy=False, temperature=1.0)
    sb.add_request(0, prompts[0])
    sb.add_request(1, prompts[1])
    steps = 0
    while sb.active.any():
        sb.step()
        steps += 1
    assert steps == 2          # ceil(6 / (gamma+1)): full acceptance
    for i in (0, 1):
        toks = sb.finished[i]
        assert len(toks) == N_NEW
        assert all(0 <= t < CFG.vocab for t in toks)


def test_speculative_batcher_sampled_deterministic(setup):
    from tpukern.models.batcher import SpeculativeBatcher

    params, prompts = setup

    def run():
        sb = SpeculativeBatcher(params, CFG, params, CFG, n_slots=1,
                                pages_per_seq=2, gamma=2, page_size=128,
                                max_new_tokens=4, prompt_buckets=(64,),
                                greedy=False, temperature=0.9,
                                seed=5, accept_seed=5)
        sb.run([("x", prompts[0])])
        return sb.finished["x"]

    assert run() == run()


def test_speculative_batcher_sampled_low_temp_matches_greedy(setup):
    """T -> 0 concentrates every distribution on its argmax: the sampled
    acceptance must emit the greedy stream."""
    from tpukern.models.batcher import SpeculativeBatcher

    params, prompts = setup
    ref = _reference_tokens(params, prompts[0])
    sb = SpeculativeBatcher(params, CFG, params, CFG, n_slots=1,
                            pages_per_seq=2, gamma=3, page_size=128,
                            max_new_tokens=N_NEW, prompt_buckets=(64,),
                            greedy=False, temperature=1e-4)
    sb.run([("x", prompts[0])])
    assert sb.finished["x"] == ref


def test_dynamic_prefill_bucket(setup):
    """Prompts longer than every configured bucket fall back to a
    power-of-two bucket (capped by the pool) instead of raising."""
    from tpukern.models.batcher import _bucket

    assert _bucket(17, (64, 128)) == 64
    assert _bucket(130, (64, 128), cap=1024) == 256   # fallback tier
    assert _bucket(300, (64,), cap=1024) == 512
    assert _bucket(600, (64,), cap=640) == 640        # pool-capped
    with pytest.raises(ValueError):
        _bucket(700, (64,), cap=640)

    params, prompts = setup
    rng = np.random.default_rng(3)
    long_prompt = rng.integers(0, CFG.vocab, 70).astype(np.int32)
    ref = _reference_tokens(params, long_prompt)
    cb = ContinuousBatcher(params, CFG, n_slots=1, pages_per_seq=2,
                           page_size=128, max_new_tokens=N_NEW,
                           prompt_buckets=(64,))   # 70 > 64: dynamic tier
    cb.run([("long", long_prompt)])
    assert cb.finished["long"] == ref


def test_int8_cache_batcher(setup):
    """Continuous batching over the int8 KV tier: deterministic,
    slot-isolated, coherent streams (first tokens match the bf16 tier)."""
    params, prompts = setup
    cb16 = ContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                             page_size=128, max_new_tokens=4,
                             prompt_buckets=(64,))
    f16 = cb16.run([(i, p) for i, p in enumerate(prompts[:2])])
    cb8 = ContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                            page_size=128, max_new_tokens=4,
                            prompt_buckets=(64,), cache_dtype=jnp.int8)
    f8 = cb8.run([(i, p) for i, p in enumerate(prompts[:2])])
    assert set(f8) == set(f16)
    for i in f16:
        # first token comes straight from the (unquantized) prefill
        # logits; later tokens may diverge within quantization tolerance
        assert f8[i][0] == f16[i][0]
        assert len(f8[i]) == len(f16[i])


def test_int8_cache_speculative_batcher(setup):
    """Speculative batching over the int8 KV tier runs end to end: both
    pools quantized, per-slot rollback preserves scales, streams are
    deterministic and complete. (Exact greedy equality with the bf16
    tier is NOT asserted — quantization legitimately perturbs logits.)"""
    from tpukern.models.batcher import SpeculativeBatcher

    params, prompts = setup

    def run():
        sb = SpeculativeBatcher(params, CFG, params, CFG, n_slots=2,
                                pages_per_seq=2, gamma=2, page_size=128,
                                max_new_tokens=4, prompt_buckets=(64,),
                                cache_dtype=jnp.int8)
        assert sb.cache.quantized and sb.dcache.quantized
        return sb.run([(i, p) for i, p in enumerate(prompts[:2])])

    a, b = run(), run()
    assert set(a) == {0, 1}
    for i in a:
        assert len(a[i]) == 4
        assert a[i] == b[i]
        assert all(0 <= t < CFG.vocab for t in a[i])


def test_tp_batcher_matches_single_device(setup):
    """Tensor-parallel continuous batching: same greedy streams as the
    single-device batcher over a 2-device "tp" mesh, both KV tiers."""
    from jax.sharding import Mesh

    from tpukern.models.batcher import TPContinuousBatcher

    params, prompts = setup
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    ref = ContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                            page_size=128, max_new_tokens=4,
                            prompt_buckets=(64,))
    f0 = ref.run([(i, p) for i, p in enumerate(prompts)])
    tpb = TPContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                              mesh=mesh, page_size=128, max_new_tokens=4,
                              prompt_buckets=(64,))
    f1 = tpb.run([(i, p) for i, p in enumerate(prompts)])
    assert f1 == f0

    tpb8 = TPContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                               mesh=mesh, page_size=128, max_new_tokens=4,
                               prompt_buckets=(64,),
                               cache_dtype=jnp.int8)
    f2 = tpb8.run([(i, p) for i, p in enumerate(prompts)])
    assert set(f2) == set(f0)
    for i in f0:  # int8 tier: first token from unquantized prefill
        assert f2[i][0] == f0[i][0] and len(f2[i]) == len(f0[i])

    # chunked admission under tp (shard_mapped chunk continuation)
    tpc = TPContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                              mesh=mesh, page_size=128, max_new_tokens=4,
                              prompt_buckets=(64,), chunked_prefill=8)
    f3 = tpc.run([(i, p) for i, p in enumerate(prompts)])
    assert f3 == f0


def test_chunked_prefill_admission(setup):
    """Chunked admission (C-token pieces through the prefix-prefill
    kernel) emits exactly the same greedy streams as whole-prompt
    prefill — including a prompt whose length isn't a chunk multiple."""
    params, prompts = setup
    ref = ContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                            page_size=128, max_new_tokens=4,
                            prompt_buckets=(64,))
    f0 = ref.run([(i, p) for i, p in enumerate(prompts)])
    cb = ContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                           page_size=128, max_new_tokens=4,
                           prompt_buckets=(64,), chunked_prefill=8)
    f1 = cb.run([(i, p) for i, p in enumerate(prompts)])
    assert f1 == f0
    # and over the int8 tier (quantized writes ride the same view path)
    cb8 = ContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                            page_size=128, max_new_tokens=4,
                            prompt_buckets=(64,), chunked_prefill=8,
                            cache_dtype=jnp.int8)
    f2 = cb8.run([(i, p) for i, p in enumerate(prompts)])
    assert set(f2) == set(f0)
    for i in f0:
        assert len(f2[i]) == len(f0[i])


def test_batcher_topk_sampling(setup):
    """Sampled decode with top-k restriction: all emitted tokens valid,
    run completes, and two same-seed runs agree (deterministic chain)."""
    params, prompts = setup

    def run(seed):
        cb = ContinuousBatcher(params, CFG, n_slots=2, pages_per_seq=2,
                               page_size=128, max_new_tokens=4,
                               prompt_buckets=(64,), greedy=False,
                               temperature=0.9, top_k=8, seed=seed)
        return cb.run([(i, p) for i, p in enumerate(prompts)])

    a, b = run(11), run(11)
    assert set(a) == {0, 1, 2}
    for i in a:
        assert a[i] == b[i], (i, a[i], b[i])
        assert all(0 <= t < CFG.vocab for t in a[i])


def test_ring_cache_batcher(setup):
    """ContinuousBatcher over a rolling-buffer cache: a windowed config
    with a 64-token ring pool streams the same greedy tokens as the same
    config over a full-size pool, even when prompt + generation wraps
    the ring."""
    import dataclasses
    params, prompts = setup
    cfg = dataclasses.replace(CFG, window=32)
    n_new = 24  # 40-token prompt + 24 > 48-token ring: wraps

    full = ContinuousBatcher(params, cfg, n_slots=2, pages_per_seq=2,
                             page_size=128, max_new_tokens=n_new,
                             prompt_buckets=(48,))
    ref = full.run([(i, p) for i, p in enumerate(prompts)])

    cb = ContinuousBatcher(params, cfg, n_slots=2, pages_per_seq=3,
                           page_size=16, max_new_tokens=n_new,
                           prompt_buckets=(48,), ring=True)
    assert cb.cache.ring and cb.cache.ring_tokens == 48
    out = cb.run([(i, p) for i, p in enumerate(prompts)])
    assert out == ref, (out, ref)


def test_prefix_cache_batcher(setup):
    """prefix_cache=True: requests sharing a prompt prefix alias its
    pages instead of recomputing it, and streams stay identical to the
    non-caching batcher (source slots aren't recycled while aliased)."""
    params, _ = setup
    rng = np.random.default_rng(31)
    base = rng.integers(0, CFG.vocab, 40).astype(np.int32)
    prompts = [base,
               np.concatenate([base, [5, 9, 11]]).astype(np.int32),
               np.concatenate([base[:24], [7] * 10]).astype(np.int32)]

    kw = dict(n_slots=2, pages_per_seq=4, page_size=16,
              max_new_tokens=5, prompt_buckets=(64,))
    ref = ContinuousBatcher(params, CFG, **kw).run(
        [(i, p) for i, p in enumerate(prompts)])
    cb = ContinuousBatcher(params, CFG, prefix_cache=True, **kw)
    out = cb.run([(i, p) for i, p in enumerate(prompts)])
    assert out == ref, (out, ref)
    # the second request must actually have aliased the base prefix
    # (40 tokens -> 2 full pages shared from slot 0)
    t = np.asarray(cb.cache.page_table)
    assert (t[1, :2] == t[0, :2]).all()


def test_tp_speculative_batcher_matches_single_device(setup):
    """TP speculative batching: draft + paged-verify steps shard_mapped
    over a 2-device "tp" mesh emit exactly the single-device target-only
    greedy streams (the speculative invariant, under tensor parallelism)."""
    from jax.sharding import Mesh

    from tpukern.models.batcher import TPSpeculativeBatcher

    params, prompts = setup
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    draft_cfg = Config(vocab=CFG.vocab, d_model=64, n_layers=1,
                       n_heads=2, n_kv_heads=2, d_ff=128, max_seq=512)
    draft = init_params(draft_cfg, jax.random.key(7))
    refs = [_reference_tokens(params, p) for p in prompts]

    sb = TPSpeculativeBatcher(params, CFG, draft, draft_cfg, n_slots=2,
                              pages_per_seq=2, mesh=mesh, gamma=3,
                              page_size=128, max_new_tokens=N_NEW,
                              prompt_buckets=(64,))
    finished = sb.run([(i, p) for i, p in enumerate(prompts)])
    assert set(finished) == {0, 1, 2}
    for i, ref in enumerate(refs):
        assert finished[i] == ref, (i, finished[i], ref)
