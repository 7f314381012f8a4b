"""Speculative decoding: output must be IDENTICAL to target-only greedy
decoding (speculation changes latency, never tokens)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpukern.models import Config
from tpukern.models import serving
from tpukern.models.speculative import (rejection_accept,
                                        speculative_generate,
                                        speculative_sample_generate)
from tpukern.models.transformer import init_params

TARGET = Config(vocab=128, d_model=128, n_layers=2, n_heads=4,
                n_kv_heads=2, d_ff=256, max_seq=512)
DRAFT = Config(vocab=128, d_model=64, n_layers=1, n_heads=2,
               n_kv_heads=2, d_ff=128, max_seq=512)
N_NEW = 10


def _setup():
    tp = init_params(TARGET, jax.random.key(0))
    dp = init_params(DRAFT, jax.random.key(1))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, TARGET.vocab, (1, 24)), jnp.int32)
    return tp, dp, prompt


def test_matches_target_greedy():
    tp, dp, prompt = _setup()
    ref = serving.generate(tp, TARGET, prompt, n_steps=N_NEW,
                           pages_per_seq=2, page_size=128)
    out, stats = speculative_generate(tp, TARGET, dp, DRAFT, prompt,
                                      N_NEW, gamma=3, pages_per_seq=2,
                                      page_size=128, return_stats=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert stats.rounds >= 1 and stats.drafted >= stats.accepted


def test_self_draft_accepts_everything():
    """Draft == target: every proposal matches, so each round emits
    gamma+1 tokens and the full-acceptance catch-up path runs."""
    tp, _, prompt = _setup()
    ref = serving.generate(tp, TARGET, prompt, n_steps=N_NEW,
                           pages_per_seq=2, page_size=128)
    out, stats = speculative_generate(tp, TARGET, tp, TARGET, prompt,
                                      N_NEW, gamma=3, pages_per_seq=2,
                                      page_size=128, return_stats=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert stats.acceptance_rate == 1.0
    # gamma+1 tokens per round -> ceil(10 / 4) = 3 rounds
    assert stats.rounds == 3


def test_gamma_one():
    tp, dp, prompt = _setup()
    ref = serving.generate(tp, TARGET, prompt, n_steps=4,
                           pages_per_seq=2, page_size=128)
    out = speculative_generate(tp, TARGET, dp, DRAFT, prompt, 4,
                               gamma=1, pages_per_seq=2, page_size=128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


# --- rejection-sampling acceptance core -------------------------------

def test_rejection_accept_identical_dists_always_accepts():
    """q == p -> min(1, p/q) = 1: every draft accepted, every seed."""
    rng = np.random.default_rng(7)
    p = np.array([0.5, 0.2, 0.2, 0.1])
    for seed in range(20):
        r = np.random.default_rng(seed)
        drafts = rng.choice(4, size=3, p=p)
        j, nxt = rejection_accept(drafts, np.tile(p, (3, 1)),
                                  np.tile(p, (4, 1)), r)
        assert j == 3 and 0 <= nxt < 4


def test_rejection_accept_marginal_is_target():
    """Leviathan et al. theorem, measured: with d ~ q then
    accept/residual, the emitted first token's marginal is exactly p —
    even when q is badly miscalibrated."""
    q = np.array([0.70, 0.10, 0.10, 0.05, 0.05])
    p = np.array([0.10, 0.40, 0.25, 0.20, 0.05])
    rng = np.random.default_rng(0)
    counts = np.zeros(5)
    n = 40000
    for _ in range(n):
        d = rng.choice(5, p=q)
        j, nxt = rejection_accept(np.array([d]), q[None], np.tile(p, (2, 1)),
                                  rng)
        counts[d if j == 1 else nxt] += 1
    emp = counts / n
    # ~3-sigma binomial band at n=40k is ~0.0075; allow 0.01
    np.testing.assert_allclose(emp, p, atol=0.01)


def test_rejection_accept_never_emits_zero_prob_token():
    """Tokens with p == 0 must never be emitted (q proposes them, the
    accept rule must kill them)."""
    q = np.array([0.25, 0.25, 0.25, 0.25])
    p = np.array([0.0, 0.5, 0.5, 0.0])
    rng = np.random.default_rng(1)
    for _ in range(500):
        d = rng.choice(4, p=q)
        j, nxt = rejection_accept(np.array([d]), q[None], np.tile(p, (2, 1)),
                                  rng)
        emitted = d if j == 1 else nxt
        assert p[emitted] > 0


# --- sampling driver --------------------------------------------------

def test_sample_self_draft_accepts_everything():
    """Draft == target -> p/q = 1 at every position: full acceptance."""
    tp, _, prompt = _setup()
    out, stats = speculative_sample_generate(
        tp, TARGET, tp, TARGET, prompt, N_NEW, gamma=3, temperature=1.0,
        seed=3, pages_per_seq=2, page_size=128, return_stats=True)
    assert stats.acceptance_rate == 1.0
    assert out.shape == (1, N_NEW)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) < TARGET.vocab))


def test_sample_deterministic_per_seed():
    tp, dp, prompt = _setup()
    a = speculative_sample_generate(tp, TARGET, dp, DRAFT, prompt, 6,
                                    gamma=2, seed=11, pages_per_seq=2,
                                    page_size=128)
    b = speculative_sample_generate(tp, TARGET, dp, DRAFT, prompt, 6,
                                    gamma=2, seed=11, pages_per_seq=2,
                                    page_size=128)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_low_temperature_tracks_greedy():
    """T -> 0 concentrates p on the argmax: sampled output must match
    the greedy speculative output."""
    tp, dp, prompt = _setup()
    ref = speculative_generate(tp, TARGET, dp, DRAFT, prompt, 6, gamma=2,
                               pages_per_seq=2, page_size=128)
    out = speculative_sample_generate(tp, TARGET, dp, DRAFT, prompt, 6,
                                      gamma=2, temperature=1e-4, seed=0,
                                      pages_per_seq=2, page_size=128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
