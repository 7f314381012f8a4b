"""Speculative decoding: output must be IDENTICAL to target-only greedy
decoding (speculation changes latency, never tokens)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpukern.models import Config
from tpukern.models import serving
from tpukern.models.speculative import speculative_generate
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
