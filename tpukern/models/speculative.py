"""Speculative decoding: draft-model proposal + single-pass target
verification over the paged serving path.

The reference has no serving layer at all; this is the TPU-native step
beyond its prefix-prefill kernel (kernels/openai-triton/prefix_prefill.py):
the verification step is exactly one paged prefix-prefill call — gamma+1
tokens scored against the target's paged KV cache in one kernel sweep —
so a step that emits j+1 tokens costs the target ONE multi-token pass
instead of j+1 sequential decode steps.

Greedy acceptance (deterministic): draft token d_i is accepted while it
equals the target's own greedy choice at that position, so the emitted
stream is IDENTICAL to target-only greedy decoding — speculation changes
latency, never output (the invariant the tests pin down).

Sampled acceptance (speculative_sample_generate): the standard
rejection-sampling scheme (Leviathan et al. 2022 / Chen et al. 2023) —
accept d_i with prob min(1, p_i(d_i)/q_i(d_i)); on rejection sample the
replacement from the residual norm(max(p_i - q_i, 0)); on full
acceptance sample the bonus token from p_{g+1}. The marginal of every
emitted token is exactly the target's sampling distribution (the
invariant `rejection_accept`'s statistical test pins down).

Cache discipline (both caches functional, lengths-only rollback):
round invariant = both caches hold exactly the n emitted tokens, with
one pending token `last` not yet in any cache.
  1. draft: gamma sequential decode steps propose d_1..d_gamma
     (draft cache grows to n + gamma: last, d_1..d_{gamma-1} written).
  2. verify: target scores [last, d_1..d_gamma] in one verify_step
     (target cache grows to n + gamma + 1); g_i = argmax at position i.
  3. accept j = longest prefix with d_i == g_{i-1}; emit last, d_1..d_j;
     new pending last = g_j; roll both caches back to n + j + 1
     (full acceptance: one draft catch-up step feeds d_gamma first).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpukern.models.serving import (decode_step, init_cache, prefill,
                                    rollback, verify_step)


@functools.partial(jax.jit, static_argnums=1)
def _d_step(params, cfg, tok, cache):
    return decode_step(params, cfg, tok, cache)


@functools.partial(jax.jit, static_argnums=1)
def _t_verify(params, cfg, tokens, cache):
    return verify_step(params, cfg, tokens, cache)


@dataclasses.dataclass
class SpecStats:
    rounds: int = 0
    drafted: int = 0
    accepted: int = 0

    @property
    def acceptance_rate(self):
        return self.accepted / max(1, self.drafted)


def speculative_generate(target_params, target_cfg, draft_params,
                         draft_cfg, prompt, n_steps, *, gamma=4,
                         pages_per_seq=8, page_size=128,
                         return_stats=False):
    """Greedy speculative decoding of n_steps tokens for prompt (1, T).

    Emits exactly the tokens target-only greedy decoding would emit.
    gamma = draft tokens proposed per round. Returns (1, n_steps) ids
    (and a SpecStats with the measured acceptance rate)."""
    B = prompt.shape[0]
    assert B == 1, "speculative driver is per-sequence"
    # capacity: every round may write up to gamma+1 tokens past the
    # emitted length before rolling back; overflowing the page pool would
    # silently clamp writes and corrupt the exact-greedy invariant
    max_len = pages_per_seq * page_size
    assert prompt.shape[1] + n_steps + gamma + 1 <= max_len, (
        f"prompt ({prompt.shape[1]}) + n_steps ({n_steps}) + gamma+1 "
        f"({gamma + 1}) must fit the page pool ({max_len})")
    tc = init_cache(target_cfg, B, pages_per_seq, page_size)
    dc = init_cache(draft_cfg, B, pages_per_seq, page_size)

    t_logits, tc = prefill(target_params, target_cfg, prompt, tc)
    _, dc = prefill(draft_params, draft_cfg, prompt, dc)
    last = int(np.asarray(jnp.argmax(t_logits, -1))[0])

    out = []
    stats = SpecStats()
    while len(out) < n_steps:
        n = int(np.asarray(tc.lengths)[0])
        g = min(gamma, n_steps - len(out))  # don't overdraft the budget
        # 1. draft proposals
        drafts = []
        cur = last
        for _ in range(g):
            dl, dc = _d_step(draft_params, draft_cfg,
                             jnp.asarray([cur], jnp.int32), dc)
            cur = int(np.asarray(jnp.argmax(dl, -1))[0])
            drafts.append(cur)
        # 2. one-pass target verification; candidates are padded to a
        # fixed gamma+1 width so the final short round reuses the same
        # compiled verify_step (positions past g are ignored AND rolled
        # back, so the padding tokens never influence anything)
        cand = np.zeros((1, gamma + 1), np.int32)
        cand[0, :g + 1] = [last] + drafts
        vl, tc = _t_verify(target_params, target_cfg,
                           jnp.asarray(cand), tc)
        greedy = np.asarray(jnp.argmax(vl, -1))[0]          # (g+1,)
        # 3. longest accepted prefix
        j = 0
        while j < g and drafts[j] == int(greedy[j]):
            j += 1
        out.append(last)
        out.extend(drafts[:j])
        new_last = int(greedy[j])
        stats.rounds += 1
        stats.drafted += g
        stats.accepted += j
        # cache discipline: both caches -> n + j + 1 live tokens
        tc = rollback(tc, np.asarray([n + j + 1]))
        if j == g and g > 0:
            # full acceptance: draft never saw d_g — catch up
            _, dc = _d_step(draft_params, draft_cfg,
                            jnp.asarray([drafts[-1]], jnp.int32), dc)
        dc = rollback(dc, np.asarray([n + j + 1]))
        last = new_last

    result = jnp.asarray([out[:n_steps]], jnp.int32)
    return (result, stats) if return_stats else result


def rejection_accept(drafts, q_probs, p_probs, rng):
    """Pure rejection-sampling acceptance over one speculative round.

    drafts: (g,) proposed token ids, d_i sampled from q_probs[i].
    q_probs: (g, V) draft distributions; p_probs: (g+1, V) target
    distributions at the same positions (p_probs[g] is the bonus
    position after all g drafts). rng: np.random.Generator.

    Returns (j, next_token): j = accepted draft count; next_token is the
    residual sample at the first rejection, or a p_probs[g] sample on
    full acceptance. Theorem (Leviathan et al.): each emitted token's
    marginal is exactly its p_i — verified statistically in
    tests/test_speculative.py."""
    g = len(drafts)
    for i in range(g):
        d = int(drafts[i])
        q = max(float(q_probs[i, d]), 1e-20)
        if rng.random() < min(1.0, float(p_probs[i, d]) / q):
            continue
        resid = np.maximum(p_probs[i] - q_probs[i], 0.0)
        z = resid.sum()
        # z == 0 only via fp degeneracy (p <= q everywhere yet the
        # accept draw lost); fall back to p itself — still target-exact
        resid = resid / z if z > 0 else p_probs[i] / p_probs[i].sum()
        return i, int(rng.choice(len(resid), p=resid))
    p = p_probs[g] / p_probs[g].sum()
    return g, int(rng.choice(len(p), p=p))


def _temp_probs(logits, temperature):
    """softmax(logits / T) as float64 numpy, renormalized exactly."""
    x = np.asarray(logits, np.float64) / temperature
    x -= x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


def speculative_sample_generate(target_params, target_cfg, draft_params,
                                draft_cfg, prompt, n_steps, *, gamma=4,
                                temperature=1.0, seed=0, pages_per_seq=8,
                                page_size=128, return_stats=False):
    """Sampling speculative decoding: n_steps tokens whose distribution
    is EXACTLY target-only sampling at `temperature` (never the draft's).

    Same cache discipline as speculative_generate; only the acceptance
    rule differs (rejection_accept above). temperature must be > 0 —
    use speculative_generate for greedy."""
    assert temperature > 0, "use speculative_generate for greedy (T=0)"
    B = prompt.shape[0]
    assert B == 1, "speculative driver is per-sequence"
    max_len = pages_per_seq * page_size
    assert prompt.shape[1] + n_steps + gamma + 1 <= max_len, (
        f"prompt ({prompt.shape[1]}) + n_steps ({n_steps}) + gamma+1 "
        f"({gamma + 1}) must fit the page pool ({max_len})")
    rng = np.random.default_rng(seed)
    tc = init_cache(target_cfg, B, pages_per_seq, page_size)
    dc = init_cache(draft_cfg, B, pages_per_seq, page_size)

    t_logits, tc = prefill(target_params, target_cfg, prompt, tc)
    p0 = _temp_probs(np.asarray(t_logits)[0], temperature)
    last = int(rng.choice(len(p0), p=p0))

    out = []
    stats = SpecStats()
    while len(out) < n_steps:
        n = int(np.asarray(tc.lengths)[0])
        g = min(gamma, n_steps - len(out))
        drafts, q_rows = [], []
        cur = last
        for _ in range(g):
            dl, dc = _d_step(draft_params, draft_cfg,
                             jnp.asarray([cur], jnp.int32), dc)
            q = _temp_probs(np.asarray(dl)[0], temperature)
            cur = int(rng.choice(len(q), p=q))
            drafts.append(cur)
            q_rows.append(q)
        cand = np.zeros((1, gamma + 1), np.int32)
        cand[0, :g + 1] = [last] + drafts
        vl, tc = _t_verify(target_params, target_cfg,
                           jnp.asarray(cand), tc)
        p_rows = _temp_probs(np.asarray(vl)[0, :g + 1], temperature)
        j, new_last = rejection_accept(
            np.asarray(drafts, np.int64),
            np.asarray(q_rows) if g else np.zeros((0, p_rows.shape[-1])),
            p_rows, rng)
        out.append(last)
        out.extend(drafts[:j])
        stats.rounds += 1
        stats.drafted += g
        stats.accepted += j
        tc = rollback(tc, np.asarray([n + j + 1]))
        if j == g and g > 0:
            _, dc = _d_step(draft_params, draft_cfg,
                            jnp.asarray([drafts[-1]], jnp.int32), dc)
        dc = rollback(dc, np.asarray([n + j + 1]))
        last = new_last

    result = jnp.asarray([out[:n_steps]], jnp.int32)
    return (result, stats) if return_stats else result
