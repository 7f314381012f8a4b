"""Continuous batching: a slot scheduler over the paged serving path.

The reference stops at kernels; its serving intent lives in the Triton
paged-FA / prefix-prefill kernels (kernels/openai-triton/). This module
is the vLLM-style driver above tpukern.models.serving: B_max slots share
one paged KV pool; requests are admitted into free slots mid-stream
(prefill writes the new sequence's pages while other slots keep their
state), every step decodes ALL active slots in one batched paged-decode
kernel call, and finished sequences (EOS or token budget) free their
slot immediately for the next request.

XLA-friendly by construction: prompts are padded to a bucket length (one
prefill compilation per bucket), the decode step is a single fixed-shape
jitted function, and slot state lives in the fixed-size KVCache — no
recompilation as requests come and go.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpukern.models.serving import (KVCache, _pages_per_block, decode_step,
                                    init_cache, prefill, rollback,
                                    share_prefix,
                                    verify_step)
from tpukern.models.speculative import _temp_probs, rejection_accept


def _bucket(n, buckets, cap=None):
    """Padded prefill length for an n-token prompt: the smallest
    configured bucket that fits, else a power-of-two fallback (so
    arbitrarily long prompts cost at most log2 extra compilations),
    capped by the page pool."""
    for b in buckets:
        if n <= b:
            return b
    b = 1 << max(int(n) - 1, 0).bit_length()
    if cap is not None:
        b = min(b, int(cap))
    if n <= b:
        return b
    raise ValueError(f"prompt length {n} exceeds the page pool ({cap})")


class ContinuousBatcher:
    """Admit / step / collect loop over a fixed slot pool.

    >>> cb = ContinuousBatcher(params, cfg, n_slots=4, pages_per_seq=8)
    >>> cb.add_request("a", prompt_ids)       # any time a slot is free
    >>> cb.step()                             # one token for every slot
    >>> cb.finished                           # {request_id: [token, ...]}
    """

    def __init__(self, params, cfg, n_slots, pages_per_seq, page_size=128,
                 eos_id=None, max_new_tokens=64, prompt_buckets=(64, 128),
                 greedy=True, temperature=1.0, seed=0,
                 top_k=0, top_p=1.0, min_p=0.0,
                 cache_dtype=jnp.bfloat16, chunked_prefill=None,
                 ring=False, prefix_cache=False):
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.eos_id = eos_id
        self.max_new = max_new_tokens
        self.buckets = tuple(sorted(prompt_buckets))
        self.greedy = greedy
        assert temperature > 0
        self.temperature = temperature
        # support restriction for sampled decode (ops/sampling.py fused
        # gumbel-max kernel); all off -> plain categorical over the
        # temperature-scaled distribution
        self.top_k, self.top_p, self.min_p = top_k, top_p, min_p
        self.key = jax.random.key(seed)

        # cache_dtype=jnp.int8 serves from the quantized KV tier (2x
        # context per HBM byte; faster decode via the s8s8s32 MXU path).
        # ring=True (requires cfg.window) makes the pool a rolling
        # buffer: generation length is bounded by cfg.max_seq (the rope
        # tables), not the pool size.
        self.cache = init_cache(cfg, n_slots, pages_per_seq, page_size,
                                dtype=cache_dtype, ring=ring)
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq
        self.max_len = cfg.max_seq if ring else pages_per_seq * page_size
        # prefix caching (vLLM-style): admission aliases a matching
        # prompt prefix's full pages from another slot instead of
        # recomputing it; slots whose pages are still aliased by active
        # slots are not recycled until the aliasers finish
        assert not (prefix_cache and ring), "prefix cache needs flat pools"
        self.prefix_cache = prefix_cache
        self.slot_prompt = [None] * n_slots
        if ring:
            # padded prefill writes positions true_len..bucket-1; they are
            # dead in a flat pool but WRAP in a ring (clobbering live
            # window slots) unless the whole bucket fits one lap from
            # start=0. Chunked admission restarts mid-ring, so its padded
            # tail has no such guarantee — keep it off ring pools.
            cap = pages_per_seq * page_size
            assert max(prompt_buckets) <= cap, (
                f"ring pool: prompt bucket {max(prompt_buckets)} > ring "
                f"capacity {cap} would wrap padded prefill writes")
            assert chunked_prefill is None, (
                "chunked admission is not supported on ring pools (padded "
                "chunk tails can wrap over live window slots)")
        self.active = np.zeros(n_slots, bool)
        self.last_tok = np.zeros(n_slots, np.int32)
        self.n_generated = np.zeros(n_slots, np.int32)
        # host mirror of each slot's live token count: lets step() pick a
        # length-aware page-DMA batch without a device readback
        self.host_len = np.zeros(n_slots, np.int64)
        self.slot_request = [None] * n_slots
        self.outputs = {}      # request_id -> [tokens so far]
        self.finished = {}     # request_id -> [tokens]

        # chunked_prefill = chunk length C: prompts longer than C admit
        # in C-token chunks through the prefix-prefill kernel, bounding
        # admission activation memory by O(C) instead of O(prompt).
        # Note: on bf16 hardware the chunked path's logits differ from
        # whole-prompt flash prefill at the last bit (different kernels),
        # so greedy streams can diverge at argmax near-ties — both are
        # equally valid samples of the model
        self.chunk = chunked_prefill
        assert chunked_prefill is None or chunked_prefill >= 1
        self._decode_fns = {}  # pages_per_block -> jitted decode step
        self._prefill = {}     # bucket -> jitted single-slot prefill
        self._chunk_fn = None  # jitted single-slot chunk continuation

    def _decode_fn(self, ppb):
        """Jitted batched decode with a static pages_per_block (at most
        4 compilations: ppb is a power of two <= 8)."""
        if ppb not in self._decode_fns:
            cfg = self.cfg
            self._decode_fns[ppb] = jax.jit(
                lambda p, toks, cache, act: decode_step(
                    p, cfg, toks, cache, active=act, pages_per_block=ppb))
        return self._decode_fns[ppb]

    def _pick_ppb(self, max_live):
        """Length-aware page-DMA batch for the current step: the largest
        block that fits the longest active sequence (waste <= 1 partial
        block per slot)."""
        live_pages = -(-int(max_live) // self.page_size)  # ceil
        return _pages_per_block(self.pages_per_seq, live_pages)

    # -- admission ---------------------------------------------------------

    def free_slots(self):
        idle = [i for i in range(self.n_slots) if not self.active[i]]
        if not self.prefix_cache:
            return idle
        # a slot is recyclable only if no ACTIVE slot still aliases a
        # page it owns (identity allocator: page p belongs to slot
        # p // pages_per_seq)
        table = np.asarray(self.cache.page_table)
        owners = set()
        for j in range(self.n_slots):
            if self.active[j]:
                owners.update(int(p) // self.pages_per_seq
                              for p in table[j])
        return [i for i in idle if i not in owners or self.active[i]]

    def _prefill_fn(self, bucket, cfg=None):
        """Jitted single-slot prefill, one compilation per bucket length:
        runs on a 1-sequence view of the shared cache (the slot's page-
        table row + a zero start), then scatters lengths back."""
        cfg = cfg or self.cfg
        key = (bucket, cfg)
        if key in self._prefill:
            return self._prefill[key]

        def fn(params, tokens, true_len, cache, slot):
            view = KVCache(
                cache.k_pages, cache.v_pages,
                jax.lax.dynamic_slice_in_dim(cache.page_table, slot, 1),
                jnp.zeros((1,), jnp.int32),
                cache.k_scales, cache.v_scales, ring=cache.ring)
            logits, view = prefill(params, cfg, tokens, view,
                                   last_index=true_len[None] - 1)
            lengths = cache.lengths.at[slot].set(true_len)
            return logits[0], KVCache(view.k_pages, view.v_pages,
                                      cache.page_table, lengths,
                                      view.k_scales, view.v_scales, ring=cache.ring)

        self._prefill[key] = jax.jit(fn)
        return self._prefill[key]

    def _chunked_admit_fn(self):
        """Jitted one-chunk admission step on a single-slot view: writes
        the chunk's K/V through verify_step (token t sees the written
        prefix + chunk tokens <= t — the chunked-prefill contract),
        advances the slot length by the chunk's TRUE token count (padded
        tail positions stay dead), and returns the last true token's
        logits."""
        if self._chunk_fn is not None:
            return self._chunk_fn
        cfg = self.cfg

        def fn(params, tokens, true_n, cache, slot, start):
            view = KVCache(
                cache.k_pages, cache.v_pages,
                jax.lax.dynamic_slice_in_dim(cache.page_table, slot, 1),
                start[None],
                cache.k_scales, cache.v_scales, ring=cache.ring)
            logits, view = verify_step(params, cfg, tokens, view)
            lengths = cache.lengths.at[slot].set(start + true_n)
            new_cache = KVCache(view.k_pages, view.v_pages,
                                cache.page_table, lengths,
                                view.k_scales, view.v_scales, ring=cache.ring)
            return logits[0, true_n - 1], new_cache

        self._chunk_fn = jax.jit(fn)
        return self._chunk_fn

    def _admit_chunked(self, prompt_ids, slot):
        """Stream the prompt into the slot in fixed-size chunks; returns
        the next-token logits after the last true token."""
        C = self.chunk
        fn = self._chunked_admit_fn()
        start = 0
        logits = None
        for off in range(0, len(prompt_ids), C):
            piece = prompt_ids[off:off + C]
            true_n = len(piece)
            padded = np.zeros(C, np.int32)
            padded[:true_n] = piece
            logits, self.cache = fn(
                self.params, jnp.asarray(padded[None]),
                jnp.int32(true_n), self.cache, jnp.int32(slot),
                jnp.int32(start))
            start += true_n
        return logits

    def _find_shared_prefix(self, prompt_ids, slot):
        """Longest common prompt prefix with any slot whose pages are
        still resident (active or not-yet-recycled); returns
        (src_slot, share_len) or (None, 0). share_len is capped at
        len(prompt) - 1 so admission always scores >= 1 real token."""
        best, best_n = None, 0
        for j in range(self.n_slots):
            pj = self.slot_prompt[j]
            if j == slot or pj is None:
                continue
            n = int(np.minimum(len(pj), len(prompt_ids)))
            eq = pj[:n] == prompt_ids[:n]
            common = int(np.argmin(eq)) if not eq.all() else n
            common = min(common, len(prompt_ids) - 1)
            if common > best_n:
                best, best_n = j, common
        # below a page there is nothing to alias — not worth the bookkeeping
        return (best, best_n) if best_n >= self.page_size else (None, 0)

    def _admit_shared(self, request_id, prompt_ids, slot, src, share):
        """share_prefix + score the remaining prompt tokens through the
        chunked-admission path (verify_step on a single-slot view)."""
        self.cache = share_prefix(self.cache, src, [slot], share)
        rest = prompt_ids[share:]
        C = self.chunk or max(64, len(rest))
        fn = self._chunked_admit_fn()
        start = share
        logits = None
        for off in range(0, len(rest), C):
            piece = rest[off:off + C]
            true_n = len(piece)
            padded = np.zeros(C, np.int32)
            padded[:true_n] = piece
            logits, self.cache = fn(
                self.params, jnp.asarray(padded[None]),
                jnp.int32(true_n), self.cache, jnp.int32(slot),
                jnp.int32(start))
            start += true_n
        self.active[slot] = True
        self.n_generated[slot] = 0
        self.host_len[slot] = len(prompt_ids)
        self.slot_request[slot] = request_id
        self.slot_prompt[slot] = prompt_ids
        self.outputs[request_id] = []
        self.last_tok[slot] = int(self._sample(logits[None])[0])
        return slot

    def add_request(self, request_id, prompt_ids):
        """Admit a prompt into a free slot (raises if none free)."""
        slots = self.free_slots()
        if not slots:
            raise RuntimeError("no free slot")
        slot = slots[0]
        prompt_ids = np.asarray(prompt_ids, np.int32)
        true_len = len(prompt_ids)
        assert true_len + self.max_new <= self.max_len, "prompt too long"
        if self.prefix_cache:
            src, share = self._find_shared_prefix(prompt_ids, slot)
            if src is not None:
                return self._admit_shared(request_id, prompt_ids, slot,
                                          src, share)
            # no share: reset a possibly-aliased recycled row to its
            # identity pages before ordinary admission writes
            import dataclasses as _dc
            pps = self.pages_per_seq
            own = jnp.arange(slot * pps, (slot + 1) * pps,
                             dtype=jnp.int32)
            self.cache = _dc.replace(
                self.cache,
                page_table=self.cache.page_table.at[slot].set(own))
            self.slot_prompt[slot] = prompt_ids
        if self.chunk is not None and true_len > self.chunk:
            logits = self._admit_chunked(prompt_ids, slot)
            self.active[slot] = True
            self.n_generated[slot] = 0
            self.host_len[slot] = true_len
            self.slot_request[slot] = request_id
            self.outputs[request_id] = []
            self.last_tok[slot] = int(self._sample(logits[None])[0])
            return slot
        bucket = _bucket(true_len, self.buckets, cap=self.max_len)
        padded = np.zeros(bucket, np.int32)
        padded[:true_len] = prompt_ids

        logits, self.cache = self._prefill_fn(bucket)(
            self.params, jnp.asarray(padded[None]),
            jnp.int32(true_len), self.cache, jnp.int32(slot))
        self.active[slot] = True
        self.n_generated[slot] = 0
        self.host_len[slot] = true_len
        self.slot_request[slot] = request_id
        self.outputs[request_id] = []
        self.last_tok[slot] = int(self._sample(logits[None])[0])
        return slot

    def _sample(self, logits):
        if self.greedy:
            return np.asarray(jnp.argmax(logits, -1), np.int32)
        self.key, sub = jax.random.split(self.key)
        if self.top_k or self.top_p < 1.0 or self.min_p > 0.0:
            # fused gumbel-max pass restricted to the configured support
            from tpukern.ops.sampling import sample
            seed = jax.random.randint(sub, (), 0, np.int32(2**31 - 1))
            return np.asarray(sample(logits, seed,
                                     temperature=self.temperature,
                                     top_k=self.top_k, top_p=self.top_p,
                                     min_p=self.min_p), np.int32)
        return np.asarray(
            jax.random.categorical(sub, logits / self.temperature),
            np.int32)

    # -- decode ------------------------------------------------------------

    def step(self):
        """One decode step across all slots; collects tokens for active
        slots and frees slots that hit EOS or the token budget."""
        if not self.active.any():
            return 0
        # attention this step sees each slot's history + the token being
        # written now, hence the +1
        ppb = self._pick_ppb(self.host_len[self.active].max() + 1)
        logits, self.cache = self._decode_fn(ppb)(
            self.params, jnp.asarray(self.last_tok), self.cache,
            jnp.asarray(self.active))
        self.host_len[self.active] += 1
        next_tok = self._sample(logits)
        n_emitted = 0
        for slot in range(self.n_slots):
            if not self.active[slot]:
                continue
            tok = int(self.last_tok[slot])
            rid = self.slot_request[slot]
            self.outputs[rid].append(tok)
            self.n_generated[slot] += 1
            n_emitted += 1
            done = (tok == self.eos_id if self.eos_id is not None
                    else False) or self.n_generated[slot] >= self.max_new
            if done:
                self.active[slot] = False
                self.finished[rid] = self.outputs.pop(rid)
                self.slot_request[slot] = None
            else:
                self.last_tok[slot] = int(next_tok[slot])
        return n_emitted

    def run(self, requests, max_steps=10_000):
        """Drive a full workload: requests is [(id, prompt_ids), ...];
        admits whenever a slot frees up, steps until all finish."""
        pending = list(requests)
        for _ in range(max_steps):
            while pending and self.free_slots():
                rid, prompt = pending.pop(0)
                self.add_request(rid, prompt)
            if not pending and not self.active.any():
                break
            self.step()
        return self.finished


class SpeculativeBatcher(ContinuousBatcher):
    """Continuous batching WITH batched speculative decoding.

    Every step: all active slots draft `gamma` tokens with the small
    model (gamma batched draft decode steps), the target scores every
    slot's gamma+1 candidates in ONE batched verify_step (the paged
    prefix-prefill kernel), and each slot accepts its longest matching
    prefix — so a slot emits 1..gamma+1 tokens per target pass while
    the emitted streams stay EXACTLY equal to target-only greedy
    decoding (same invariant as models/speculative.py, now across a
    whole slot pool with per-slot acceptance lengths).

    greedy=False switches each slot's acceptance to rejection sampling
    (models/speculative.py rejection_accept): the per-slot emitted
    marginal is exactly target-only sampling at `temperature`.

    Cache discipline per round (both pools, per-slot lengths):
    n -> draft to n+gamma -> verify to n+gamma+1 -> accept j_b ->
    roll both back to n + j_b + 1 (full-accept slots first run one
    masked draft catch-up step for d_gamma).
    """

    def __init__(self, params, cfg, draft_params, draft_cfg, n_slots,
                 pages_per_seq, gamma=4, page_size=128, accept_seed=0,
                 **kw):
        super().__init__(params, cfg, n_slots, pages_per_seq,
                         page_size=page_size, **kw)
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.gamma = gamma
        # host rng driving draft sampling + accept/residual draws
        # (greedy mode never touches it)
        self._accept_rng = np.random.default_rng(accept_seed)
        # draft cache shares the target's KV tier (bf16 or int8)
        self.dcache = init_cache(draft_cfg, n_slots, pages_per_seq,
                                 page_size,
                                 dtype=self.cache.k_pages.dtype)
        self._ddecode_fns = {}
        self._verify_fns = {}

    def _ddecode_fn(self, ppb):
        if ppb not in self._ddecode_fns:
            dcfg = self.draft_cfg
            self._ddecode_fns[ppb] = jax.jit(
                lambda p, toks, cache, act: decode_step(
                    p, dcfg, toks, cache, active=act, pages_per_block=ppb))
        return self._ddecode_fns[ppb]

    def _verify_fn(self, ppb):
        if ppb not in self._verify_fns:
            cfg = self.cfg
            self._verify_fns[ppb] = jax.jit(
                lambda p, toks, cache: verify_step(
                    p, cfg, toks, cache, pages_per_block=ppb))
        return self._verify_fns[ppb]

    def add_request(self, request_id, prompt_ids):
        prompt_ids = np.asarray(prompt_ids, np.int32)
        assert (len(prompt_ids) + self.max_new + self.gamma + 1
                <= self.max_len), "prompt too long for speculative rounds"
        slot = super().add_request(request_id, prompt_ids)
        # draft prefill into the same slot (its logits are unused: the
        # first draft proposal starts from the target-sampled last token)
        bucket = _bucket(len(prompt_ids), self.buckets, cap=self.max_len)
        padded = np.zeros(bucket, np.int32)
        padded[:len(prompt_ids)] = prompt_ids
        _, self.dcache = self._prefill_fn(bucket, self.draft_cfg)(
            self.draft_params, jnp.asarray(padded[None]),
            jnp.int32(len(prompt_ids)), self.dcache, jnp.int32(slot))
        return slot

    def step(self):
        """One speculative round across all active slots; returns the
        number of tokens emitted."""
        if not self.active.any():
            return 0
        g = self.gamma
        act = jnp.asarray(self.active)
        n_before = np.asarray(self.cache.lengths).copy()
        # the round touches up to n + gamma + 1 tokens of the longest
        # active slot; pick one page-DMA batch for the whole round
        ppb = self._pick_ppb(n_before[self.active].max() + g + 1)

        # 1. batched drafting: gamma small-model decode steps (sampled
        # mode records each slot's draft distribution for the accept rule)
        sampled = not self.greedy
        drafts = np.zeros((self.n_slots, g), np.int32)
        q_all = np.zeros((self.n_slots, g, self.cfg.vocab)) if sampled \
            else None
        cur = np.asarray(self.last_tok).copy()
        for i in range(g):
            dl, self.dcache = self._ddecode_fn(ppb)(
                self.draft_params, jnp.asarray(cur), self.dcache, act)
            if sampled:
                qs = _temp_probs(np.asarray(dl), self.temperature)
                q_all[:, i] = qs
                cur = np.array(
                    [self._accept_rng.choice(qs.shape[-1], p=qs[s])
                     for s in range(self.n_slots)], np.int32)
            else:
                cur = np.asarray(jnp.argmax(dl, -1), np.int32)
            drafts[:, i] = cur

        # 2. one batched target verification over g+1 candidates/slot
        cand = np.concatenate(
            [np.asarray(self.last_tok)[:, None], drafts], axis=1)
        vl, self.cache = self._verify_fn(ppb)(self.params,
                                              jnp.asarray(cand), self.cache)
        vl_np = np.asarray(vl)                           # (B, g+1, V)
        greedy = np.argmax(vl_np, -1)                    # (B, g+1)

        # 3. per-slot acceptance, emission, EOS/budget bookkeeping
        new_len = n_before + g + 1  # verify advanced everyone; fix below
        full_accept = np.zeros(self.n_slots, bool)
        n_emitted = 0
        for slot in range(self.n_slots):
            if not self.active[slot]:
                new_len[slot] = n_before[slot]
                continue
            if sampled:
                p_rows = _temp_probs(vl_np[slot, :g + 1], self.temperature)
                j, nxt = rejection_accept(drafts[slot], q_all[slot],
                                          p_rows, self._accept_rng)
            else:
                j = 0
                while j < g and drafts[slot, j] == int(greedy[slot, j]):
                    j += 1
                nxt = int(greedy[slot, j])
            full_accept[slot] = j == g
            rid = self.slot_request[slot]
            tokens = [int(self.last_tok[slot])] + \
                [int(t) for t in drafts[slot, :j]]
            done = False
            emitted = 0
            for tok in tokens:
                self.outputs[rid].append(tok)
                self.n_generated[slot] += 1
                emitted += 1
                if ((self.eos_id is not None and tok == self.eos_id)
                        or self.n_generated[slot] >= self.max_new):
                    done = True
                    break
            n_emitted += emitted
            if done:
                self.active[slot] = False
                self.finished[rid] = self.outputs.pop(rid)
                self.slot_request[slot] = None
                new_len[slot] = n_before[slot]  # freed; value is dead
            else:
                self.last_tok[slot] = nxt
                new_len[slot] = n_before[slot] + j + 1

        # 4. target rollback to the accepted lengths
        self.cache = rollback(self.cache, new_len)

        # 5. draft catch-up for full-accept slots (they never saw d_g),
        # then rollback
        catch = full_accept & self.active
        if catch.any():
            _, self.dcache = self._ddecode_fn(ppb)(
                self.draft_params, jnp.asarray(drafts[:, -1]),
                self.dcache, jnp.asarray(catch))
        self.dcache = rollback(self.dcache, new_len)
        self.host_len[:] = new_len
        return n_emitted


class TPContinuousBatcher(ContinuousBatcher):
    """Continuous batching with tensor-parallel serving steps.

    Same scheduler as ContinuousBatcher; the jitted prefill/decode
    steps are shard_mapped over the mesh's "tp" axis with the
    make_tp_serving layout (Megatron param splits, kv-head-sharded page
    pools). The cache starts replicated and settles into its sharded
    layout after the first step (out_specs drive placement)."""

    def __init__(self, params, cfg, n_slots, pages_per_seq, mesh,
                 page_size=128, **kw):
        from tpukern.models.serving import tp_local_cfg

        self.mesh = mesh
        self._lcfg = tp_local_cfg(cfg, mesh.shape["tp"])
        super().__init__(params, cfg, n_slots, pages_per_seq,
                         page_size=page_size, **kw)

    def _decode_fn(self, ppb):
        if ppb not in self._decode_fns:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from tpukern.models.serving import tp_cache_spec
            from tpukern.models.transformer import param_specs

            lcfg = self._lcfg
            cache_spec = tp_cache_spec(self.cache.quantized)

            def fn(p, toks, cache, act):
                return decode_step(p, lcfg, toks, cache, active=act,
                                   pages_per_block=ppb, tp_axis="tp")

            self._decode_fns[ppb] = jax.jit(shard_map(
                fn, mesh=self.mesh,
                in_specs=(param_specs(self.cfg), P(), cache_spec, P()),
                out_specs=(P(), cache_spec), check_vma=False))
        return self._decode_fns[ppb]

    def _prefill_fn(self, bucket, cfg=None):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from tpukern.models.serving import tp_cache_spec
        from tpukern.models.transformer import param_specs

        assert cfg is None, "TP batching is non-speculative"
        if bucket in self._prefill:
            return self._prefill[bucket]
        lcfg = self._lcfg
        cache_spec = tp_cache_spec(self.cache.quantized)

        def fn(params, tokens, true_len, cache, slot):
            view = KVCache(
                cache.k_pages, cache.v_pages,
                jax.lax.dynamic_slice_in_dim(cache.page_table, slot, 1),
                jnp.zeros((1,), jnp.int32),
                cache.k_scales, cache.v_scales, ring=cache.ring)
            logits, view = prefill(params, lcfg, tokens, view,
                                   last_index=true_len[None] - 1,
                                   tp_axis="tp")
            lengths = cache.lengths.at[slot].set(true_len)
            return logits[0], KVCache(view.k_pages, view.v_pages,
                                      cache.page_table, lengths,
                                      view.k_scales, view.v_scales, ring=cache.ring)

        self._prefill[bucket] = jax.jit(shard_map(
            fn, mesh=self.mesh,
            in_specs=(param_specs(self.cfg), P(), P(), cache_spec, P()),
            out_specs=(P(), cache_spec), check_vma=False))
        return self._prefill[bucket]

    def _chunked_admit_fn(self):
        if self._chunk_fn is not None:
            return self._chunk_fn
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from tpukern.models.serving import tp_cache_spec
        from tpukern.models.transformer import param_specs

        lcfg = self._lcfg
        cache_spec = tp_cache_spec(self.cache.quantized)

        def fn(params, tokens, true_n, cache, slot, start):
            view = KVCache(
                cache.k_pages, cache.v_pages,
                jax.lax.dynamic_slice_in_dim(cache.page_table, slot, 1),
                start[None],
                cache.k_scales, cache.v_scales, ring=cache.ring)
            logits, view = verify_step(params, lcfg, tokens, view,
                                       tp_axis="tp")
            lengths = cache.lengths.at[slot].set(start + true_n)
            new_cache = KVCache(view.k_pages, view.v_pages,
                                cache.page_table, lengths,
                                view.k_scales, view.v_scales, ring=cache.ring)
            return logits[0, true_n - 1], new_cache

        self._chunk_fn = jax.jit(shard_map(
            fn, mesh=self.mesh,
            in_specs=(param_specs(self.cfg), P(), P(), cache_spec, P(),
                      P()),
            out_specs=(P(), cache_spec), check_vma=False))
        return self._chunk_fn


class TPSpeculativeBatcher(SpeculativeBatcher, TPContinuousBatcher):
    """Speculative continuous batching over a ("tp",) mesh.

    Target AND draft serving steps (prefill / decode / gamma draft steps /
    batched verify) are shard_mapped over the mesh's "tp" axis with the
    make_tp_serving layout — Megatron param splits, kv-head-sharded page
    pools for BOTH models' caches. The host-side scheduler, per-slot
    acceptance rule, and the exactness invariants (greedy streams equal
    target-only greedy; sampled marginals equal target-only sampling) are
    inherited unchanged from SpeculativeBatcher. Requires target and
    draft n_kv_heads (and d_ff) divisible by the tp degree."""

    def __init__(self, params, cfg, draft_params, draft_cfg, n_slots,
                 pages_per_seq, mesh, **kw):
        from tpukern.models.serving import tp_local_cfg

        # mesh flows to TPContinuousBatcher.__init__ through the MRO
        # (SpeculativeBatcher passes **kw up); the draft's tp-local cfg
        # must exist before any draft fn is built
        self._dlcfg = tp_local_cfg(draft_cfg, mesh.shape["tp"])
        super().__init__(params, cfg, draft_params, draft_cfg, n_slots,
                         pages_per_seq, mesh=mesh, **kw)

    def _ddecode_fn(self, ppb):
        if ppb not in self._ddecode_fns:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from tpukern.models.serving import tp_cache_spec
            from tpukern.models.transformer import param_specs

            dlcfg = self._dlcfg
            cache_spec = tp_cache_spec(self.dcache.quantized)

            def fn(p, toks, cache, act):
                return decode_step(p, dlcfg, toks, cache, active=act,
                                   pages_per_block=ppb, tp_axis="tp")

            self._ddecode_fns[ppb] = jax.jit(shard_map(
                fn, mesh=self.mesh,
                in_specs=(param_specs(self.draft_cfg), P(), cache_spec,
                          P()),
                out_specs=(P(), cache_spec), check_vma=False))
        return self._ddecode_fns[ppb]

    def _verify_fn(self, ppb):
        if ppb not in self._verify_fns:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from tpukern.models.serving import tp_cache_spec
            from tpukern.models.transformer import param_specs

            lcfg = self._lcfg
            cache_spec = tp_cache_spec(self.cache.quantized)

            def fn(p, toks, cache):
                return verify_step(p, lcfg, toks, cache,
                                   pages_per_block=ppb, tp_axis="tp")

            self._verify_fns[ppb] = jax.jit(shard_map(
                fn, mesh=self.mesh,
                in_specs=(param_specs(self.cfg), P(), cache_spec),
                out_specs=(P(), cache_spec), check_vma=False))
        return self._verify_fns[ppb]

    def _prefill_fn(self, bucket, cfg=None):
        # target admission: TPContinuousBatcher's shard_mapped prefill
        if cfg is None or cfg is self.cfg:
            return TPContinuousBatcher._prefill_fn(self, bucket)
        # draft admission: same single-slot-view prefill, draft layout
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from tpukern.models.serving import tp_cache_spec
        from tpukern.models.transformer import param_specs

        key = (bucket, cfg)
        if key in self._prefill:
            return self._prefill[key]
        dlcfg = self._dlcfg
        cache_spec = tp_cache_spec(self.dcache.quantized)

        def fn(params, tokens, true_len, cache, slot):
            view = KVCache(
                cache.k_pages, cache.v_pages,
                jax.lax.dynamic_slice_in_dim(cache.page_table, slot, 1),
                jnp.zeros((1,), jnp.int32),
                cache.k_scales, cache.v_scales, ring=cache.ring)
            logits, view = prefill(params, dlcfg, tokens, view,
                                   last_index=true_len[None] - 1,
                                   tp_axis="tp")
            lengths = cache.lengths.at[slot].set(true_len)
            return logits[0], KVCache(view.k_pages, view.v_pages,
                                      cache.page_table, lengths,
                                      view.k_scales, view.v_scales,
                                      ring=cache.ring)

        self._prefill[key] = jax.jit(shard_map(
            fn, mesh=self.mesh,
            in_specs=(param_specs(cfg), P(), P(), cache_spec, P()),
            out_specs=(P(), cache_spec), check_vma=False))
        return self._prefill[key]
