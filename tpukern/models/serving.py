"""Serving path: prefill + continuous decode over a paged KV cache.

The reference stops at kernels; its serving-adjacent pieces are the
Triton paged-FA / prefix-prefill kernels (kernels/openai-triton/). This
module is the driver those kernels imply: a paged KV cache per layer, a
prefill step that runs the causal Pallas FA-2 kernel over the prompt and
writes K/V into pages, and a decode step that runs the paged-decode
Pallas kernel per layer (ops/paged_attention.py) — the vLLM-style
continuous-batching layout (each sequence owns a row of logical pages
mapped to physical pages).

All shapes are static (XLA-friendly): B_max sequences, fixed page pool.
"""

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from tpukern.models.transformer import Config
from tpukern.ops.attention import flash_attention
from tpukern.ops.paged_attention import paged_attention
from tpukern.ops.rmsnorm import rms_norm
from tpukern.ops.rope import make_cos_sin, rope_cached


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    k_pages: Any      # (L, Hkv, P, page, D)
    v_pages: Any      # (L, Hkv, P, page, D)
    page_table: Any   # (B, pages_per_seq) int32 physical page ids
    lengths: Any      # (B,) int32 live tokens per sequence
    # quantized tier (int8 or fp8-e4m3 pools): per-token dequant scales
    # (L, Hkv, P, page) f32, None for float pools (2x context per HBM
    # byte; int8 also decodes faster via the s8s8s32 MXU score path —
    # see BENCH_NOTES)
    k_scales: Any = None
    v_scales: Any = None
    # rolling-buffer (Mistral-style) sliding-window cache: token at
    # absolute position p lives in page slot p mod ring_tokens, so HBM
    # is bounded by the window, not the history (static: selects the
    # wrapped write path and the kernels' slot->position recovery)
    ring: bool = dataclasses.field(default=False,
                                   metadata=dict(static=True))

    @property
    def page_size(self):
        return self.k_pages.shape[3]

    @property
    def ring_tokens(self):
        return self.page_table.shape[1] * self.page_size

    @property
    def quantized(self):
        return self.k_scales is not None


def init_cache(cfg: Config, batch, pages_per_seq, page_size=128,
               dtype=jnp.bfloat16, ring=False):
    """Fixed page pool; sequence b owns physical pages
    [b*pages_per_seq, (b+1)*pages_per_seq) — the identity mapping a real
    allocator would replace (the kernel only sees the table).

    dtype=jnp.int8 (or jnp.float8_e4m3fn) allocates the quantized tier:
    1-byte pools plus per-token scale pools; the serving steps then
    write tokens row-quantized and attend with the quantized paged
    kernels. int8 additionally gets the s8s8s32 MXU score path; fp8 is
    a storage-only tier on v5e (casts are software-expanded,
    BENCH_NOTES) aimed at hardware with native fp8 ALUs.

    ring=True (requires cfg.window) makes the pool a rolling buffer:
    writes wrap at pages_per_seq * page_size tokens and the paged
    kernels recover absolute positions from the slot index, so a
    sequence can generate past the pool size with HBM bounded by the
    window. Size the pool >= window + the longest verify/chunk T."""
    from tpukern.core import round_up
    Hkv, D = cfg.n_kv_heads, cfg.head_dim
    P = batch * pages_per_seq
    if ring:
        assert cfg.window is not None, "ring cache requires cfg.window"
        need = cfg.window + int(cfg.sinks or 0)
        assert need <= pages_per_seq * page_size, (
            f"ring capacity {pages_per_seq * page_size} < window + sinks "
            f"{need}")
    # head dim padded to the 128-lane tile: Mosaic requires page slices
    # lane-aligned in HBM (pad columns are zero and sliced off by the
    # kernels; _write_tokens writes D columns at offset 0)
    shape = (cfg.n_layers, Hkv, P, page_size, round_up(D, 128))
    table = jnp.arange(P, dtype=jnp.int32).reshape(batch, pages_per_seq)
    quant = jnp.dtype(dtype) in (jnp.dtype(jnp.int8),
                                 jnp.dtype(jnp.float8_e4m3fn))
    if jnp.dtype(dtype) == jnp.dtype(jnp.float8_e4m3fn):
        # measured 0.30x of bf16 decode on v5e (BENCH_NOTES r2: casts are
        # software-expanded without a native fp8 ALU) — int8 gives the
        # same 2x pool capacity AND beats bf16 latency there
        import warnings
        warnings.warn(
            "fp8-e4m3 KV pools are a decode-latency regression on "
            "TPU v5e (no native fp8 ALU); use dtype=jnp.int8 unless "
            "targeting fp8-native hardware", stacklevel=2)
    if cfg.pv_int8 and jnp.dtype(dtype) != jnp.dtype(jnp.int8):
        # mirror the kernel-level assert (paged_attention.py pv_int8):
        # the all-int8 PV path only exists for int8 pools — silently
        # ignoring the flag would hand the user neither error nor speedup
        raise ValueError(
            f"Config.pv_int8=True requires an int8 KV cache, got "
            f"dtype={jnp.dtype(dtype).name}")
    return KVCache(
        k_pages=jnp.zeros(shape, dtype),
        v_pages=jnp.zeros(shape, dtype),
        page_table=table,
        lengths=jnp.zeros((batch,), jnp.int32),
        k_scales=jnp.zeros(shape[:4], jnp.float32) if quant else None,
        v_scales=jnp.zeros(shape[:4], jnp.float32) if quant else None,
        ring=ring,
    )


def _pages_per_block(pages_per_seq, max_live_pages=None):
    """Page-DMA batch size that divides the sequence's page count.
    Bigger batches amortize grid-step overhead (v5e: ppb 4 -> 8 -> 16
    measured 174 -> 145 -> 121 us at the long-context decode shape), but
    skip granularity is a whole block: at short contexts a big block
    DMAs pages past the live range for nothing. With a max_live_pages
    hint (host-known in the serving drivers), pick the largest batch
    that still fits the live range — the per-step waste is then bounded
    by one partial block. Candidates are powers of two, so a driver
    compiles at most 4 kernel variants."""
    cands = [d for d in (8, 4, 2, 1) if pages_per_seq % d == 0]
    if max_live_pages is not None:
        fit = [d for d in cands if d <= max(int(max_live_pages), 1)]
        if fit:
            return fit[0]
    return cands[0]


def _write_tokens(pages, layer, new, table, start, ring=False,
                  sinks=0):
    """Scatter new (B, Hkv, T, D) tokens into the page pool at positions
    start[b] .. start[b]+T-1 of each sequence (mod the pool size for a
    ring cache)."""
    B, Hkv, T, D = new.shape
    page_size = pages.shape[3]

    pages_per_seq = table.shape[1]
    max_pos = pages_per_seq * page_size - 1

    def per_seq(pages, new_b, table_b, start_b):
        def per_tok(pages, t):
            # clamp so a full sequence can't index past its page range
            # (an inactive slot's write lands un-clamped at its current
            # length — safe only because that position is always
            # overwritten before the slot's length ever reaches it);
            # a ring cache wraps instead of clamping (sink slots are
            # pinned; only the remaining region rotates)
            if ring:
                pp = start_b + t
                if sinks:
                    pos = jnp.where(
                        pp < sinks, pp,
                        sinks + jnp.remainder(pp - sinks,
                                              max_pos + 1 - sinks))
                else:
                    pos = jnp.remainder(pp, max_pos + 1)
            else:
                pos = jnp.minimum(start_b + t, max_pos)
            phys = table_b[pos // page_size]
            pages = jax.lax.dynamic_update_slice(
                pages,
                new_b[:, t][None, :, None, None, :].astype(pages.dtype),
                (layer, 0, phys, pos % page_size, 0))
            return pages, None
        pages, _ = jax.lax.scan(per_tok, pages, jnp.arange(T))
        return pages

    for b in range(B):  # static, small
        pages = per_seq(pages, new[b], table[b], start[b])
    return pages


def _write_tokens_quantized(pages, scales, layer, new, table, start,
                            ring=False, sinks=0):
    """Row-quantize new (B, Hkv, T, D) tokens to the pool's 1-byte dtype
    (int8 or fp8-e4m3) and scatter values + per-token scales into the
    quantized pool (same indexing discipline as _write_tokens)."""
    from tpukern.ops.quant import quantize_fp8_ref, quantize_ref
    B, Hkv, T, D = new.shape
    qfn = (quantize_ref if pages.dtype == jnp.int8 else quantize_fp8_ref)
    vals, s = qfn(new.reshape(B * Hkv * T, D).astype(jnp.float32))
    vals = vals.reshape(B, Hkv, T, D)
    s = s.reshape(B, Hkv, T).astype(jnp.float32)
    page_size = pages.shape[3]
    pages_per_seq = table.shape[1]
    max_pos = pages_per_seq * page_size - 1

    def per_seq(carry, new_b, s_b, table_b, start_b):
        def per_tok(carry, t):
            pages, scales = carry
            if ring:
                pp = start_b + t
                if sinks:
                    pos = jnp.where(
                        pp < sinks, pp,
                        sinks + jnp.remainder(pp - sinks,
                                              max_pos + 1 - sinks))
                else:
                    pos = jnp.remainder(pp, max_pos + 1)
            else:
                pos = jnp.minimum(start_b + t, max_pos)
            phys = table_b[pos // page_size]
            pages = jax.lax.dynamic_update_slice(
                pages, new_b[:, t][None, :, None, None, :],
                (layer, 0, phys, pos % page_size, 0))
            scales = jax.lax.dynamic_update_slice(
                scales, s_b[:, t][None, :, None, None],
                (layer, 0, phys, pos % page_size))
            return (pages, scales), None
        carry, _ = jax.lax.scan(per_tok, carry, jnp.arange(T))
        return carry

    carry = (pages, scales)
    for b in range(B):
        carry = per_seq(carry, vals[b], s[b], table[b], start[b])
    return carry


def _write_kv(cache, k_pages, v_pages, k_scales, v_scales, layer, k, v,
              start, sinks=0):
    """Write one layer's new K/V tokens via the cache's tier (float
    passthrough or int8 row-quantized)."""
    sinks = int(sinks or 0)
    if cache.quantized:
        k_pages, k_scales = _write_tokens_quantized(
            k_pages, k_scales, layer, k, cache.page_table, start,
            ring=cache.ring, sinks=sinks)
        v_pages, v_scales = _write_tokens_quantized(
            v_pages, v_scales, layer, v, cache.page_table, start,
            ring=cache.ring, sinks=sinks)
    else:
        k_pages = _write_tokens(k_pages, layer, k, cache.page_table,
                                start, ring=cache.ring, sinks=sinks)
        v_pages = _write_tokens(v_pages, layer, v, cache.page_table,
                                start, ring=cache.ring, sinks=sinks)
    return k_pages, v_pages, k_scales, v_scales


def _rope_at(x_rows, pos_rows, max_pos):
    """RoPE at arbitrary positions: gather the cached cos/sin tables at
    pos_rows and run the library's cached-table kernel."""
    D = x_rows.shape[-1]
    cos, sin = make_cos_sin(max_pos, D)
    return rope_cached(x_rows, cos[pos_rows], sin[pos_rows])


def quantize_model_weights(params):
    """Weight-only int8 (w8a16) serving tier: every 2-D projection
    matrix (wq/wk/wv/wo/w1/w2 and the LM head) becomes
    {"q": int8, "s": per-column f32} and the forward routes those
    through ops/matmul_w8a16.py — half the weight HBM bytes per decode
    step. Embedding and norm scales stay full precision. Serving-only
    (the training step wants gradients w.r.t. full-precision weights)."""
    from tpukern.ops.matmul_w8a16 import quantize_weights

    def q(w):
        qq, s = quantize_weights(w)
        return {"q": qq, "s": s}

    out = dict(params)
    out["head"] = q(params["head"])
    out["layers"] = [
        {k: (q(v) if k in ("wq", "wk", "wv", "wo", "w1", "w2") else v)
         for k, v in lp.items()}
        for lp in params["layers"]
    ]
    return out


def _wmm(h2, w):
    """h2 @ w for full-precision weights, or the w8a16 kernel when w is
    a quantized {"q", "s"} pair (quantize_model_weights)."""
    if isinstance(w, dict):
        from tpukern.ops.matmul_w8a16 import matmul_w8a16
        return matmul_w8a16(h2, w["q"], w["s"])
    return h2 @ w


def _layer_qkv(h, lp, cfg: Config, positions):
    """Project + rope one batch of hidden states h (B, T, d);
    positions (B, T) are the absolute cache positions of each token."""
    B, T, d = h.shape
    Dh, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    max_pos = cfg.max_seq
    h2 = h.reshape(B * T, d)
    q = _wmm(h2, lp["wq"]).reshape(B, T, Hq, Dh).transpose(0, 2, 1, 3)
    k = _wmm(h2, lp["wk"]).reshape(B, T, Hkv, Dh).transpose(0, 2, 1, 3)
    v = _wmm(h2, lp["wv"]).reshape(B, T, Hkv, Dh).transpose(0, 2, 1, 3)

    def pos_rows(nh):
        return jnp.broadcast_to(positions[:, None, :], (B, nh, T)
                                ).reshape(-1)

    q = _rope_at(q.reshape(B * Hq * T, Dh), pos_rows(Hq), max_pos
                 ).reshape(B, Hq, T, Dh)
    k = _rope_at(k.reshape(B * Hkv * T, Dh), pos_rows(Hkv), max_pos
                 ).reshape(B, Hkv, T, Dh)
    return q, k, v


def _mlp(h, lp):
    return _wmm(jax.nn.gelu(_wmm(h, lp["w1"])), lp["w2"])


def prefill(params, cfg: Config, tokens, cache: KVCache, last_index=None,
            tp_axis=None):
    """Process a full prompt (B, T): causal FA-2 over the prompt, write
    K/V into the cache pages, return next-token logits (B, vocab).

    last_index (B,) int32 selects which position's hidden state feeds the
    logits (default T-1) — continuous batching pads prompts to a bucket
    length and reads the logits at the true last token."""
    B, T = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0)
    start = cache.lengths
    positions = start[:, None] + jnp.arange(T)[None, :]
    k_pages, v_pages = cache.k_pages, cache.v_pages
    k_scales, v_scales = cache.k_scales, cache.v_scales
    for li, lp in enumerate(params["layers"]):
        hn = rms_norm(h.reshape(B * T, -1), lp["ln1"]).reshape(h.shape)
        q, k, v = _layer_qkv(hn, lp, cfg, positions)
        o = flash_attention(q, k, v, causal=True, window=cfg.window,
                            sinks=cfg.sinks, softcap=cfg.softcap)
        o = _wmm(o.transpose(0, 2, 1, 3).reshape(B * T, -1), lp["wo"])
        if tp_axis is not None:  # wo is row-split: sum the partials
            o = jax.lax.psum(o, tp_axis)
        h = h + o.reshape(B, T, -1)
        hn = rms_norm(h.reshape(B * T, -1), lp["ln2"]).reshape(h.shape)
        mlp = _mlp(hn.reshape(B * T, -1), lp)
        if tp_axis is not None:  # w2 is row-split
            mlp = jax.lax.psum(mlp, tp_axis)
        h = h + mlp.reshape(h.shape)
        k_pages, v_pages, k_scales, v_scales = _write_kv(
            cache, k_pages, v_pages, k_scales, v_scales, li, k, v, start,
            sinks=cfg.sinks)
    if last_index is None:
        h_last = h[:, -1]
    else:
        h_last = jnp.take_along_axis(
            h, last_index[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    hn = rms_norm(h_last, params["lnf"])
    logits = _wmm(hn, params["head"]).astype(jnp.float32)
    n_new = T if last_index is None else last_index + 1
    new_cache = dataclasses.replace(
        cache, k_pages=k_pages, v_pages=v_pages,
        lengths=cache.lengths + n_new, k_scales=k_scales,
        v_scales=v_scales)
    return logits, new_cache


def decode_step(params, cfg: Config, last_tokens, cache: KVCache,
                active=None, pages_per_block=None, tp_axis=None):
    """One continuous-batching decode step: last_tokens (B,) -> logits
    (B, vocab). Attention runs the paged-decode Pallas kernel against the
    page pool (ops/paged_attention.py). active (B,) bool masks which
    slots advance (inactive slots' lengths don't move; their page writes
    land at the frozen length position, which stays dead — it is
    overwritten by the next real token before the length covers it).
    pages_per_block (static) overrides the DMA batch pick — serving
    drivers pass a length-aware value (_pages_per_block hint)."""
    from tpukern.ops.paged_attention import paged_attention_quantized
    B = last_tokens.shape[0]
    h = jnp.take(params["embed"], last_tokens, axis=0)[:, None, :]  # (B,1,d)
    positions = cache.lengths[:, None]  # (B, 1)
    k_pages, v_pages = cache.k_pages, cache.v_pages
    k_scales, v_scales = cache.k_scales, cache.v_scales
    for li, lp in enumerate(params["layers"]):
        hn = rms_norm(h.reshape(B, -1), lp["ln1"]).reshape(h.shape)
        q, k, v = _layer_qkv(hn, lp, cfg, positions)
        k_pages, v_pages, k_scales, v_scales = _write_kv(
            cache, k_pages, v_pages, k_scales, v_scales, li, k, v,
            cache.lengths, sinks=cfg.sinks)
        ppb = (pages_per_block if pages_per_block is not None
               else _pages_per_block(cache.page_table.shape[1]))
        if cache.quantized:
            # s8s8s32 MXU score path: measured faster than bf16 pages
            # at the decode shape (BENCH_NOTES)
            o = paged_attention_quantized(
                q[:, :, 0], k_pages[li], k_scales[li], v_pages[li],
                v_scales[li], cache.lengths + 1, cache.page_table,
                pages_per_block=ppb, window=cfg.window,
                softcap=cfg.softcap, ring=cache.ring, sinks=cfg.sinks,
                q_int8=k_pages.dtype == jnp.int8,
                pv_int8=cfg.pv_int8 and v_pages.dtype == jnp.int8)
        else:
            o = paged_attention(q[:, :, 0], k_pages[li], v_pages[li],
                                cache.lengths + 1, cache.page_table,
                                pages_per_block=ppb, window=cfg.window,
                                softcap=cfg.softcap, ring=cache.ring,
                                sinks=cfg.sinks)
        o = _wmm(o.reshape(B, -1), lp["wo"])
        if tp_axis is not None:
            o = jax.lax.psum(o, tp_axis)
        h = h + o.reshape(h.shape)
        hn = rms_norm(h.reshape(B, -1), lp["ln2"]).reshape(h.shape)
        mlp = _mlp(hn.reshape(B, -1), lp)
        if tp_axis is not None:
            mlp = jax.lax.psum(mlp, tp_axis)
        h = h + mlp.reshape(h.shape)
    hn = rms_norm(h[:, 0], params["lnf"])
    logits = _wmm(hn, params["head"]).astype(jnp.float32)
    adv = 1 if active is None else active.astype(jnp.int32)
    new_cache = dataclasses.replace(
        cache, k_pages=k_pages, v_pages=v_pages,
        lengths=cache.lengths + adv, k_scales=k_scales,
        v_scales=v_scales)
    return logits, new_cache


def verify_step(params, cfg: Config, tokens, cache: KVCache,
                pages_per_block=None, tp_axis=None):
    """Score T tokens in one pass against the paged cache: writes their
    K/V into the pages, runs the paged prefix-prefill kernel per layer
    (token t sees the cache prefix + tokens <= t), and returns logits at
    EVERY position (B, T, vocab) — the speculative-decoding verification
    step (and chunked-prefill continuation). pages_per_block as in
    decode_step."""
    from tpukern.ops.paged_attention import (
        paged_prefill_attention, paged_prefill_attention_quantized)
    B, T = tokens.shape
    h = jnp.take(params["embed"], tokens, axis=0)
    start = cache.lengths
    positions = start[:, None] + jnp.arange(T)[None, :]
    k_pages, v_pages = cache.k_pages, cache.v_pages
    k_scales, v_scales = cache.k_scales, cache.v_scales
    for li, lp in enumerate(params["layers"]):
        hn = rms_norm(h.reshape(B * T, -1), lp["ln1"]).reshape(h.shape)
        q, k, v = _layer_qkv(hn, lp, cfg, positions)
        k_pages, v_pages, k_scales, v_scales = _write_kv(
            cache, k_pages, v_pages, k_scales, v_scales, li, k, v,
            start, sinks=cfg.sinks)
        ppb = (pages_per_block if pages_per_block is not None
               else _pages_per_block(cache.page_table.shape[1]))
        if cache.quantized:
            o = paged_prefill_attention_quantized(
                q, k_pages[li], k_scales[li], v_pages[li], v_scales[li],
                start + T, cache.page_table, pages_per_block=ppb,
                window=cfg.window, softcap=cfg.softcap, ring=cache.ring,
                sinks=cfg.sinks,
                q_int8=k_pages.dtype == jnp.int8,
                pv_int8=cfg.pv_int8 and v_pages.dtype == jnp.int8)
        else:
            o = paged_prefill_attention(q, k_pages[li], v_pages[li],
                                        start + T, cache.page_table,
                                        pages_per_block=ppb,
                                        window=cfg.window,
                                        softcap=cfg.softcap,
                                        ring=cache.ring,
                                        sinks=cfg.sinks)
        o = _wmm(o.transpose(0, 2, 1, 3).reshape(B * T, -1), lp["wo"])
        if tp_axis is not None:
            o = jax.lax.psum(o, tp_axis)
        h = h + o.reshape(B, T, -1)
        hn = rms_norm(h.reshape(B * T, -1), lp["ln2"]).reshape(h.shape)
        mlp = _mlp(hn.reshape(B * T, -1), lp)
        if tp_axis is not None:
            mlp = jax.lax.psum(mlp, tp_axis)
        h = h + mlp.reshape(h.shape)
    hn = rms_norm(h.reshape(B * T, -1), params["lnf"])
    logits = _wmm(hn, params["head"]).astype(jnp.float32).reshape(B, T, -1)
    new_cache = dataclasses.replace(
        cache, k_pages=k_pages, v_pages=v_pages,
        lengths=cache.lengths + T, k_scales=k_scales,
        v_scales=v_scales)
    return logits, new_cache


def share_prefix(cache: KVCache, src_slot, dst_slots, prefix_len):
    """vLLM-style prefix caching: alias src_slot's first `prefix_len`
    cache positions into each dst slot via the page table — full pages
    are shared read-only (one physical copy serves every request with
    the same prompt prefix); the trailing partial page is copied into
    the dst slot's own page (copy-on-write: the continuation writes
    into it). dst lengths are set to prefix_len; dst decoding proceeds
    normally from there.

    Safe because serving only ever writes at positions >= length: the
    aliased full pages are read-only for dst slots by construction.
    Incompatible with ring pools (wrapping would overwrite shared
    pages). src_slot/dst_slots/prefix_len are host ints (the batcher's
    admission path is host-driven)."""
    assert not cache.ring, "prefix sharing needs a non-ring pool"
    page = cache.page_size
    pps = cache.page_table.shape[1]
    full, rem = divmod(int(prefix_len), page)
    table = cache.page_table
    k_pages, v_pages = cache.k_pages, cache.v_pages
    k_scales, v_scales = cache.k_scales, cache.v_scales
    lengths = cache.lengths
    assert src_slot not in dst_slots
    src_pages = table[src_slot, :full]
    for d in dst_slots:
        # reset the dst row to its identity pages first: a recycled slot
        # may still carry aliases from an earlier share, and writes must
        # land in pages this slot owns
        own = jnp.arange(d * pps, (d + 1) * pps, dtype=jnp.int32)
        table = table.at[d].set(own)
        if full:
            table = table.at[d, :full].set(src_pages)
        if rem:
            sp = table[src_slot, full]
            dp = d * pps + full             # dst's own physical page
            k_pages = k_pages.at[:, :, dp, :rem].set(
                k_pages[:, :, sp, :rem])
            v_pages = v_pages.at[:, :, dp, :rem].set(
                v_pages[:, :, sp, :rem])
            if cache.quantized:
                k_scales = k_scales.at[:, :, dp, :rem].set(
                    k_scales[:, :, sp, :rem])
                v_scales = v_scales.at[:, :, dp, :rem].set(
                    v_scales[:, :, sp, :rem])
        lengths = lengths.at[d].set(prefix_len)
    return dataclasses.replace(
        cache, k_pages=k_pages, v_pages=v_pages, page_table=table,
        lengths=lengths, k_scales=k_scales, v_scales=v_scales)


def prefill_prefix(params, cfg: Config, prompt, cache: KVCache, slot=0,
                   tp_axis=None):
    """Prefill ONE slot's prompt on a single-slot view of the shared
    cache (the batcher's admission pattern) — the producer half of
    share_prefix. Returns (next-token logits (vocab,), cache)."""
    view = dataclasses.replace(
        cache,
        page_table=jax.lax.dynamic_slice_in_dim(
            cache.page_table, slot, 1),
        lengths=jnp.zeros((1,), jnp.int32))
    logits, view = prefill(params, cfg, prompt[None], view,
                           tp_axis=tp_axis)
    return logits[0], dataclasses.replace(
        cache, k_pages=view.k_pages, v_pages=view.v_pages,
        lengths=cache.lengths.at[slot].set(prompt.shape[0]),
        k_scales=view.k_scales, v_scales=view.v_scales)


def rollback(cache: KVCache, new_lengths):
    """Functional cache rewind: positions beyond new_lengths become dead
    (they're overwritten before ever being read — the kernels mask
    pos >= length).

    Ring caches: a rewound token's slot may have clobbered the token one
    lap older; that older position re-enters reads only if it is still
    inside the window, which cannot happen when ring_tokens >= window +
    max speculation depth (the init_cache sizing rule) — under that
    rule rollback is exact for ring pools too."""
    return dataclasses.replace(
        cache, lengths=jnp.asarray(new_lengths, jnp.int32))


def generate(params, cfg: Config, prompt, n_steps, pages_per_seq=8,
             page_size=128, greedy=True, key=None,
             temperature=1.0, top_k=0, top_p=1.0, min_p=0.0,
             cache_dtype=jnp.bfloat16, ring=False):
    """Prefill the prompt then decode n_steps tokens (greedy or sampled).
    Returns (B, n_steps) generated token ids. cache_dtype=jnp.int8
    serves from the quantized KV tier. With any of top_k/top_p/min_p (or
    temperature != 1) the sampled path runs the fused gumbel-max kernel
    (ops/sampling.py) restricted to that support."""
    B, T = prompt.shape
    cache = init_cache(cfg, B, pages_per_seq, page_size,
                       dtype=cache_dtype, ring=ring)
    logits, cache = prefill(params, cfg, prompt, cache)
    outs = []
    restricted = top_k or top_p < 1.0 or min_p > 0.0 or temperature != 1.0

    def _pick(logits, key):
        if greedy:
            return jnp.argmax(logits, -1).astype(jnp.int32), key
        key, sub = jax.random.split(key)
        if restricted:
            from tpukern.ops.sampling import sample
            seed = jax.random.randint(sub, (), 0, np.int32(2**31 - 1))
            return sample(logits, seed, temperature=temperature,
                          top_k=top_k, top_p=top_p, min_p=min_p), key
        return jax.random.categorical(sub, logits).astype(jnp.int32), key

    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    for i in range(n_steps):
        outs.append(tok)
        logits, cache = decode_step(params, cfg, tok, cache)
        tok, key = _pick(logits, key)
    return jnp.stack(outs, axis=1)


def tp_local_cfg(cfg: Config, tp):
    """Per-device view of cfg under tp-way head sharding: each device
    owns n_heads/tp q heads and n_kv_heads/tp kv heads with the SAME
    head_dim. head_dim is the derived d_model//n_heads, so d_model is
    rescaled to keep it fixed — the serving steps read the true hidden
    width from the (replicated) activations, never from cfg.d_model."""
    assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0, \
        (cfg.n_heads, cfg.n_kv_heads, tp)
    return dataclasses.replace(
        cfg, n_heads=cfg.n_heads // tp, n_kv_heads=cfg.n_kv_heads // tp,
        d_model=cfg.head_dim * (cfg.n_heads // tp))


def tp_cache_spec(quantized, ring=False):
    """PartitionSpec pytree for a KVCache sharded over kv heads (ring
    must match the cache's static ring flag — it is part of the
    treedef)."""
    from jax.sharding import PartitionSpec as P
    sc = P(None, "tp") if quantized else None
    return KVCache(P(None, "tp"), P(None, "tp"), P(), P(), sc, sc,
                   ring=ring)


def make_tp_serving(cfg: Config, mesh, quantized=False,
                    pages_per_block=None, ring=False):
    """Tensor-parallel serving: shard_mapped (prefill, decode, verify)
    over the mesh's "tp" axis.

    Megatron-style layout (same specs the training step uses,
    transformer.param_specs): wq/wk/wv/w1 column-split and wo/w2
    row-split over "tp"; KV page pools (and int8 scale pools) shard over
    the kv-head axis; embeddings/norms/head replicated. Each device runs
    the paged kernels on its local head slice; the only collectives are
    the two psums per layer after the row-split products — decode's ICI
    traffic is 2*L*B*d_model values per step.

    Returns (prefill_fn, decode_fn, verify_fn), jitted:
      prefill_fn(params, tokens, cache, last_index) -> (logits, cache)
      decode_fn(params, last_tokens, cache, active) -> (logits, cache)
      verify_fn(params, tokens, cache)              -> (logits, cache)
    params must be device_put with param_specs-matching shardings (or
    replicated — shard_map reshards). tp must divide n_heads AND
    n_kv_heads. quantized=True builds for the int8 cache tier."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tpukern.models.transformer import param_specs

    tp = mesh.shape["tp"]
    lcfg = tp_local_cfg(cfg, tp)
    p_specs = param_specs(cfg)
    cache_spec = tp_cache_spec(quantized, ring=ring)

    def _prefill(params, tokens, cache, last_index):
        return prefill(params, lcfg, tokens, cache,
                       last_index=last_index, tp_axis="tp")

    def _decode(params, toks, cache, active):
        return decode_step(params, lcfg, toks, cache, active=active,
                           pages_per_block=pages_per_block, tp_axis="tp")

    def _verify(params, tokens, cache):
        return verify_step(params, lcfg, tokens, cache,
                           pages_per_block=pages_per_block, tp_axis="tp")

    prefill_fn = jax.jit(shard_map(
        _prefill, mesh=mesh,
        in_specs=(p_specs, P(), cache_spec, P()),
        out_specs=(P(), cache_spec), check_vma=False))
    decode_fn = jax.jit(shard_map(
        _decode, mesh=mesh,
        in_specs=(p_specs, P(), cache_spec, P()),
        out_specs=(P(), cache_spec), check_vma=False))
    verify_fn = jax.jit(shard_map(
        _verify, mesh=mesh,
        in_specs=(p_specs, P(), cache_spec),
        out_specs=(P(), cache_spec), check_vma=False))
    return prefill_fn, decode_fn, verify_fn
