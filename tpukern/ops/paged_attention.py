"""Paged-KV decode attention: single-token queries against a paged KV cache.

Reference: kernels/openai-triton/ — Triton FA-2 forward with paged KV-cache
(flash_attn_v2_fwd.py:12) and prefix-prefill context attention ± ALiBi
(prefix_prefill.py:12,245, adapted from LightLLM/vLLM). The reference keeps
these as Triton-DSL kernels; the TPU-native counterpart is a Pallas kernel
using scalar-prefetched page tables and async page DMA (the serving-path
pattern of jax.experimental.pallas.ops.tpu.paged_attention, re-implemented
here from the algorithm up).

Design:
- KV lives in HBM as (num_pages, page_size, D) pools per head; a
  (batch, pages_per_seq) page table maps logical to physical pages.
- Grid: (batch, kv_heads, seq blocks). Page indices arrive via
  PrefetchScalarGridSpec so the kernel can DMA exactly the pages of the
  current block; per-page copies run concurrently and double-buffer
  against compute (pallas_guide.md "Async DMA").
- Online softmax across blocks (same recurrence as ops/attention.py), with
  GQA: all q heads of a kv head processed together -> the MXU sees a
  (group, bk) matmul instead of (1, bk) vectors.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import cdiv, use_interpret
from tpukern.core.registry import register

NEG_BIG = -0.7 * 3.4e38


def _pv_accumulate(acc_s, alpha, p, v_slot, vs_slot, *, o_dtype,
                   quantized, pv_int8, apply_row_scale):
    """Shared PV accumulate for the decode and prefix kernels.
    v_slot is the current block's (bk, D) page buffer view.

    pv_int8: s8s8s32 PV pass — fold V's per-token scale into p's columns
    (a (rows, bk) lane multiply), row-quantize p ON-CHIP (p >= 0, so amax
    is a plain row max), and contract int8 p against the RAW int8 V pages
    — no (bk, D) V dequant cast at all, completing the all-int8 MXU path
    started by q_int8. p's per-row scale folds back into the f32
    accumulator after the dot. ~7-bit p resolution; error is relative to
    each row's largest p*v_scale product, i.e. bounded by the terms that
    dominate the softmax sum.
    """
    if quantized and pv_int8:
        p = apply_row_scale(p, vs_slot)
        amax = jnp.max(p, axis=-1, keepdims=True)
        amax = jnp.where(amax <= 0.0, 1.0, amax)
        pq = jnp.round(p * (127.0 / amax)).astype(jnp.int8)
        pv = jax.lax.dot_general(
            pq, v_slot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_s[...] = (acc_s[...] * alpha
                      + pv.astype(jnp.float32) * (amax * (1.0 / 127.0)))
        return
    if quantized:
        # fold V's per-token scale into p's columns (tiny) and cast V
        # (o_dtype, NOT q.dtype — q may be int8 on the MXU score path)
        v = v_slot.astype(o_dtype)
        p = apply_row_scale(p, vs_slot)
    else:
        v = v_slot
    acc_s[...] = (acc_s[...] * alpha
                  + jax.lax.dot_general(
                      p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32,
                      precision=(jax.lax.Precision.HIGHEST
                                 if v.dtype == jnp.float32 else None)))


def _decode_kernel(lengths_ref, tables_ref, *refs,
                   page_size, pages_per_block, mask_value,
                   quantized=False, q_int8=False, pv_int8=False, sm_D=None,
                   window=None, softcap=None, has_alibi=False, ring=None,
                   sinks=0):
    slopes_ref = None
    if has_alibi:
        # per-q-head ALiBi slopes, (Hq,) f32 in SMEM (first input)
        slopes_ref, *refs = refs
    qs_ref = None
    if quantized and q_int8:
        (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, qs_ref, o_ref, k_buf, v_buf,
         ks_buf, vs_buf, m_s, l_s, acc_s, sems) = refs
    elif quantized:
        (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref, k_buf, v_buf,
         ks_buf, vs_buf, m_s, l_s, acc_s, sems) = refs
    else:
        (q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf,
         m_s, l_s, acc_s, sems) = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    blk = pl.program_id(2)
    n_blk = pl.num_programs(2)
    bk = page_size * pages_per_block
    length = lengths_ref[b]
    group, D = q_ref.shape[2], q_ref.shape[3]
    pages_per_seq = n_blk * pages_per_block

    @pl.when(blk == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, NEG_BIG)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    def valid(t):
        v = t * bk < length
        if window is not None and ring is None:
            # sliding window: blocks entirely older than the window skip
            # both their DMA and their compute (with a ring buffer every
            # live slot is inside the window by construction)
            in_band = (t + 1) * bk - 1 >= length - window
            if sinks:
                # attention-sink blocks always stay live (StreamingLLM)
                in_band = jnp.logical_or(in_band, t * bk < sinks)
            v = jnp.logical_and(v, in_band)
        return v

    def fetch(t, slot):
        """Copy descriptors for block t into buffer slot (0/1). Scales
        land in LANE slices of an (8, bk) row buffer so they can multiply
        the (group, bk) score row directly (no per-(bk, D) dequant
        multiply — see the compute below)."""
        cps = []
        for p in range(pages_per_block):
            page = tables_ref[b * pages_per_seq + t * pages_per_block + p]
            cps.append(pltpu.make_async_copy(
                k_hbm.at[h, page], k_buf.at[slot, p], sems.at[0, slot, p]))
            cps.append(pltpu.make_async_copy(
                v_hbm.at[h, page], v_buf.at[slot, p], sems.at[1, slot, p]))
            if quantized:
                cps.append(pltpu.make_async_copy(
                    ks_hbm.at[h, page], ks_buf.at[slot, p],
                    sems.at[2, slot, p]))
                cps.append(pltpu.make_async_copy(
                    vs_hbm.at[h, page], vs_buf.at[slot, p],
                    sems.at[3, slot, p]))
        return cps

    def apply_row_scale(x, scales):
        """x (rows, bk) * per-token scales (ppb, page), applied per
        static page segment (lane-aligned value slices — no cross-
        sublane/lane relayout needed)."""
        segs = [x[:, i * page_size:(i + 1) * page_size]
                * scales[i][None, :]
                for i in range(pages_per_block)]
        return segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)

    # double-buffered page pipeline: block t's pages were started at step
    # t-1 (or at t==0 below); start block t+1's DMAs BEFORE waiting on
    # t's, so the fetch of the next block overlaps this block's compute
    run = valid(blk)
    slot = blk % 2

    @pl.when(jnp.logical_and(blk == 0, run))
    def _():
        for c in fetch(0, 0):
            c.start()

    nxt = blk + 1

    @pl.when(jnp.logical_and(nxt < n_blk, valid(nxt)))
    def _():
        for c in fetch(nxt, nxt % 2):
            c.start()

    @pl.when(run)
    def _():
        for c in fetch(blk, slot):
            c.wait()

        q = q_ref[0, 0]                                   # (group, D)
        if quantized and q_int8:
            # s8s8s32 MXU path: q was row-quantized at the XLA boundary,
            # so the score dot runs entirely in int8 (no (bk, D) K cast
            # at all); both scales fold into the f32 score row
            k = k_buf[slot].reshape(bk, D)
            s32 = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)         # (group, bk)
            s = s32.astype(jnp.float32) * qs_ref[0, 0][:, :1]
        else:
            if quantized:
                # cast-only dequant: quantized values are exact in bf16
                # (int8 magnitudes <= 127), so cast once and fold the
                # per-token scale into the SCORE row afterwards — a
                # (group, bk) lane multiply instead of a (bk, D) pass
                k = k_buf[slot].astype(q.dtype).reshape(bk, D)
            else:
                k = k_buf[slot].reshape(bk, D)
            # all-f32 dots get true-f32 MXU passes (TPU DEFAULT runs f32
            # through bf16 multiplies, ~1e-3 relative); HIGHEST on a bf16
            # operand is REJECTED by Mosaic, so key on both dtypes
            prec = (jax.lax.Precision.HIGHEST
                    if q.dtype == jnp.float32 and k.dtype == jnp.float32
                    else None)
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                           # (group, bk)
        if quantized:
            s = apply_row_scale(s, ks_buf[slot])
        s *= 1.0 / math.sqrt(sm_D if sm_D is not None else D)
        if softcap is not None:
            # Gemma-style logit cap, matching the training kernels
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        pos = blk * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if ring is not None:
            # rolling-buffer cache: ring-region slot s holds the newest
            # token with position == s (mod R); recover it as the
            # largest p <= length-1 congruent to s. Slots never written
            # (first lap) recover a position outside the slot's region
            # and mask away. With sinks, slots < sinks are pinned
            # (position == slot) and only the remaining R = ring - sinks
            # slots rotate.
            R = ring - sinks
            slot_idx = pos
            ring_pos = (length - 1) - jnp.remainder(
                length - 1 - slot_idx, R)
            if sinks:
                pos = jnp.where(slot_idx < sinks, slot_idx, ring_pos)
                pos = jnp.where(
                    jnp.logical_and(slot_idx >= sinks, ring_pos < sinks),
                    -1, pos)
            else:
                pos = ring_pos
        if has_alibi:
            # ALiBi: s += slope_g * (k_pos - q_pos), q_pos = length - 1
            # (reference kernels/openai-triton/prefix_prefill_alibi.py).
            # Rows are the GQA group's q heads: build the per-row slope
            # column from SMEM scalars via an unrolled one-hot sum.
            rowi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            slope = jnp.zeros_like(s)
            for g in range(group):
                slope += jnp.where(rowi == g,
                                   slopes_ref[h * group + g], 0.0)
            s = s + slope * (pos - (length - 1)).astype(jnp.float32)
        s = jnp.where(jnp.logical_and(pos >= 0, pos < length), s,
                      mask_value)
        if window is not None:
            keep = pos >= length - window
            if sinks:
                keep = jnp.logical_or(keep, pos < sinks)
            s = jnp.where(keep, s, mask_value)

        m_prev = m_s[:, :1]
        l_prev = l_s[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_s[:, :1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_s[:, :1] = m_next
        _pv_accumulate(
            acc_s, alpha, p, v_buf[slot].reshape(bk, D),
            vs_buf[slot] if quantized else None,
            o_dtype=o_ref.dtype, quantized=quantized,
            pv_int8=pv_int8, apply_row_scale=apply_row_scale)

    @pl.when(blk == n_blk - 1)
    def _():
        l = l_s[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_s[...] * l_inv).astype(o_ref.dtype)


def paged_attention(q, k_pages, v_pages, lengths, page_table,
                    *, pages_per_block=4, window=None, softcap=None,
                    alibi_slopes=None, ring=False, sinks=None,
                    interpret=None):
    """Decode attention against a paged KV cache.

    q:          (B, Hq, D)           current-token queries
    k_pages:    (Hkv, P, page, D)    paged K pool
    v_pages:    (Hkv, P, page, D)    paged V pool
    lengths:    (B,) int32           live tokens per sequence
    page_table: (B, pages_per_seq)   physical page id per logical page
    window: only the last `window` live tokens are attended (sliding-
    window decode; whole page blocks older than the window are skipped,
    so decode DMA traffic is bounded by the window, not the history).
    alibi_slopes: optional (Hq,) per-head ALiBi slopes (linear position
    bias — the prefix_prefill_alibi analog for the decode step).
    ring: the page pool is a rolling buffer (Mistral-style): token at
    absolute position p lives in slot p mod (pages_per_seq * page_size),
    so cache memory is bounded by the window, not the history. Requires
    window <= pages_per_seq * page_size; lengths keep counting absolute
    tokens.
    Returns (B, Hq, D).
    """
    from tpukern.core import round_up
    B, Hq, D = q.shape
    Hkv, P, page_size, Dpool = k_pages.shape
    pages_per_seq = page_table.shape[1]
    assert Hq % Hkv == 0
    group = Hq // Hkv
    assert pages_per_seq % pages_per_block == 0
    assert window is None or window >= 1, f"window must be >= 1: {window}"
    sinks = int(sinks or 0)
    assert sinks == 0 or window is not None, "sinks require a window"
    ring_tokens = pages_per_seq * page_size if ring else None
    if ring:
        assert window is not None and window <= ring_tokens - sinks, (
            f"ring cache needs window <= ring capacity - sinks: "
            f"{window} vs {ring_tokens} - {sinks}")
    n_blk = pages_per_seq // pages_per_block
    bk = page_size * pages_per_block

    # Mosaic requires HBM page slices 128-lane aligned: pools must carry
    # D padded to 128 (serving's init_cache allocates them padded; for
    # ad-hoc unpadded pools pad here — a one-off copy)
    Dp = round_up(D, 128)
    if Dpool == D and Dp != D:
        pad = ((0, 0), (0, 0), (0, 0), (0, Dp - D))
        k_pages = jnp.pad(k_pages, pad)
        v_pages = jnp.pad(v_pages, pad)
    else:
        assert Dpool == Dp, (D, Dpool)

    # (B, Hkv, group, D) so one grid cell covers a whole GQA group
    q4 = q.reshape(B, Hkv, group, D)
    if Dp != D:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))

    has_alibi = alibi_slopes is not None
    if has_alibi:
        assert softcap is None, "softcap + alibi ordering is ambiguous"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # lengths, flat page table
        grid=(B, Hkv, n_blk),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  if has_alibi else []) + [
            pl.BlockSpec((1, 1, group, Dp), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # K pages stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # V pages stay in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, group, Dp), lambda b, h, i, *_: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_block, page_size, Dp), k_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page_size, Dp), v_pages.dtype),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, Dp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, pages_per_block)),
        ],
    )

    kernel = functools.partial(
        _decode_kernel, page_size=page_size,
        pages_per_block=pages_per_block, mask_value=NEG_BIG,
        window=window, softcap=softcap, has_alibi=has_alibi,
        ring=ring_tokens, sinks=sinks, sm_D=D)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group, Dp), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=use_interpret() if interpret is None else interpret,
    )(lengths.astype(jnp.int32), page_table.reshape(-1).astype(jnp.int32),
      *([jnp.asarray(alibi_slopes, jnp.float32)] if has_alibi else []),
      q4, k_pages, v_pages)
    return out[..., :D].reshape(B, Hq, D)


def quantize_pages(pages, dtype="int8"):
    """Quantize a (Hkv, P, page, D) KV page pool to int8 or fp8 (e4m3)
    with per-token scales (Hkv, P, page) — the KV-cache layout for
    paged_attention with quantized=True. Uses the library's per-row
    quantization kernels (ops/quant.py).

    D is zero-padded to a 128 multiple: 1-byte dtypes tile at 128 lanes,
    and Mosaic rejects HBM page slices whose minor dim is narrower (seen
    at D=64 on v5e). Zero columns don't change row absmax, dequantize to
    exact zeros, and contribute nothing to the score/output matmuls."""
    from tpukern.core import round_up
    from tpukern.ops.quant import quantize_fp8, quantize_int8
    Hkv, P, page_size, D = pages.shape
    Dp = round_up(D, 128)
    if Dp != D:
        pages = jnp.pad(pages, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
    qfn = {"int8": quantize_int8, "fp8": quantize_fp8}[dtype]
    vals, scales = qfn(pages.reshape(Hkv * P * page_size, Dp))
    return (vals.reshape(Hkv, P, page_size, Dp),
            scales.reshape(Hkv, P, page_size))


def paged_attention_quantized(q, k_pages, k_scales, v_pages, v_scales,
                              lengths, page_table, *, pages_per_block=4,
                              q_int8=False, pv_int8=False, window=None,
                              softcap=None, alibi_slopes=None, ring=False,
                              sinks=None, interpret=None):
    """Decode attention against a quantized paged KV cache: pages are
    1-byte values (int8 or float8_e4m3fn — half the DMA traffic of
    bf16), dequantized in VMEM with their per-token scales right after
    the page fetch.

    k_pages/v_pages: (Hkv, P, page, Dp) int8 or e4m3 with Dp = D rounded
    up to 128 (quantize_pages pads); k_scales/v_scales: (Hkv, P, page)
    f32. Other args as paged_attention.

    q_int8=True (int8 pages only) additionally row-quantizes q so the
    score matmul runs s8s8s32 on the MXU — no per-block (bk, D) K
    dequant cast at all; q and K scales fold into the f32 score row.
    Adds q's ~0.4% row quantization error on top of the KV tolerance.

    pv_int8=True (int8 pages only) also runs the PV matmul s8s8s32: the
    softmax row p is quantized on-chip per row (after folding V's
    per-token scale in) and contracted against the raw int8 V pages —
    no (bk, D) V dequant cast either. With q_int8 the whole decode MXU
    path is int8. Adds ~7-bit p resolution on top of the KV tolerance.
    """
    from tpukern.core import round_up
    B, Hq, D = q.shape
    Hkv, P, page_size, Dp = k_pages.shape
    assert Dp == round_up(D, 128), (D, Dp)
    pages_per_seq = page_table.shape[1]
    assert Hq % Hkv == 0
    group = Hq // Hkv
    assert pages_per_seq % pages_per_block == 0
    n_blk = pages_per_seq // pages_per_block
    if q_int8:
        assert k_pages.dtype == jnp.int8, "q_int8 needs int8 K pages"
    if pv_int8:
        assert v_pages.dtype == jnp.int8, "pv_int8 needs int8 V pages"
    sinks = int(sinks or 0)
    assert sinks == 0 or window is not None, "sinks require a window"
    ring_tokens = pages_per_seq * page_size if ring else None
    if ring:
        assert window is not None and window <= ring_tokens - sinks, (
            f"ring cache needs window <= ring capacity - sinks: "
            f"{window} vs {ring_tokens} - {sinks}")

    q4 = q.reshape(B, Hkv, group, D)
    if Dp != D:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
    if q_int8:
        from tpukern.ops.quant import quantize_ref
        qi8, qscale = quantize_ref(q4.reshape(B * Hkv * group, Dp))
        q4 = qi8.reshape(B, Hkv, group, Dp)
        # per-row q scale, broadcast over a 128-lane block (row 0 live)
        qs4 = jnp.broadcast_to(
            qscale.reshape(B, Hkv, group)[..., None].astype(jnp.float32),
            (B, Hkv, group, 128))

    has_alibi = alibi_slopes is not None
    if has_alibi:
        assert softcap is None, "softcap + alibi ordering is ambiguous"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, n_blk),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  if has_alibi else []) + [
            pl.BlockSpec((1, 1, group, Dp), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # int8 K pages in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # int8 V pages in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # K scales in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # V scales in HBM
        ] + ([pl.BlockSpec((1, 1, group, 128),
                           lambda b, h, i, *_: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)] if q_int8 else []),
        out_specs=pl.BlockSpec((1, 1, group, Dp),
                               lambda b, h, i, *_: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_block, page_size, Dp), k_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page_size, Dp), v_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page_size), jnp.float32),
            pltpu.VMEM((2, pages_per_block, page_size), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, Dp), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2, pages_per_block)),
        ],
    )

    kernel = functools.partial(
        _decode_kernel, page_size=page_size,
        pages_per_block=pages_per_block, mask_value=NEG_BIG,
        quantized=True, q_int8=q_int8, pv_int8=pv_int8, window=window,
        softcap=softcap, has_alibi=has_alibi, ring=ring_tokens,
        sinks=sinks, sm_D=D)

    args = [lengths.astype(jnp.int32),
            page_table.reshape(-1).astype(jnp.int32)]
    if has_alibi:
        args.append(jnp.asarray(alibi_slopes, jnp.float32))
    args += [q4, k_pages, v_pages, k_scales.astype(jnp.float32),
             v_scales.astype(jnp.float32)]
    if q_int8:
        args.append(qs4)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group, Dp), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=use_interpret() if interpret is None else interpret,
    )(*args)
    return out[..., :D].reshape(B, Hq, D)


def _prefix_kernel(lengths_ref, tables_ref, *refs, page_size,
                   pages_per_block, mask_value, n_tok, sm_D,
                   quantized=False, q_int8=False, pv_int8=False,
                   window=None,
                   softcap=None, has_alibi=False, ring=None, sinks=0):
    """Multi-token causal decode body: rows are (group, t) pairs flattened
    to group*n_tok; row (g, t) may see pages positions < lengths[b] - n_tok
    + t + 1 (its own token was already written into the pages).
    quantized/q_int8 as in _decode_kernel (1-byte pages with per-token
    scales; optional s8s8s32 score dot)."""
    slopes_ref = None
    if has_alibi:
        slopes_ref, *refs = refs
    qs_ref = None
    if quantized and q_int8:
        (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, qs_ref, o_ref, k_buf, v_buf,
         ks_buf, vs_buf, m_s, l_s, acc_s, sems) = refs
    elif quantized:
        (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref, k_buf, v_buf,
         ks_buf, vs_buf, m_s, l_s, acc_s, sems) = refs
    else:
        (q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf, m_s, l_s, acc_s,
         sems) = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    blk = pl.program_id(2)
    n_blk = pl.num_programs(2)
    bk = page_size * pages_per_block
    length = lengths_ref[b]           # INCLUDING the n_tok new tokens
    rows, D = q_ref.shape[2], q_ref.shape[3]
    pages_per_seq = n_blk * pages_per_block

    @pl.when(blk == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, NEG_BIG)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    def fetch(t, slot):
        cps = []
        for p in range(pages_per_block):
            page = tables_ref[b * pages_per_seq + t * pages_per_block + p]
            cps.append(pltpu.make_async_copy(
                k_hbm.at[h, page], k_buf.at[slot, p], sems.at[0, slot, p]))
            cps.append(pltpu.make_async_copy(
                v_hbm.at[h, page], v_buf.at[slot, p], sems.at[1, slot, p]))
            if quantized:
                cps.append(pltpu.make_async_copy(
                    ks_hbm.at[h, page], ks_buf.at[slot, p],
                    sems.at[2, slot, p]))
                cps.append(pltpu.make_async_copy(
                    vs_hbm.at[h, page], vs_buf.at[slot, p],
                    sems.at[3, slot, p]))
        return cps

    def apply_row_scale(x, scales):
        segs = [x[:, i * page_size:(i + 1) * page_size]
                * scales[i][None, :]
                for i in range(pages_per_block)]
        return segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)

    # double-buffered page pipeline (see _decode_kernel)
    run = blk * bk < length
    slot = blk % 2

    @pl.when(jnp.logical_and(blk == 0, run))
    def _():
        for c in fetch(0, 0):
            c.start()

    nxt = blk + 1

    @pl.when(jnp.logical_and(nxt < n_blk, nxt * bk < length))
    def _():
        for c in fetch(nxt, nxt % 2):
            c.start()

    @pl.when(run)
    def _():
        for c in fetch(blk, slot):
            c.wait()

        q = q_ref[0, 0]                                   # (rows, D)
        if quantized and q_int8:
            # s8s8s32 score dot (see _decode_kernel)
            k = k_buf[slot].reshape(bk, D)
            s32 = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)         # (rows, bk)
            s = s32.astype(jnp.float32) * qs_ref[0, 0][:, :1]
        else:
            if quantized:
                k = k_buf[slot].astype(o_ref.dtype).reshape(bk, D)
            else:
                k = k_buf[slot].reshape(bk, D)
            prec = (jax.lax.Precision.HIGHEST
                    if q.dtype == jnp.float32 and k.dtype == jnp.float32
                    else None)
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                           # (rows, bk)
        if quantized:
            s = apply_row_scale(s, ks_buf[slot])
        s *= 1.0 / math.sqrt(sm_D)
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        pos = blk * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if ring is not None:
            # rolling-buffer slots -> absolute positions (see
            # _decode_kernel); out-of-region recoveries mask below
            R = ring - sinks
            slot_idx = pos
            ring_pos = (length - 1) - jnp.remainder(
                length - 1 - slot_idx, R)
            if sinks:
                pos = jnp.where(slot_idx < sinks, slot_idx, ring_pos)
                pos = jnp.where(
                    jnp.logical_and(slot_idx >= sinks, ring_pos < sinks),
                    -1, pos)
            else:
                pos = ring_pos
        # row r is query token t = r % n_tok; it sees positions
        # < length - n_tok + t + 1 (causal within the new tokens)
        rowi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        t = rowi % n_tok
        if has_alibi:
            # ALiBi: s += slope_g * (k_pos - q_pos); row r is q head
            # g = r // n_tok at position length - n_tok + t (reference
            # kernels/openai-triton/prefix_prefill_alibi.py)
            group = rows // n_tok
            slope = jnp.zeros_like(s)
            for g in range(group):
                slope += jnp.where(rowi // n_tok == g,
                                   slopes_ref[h * group + g], 0.0)
            s = s + slope * (pos - (length - n_tok + t)).astype(
                jnp.float32)
        s = jnp.where(jnp.logical_and(pos >= 0,
                                      pos < length - n_tok + t + 1),
                      s, mask_value)
        if window is not None:
            # sliding window relative to each query token's position
            keep = pos >= length - n_tok + t - window + 1
            if sinks:
                keep = jnp.logical_or(keep, pos < sinks)
            s = jnp.where(keep, s, mask_value)

        m_prev = m_s[:, :1]
        l_prev = l_s[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_s[:, :1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_s[:, :1] = m_next
        _pv_accumulate(
            acc_s, alpha, p, v_buf[slot].reshape(bk, D),
            vs_buf[slot] if quantized else None,
            o_dtype=o_ref.dtype, quantized=quantized,
            pv_int8=pv_int8, apply_row_scale=apply_row_scale)

    @pl.when(blk == n_blk - 1)
    def _():
        l = l_s[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_s[...] * l_inv).astype(o_ref.dtype)


def paged_prefill_attention(q, k_pages, v_pages, lengths, page_table,
                            *, pages_per_block=4, window=None,
                            softcap=None, alibi_slopes=None, ring=False,
                            sinks=None, interpret=None):
    """Multi-token causal attention against a paged KV cache (the
    prefix-prefill / context-attention kernel, reference
    kernels/openai-triton/prefix_prefill.py adapted from vLLM — here the
    paged-native Pallas version).

    q: (B, Hq, T, D) — T new tokens per sequence whose K/V have ALREADY
    been written into the pages; lengths (B,) counts live tokens
    INCLUDING those T. Token t of sequence b attends positions
    [0, lengths[b] - T + t]. Used for chunked prefill continuation and
    speculative-decoding verification. Returns (B, Hq, T, D).
    """
    from tpukern.core import round_up
    B, Hq, T, D = q.shape
    Hkv, P, page_size, Dpool = k_pages.shape
    pages_per_seq = page_table.shape[1]
    assert Hq % Hkv == 0
    group = Hq // Hkv
    assert pages_per_seq % pages_per_block == 0
    n_blk = pages_per_seq // pages_per_block

    # pools carry D padded to the 128-lane tile (see paged_attention)
    Dp = round_up(D, 128)
    if Dpool == D and Dp != D:
        pad = ((0, 0), (0, 0), (0, 0), (0, Dp - D))
        k_pages = jnp.pad(k_pages, pad)
        v_pages = jnp.pad(v_pages, pad)
    else:
        assert Dpool == Dp, (D, Dpool)

    # rows = (group, t) flattened so one grid cell handles a GQA group's
    # T tokens in a single MXU operand
    q4 = q.reshape(B, Hkv, group, T, D).reshape(B, Hkv, group * T, D)
    if Dp != D:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))

    has_alibi = alibi_slopes is not None
    if has_alibi:
        assert softcap is None, "softcap + alibi ordering is ambiguous"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, n_blk),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  if has_alibi else []) + [
            pl.BlockSpec((1, 1, group * T, Dp),
                         lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, group * T, Dp),
                               lambda b, h, i, *_: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_block, page_size, Dp), k_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page_size, Dp), v_pages.dtype),
            pltpu.VMEM((group * T, 128), jnp.float32),
            pltpu.VMEM((group * T, 128), jnp.float32),
            pltpu.VMEM((group * T, Dp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, pages_per_block)),
        ],
    )

    sinks = int(sinks or 0)
    assert sinks == 0 or window is not None, "sinks require a window"
    ring_tokens = pages_per_seq * page_size if ring else None
    if ring:
        # the earliest chunk token must still see its whole window after
        # the chunk's own T wrapped writes
        assert (window is not None
                and window + T - 1 <= ring_tokens - sinks), (
            f"ring cache needs window + T - 1 <= ring capacity - sinks: "
            f"{window} + {T} - 1 vs {ring_tokens} - {sinks}")

    kernel = functools.partial(
        _prefix_kernel, page_size=page_size,
        pages_per_block=pages_per_block, mask_value=NEG_BIG,
        n_tok=T, window=window, softcap=softcap, has_alibi=has_alibi,
        ring=ring_tokens, sinks=sinks, sm_D=D)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group * T, Dp), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=use_interpret() if interpret is None else interpret,
    )(lengths.astype(jnp.int32), page_table.reshape(-1).astype(jnp.int32),
      *([jnp.asarray(alibi_slopes, jnp.float32)] if has_alibi else []),
      q4, k_pages, v_pages)
    out = out[..., :D]
    return out.reshape(B, Hkv, group, T, D).reshape(B, Hq, T, D)


def paged_prefill_attention_quantized(q, k_pages, k_scales, v_pages,
                                      v_scales, lengths, page_table, *,
                                      pages_per_block=4, q_int8=False,
                                      pv_int8=False,
                                      window=None, softcap=None,
                                      alibi_slopes=None, ring=False,
                                      sinks=None, interpret=None):
    """Multi-token causal attention against a QUANTIZED paged KV cache
    (1-byte pages + per-token scales, as paged_attention_quantized) —
    the verification/chunked-prefill step of an int8/fp8-KV serving
    stack. q_int8=True additionally runs the score dot s8s8s32 on the
    MXU (int8 pages only); pv_int8=True runs the PV dot s8s8s32 too
    (on-chip per-row p quantization against the raw int8 V pages). Args
    as paged_prefill_attention plus the scale pools."""
    from tpukern.core import round_up
    B, Hq, T, D = q.shape
    Hkv, P, page_size, Dp = k_pages.shape
    assert Dp == round_up(D, 128), (D, Dp)
    pages_per_seq = page_table.shape[1]
    assert Hq % Hkv == 0
    group = Hq // Hkv
    assert pages_per_seq % pages_per_block == 0
    n_blk = pages_per_seq // pages_per_block
    if q_int8:
        assert k_pages.dtype == jnp.int8, "q_int8 needs int8 K pages"
    if pv_int8:
        assert v_pages.dtype == jnp.int8, "pv_int8 needs int8 V pages"
    sinks = int(sinks or 0)
    assert sinks == 0 or window is not None, "sinks require a window"
    if ring:
        cap = pages_per_seq * page_size - sinks
        assert window is not None and window + T - 1 <= cap, (
            f"ring cache needs window + T - 1 <= ring capacity - sinks: "
            f"{window} + {T} - 1 vs {cap}")

    q4 = q.reshape(B, Hkv, group, T, D).reshape(B, Hkv, group * T, D)
    if Dp != D:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
    if q_int8:
        from tpukern.ops.quant import quantize_ref
        qi8, qscale = quantize_ref(q4.reshape(B * Hkv * group * T, Dp))
        q4 = qi8.reshape(B, Hkv, group * T, Dp)
        qs4 = jnp.broadcast_to(
            qscale.reshape(B, Hkv, group * T)[..., None].astype(
                jnp.float32),
            (B, Hkv, group * T, 128))

    has_alibi = alibi_slopes is not None
    if has_alibi:
        assert softcap is None, "softcap + alibi ordering is ambiguous"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, n_blk),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  if has_alibi else []) + [
            pl.BlockSpec((1, 1, group * T, Dp),
                         lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),   # K scales in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # V scales in HBM
        ] + ([pl.BlockSpec((1, 1, group * T, 128),
                           lambda b, h, i, *_: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)] if q_int8 else []),
        out_specs=pl.BlockSpec((1, 1, group * T, Dp),
                               lambda b, h, i, *_: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_block, page_size, Dp), k_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page_size, Dp), v_pages.dtype),
            pltpu.VMEM((2, pages_per_block, page_size), jnp.float32),
            pltpu.VMEM((2, pages_per_block, page_size), jnp.float32),
            pltpu.VMEM((group * T, 128), jnp.float32),
            pltpu.VMEM((group * T, 128), jnp.float32),
            pltpu.VMEM((group * T, Dp), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2, pages_per_block)),
        ],
    )

    kernel = functools.partial(
        _prefix_kernel, page_size=page_size,
        pages_per_block=pages_per_block, mask_value=NEG_BIG,
        n_tok=T, sm_D=D, quantized=True, q_int8=q_int8, pv_int8=pv_int8,
        window=window, softcap=softcap, has_alibi=has_alibi,
        ring=pages_per_seq * page_size if ring else None, sinks=sinks)

    args = [lengths.astype(jnp.int32),
            page_table.reshape(-1).astype(jnp.int32)]
    if has_alibi:
        args.append(jnp.asarray(alibi_slopes, jnp.float32))
    args += [q4, k_pages, v_pages, k_scales.astype(jnp.float32),
             v_scales.astype(jnp.float32)]
    if q_int8:
        args.append(qs4)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group * T, Dp), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=use_interpret() if interpret is None else interpret,
    )(*args)
    out = out[..., :D]
    return out.reshape(B, Hkv, group, T, D).reshape(B, Hq, T, D)


def paged_prefill_ref(q, k_pages, v_pages, lengths, page_table,
                      alibi_slopes=None):
    """XLA gather reference for paged_prefill_attention."""
    B, Hq, T, D = q.shape
    k_pages, v_pages = k_pages[..., :D], v_pages[..., :D]
    Hkv, P, page_size, _ = k_pages.shape
    group = Hq // Hkv
    S = page_table.shape[1] * page_size
    k_seq = k_pages[:, page_table].transpose(1, 0, 2, 3, 4).reshape(
        B, Hkv, S, D)
    v_seq = v_pages[:, page_table].transpose(1, 0, 2, 3, 4).reshape(
        B, Hkv, S, D)
    qf = q.reshape(B, Hkv, group, T, D).astype(jnp.float32)
    s = jnp.einsum("bhgtd,bhkd->bhgtk", qf, k_seq.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    s *= 1.0 / math.sqrt(D)
    pos = jnp.arange(S)[None, None, None, None, :]
    limit = (lengths[:, None, None, None, None] - T
             + jnp.arange(T)[None, None, None, :, None] + 1)
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            1, Hkv, group, 1, 1)
        s = s + slopes * (pos - (limit - 1))
    s = jnp.where(pos < limit, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgtk,bhkd->bhgtd", p, v_seq.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return o.reshape(B, Hq, T, D).astype(q.dtype)


register("paged_attention", "paged_prefix_prefill", ref=paged_prefill_ref)(
    lambda *a, **kw: paged_prefill_attention(*a, **kw))


def _paged_prefill_quantized(q, k, v, lengths, table, dtype="int8", **kw):
    kq, ks = quantize_pages(k, dtype)
    vq, vs = quantize_pages(v, dtype)
    return paged_prefill_attention_quantized(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table, **kw)


register("paged_attention", "paged_prefix_prefill_int8kv",
         ref=paged_prefill_ref)(_paged_prefill_quantized)
register("paged_attention", "paged_prefix_prefill_int8kv_mxu",
         ref=paged_prefill_ref)(
    lambda *a, **kw: _paged_prefill_quantized(*a, q_int8=True, **kw))


def paged_attention_ref(q, k_pages, v_pages, lengths, page_table,
                        alibi_slopes=None):
    """XLA gather reference."""
    B, Hq, D = q.shape
    k_pages, v_pages = k_pages[..., :D], v_pages[..., :D]
    Hkv, P, page_size, _ = k_pages.shape
    group = Hq // Hkv
    pages_per_seq = page_table.shape[1]
    S = pages_per_seq * page_size
    # materialize per-sequence K/V: (B, Hkv, S, D)
    k_seq = k_pages[:, page_table].transpose(1, 0, 2, 3, 4).reshape(
        B, Hkv, S, D)
    v_seq = v_pages[:, page_table].transpose(1, 0, 2, 3, 4).reshape(
        B, Hkv, S, D)
    qf = q.reshape(B, Hkv, group, D).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhkd->bhgk", qf, k_seq.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    s *= 1.0 / math.sqrt(D)
    pos = jnp.arange(S)[None, None, None, :]
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            1, Hkv, group, 1)
        s = s + slopes * (pos - (lengths[:, None, None, None] - 1))
    s = jnp.where(pos < lengths[:, None, None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bhkd->bhgd", p, v_seq.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return o.reshape(B, Hq, D).astype(q.dtype)


register("paged_attention", "paged_decode_f32", ref=paged_attention_ref)(
    lambda *a, **kw: paged_attention(*a, **kw))
register("paged_attention", "paged_decode_bf16", ref=paged_attention_ref)(
    lambda q, k, v, l, t, **kw: paged_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), l, t, **kw))


def _paged_quantized(q, k, v, lengths, table, dtype="int8", **kw):
    kq, ks = quantize_pages(k, dtype)
    vq, vs = quantize_pages(v, dtype)
    return paged_attention_quantized(
        q.astype(jnp.bfloat16), kq, ks, vq, vs, lengths, table, **kw)


def default_alibi_slopes(n_heads):
    """Standard ALiBi slope schedule: 2^(-8i/n), i = 1..n (Press et al.;
    the schedule the reference's prefix_prefill_alibi harness uses)."""
    return 2.0 ** (-8.0 * jnp.arange(1, n_heads + 1, dtype=jnp.float32)
                   / n_heads)


register("paged_attention", "paged_decode_alibi",
         ref=lambda q, k, v, l, t: paged_attention_ref(
             q, k, v, l, t,
             alibi_slopes=default_alibi_slopes(q.shape[1])))(
    lambda q, k, v, l, t, **kw: paged_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), l, t,
        alibi_slopes=default_alibi_slopes(q.shape[1]), **kw))
register("paged_attention", "paged_prefix_prefill_alibi",
         ref=lambda q, k, v, l, t: paged_prefill_ref(
             q, k, v, l, t,
             alibi_slopes=default_alibi_slopes(q.shape[1])))(
    lambda q, k, v, l, t, **kw: paged_prefill_attention(
        q, k, v, l, t,
        alibi_slopes=default_alibi_slopes(q.shape[1]), **kw))


register("paged_attention", "paged_decode_int8kv",
         ref=paged_attention_ref)(_paged_quantized)
register("paged_attention", "paged_decode_int8kv_mxu",
         ref=paged_attention_ref)(
    lambda *a, **kw: _paged_quantized(*a, q_int8=True, **kw))
register("paged_attention", "paged_decode_fp8kv",
         ref=paged_attention_ref)(
    lambda *a, **kw: _paged_quantized(*a, dtype="fp8", **kw))
register("paged_attention", "paged_decode_int8kv_mxu_full",
         ref=paged_attention_ref)(
    lambda *a, **kw: _paged_quantized(*a, q_int8=True, pv_int8=True, **kw))
