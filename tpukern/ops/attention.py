"""FlashAttention-2 forward family: split-Q tiling + fused online softmax.

Reference: the flash-attention-mma library (kernels/flash-attn/, ~29.9k
LoC). Algorithm families there: split-kv (FA-1), split-q (FA-2,
flash_attn_mma_split_q.cu:34-120), share-kv / share-qkv (smem-sharing
tiers), tiling-qk / tiling-qkv (large head dim), x {acc-f16, acc-f32} x
{smem swizzle} twins. The online-softmax hot loop with
rescale-then-accumulate is at flash_attn_mma_split_q.cu:374-560.

TPU mapping:
- split-Q warp partitioning  -> grid over (batch, head, Q blocks); every Q
  block streams all KV blocks through the innermost ("arbitrary") grid axis
  with Pallas double-buffering the K/V tile DMAs (the cp.async stages),
- smem rings + ldmatrix      -> VMEM tiles + MXU dot_general,
- share-kv / share-qkv tiers -> VMEM-budget tiers = (block_q, block_k)
  knobs ("stage" variants batch bigger KV tiles per fetch),
- tiling-qk large-D tier     -> the same kernel holds D up to 1024 directly
  (f32 accumulator tile (block_q, D) in VMEM scratch),
- acc-f16 twins              -> acc_dtype=bf16 variants,
- softmax safety             -> m/l statistics always f32; the m/l update is
  the rescale-then-update recurrence (reference :532-560),
- MAX_HEADDIM_CFG            -> MAX_HEADDIM table below.

GQA is supported by mapping each Q head to its KV head in the BlockSpec
index_map (no KV duplication in HBM).
"""

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import cdiv, to_kernel_dtype, use_interpret
from tpukern.core.registry import register

NEG_BIG = -0.7 * 3.4e38  # mask value; avoids exp(-inf - -inf) NaN
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)

# variant name -> max supported head dim (the MAX_HEADDIM_CFG analog,
# flash_attn_mma.py:436-506)
MAX_HEADDIM = {
    "mha_splitq_bf16": 1024,
    "mha_splitq_bf16_hyper": 128,
    "mha_splitq_f32": 512,
    "mha_splitq_f16": 1024,
    "mha_splitq_bf16_stage2": 1024,
    "mha_splitq_bf16_stage4": 1024,
    "mha_splitq_bf16_bigq": 512,
    "mha_splitq_bf16_accbf16": 1024,
    "mha_splitq_bf16_duo": 1024,
    "mha_xla_sdpa": 16384,
    "mha_unfused": 16384,
}


def _fa_kernel(*refs, causal, block_q, block_k, with_stats,
               has_alibi, causal_offset=0, kv_len=None, use_exp2=True,
               has_carry_in=False, carry_out=False, window=None,
               has_segments=False, softcap=None, duo=False, sinks=None,
               diag_quadrant=False):
    """Online-softmax body, by default in log2 space: q arrives pre-scaled
    by sm_scale*log2(e), so p = exp2(s - m) uses the VPU's fast exp2 and
    saves one multiply per score element (the rescale-then-update
    recurrence, reference flash_attn_mma_split_q.cu:532-560). TPU exp2 is
    the quick hardware approximation (~2^-13 relative) — fine inside
    bf16/f16 tolerances, so the f32 tier sets use_exp2=False and keeps the
    accurate exp polynomial.
    kv_len is the true KV length when Skv is not a block_k multiple:
    out-of-range columns (undefined block padding) are masked."""
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    i = 3
    slopes_ref = None
    if has_alibi:
        slopes_ref = refs[i]
        i += 1
    qseg_ref = kseg_ref = None
    if has_segments:
        qseg_ref, kseg_ref = refs[i:i + 2]
        i += 2
    acc_in_ref = m_in_ref = l_in_ref = None
    if has_carry_in:
        acc_in_ref, m_in_ref, l_in_ref = refs[i:i + 3]
        i += 3
    if carry_out:
        o_ref = lse_ref = None
        acc_out_ref, m_out_ref, l_out_ref = refs[i:i + 3]
        i += 3
    else:
        o_ref = refs[i]
        i += 1
        lse_ref = refs[i] if with_stats else None
    m_ref, l_ref, acc_ref = refs[-3:]
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    h = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        if has_carry_in:
            # resume a prior pass's online-softmax state (ring attention:
            # the cross-shard combine rides inside the kernel). Carried m
            # is in natural-log units; clamp after the log2 conversion so
            # a neutral carry can't overflow f32 to -inf (exp2(-inf -
            # -inf) would be nan).
            acc_ref[...] = acc_in_ref[0, 0].astype(acc_ref.dtype)
            m0 = m_in_ref[0, 0][:, :1]
            if use_exp2:
                m0 = jnp.maximum(m0 * LOG2E, NEG_BIG)
            m_ref[...] = jnp.broadcast_to(m0, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_in_ref[0, 0][:, :1],
                                          l_ref.shape)
        else:
            m_ref[...] = jnp.full_like(m_ref, NEG_BIG)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

    if causal:
        # Run only if the block intersects the causal lower triangle
        # (shifted by causal_offset for prefill-with-cache).
        should_run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k
        if window is not None:
            # ... and isn't entirely below the sliding window's lower edge
            # (oldest visible kv for the block's last row)
            in_band = ((ki + 1) * block_k - 1
                       >= qi * block_q + causal_offset - window + 1)
            if sinks is not None:
                # attention sinks (StreamingLLM): blocks holding the
                # first `sinks` kv positions always run
                in_band = jnp.logical_or(in_band, ki * block_k < sinks)
            should_run = jnp.logical_and(should_run, in_band)
    else:
        should_run = True

    # the f32 tier needs true-f32 MXU passes: TPU DEFAULT precision runs
    # f32 dots through bf16 multiplies (~1e-3 relative error)
    prec = None if use_exp2 else jax.lax.Precision.HIGHEST

    def body_duo(mask_causal):
        # Split-softmax: the KV block is processed as two INDEPENDENT
        # online-softmax chains (own m/l/pv), merged at the end. The two
        # chains have no cross-dependencies, so the Mosaic scheduler can
        # overlap chain A's VPU softmax with chain B's MXU matmuls —
        # the FA-3 softmax/GEMM-overlap idea expressed as ILP instead of
        # warp specialization. MEASURED (v5e, B4 H16 S8192 D128):
        # performance-NEUTRAL at the tuned blocks (151.5 vs 150.9 TFLOPS
        # non-causal, 102.3 vs 103.3 causal at bq=1024 bk=2048) and
        # clearly worse at small bk (117.8 vs 143.8 at bk=1024) — the
        # cross-grid-step software pipeline already hides the VPU work,
        # so the extra (bq, D) rescale multiply per chain only costs.
        # Kept as the in-kernel split-softmax merge demonstration (the
        # same merge algebra the split-kv / ring combines use).
        exp_fn = jnp.exp2 if use_exp2 else jnp.exp
        q = q_ref[0, 0]
        hbk = block_k // 2
        parts = []
        for hh in range(2):
            k_h = k_ref[0, 0][hh * hbk:(hh + 1) * hbk]
            s = jax.lax.dot_general(
                q, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            if mask_causal or kv_len is not None:
                cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                        + ki * block_k + hh * hbk)
            if mask_causal:
                rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                        + qi * block_q)
                s = jnp.where(cols <= rows + causal_offset, s, NEG_BIG)
            if kv_len is not None:
                s = jnp.where(cols < kv_len, s, NEG_BIG)
            m_h = jnp.max(s, axis=-1, keepdims=True)
            p_h = exp_fn(s - m_h)
            l_h = jnp.sum(p_h, axis=-1, keepdims=True)
            v_h = v_ref[0, 0][hh * hbk:(hh + 1) * hbk]
            pv_h = jax.lax.dot_general(
                p_h.astype(v_h.dtype), v_h,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            parts.append((m_h, l_h, pv_h))
        (m_a, l_a, pv_a), (m_b, l_b, pv_b) = parts
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_ab = jnp.maximum(m_a, m_b)
        m_next = jnp.maximum(m_prev, m_ab)
        sc_a = exp_fn(m_a - m_next)
        sc_b = exp_fn(m_b - m_next)
        alpha = exp_fn(m_prev - m_next)
        l_ref[:, :1] = alpha * l_prev + sc_a * l_a + sc_b * l_b
        m_ref[:, :1] = m_next
        acc_ref[...] = (acc_ref[...].astype(jnp.float32) * alpha
                        + pv_a * sc_a + pv_b * sc_b).astype(acc_ref.dtype)

    def body(mask_causal):
        if duo:
            return body_duo(mask_causal)
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if softcap is not None:
            # Gemma-style logit soft-capping: s = cap * tanh(s / cap).
            # q arrives pre-scaled by sm_scale ONLY in this mode (the
            # LOG2E fold would land inside the tanh); convert to log2
            # space after capping instead.
            s = softcap * jnp.tanh(s * (1.0 / softcap))
            if use_exp2:
                s = s * LOG2E
        need_cols = mask_causal or has_alibi or kv_len is not None
        if need_cols:
            cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    + ki * block_k)
        if mask_causal or has_alibi:
            rows = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                    + qi * block_q)
        if has_alibi:
            # ALiBi: s += slope_h * (k_pos - q_pos)  (reference:
            # kernels/openai-triton/prefix_prefill_alibi.py); the slope is
            # pre-multiplied by log2(e) to stay in log2 space
            s = s + slopes_ref[h] * (cols - rows).astype(jnp.float32)
        if mask_causal:
            s = jnp.where(cols <= rows + causal_offset, s, NEG_BIG)
            if window is not None:
                # sliding window: only the last `window` kv positions
                # relative to each query row stay visible — plus the
                # first `sinks` positions (StreamingLLM attention sinks)
                keep = cols >= rows + causal_offset - window + 1
                if sinks is not None:
                    keep = jnp.logical_or(keep, cols < sinks)
                s = jnp.where(keep, s, NEG_BIG)
        if kv_len is not None:
            s = jnp.where(cols < kv_len, s, NEG_BIG)
        if has_segments:
            # packed sequences: query row r may only attend to kv column c
            # when their segment ids match. Blocks arrive (1, bq)/(1, bk);
            # the q side reshapes to a column via sublane relayout (once
            # per (bq, bk) tile — amortized over the whole score block).
            qseg = qseg_ref[0].reshape(block_q, 1)
            kseg = kseg_ref[0].reshape(1, block_k)
            s = jnp.where(qseg == kseg, s, NEG_BIG)

        exp_fn = jnp.exp2 if use_exp2 else jnp.exp
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = exp_fn(m_prev - m_next)
        p = exp_fn(s - m_next)
        l_ref[:, :1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, :1] = m_next
        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        # round through the accumulator dtype (the acc-f16-twin semantics);
        # mixed-dtype stores are rejected by Pallas
        acc_ref[...] = (acc_ref[...].astype(jnp.float32) * alpha + pv
                        ).astype(acc_ref.dtype)

    def body_diag():
        # Exactly-diagonal block (bq == bk, block-aligned causal offset —
        # the caller sets diag_quadrant only then): the upper-right
        # quadrant is fully masked, so a 2-row-half decomposition skips
        # 25% of the block's MXU and VPU work (the low row half only
        # scores the low kv half). The halves are independent
        # online-softmax chains over disjoint row ranges.
        exp_fn = jnp.exp2 if use_exp2 else jnp.exp
        hq = block_q // 2
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        for lo, hi, kw in ((0, hq, hq), (hq, block_q, block_k)):
            s = jax.lax.dot_general(
                q[lo:hi], k[:kw],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + lo
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols <= rows, s, NEG_BIG)
            m_prev = m_ref[lo:hi, :1]
            l_prev = l_ref[lo:hi, :1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = exp_fn(m_prev - m_next)
            p = exp_fn(s - m_next)
            l_ref[lo:hi, :1] = (alpha * l_prev
                                + jnp.sum(p, axis=-1, keepdims=True))
            m_ref[lo:hi, :1] = m_next
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v[:kw],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            acc_ref[lo:hi] = (acc_ref[lo:hi].astype(jnp.float32) * alpha
                              + pv).astype(acc_ref.dtype)

    # Diagonal specialization WITHOUT lax.cond (a cond fast path measured
    # 40% slower — it breaks grid pipelining): two disjoint pl.when
    # regions, so fully-visible interior blocks skip the whole iota/
    # compare/select mask chain (~3 VPU passes over (bq, bk) per block).
    if causal and not has_alibi and window is None:
        fully_visible = ((ki + 1) * block_k - 1
                         <= qi * block_q + causal_offset)

        @pl.when(jnp.logical_and(should_run, fully_visible))
        def _():
            body(False)

        @pl.when(jnp.logical_and(should_run,
                                 jnp.logical_not(fully_visible)))
        def _():
            if diag_quadrant:
                body_diag()
            else:
                body(True)
    else:
        @pl.when(should_run)
        def _():
            body(causal)

    @pl.when(ki == pl.num_programs(3) - 1)
    def _():
        l = l_ref[:, :1]
        if carry_out:
            # hand the un-normalized state to the next pass (natural-log m)
            acc_out_ref[0, 0] = acc_ref[...].astype(jnp.float32)
            m_nat = (LN2 * m_ref[:, :1]) if use_exp2 else m_ref[:, :1]
            m_out_ref[0, 0] = jnp.broadcast_to(m_nat,
                                               m_out_ref.shape[2:])
            l_out_ref[0, 0] = jnp.broadcast_to(l, l_out_ref.shape[2:])
            return
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        if has_segments:
            # a row whose segment matches no kv anywhere keeps m == NEG_BIG
            # and self-heals into p == 1 garbage (exp(NEG_BIG - NEG_BIG));
            # define its output as 0, matching attention_ref
            l_inv = jnp.where(m_ref[:, :1] <= NEG_BIG * 0.5, 0.0, l_inv)
        o_ref[0, 0] = (acc_ref[...].astype(jnp.float32) * l_inv
                       ).astype(o_ref.dtype)
        if with_stats:
            # in log2 space m is in log2 units: lse_nat = ln2 * m + ln(l)
            m_nat = (LN2 * m_ref[:, :1]) if use_exp2 else m_ref[:, :1]
            lse = m_nat + jnp.log(jnp.maximum(l, 1e-37))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def flash_attention(q, k, v, *, causal=False, sm_scale=None,
                    block_q=None, block_k=None, acc_dtype=jnp.float32,
                    return_stats=False, alibi_slopes=None,
                    causal_offset=0, window=None, sinks=None, carry=None,
                    return_carry=False, segment_ids=None, softcap=None,
                    duo=False, diag_quadrant=None, interpret=None):
    """FA-2 forward. q: (B, Hq, Sq, D); k, v: (B, Hkv, Skv, D), Hkv | Hq.

    alibi_slopes: optional (Hq,) per-head ALiBi slopes (linear position
    bias, the prefix_prefill_alibi analog). causal_offset shifts the causal
    diagonal right: with Skv = prefix + Sq and causal_offset = Skv - Sq,
    this is chunked-prefill "context attention" over a KV-cache prefix (the
    kernels/openai-triton/prefix_prefill.py analog). Returns o (B,Hq,Sq,D);
    with return_stats also lse (B,Hq,Sq) for cross-shard softmax
    combination (ring attention / context parallelism).

    window (with causal=True) restricts each query to the last `window`
    key positions (sliding-window / local attention, mistral-style);
    blocks entirely outside the band are skipped, so FLOPs scale with
    S*window rather than S^2. sinks (with window) re-admits the first
    `sinks` key positions for every query — StreamingLLM-style attention
    sinks, keeping long-context generation stable under a rolling
    window.

    segment_ids = (q_seg (B, Sq) int, kv_seg (B, Skv) int) masks packed
    sequences: a query attends only to kv positions with an equal segment
    id (composes with causal for packed causal training). Rows whose
    segment matches nothing output 0. softcap applies Gemma-style logit
    soft-capping, s -> cap * tanh(s / cap), before masking.

    carry / return_carry chain the online-softmax state ACROSS calls
    (the in-kernel ring-attention combine): carry = (acc (B,Hq,Sq,D) f32
    un-normalized output, m (B,Hq,Sq) f32 natural-log running max,
    l (B,Hq,Sq) f32 running denominator). With return_carry=True the
    kernel returns that tuple instead of o; finish with
    flash_attention_finalize(acc, m, l). A neutral initial carry comes
    from flash_attention_carry_init(q).
    """
    # Auto-dispatch: at D <= 64 the transposed-PV kernel is ~1.12x faster
    # (both matmuls run half-MXU-width in the standard layout; see
    # _fa_tpv_kernel). Only when the caller asked for defaults and no
    # feature the tpv kernel lacks — explicit blocks mean a tuned tier.
    if (q.shape[-1] <= 64 and block_q is None and block_k is None
            and alibi_slopes is None and window is None and sinks is None
            and segment_ids is None and softcap is None and not duo
            and acc_dtype == jnp.float32):
        return flash_attention_tpv(q, k, v, causal=causal,
                                   sm_scale=sm_scale,
                                   causal_offset=causal_offset,
                                   return_stats=return_stats,
                                   carry=carry, return_carry=return_carry,
                                   interpret=interpret)
    orig_dtype = q.dtype
    q, k, v = (to_kernel_dtype(t) for t in (q, k, v))
    B, Hq, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    assert Hq % Hkv == 0
    group = Hq // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    # fold the softmax scale AND (for half-precision tiers) log2(e) into q
    # once at the XLA level: saves one VPU multiply per score element, and
    # the kernel then uses the fast native exp2 (FA at small D is VPU-bound
    # on TPU). The f32 tier keeps natural-log space + accurate exp.
    use_exp2 = jnp.dtype(orig_dtype) != jnp.float32
    # with softcap the LOG2E fold would land inside the tanh — prescale by
    # sm_scale only and let the kernel convert to log2 space after capping
    q = (q.astype(jnp.float32)
         * (sm_scale * (LOG2E if use_exp2 and softcap is None else 1.0))
         ).astype(q.dtype)
    # shape-aware defaults from the v5e sweeps (tools/fa_tune.py and
    # tools/fa512_tune.py, frozen in BENCH_NOTES.md): grid-step overhead
    # dominates small tiles, VMEM caps large ones (scale with D), and
    # causal prefers bq >= bk (block-level triangle skipping wastes less
    # of each KV block near the diagonal)
    # per-(D,S) causal class (round-5 6-adjacent-sample A/B,
    # tools/fa_cfg_ab.py at B=1 H=8 S=1024 D=512: 512x512 min 71.2 >
    # 1024-default max 65.8 TFLOPS on every sample — at Sq <= 1024 the
    # 1024 tile leaves a (1,H,1,1)-ish grid with no diagonal interior to
    # amortize, while 512 tiles restore 4 causal blocks incl. one
    # interior). D=256 prefers the 1024 default at the same S (probe
    # 69.1 vs 62.6) and D=512 S=2048 does too (107.1 vs 96.5), so the
    # entry is exactly this class.
    _small_s_large_d = causal and D >= 512 and Sq <= 1024
    if block_q is None:
        # bq=1024 at EVERY D (round-3 non-causal sweep: (1024,1024) wins
        # at D=256 167.7 and D=512 172.2 TFLOPS — 1.02x/1.04x of tuned
        # splash; round-4 causal tune: same shape wins causal too)
        block_q = 512 if _small_s_large_d else 1024
    if block_k is None:
        if causal:
            # causal: bq=bk=1024 at every head dim except the
            # small-S/large-D class above (round-4 re-tune,
            # tools/fa512_tune.py --causal: (1024,1024) wins 110.6-119.4%
            # of best splash at D in {256,512} x S in {4096,8192}; the
            # round-2-era 512/256 KV blocks lost up to 31%). Equal
            # aligned blocks also enable the diagonal-quadrant body and
            # the frontier KV-index pinning (see diag_quadrant below).
            block_k = 512 if _small_s_large_d else 1024
        else:
            block_k = 2048 if (D <= 128 and Skv >= 4096) else 1024
    bq = min(block_q, Sq)
    bk = min(block_k, Skv)
    if duo and bk % 256:
        # duo halves must be lane-aligned: round bk to a 256 multiple
        # (tails are handled by the XLA-boundary padding + kv_len mask)
        bk = max(256, (bk // 256) * 256)
    # Non-block-multiple sequence lengths: zero-pad at the XLA boundary so
    # tail blocks hold defined data (Pallas tail padding is undefined
    # memory), and mask the padded KV columns in-kernel (kv_len below) so
    # they can't enter the online-softmax statistics.
    Sq_p, Skv_p = -(-Sq // bq) * bq, -(-Skv // bk) * bk
    if Sq_p != Sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0)))
    if Skv_p != Skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)))
    grid = (B, Hq, cdiv(Sq_p, bq), cdiv(Skv_p, bk))

    has_alibi = alibi_slopes is not None
    assert not (return_carry and return_stats), \
        "return_carry already includes the softmax stats (m, l)"
    if window is not None:
        assert causal, "sliding window requires causal=True"
        assert window >= 1
    if sinks is not None:
        assert window is not None, (
            "sinks only matter with a sliding window (without one the "
            "causal mask already keeps every prefix position)")
        assert sinks >= 1
    if softcap is not None:
        assert softcap > 0
        assert not has_alibi, "softcap + alibi ordering is ambiguous"
    if duo:
        assert (not has_alibi and segment_ids is None and softcap is None
                and window is None), (
            "the duo (split-softmax) tier supports causal/offset/tails "
            "only; use the standard kernel for alibi/segments/softcap/"
            "window")
        assert bk % 256 == 0  # guaranteed by the rounding at bk selection
    # Exactly-diagonal quadrant decomposition (see _fa_kernel.body_diag):
    # only when the masked pl.when region is provably the single aligned
    # diagonal block and no feature re-shapes the mask.
    _diag_ok = (causal and bq == bk and isinstance(causal_offset, int)
                and causal_offset % bk == 0 and Skv % bk == 0
                and window is None and not has_alibi
                and segment_ids is None and softcap is None
                and not duo)
    if diag_quadrant is None:
        # When the KV grid is a SINGLE block (Skv_p == bk) every grid
        # step is the diagonal block, so the two-chain decomposition
        # replaces 100% of the work instead of specializing a 1/Tc
        # fraction. Whether that pays depends on what bounds the block:
        # at D <= 128 the block is VPU-bound and the dual-chain overhead
        # measured 30%/20% slower at S=1024 (ADVICE r4 item 1), but at
        # D >= 256 it is MXU-bound and skipping 25% of the diagonal
        # block's MXU work wins on every adjacent A/B sample (75.2-76.8
        # vs 61.3-65.5 TFLOPS at D=256 S=1024, tools/fa_cfg_ab.py,
        # BENCH_NOTES round 5). Interior blocks amortize it regardless.
        diag_quadrant = _diag_ok and (Skv_p > bk or D >= 256)
    else:
        diag_quadrant = bool(diag_quadrant) and _diag_ok
    kernel = functools.partial(
        _fa_kernel, causal=causal,
        block_q=bq, block_k=bk, with_stats=return_stats,
        has_alibi=has_alibi, causal_offset=causal_offset,
        kv_len=Skv if Skv % bk else None, use_exp2=use_exp2,
        has_carry_in=carry is not None, carry_out=return_carry,
        window=window, sinks=sinks, has_segments=segment_ids is not None,
        softcap=softcap, duo=duo, diag_quadrant=diag_quadrant)

    # lse carries an 8-wide trailing dim: Mosaic block shapes need the
    # last two dims (8, 128)-aligned or array-sized. Only materialized
    # when requested — an unconditional stats output would add ~25% of
    # output-write DMA traffic at D=64 for nothing.
    _stat_spec = pl.BlockSpec((1, 1, bq, 8), lambda b, h, i, j: (b, h, i, 0),
                              memory_space=pltpu.VMEM)
    _acc_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0),
                             memory_space=pltpu.VMEM)
    if return_carry:
        out_shapes = [
            jax.ShapeDtypeStruct((B, Hq, Sq_p, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, Sq_p, 8), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, Sq_p, 8), jnp.float32),
        ]
        out_specs = [_acc_spec, _stat_spec, _stat_spec]
    else:
        out_shapes = [jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype)]
        out_specs = [
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ]
        if return_stats:
            out_shapes.append(
                jax.ShapeDtypeStruct((B, Hq, Sq_p, 8), jnp.float32))
            out_specs.append(_stat_spec)

    # KV index map: past the causal frontier the kernel body is switched
    # off (pl.when should_run), but the pipeline would still DMA the
    # mapped KV block. Pinning skipped steps' index at the frontier makes
    # the mapped index equal the previous step's, so the pipeline skips
    # the fetch entirely — a skipped causal step then costs only grid
    # overhead, not a dead (bk, D) K + V fetch. Same trick for blocks
    # below a sliding window's band (unless sinks re-admit low blocks).
    if causal and isinstance(causal_offset, int):
        def _kv_idx(b, h, i, j, _g=group):
            jj = jnp.minimum(j, ((i + 1) * bq - 1 + causal_offset) // bk)
            if window is not None and sinks is None:
                jj = jnp.maximum(
                    jj, jnp.maximum(
                        0, (i * bq + causal_offset - window + 1) // bk))
            return (b, h // _g, jj, 0)
    else:
        def _kv_idx(b, h, i, j, _g=group):
            return (b, h // _g, j, 0)
    in_specs = [
        pl.BlockSpec((1, 1, bq, D),
                     lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), _kv_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), _kv_idx, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if has_alibi:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(alibi_slopes, jnp.float32)
                    * (LOG2E if use_exp2 else 1.0))
    if segment_ids is not None:
        q_seg, kv_seg = segment_ids
        assert q_seg.shape == (B, Sq) and kv_seg.shape == (B, Skv), (
            f"segment_ids must be ((B,Sq),(B,Skv)); got {q_seg.shape}, "
            f"{kv_seg.shape}")
        # distinct negative sentinels so padded rows/cols never match
        q_seg = jnp.pad(q_seg.astype(jnp.int32),
                        ((0, 0), (0, Sq_p - Sq)), constant_values=-1)
        kv_seg = jnp.pad(kv_seg.astype(jnp.int32),
                         ((0, 0), (0, Skv_p - Skv)), constant_values=-2)
        in_specs.append(pl.BlockSpec((1, bq), lambda b, h, i, j: (b, i),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, bk), lambda b, h, i, j: (b, j),
                                     memory_space=pltpu.VMEM))
        args.extend([q_seg, kv_seg])
    if carry is not None:
        acc_in, m_in, l_in = carry
        pad_q = ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0))
        acc_in = jnp.pad(acc_in.astype(jnp.float32), pad_q)
        stats_in = []
        for t in (m_in, l_in):
            t = jnp.broadcast_to(t.astype(jnp.float32)[..., None],
                                 (B, Hq, Sq, 8))
            stats_in.append(jnp.pad(t, pad_q))
        in_specs.extend([_acc_spec, _stat_spec, _stat_spec])
        args.extend([acc_in, *stats_in])

    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # m
            pltpu.VMEM((bq, 128), jnp.float32),   # l
            pltpu.VMEM((bq, D), acc_dtype),       # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * Hq * Sq * Skv * D * (0.5 if causal else 1.0)),
            bytes_accessed=int((q.size + k.size + v.size) * q.dtype.itemsize
                               + q.size * q.dtype.itemsize),
            transcendentals=int(B * Hq * Sq * Skv),
        ),
        interpret=use_interpret() if interpret is None else interpret,
    )(*args)
    if return_carry:
        return (res[0][:, :, :Sq], res[1][:, :, :Sq, 0],
                res[2][:, :, :Sq, 0])
    o = res[0][:, :, :Sq].astype(orig_dtype)
    if return_stats:
        return o, res[1][:, :, :Sq, 0]
    return o


def flash_attention_carry_init(q):
    """Neutral online-softmax carry for chained flash_attention calls."""
    B, Hq, Sq, D = q.shape
    return (jnp.zeros((B, Hq, Sq, D), jnp.float32),
            jnp.full((B, Hq, Sq), NEG_BIG, jnp.float32),
            jnp.zeros((B, Hq, Sq), jnp.float32))


def flash_attention_finalize(acc, m, l, dtype=None, with_lse=False):
    """Normalize a chained carry into the attention output (and lse)."""
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)[..., None]
    o = acc * l_inv
    o = o.astype(dtype) if dtype is not None else o
    if with_lse:
        return o, m + jnp.log(jnp.maximum(l, 1e-37))
    return o


def _fa_tpv_kernel(*refs, causal, block_q, block_k, causal_offset,
                   kv_len, use_exp2, with_stats=False,
                   has_carry_in=False, carry_out=False):
    """Transposed-PV online-softmax body: scores are computed as
    sT = K @ Q^T (bk, bq) and the output as accT = V^T @ P^T (D, bq).

    Why: at D = 64 the standard layout runs BOTH matmuls at half MXU
    width (QK^T contracts over D=64, PV outputs width D=64). Transposing
    keeps QK^T at its unavoidable D-deep contraction but makes PV
    full-rate (contraction block_k, output width block_q) — the same
    width economics behind the reference's ldmatrix.x2.trans B-operand
    loads (flash_attn_mma_split_q.cu:470-534). Softmax statistics become
    lane vectors (1, bq) reduced over sublanes, the VPU's cheap axis."""
    refs = list(refs)
    qT_ref, k_ref, vT_ref = refs[:3]
    i = 3
    accT_in_ref = m_in_ref = l_in_ref = None
    if has_carry_in:
        accT_in_ref, m_in_ref, l_in_ref = refs[i:i + 3]
        i += 3
    lse_ref = None
    if carry_out:
        o_ref = None
        accT_out_ref, m_out_ref, l_out_ref = refs[i:i + 3]
        i += 3
    else:
        o_ref = refs[i]
        i += 1
        if with_stats:
            lse_ref = refs[i]
            i += 1
    m_ref, l_ref, acc_ref = refs[-3:]
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        if has_carry_in:
            # resume the chained state (transposed layouts; natural-log m
            # converted to log2 space with the same clamp as _fa_kernel)
            acc_ref[...] = accT_in_ref[0, 0]
            m0 = m_in_ref[0, 0][:1]
            if use_exp2:
                m0 = jnp.maximum(m0 * LOG2E, NEG_BIG)
            m_ref[...] = jnp.broadcast_to(m0, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_in_ref[0, 0][:1], l_ref.shape)
        else:
            m_ref[...] = jnp.full_like(m_ref, NEG_BIG)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

    if causal:
        should_run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k
    else:
        should_run = True
    prec = None if use_exp2 else jax.lax.Precision.HIGHEST

    def body(mask_causal):
        qT = qT_ref[0, 0]                                  # (D, bq)
        k = k_ref[0, 0]                                    # (bk, D)
        sT = jax.lax.dot_general(
            k, qT, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (bk, bq)
        need_mask = mask_causal or kv_len is not None
        if need_mask:
            kv_pos = (jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0)
                      + ki * block_k)
        if mask_causal:
            q_pos = (jax.lax.broadcasted_iota(jnp.int32, sT.shape, 1)
                     + qi * block_q)
            sT = jnp.where(kv_pos <= q_pos + causal_offset, sT, NEG_BIG)
        if kv_len is not None:
            sT = jnp.where(kv_pos < kv_len, sT, NEG_BIG)

        exp_fn = jnp.exp2 if use_exp2 else jnp.exp
        m_prev = m_ref[:1]                                 # (1, bq)
        l_prev = l_ref[:1]
        m_cur = jnp.max(sT, axis=0, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = exp_fn(m_prev - m_next)
        pT = exp_fn(sT - m_next)
        l_ref[:1] = alpha * l_prev + jnp.sum(pT, axis=0, keepdims=True)
        m_ref[:1] = m_next
        vT = vT_ref[0, 0]                                  # (D, bk)
        pv = jax.lax.dot_general(
            vT, pT.astype(vT.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (D, bq)
        acc_ref[...] = acc_ref[...] * alpha + pv

    # diagonal specialization: interior causal blocks skip the mask chain
    # entirely (two disjoint pl.when regions, see _fa_kernel)
    if causal:
        fully_visible = ((ki + 1) * block_k - 1
                         <= qi * block_q + causal_offset)

        @pl.when(jnp.logical_and(should_run, fully_visible))
        def _():
            body(False)

        @pl.when(jnp.logical_and(should_run,
                                 jnp.logical_not(fully_visible)))
        def _():
            body(True)
    else:
        @pl.when(should_run)
        def _():
            body(False)

    @pl.when(ki == pl.num_programs(3) - 1)
    def _():
        l = l_ref[:1]
        if carry_out:
            accT_out_ref[0, 0] = acc_ref[...]
            m_nat = (LN2 * m_ref[:1]) if use_exp2 else m_ref[:1]
            m_out_ref[0, 0] = jnp.broadcast_to(m_nat,
                                               m_out_ref.shape[2:])
            l_out_ref[0, 0] = jnp.broadcast_to(l, l_out_ref.shape[2:])
            return
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)
        if with_stats:
            m_nat = (LN2 * m_ref[:1]) if use_exp2 else m_ref[:1]
            lse = m_nat + jnp.log(jnp.maximum(l, 1e-37))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def flash_attention_tpv(q, k, v, *, causal=False, sm_scale=None,
                        block_q=None, block_k=None, causal_offset=0,
                        return_stats=False, carry=None,
                        return_carry=False, interpret=None):
    """Transposed-PV FA-2 forward (see _fa_tpv_kernel). Same contract as
    flash_attention for o; the (B,H,S,D) <-> (B,H,D,S) transposes of Q, V
    and O happen at the XLA boundary (~3 HBM passes, <2% of the kernel's
    time at S=8192) so callers keep the standard layout."""
    orig_dtype = q.dtype
    q, k, v = (to_kernel_dtype(t) for t in (q, k, v))
    B, Hq, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    assert Hq % Hkv == 0
    group = Hq // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    use_exp2 = jnp.dtype(orig_dtype) != jnp.float32
    q = (q.astype(jnp.float32)
         * (sm_scale * (LOG2E if use_exp2 else 1.0))).astype(q.dtype)
    # v5e sweep (BENCH_NOTES round 2): (2048,1024) best for D<=64, both
    # causal and not; larger D is better served by the standard kernel
    if block_q is None:
        block_q = 2048 if D <= 64 else 1024 if D <= 128 else 512
    if block_k is None:
        block_k = 1024
    bq = min(block_q, Sq)
    bk = min(block_k, Skv)
    Sq_p, Skv_p = -(-Sq // bq) * bq, -(-Skv // bk) * bk
    if Sq_p != Sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0)))
    if Skv_p != Skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)))
    qT = jnp.swapaxes(q, -1, -2)                      # (B, Hq, D, Sq_p)
    vT = jnp.swapaxes(v, -1, -2)                      # (B, Hkv, D, Skv_p)
    grid = (B, Hq, cdiv(Sq_p, bq), cdiv(Skv_p, bk))

    kernel = functools.partial(
        _fa_tpv_kernel, causal=causal, block_q=bq, block_k=bk,
        causal_offset=causal_offset,
        kv_len=Skv if Skv % bk else None, use_exp2=use_exp2,
        with_stats=return_stats, has_carry_in=carry is not None,
        carry_out=return_carry)

    assert not (return_carry and return_stats)
    _accT_spec = pl.BlockSpec((1, 1, D, bq), lambda b, h, i, j: (b, h, 0, i),
                              memory_space=pltpu.VMEM)
    _statT_spec = pl.BlockSpec((1, 1, 8, bq), lambda b, h, i, j: (b, h, 0, i),
                               memory_space=pltpu.VMEM)
    if return_carry:
        out_shapes = [
            jax.ShapeDtypeStruct((B, Hq, D, Sq_p), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, 8, Sq_p), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, 8, Sq_p), jnp.float32),
        ]
        out_specs = [_accT_spec, _statT_spec, _statT_spec]
    else:
        out_shapes = [jax.ShapeDtypeStruct((B, Hq, D, Sq_p), q.dtype)]
        out_specs = [_accT_spec]
        if return_stats:
            # lse rides as (1, bq) lane rows: 8-sublane block, row 0 live
            out_shapes.append(
                jax.ShapeDtypeStruct((B, Hq, 8, Sq_p), jnp.float32))
            out_specs.append(_statT_spec)

    # pin skipped causal steps' KV index at the frontier so their dead
    # K/V^T fetches are elided by the pipeline (same-index no-refetch —
    # see the standard kernel's _kv_idx for the full rationale)
    if causal and isinstance(causal_offset, int):
        def _kv_j(i, j):
            return jnp.minimum(j, ((i + 1) * bq - 1 + causal_offset) // bk)
    else:
        def _kv_j(i, j):
            return j
    in_specs = [
        pl.BlockSpec((1, 1, D, bq), lambda b, h, i, j: (b, h, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D),
                     lambda b, h, i, j, _g=group: (b, h // _g,
                                                   _kv_j(i, j), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, D, bk),
                     lambda b, h, i, j, _g=group: (b, h // _g, 0,
                                                   _kv_j(i, j)),
                     memory_space=pltpu.VMEM),
    ]
    args = [qT, k, vT]
    if carry is not None:
        # public carry layout matches _fa_kernel's: acc (B,Hq,Sq,D) f32,
        # m/l (B,Hq,Sq) f32 natural-log — transposed at the XLA boundary
        acc_in, m_in, l_in = carry
        pad_q = ((0, 0), (0, 0), (0, Sq_p - Sq), (0, 0))
        accT_in = jnp.swapaxes(
            jnp.pad(acc_in.astype(jnp.float32), pad_q), -1, -2)
        stats_in = []
        for t in (m_in, l_in):
            t = jnp.pad(t.astype(jnp.float32),
                        ((0, 0), (0, 0), (0, Sq_p - Sq)))
            stats_in.append(jnp.broadcast_to(t[:, :, None, :],
                                             (B, Hq, 8, Sq_p)))
        in_specs.extend([_accT_spec, _statT_spec, _statT_spec])
        args.extend([accT_in, *stats_in])

    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((8, bq), jnp.float32),     # m (row 0 live)
            pltpu.VMEM((8, bq), jnp.float32),     # l
            pltpu.VMEM((D, bq), jnp.float32),     # transposed accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * Hq * Sq * Skv * D * (0.5 if causal else 1.0)),
            bytes_accessed=int((q.size + k.size + v.size + q.size)
                               * q.dtype.itemsize),
            transcendentals=int(B * Hq * Sq * Skv),
        ),
        interpret=use_interpret() if interpret is None else interpret,
    )(*args)
    if return_carry:
        return (jnp.swapaxes(res[0], -1, -2)[:, :, :Sq],
                res[1][:, :, 0, :Sq], res[2][:, :, 0, :Sq])
    o = jnp.swapaxes(res[0], -1, -2)[:, :, :Sq].astype(orig_dtype)
    if return_stats:
        return o, res[1][:, :, 0, :Sq]
    return o


def attention_ref(q, k, v, *, causal=False, sm_scale=None,
                  alibi_slopes=None, segment_ids=None, softcap=None,
                  window=None, sinks=None):
    """Unfused XLA reference (the reference harness's `unfused attention`,
    flash_attn_mma.py:384), with GQA broadcast."""
    B, Hq, Sq, D = q.shape
    _, Hkv, Skv, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    if Hkv != Hq:
        k = jnp.repeat(k, Hq // Hkv, axis=1)
        v = jnp.repeat(v, Hq // Hkv, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * sm_scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    if alibi_slopes is not None:
        rel = (jnp.arange(Skv)[None, :] - jnp.arange(Sq)[:, None]
               ).astype(jnp.float32)
        s = s + jnp.asarray(alibi_slopes, jnp.float32)[None, :, None, None] * rel
    if causal:
        mask = jnp.tril(jnp.ones((Sq, Skv), bool))
        if window is not None:
            cols = jnp.arange(Skv)[None, :]
            rows = jnp.arange(Sq)[:, None]
            band = cols >= rows - window + 1
            if sinks is not None:
                band = band | (cols < sinks)
            mask = mask & band
        s = jnp.where(mask, s, -jnp.inf)
    if segment_ids is not None:
        q_seg, kv_seg = segment_ids
        match = q_seg[:, None, :, None] == kv_seg[:, None, None, :]
        s = jnp.where(match, s, -jnp.inf)
    # rows masked everywhere (e.g. a padding segment with no kv): define
    # the output as 0, matching the kernel's l == 0 guard
    all_masked = jnp.all(jnp.isneginf(s), axis=-1, keepdims=True)
    p = jax.nn.softmax(jnp.where(all_masked, 0.0, s), axis=-1)
    p = jnp.where(all_masked, 0.0, p)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST).astype(q.dtype)


def prefill_attention(q, k_cache, v_cache, k_new, v_new, **kw):
    """Chunked-prefill context attention: new-token queries q attend
    causally to cache + new K/V (prefix_prefill.py analog)."""
    k = jnp.concatenate([k_cache, k_new], axis=2)
    v = jnp.concatenate([v_cache, v_new], axis=2)
    offset = k.shape[2] - q.shape[2]
    return flash_attention(q, k, v, causal=True, causal_offset=offset, **kw)


def attention_ref_offset(q, k, v, *, causal_offset=0, sm_scale=None):
    """Reference for offset-causal (prefill) attention."""
    B, Hq, Sq, D = q.shape
    Skv = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * sm_scale
    mask = (jnp.arange(Skv)[None, :]
            <= jnp.arange(Sq)[:, None] + causal_offset)
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST).astype(q.dtype)


def sdpa_xla(q, k, v, *, causal=False, sm_scale=None):
    """XLA fused SDPA baseline (the torch-SDPA role, flash_attn_mma.py:391)."""
    B, Hq, Sq, D = q.shape
    _, Hkv, _, _ = k.shape
    if Hkv != Hq:
        k = jnp.repeat(k, Hq // Hkv, axis=1)
        v = jnp.repeat(v, Hq // Hkv, axis=1)
    # jax.nn.dot_product_attention expects (B, S, H, D)
    o = jax.nn.dot_product_attention(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
        scale=sm_scale, is_causal=causal)
    return o.swapaxes(1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_trainable(q, k, v, causal=False, sm_scale=None,
                              window=None, softcap=None, segment_ids=None):
    """Differentiable FA-2: Pallas forward saving (o, lse) residuals,
    Pallas dQ/dKV backward kernels (ops/attention_bwd.py) — no S^2 matrix
    is materialized in either direction. (The reference library itself is
    forward-only.) window (causal sliding window), softcap (Gemma-style
    logit cap) and segment_ids (packed sequences; int arrays, zero
    cotangent) differentiate through the featured backward kernels."""
    return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale,
                           window=window, softcap=softcap,
                           segment_ids=segment_ids)


def _fat_fwd(q, k, v, causal, sm_scale, window, softcap, segment_ids):
    o, lse = flash_attention(q, k, v, causal=causal, sm_scale=sm_scale,
                             window=window, softcap=softcap,
                             segment_ids=segment_ids, return_stats=True)
    return o, (q, k, v, o, lse, segment_ids)


def _fat_bwd(causal, sm_scale, window, softcap, res, g):
    from tpukern.ops.attention_bwd import flash_attention_bwd
    q, k, v, o, lse, segment_ids = res
    kw = dict(causal=causal, sm_scale=sm_scale, window=window,
              softcap=softcap, segment_ids=segment_ids)
    B, Hq, Sq, D = q.shape
    Hkv = k.shape[1]
    if segment_ids is None:
        seg_ct = (None,)
    else:
        seg_ct = (tuple(np.zeros(s.shape, dtype=jax.dtypes.float0)
                        for s in segment_ids),)
    if Hkv != Hq:
        group = Hq // Hkv
        k_full = jnp.repeat(k, group, axis=1)
        v_full = jnp.repeat(v, group, axis=1)
        dq, dk_full, dv_full = flash_attention_bwd(
            q, k_full, v_full, o, lse, g, **kw)
        Skv = k.shape[2]
        dk = dk_full.reshape(B, Hkv, group, Skv, D).sum(2).astype(k.dtype)
        dv = dv_full.reshape(B, Hkv, group, Skv, D).sum(2).astype(v.dtype)
        return (dq, dk, dv) + seg_ct
    return flash_attention_bwd(q, k, v, o, lse, g, **kw) + seg_ct


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


# tuned on v5e at (B,H,S,D)=(4,48,8192,64): (bq,bk)=(1024,2048) 73.7
# TFLOPS > (1024,1024) 71.1 > (512,1024) 63.3 >> (128,128) 7.5 — grid-step
# overhead dominates small tiles; VPU softmax work bounds large ones.
_VARIANTS = [
    ("mha_splitq_bf16", jnp.bfloat16, dict()),
    ("mha_splitq_bf16_hyper", jnp.bfloat16,
     dict(block_q=1024, block_k=2048)),
    ("mha_splitq_f32", jnp.float32, dict(block_q=256, block_k=512)),
    ("mha_splitq_f16", jnp.float16, dict()),
    ("mha_splitq_bf16_stage2", jnp.bfloat16, dict(block_k=256)),
    ("mha_splitq_bf16_stage4", jnp.bfloat16, dict(block_k=512)),
    ("mha_splitq_bf16_bigq", jnp.bfloat16, dict(block_q=1024, block_k=1024)),
    ("mha_splitq_bf16_accbf16", jnp.bfloat16, dict(acc_dtype=jnp.bfloat16)),
    # split-softmax tier: two independent per-block softmax chains merged
    # in-kernel (FA-3 overlap idea as ILP). Measured perf-neutral at the
    # tuned blocks — see body_duo's docstring for the numbers.
    ("mha_splitq_bf16_duo", jnp.bfloat16, dict(duo=True)),
]


def _fa_flops(q, k, v, **kw):
    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    f = 4 * B * H * Sq * Skv * D
    return f // 2 if kw.get("causal") else f


def _check_headdim(name, q):
    """Enforce the per-variant head-dim capability table (the
    MAX_HEADDIM_CFG skip logic, flash_attn_mma.py:436-506): a clear error
    instead of an opaque Mosaic VMEM failure."""
    limit = MAX_HEADDIM.get(name)
    if limit is not None and q.shape[-1] > limit:
        raise ValueError(
            f"attention variant {name!r} supports head dim <= {limit}, "
            f"got D={q.shape[-1]} (see MAX_HEADDIM)")


for _name, _dt, _kw in _VARIANTS:
    def _fn(q, k, v, _dt=_dt, _kw=_kw, _name=_name, **kw):
        _check_headdim(_name, q)
        return flash_attention(q.astype(_dt), k.astype(_dt), v.astype(_dt),
                               **{**_kw, **kw})
    register("attention", _name, ref=attention_ref, flops=_fa_flops)(_fn)

def _fn_tpv(q, k, v, **kw):
    _check_headdim("mha_splitq_bf16_tpv", q)
    bf = jnp.bfloat16
    return flash_attention_tpv(q.astype(bf), k.astype(bf), v.astype(bf),
                               **kw)


MAX_HEADDIM["mha_splitq_bf16_tpv"] = 256
register("attention", "mha_splitq_bf16_tpv", ref=attention_ref,
         flops=_fa_flops)(_fn_tpv)

register("attention", "mha_xla_sdpa", ref=attention_ref, flops=_fa_flops,
         tags=("baseline",))(
    lambda q, k, v, **kw: sdpa_xla(q, k, v, **kw))
register("attention", "mha_unfused", ref=attention_ref, flops=_fa_flops,
         tags=("baseline",))(
    lambda q, k, v, **kw: attention_ref(q, k, v, **kw))


# -- External TPU baselines (the "official flash_attn_func" role the
# reference harness benchmarks against, flash_attn_mma.py:521-593). These
# are jax.experimental library kernels used purely as comparison targets.
try:
    from jax.experimental.pallas.ops.tpu import (
        flash_attention as _jax_fa)
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as _sak,
        splash_attention_mask as _sam)

    def jax_flash_baseline(q, k, v, *, causal=False, sm_scale=None, **_):
        if sm_scale is None:
            sm_scale = 1.0 / math.sqrt(q.shape[-1])
        return _jax_fa.flash_attention(q, k, v, causal=causal,
                                       sm_scale=sm_scale)

    def splash_baseline(q, k, v, *, causal=False, sm_scale=None,
                        block_q=None, block_kv=None, **_):
        B, H, S, D = q.shape
        if sm_scale is None:
            sm_scale = 1.0 / math.sqrt(D)
        mask = (_sam.CausalMask((S, S)) if causal
                else _sam.FullMask((S, S)))
        mh = _sam.MultiHeadMask([mask] * H)
        bs = None
        if block_q or block_kv:
            bs = _sak.BlockSizes(block_q=min(block_q or 512, S),
                                 block_kv=min(block_kv or 1024, S))
        kernel = _sak.make_splash_mha(mh, block_sizes=bs, head_shards=1,
                                      q_seq_shards=1)
        return jax.vmap(kernel)((q * sm_scale).astype(q.dtype), k, v)

    register("attention", "mha_jax_flash", ref=attention_ref,
             flops=_fa_flops, tags=("baseline", "tpu-only"))(
        jax_flash_baseline)
    register("attention", "mha_splash", ref=attention_ref,
             flops=_fa_flops, tags=("baseline", "tpu-only"))(
        splash_baseline)
    # tuned-vs-tuned is the honest comparison (round-1 VERDICT: beating
    # splash at its DEFAULT blocks is a misconfigured baseline, not a win)
    register("attention", "mha_splash_tuned", ref=attention_ref,
             flops=_fa_flops, tags=("baseline", "tpu-only"))(
        lambda q, k, v, **kw: splash_baseline(
            q, k, v, block_q=1024, block_kv=2048, **kw))
except ImportError:  # keep the registry usable without these modules
    pass


def flash_attention_splitkv(q, k, v, *, num_splits=4, causal=False,
                            sm_scale=None, block_q=None, block_k=None,
                            interpret=None):
    """Split-KV attention (the FA-1-style family,
    flash_attn_mma_split_kv.cu): KV is partitioned into `num_splits`
    ranges computed as independent partial attentions (extra parallelism
    when Q is short and KV long — the flash-decoding regime), then merged
    exactly via their log-sum-exp stats — the same cross-partial combine
    ring attention uses at chip granularity.
    """
    B, Hq, Sq, D = q.shape
    Skv = k.shape[2]
    assert Skv % num_splits == 0
    chunk = Skv // num_splits
    if causal:
        assert Sq == Skv, "causal split-kv expects square attention"

    os, lses = [], []
    for s in range(num_splits):
        ks = k[:, :, s * chunk:(s + 1) * chunk]
        vs = v[:, :, s * chunk:(s + 1) * chunk]
        o_p, lse_p = flash_attention(
            q, ks, vs, causal=causal, sm_scale=sm_scale, block_q=block_q,
            block_k=block_k, return_stats=True, interpret=interpret,
            causal_offset=-s * chunk if causal else 0)
        os.append(o_p.astype(jnp.float32))
        lses.append(lse_p)

    o_acc, lse_acc = os[0], lses[0]
    for o_p, lse_p in zip(os[1:], lses[1:]):
        m = jnp.maximum(lse_acc, lse_p)
        w1 = jnp.exp(lse_acc - m)[..., None]
        w2 = jnp.exp(lse_p - m)[..., None]
        denom = w1 + w2
        o_acc = (o_acc * w1 + o_p * w2) / jnp.where(denom == 0, 1.0, denom)
        lse_acc = m + jnp.log(jnp.maximum(w1 + w2, 1e-37))[..., 0]
    return o_acc.astype(q.dtype)


register("attention", "mha_splitkv_bf16", ref=attention_ref,
         flops=_fa_flops)(
    lambda q, k, v, **kw: flash_attention_splitkv(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), **kw))
MAX_HEADDIM["mha_splitkv_bf16"] = 1024
