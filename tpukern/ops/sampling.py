"""Token sampling: streaming greedy / gumbel-max kernels + logit filters.

Reference role: the reference has no sampling kernels (it is a kernel
zoo, not a serving stack); this family completes OUR serving path
(models/serving.py, models/batcher.py), which until now sampled with
`jnp.argmax` / `jax.random.categorical` — an XLA chain that materializes
softmax probabilities and a (B, V) noise tensor.

TPU design: sampling from logits is one linear pass over the vocab, so
it belongs in a single Pallas kernel. The gumbel-max trick turns
categorical sampling into `argmax(logits/T + g)`, g ~ Gumbel(0,1), and
the argmax streams over vocab-column blocks exactly like the CE family's
online max (ops/cross_entropy.py): carry (best value, best index) per
row in VMEM scratch, finalize on the last block. Gumbel noise comes from
the ON-CHIP PRNG (pltpu.prng_seed / prng_random_bits — same mechanism as
ops/quant.py stochastic rounding), so no noise tensor ever exists in
HBM. top-k / top-p / min-p restriction enters the same kernel as a
per-row logit threshold computed in XLA:

- top-k: k-th largest logit via lax.top_k (no full sort),
- top-p: smallest kept logit of the nucleus via one descending sort,
- min-p: pure math, no sort at all — keep p_i >= min_p * p_max
  <=> logit_i >= max_logit + T*log(min_p).

Greedy (temperature 0) is the same kernel without noise and matches
`jnp.argmax` bit-exactly (first-occurrence tie-breaking in both the
in-block min-index reduction and the strict > cross-block carry).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import LANES, cdiv, round_up, use_interpret
from tpukern.core.registry import register

NEG_BIG = -0.7 * 3.4e38
_IDX_BIG = np.int32(2**31 - 1)


def _sample_kernel(seed_ref, x_ref, thr_ref, *rest, block_v, n_v, vocab,
                   inv_temp, gumbel, threshold):
    # gumbel == "input": rest = (noise_ref, idx_ref, bv_ref, bi_ref)
    # otherwise:         rest = (idx_ref, bv_ref, bi_ref)
    if gumbel == "input":
        noise_ref, idx_ref, bv_ref, bi_ref = rest
    else:
        idx_ref, bv_ref, bi_ref = rest
    ji = pl.program_id(1)

    @pl.when(ji == 0)
    def _():
        bv_ref[...] = jnp.full_like(bv_ref, NEG_BIG)
        bi_ref[...] = jnp.zeros_like(bi_ref)

    x = x_ref[...].astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + ji * block_v
    live = cols < vocab if vocab % block_v else None
    if threshold:
        # threshold is in RAW logit units (computed pre-temperature)
        keep = x >= thr_ref[:, :1]
        live = keep if live is None else jnp.logical_and(live, keep)
    if inv_temp != 1.0:
        x = x * inv_temp
    if gumbel == "prng":
        # on-chip PRNG; decorrelate blocks: one seed per
        # (row-block, vocab-block)
        pltpu.prng_seed(seed_ref[0]
                        + pl.program_id(0) * n_v + pl.program_id(1))
        bits = pltpu.prng_random_bits(x.shape)
        # low 23 bits -> u in (0,1) (never 0: +0.5 before scaling), then
        # g = -log(-log u); Mosaic can't cast uint32->f32, go via int32
        bits23 = jnp.bitwise_and(pltpu.bitcast(bits, jnp.int32),
                                 jnp.int32(0x7FFFFF))
        u = (bits23.astype(jnp.float32) + 0.5) * (1.0 / 8388608.0)
        x = x + (-jnp.log(-jnp.log(u)))
    elif gumbel == "input":
        # interpret-mode fallback (pltpu PRNG has no CPU lowering):
        # the gumbel tensor is precomputed in XLA and streamed in
        x = x + noise_ref[...]
    if live is not None:
        x = jnp.where(live, x, NEG_BIG)

    m = jnp.max(x, axis=-1, keepdims=True)
    idx = jnp.min(jnp.where(x == m, cols, _IDX_BIG), axis=-1, keepdims=True)
    better = m > bv_ref[:, :1]
    bi_ref[:, :1] = jnp.where(better, idx, bi_ref[:, :1])
    bv_ref[:, :1] = jnp.where(better, m, bv_ref[:, :1])

    @pl.when(ji == n_v - 1)
    def _():
        idx_ref[...] = jnp.broadcast_to(bi_ref[:, :1], idx_ref.shape)


def _stream_sample(logits, seed, *, inv_temp, gumbel, thresholds=None,
                   block_b=None, block_v=None, interpret=None):
    B, V = logits.shape
    bb = block_b or min(round_up(B, 8), 64)
    bv = block_v or min(round_up(V, LANES), 8192)
    Bp, Vp = round_up(B, bb), round_up(V, bv)
    x = logits
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if Vp != V:
        x = jnp.pad(x, ((0, 0), (0, Vp - V)))
    n_v = Vp // bv
    interpret = use_interpret() if interpret is None else interpret
    has_thr = thresholds is not None
    if has_thr:
        thr = jnp.broadcast_to(
            jnp.pad(thresholds.astype(jnp.float32), (0, Bp - B),
                    constant_values=NEG_BIG)[:, None], (Bp, LANES))
    else:
        thr = jnp.zeros((Bp, LANES), jnp.float32)
    gmode = False
    inputs = [jnp.asarray([seed], jnp.int32), x, thr]
    blk = pl.BlockSpec((bb, bv), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), blk,
                pl.BlockSpec((bb, LANES), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)]
    if gumbel:
        if interpret:
            gmode = "input"
            g = jax.random.gumbel(jax.random.key(seed), (Bp, Vp),
                                  jnp.float32)
            inputs.append(g)
            in_specs.append(blk)
        else:
            gmode = "prng"
    kernel = functools.partial(
        _sample_kernel, block_v=bv, n_v=n_v, vocab=V,
        inv_temp=float(inv_temp), gumbel=gmode, threshold=has_thr)
    stat = pl.BlockSpec((bb, LANES), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    idx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, LANES), jnp.int32),
        grid=(Bp // bb, n_v),
        in_specs=in_specs,
        out_specs=stat,
        scratch_shapes=[pltpu.VMEM((bb, LANES), jnp.float32),
                        pltpu.VMEM((bb, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    return idx[:B, 0]


# ---------------------------------------------------------------------------
# threshold kernel: exact k-th value / nucleus boundary in ONE HBM pass
#
# lax.top_k and jnp.sort over a 128k vocab cost 8-10 ms on v5e — 50-100x
# the sampling pass itself. The selection problem needs no sort: keep the
# whole (bb, V) row block VMEM-resident and bisect the threshold in the
# BIT space of the logits. bitcast(f32) with the sign-fold
# (i < 0 -> i ^ 0x7fffffff) is monotone in the float value, so 33
# integer bisection steps (each one masked count/mass reduction over the
# resident block) isolate the boundary EXACTLY — no float-epsilon games —
# and a final min-reduction snaps the threshold to an actual data value.

_I32_MIN = np.int32(-2**31)
_I32_MAX = np.int32(2**31 - 1)


def _keys_of(x):
    """Monotone int32 total-order keys of f32 values."""
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(i < 0, jnp.bitwise_xor(i, _I32_MAX), i)


def _unkey(k):
    i = jnp.where(k < 0, jnp.bitwise_xor(k, _I32_MAX), k)
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _threshold_kernel(x_ref, thr_ref, *, vocab, mode, kk, pp, inv_temp):
    x = x_ref[...].astype(jnp.float32)
    if vocab % x.shape[-1] or x.shape[-1] != vocab:
        cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(cols < vocab, x, NEG_BIG)
    keys = _keys_of(x)
    if mode == "mass":
        m = jnp.max(x, axis=-1, keepdims=True)
        w = jnp.exp((x - m) * inv_temp)
        target = pp * jnp.sum(w, axis=-1, keepdims=True)

    def q_of(mid):
        """Q(mid) = 'everything STRICTLY above mid is not enough yet'
        (count < k / mass < p) — monotone non-decreasing in mid."""
        above = keys > mid
        if mode == "count":
            return (jnp.sum(above.astype(jnp.int32), axis=-1,
                            keepdims=True) < kk)
        return jnp.sum(jnp.where(above, w, 0.0), axis=-1,
                       keepdims=True) < target

    rows = x.shape[0]

    def body(_, carry):
        lo, hi = carry
        # overflow-safe floor((lo + hi) / 2)
        mid = (lo >> 1) + (hi >> 1) + jnp.bitwise_and(
            jnp.bitwise_and(lo, hi), 1)
        q = q_of(mid)
        return (jnp.where(q, lo, mid), jnp.where(q, mid, hi))

    lo = jnp.full((rows, 1), _I32_MIN, jnp.int32)
    hi = jnp.full((rows, 1), _I32_MAX, jnp.int32)
    lo, _ = jax.lax.fori_loop(0, 33, body, (lo, hi))
    # boundary data key = min key strictly above lo (Q holds exactly for
    # keys > lo); always exists because Q(rowmax) is true
    bk = jnp.min(jnp.where(keys > lo, keys, _I32_MAX), axis=-1,
                 keepdims=True)
    thr_ref[...] = jnp.broadcast_to(_unkey(bk), thr_ref.shape)


def _bisect_threshold(logits, *, mode, kk=0, pp=1.0, inv_temp=1.0,
                      interpret=None):
    B, V = logits.shape
    bb = min(round_up(B, 8), 8)
    Bp = round_up(B, bb)
    Vp = round_up(V, LANES)
    x = logits.astype(jnp.float32)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    if Vp != V:
        x = jnp.pad(x, ((0, 0), (0, Vp - V)))
    kernel = functools.partial(_threshold_kernel, vocab=V, mode=mode,
                               kk=int(kk), pp=float(pp),
                               inv_temp=float(inv_temp))
    thr = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, LANES), jnp.float32),
        grid=(Bp // bb,),
        in_specs=[pl.BlockSpec((bb, Vp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=use_interpret() if interpret is None else interpret,
    )(x)
    return thr[:B, 0]


# the one-pass kernel holds (x, keys[, w]) rows in VMEM: 8-12 bytes/elem
# x 8 rows -> V up to ~1M; beyond that fall back to the XLA paths
_BISECT_MAX_V = 1 << 20


# ---------------------------------------------------------------------------
# thresholds (per row, in raw logit units)

def topk_threshold(logits, k, use_kernel=True):
    """k-th largest logit per row (keep logit >= this <=> top-k set)."""
    if use_kernel and logits.shape[1] <= _BISECT_MAX_V:
        return _bisect_threshold(logits, mode="count", kk=k)
    return jax.lax.top_k(logits, k)[0][:, -1]


def topp_threshold(logits, p, temperature=1.0, use_kernel=True):
    """Smallest kept logit of the nucleus: keep a token iff the
    probability mass STRICTLY above its logit is < p (equivalently: sort
    descending, keep while the cumulative probability BEFORE a token is
    < p — always keeps the top token; includes the token crossing p).

    Kernel path: one-pass bit-space bisection of the mass predicate; XLA
    path: descending sort + cumsum. Both give the same boundary up to
    float-accumulation order on the mass sums."""
    if use_kernel and logits.shape[1] <= _BISECT_MAX_V:
        return _bisect_threshold(logits, mode="mass", pp=p,
                                 inv_temp=1.0 / temperature)
    srt = jnp.sort(logits, axis=-1)[:, ::-1].astype(jnp.float32)
    pr = jax.nn.softmax(srt / temperature, axis=-1)
    cum = jnp.cumsum(pr, axis=-1) - pr
    kept = cum < p
    # threshold = min logit among kept = the logit at the last kept slot
    last = jnp.sum(kept.astype(jnp.int32), axis=-1) - 1
    return jnp.take_along_axis(srt, last[:, None], axis=-1)[:, 0]


def minp_threshold(logits, min_p, temperature=1.0):
    """Sort-free: keep p_i >= min_p * p_max <=>
    logit_i >= max_logit + T*log(min_p)."""
    return (jnp.max(logits.astype(jnp.float32), axis=-1)
            + temperature * float(np.log(min_p)))


# ---------------------------------------------------------------------------
# public API

def greedy_sample(logits, **kw):
    """Streaming argmax over vocab blocks; bit-exact vs jnp.argmax."""
    return _stream_sample(logits, 0, inv_temp=1.0, gumbel=False, **kw)


def sample(logits, seed, temperature=1.0, top_k=0, top_p=1.0, min_p=0.0,
           **kw):
    """One fused sampling pass: categorical over softmax(logits/T)
    restricted to the top-k / top-p / min-p support. temperature == 0
    degrades to greedy. Deterministic per (seed, shape)."""
    if temperature == 0.0:
        return greedy_sample(logits, **kw)
    thr = None

    def _merge(t):
        nonlocal thr
        thr = t if thr is None else jnp.maximum(thr, t)

    if top_k:
        _merge(topk_threshold(logits, top_k))
    if top_p < 1.0:
        _merge(topp_threshold(logits, top_p, temperature))
    if min_p > 0.0:
        _merge(minp_threshold(logits, min_p, temperature))
    return _stream_sample(logits, seed, inv_temp=1.0 / temperature,
                          gumbel=True, thresholds=thr, **kw)


def sample_ref(logits, key, temperature=1.0, top_k=0, top_p=1.0,
               min_p=0.0):
    """XLA reference: same support restriction, jax.random.categorical."""
    x = logits.astype(jnp.float32)
    if temperature == 0.0:
        return jnp.argmax(x, axis=-1).astype(jnp.int32)
    thr = jnp.full((x.shape[0],), NEG_BIG, jnp.float32)
    if top_k:
        thr = jnp.maximum(thr, topk_threshold(x, top_k))
    if top_p < 1.0:
        thr = jnp.maximum(thr, topp_threshold(x, top_p, temperature))
    if min_p > 0.0:
        thr = jnp.maximum(thr, minp_threshold(x, min_p, temperature))
    x = jnp.where(x >= thr[:, None], x, NEG_BIG)
    return jax.random.categorical(key, x / temperature,
                                  axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# registry

def _argmax_ref(logits, *a, **k):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@register("sampling", "greedy_stream", ref=_argmax_ref,
          bytes_moved=lambda x, *a, **k: x.size * x.dtype.itemsize,
          doc="streaming Pallas argmax (bit-exact greedy)")
def _greedy(logits, **kw):
    return greedy_sample(logits)


@register("sampling", "gumbel_stream",
          bytes_moved=lambda x, *a, **k: x.size * x.dtype.itemsize,
          doc="fused gumbel-max categorical, on-chip PRNG")
def _gumbel(logits, seed=0, **kw):
    return sample(logits, seed, temperature=1.0)


@register("sampling", "topk_gumbel_stream",
          bytes_moved=lambda x, *a, **k: 2 * x.size * x.dtype.itemsize,
          doc="top-k (lax.top_k threshold) + fused gumbel pass")
def _topk(logits, seed=0, k=40, **kw):
    return sample(logits, seed, temperature=1.0, top_k=k)


@register("sampling", "topp_gumbel_stream",
          bytes_moved=lambda x, *a, **k: 3 * x.size * x.dtype.itemsize,
          doc="top-p (one sort) + fused gumbel pass")
def _topp(logits, seed=0, p=0.9, **kw):
    return sample(logits, seed, temperature=1.0, top_p=p)


@register("sampling", "minp_gumbel_stream",
          bytes_moved=lambda x, *a, **k: 2 * x.size * x.dtype.itemsize,
          doc="min-p (sort-free threshold) + fused gumbel pass")
def _minp(logits, seed=0, mp=0.05, **kw):
    return sample(logits, seed, temperature=1.0, min_p=mp)


@register("sampling", "greedy_xla", ref=_argmax_ref, tags=("baseline",),
          bytes_moved=lambda x, *a, **k: x.size * x.dtype.itemsize,
          doc="jnp.argmax baseline")
def _greedy_xla(logits, **kw):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@register("sampling", "categorical_xla", tags=("baseline",),
          bytes_moved=lambda x, *a, **k: x.size * x.dtype.itemsize,
          doc="jax.random.categorical baseline (materialized noise)")
def _cat_xla(logits, seed=0, **kw):
    return jax.random.categorical(jax.random.key(seed), logits,
                                  axis=-1).astype(jnp.int32)
