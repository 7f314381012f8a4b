"""Grouped (ragged) GEMM — per-expert matmul over tokens sorted by group.

The MoE production path (models/moe.py moe_block_ragged) contracts a
token matrix whose rows are grouped by expert against a stack of expert
weights: y[rows_e] = x[rows_e] @ w[e]. The reference repo's MoE story is
a set of 0-byte placeholder files (SURVEY.md §2.5), and its dense-GEMM
library (kernels/hgemm/) has no ragged analog — XLA's `lax.ragged_dot`
is the stock TPU lowering. This family is the megablocks-style Pallas
version: group boundaries are NOT padded to tile multiples, so FLOPs
scale with sum(group_sizes) rather than E * ceil-padded capacity.

Design (TPU-first, not a CUDA translation):

- The grid's tile axis enumerates (m-block, group) work items. An
  m-block may be visited by several consecutive tiles — one per
  non-empty group whose rows intersect it — and each group boundary
  inside a block adds at most one extra tile, so the static tile count
  is bounded by ceil(T/bm) + E - 1; the actual schedule (which group, which
  m-block, the live row range, whether this is the block's first visit)
  is computed from `group_sizes` with jnp and handed to the kernel as a
  scalar-prefetch (SMEM) table, exactly like the paged-attention page
  tables (ops/paged_attention.py).
- Grid order is (n, tile, k) with k innermost: the f32 accumulator
  lives in VMEM scratch across k steps, and when a boundary m-block is
  visited by consecutive tiles (groups e, e+1, ...) the OUTPUT block
  index is unchanged, so the block stays VMEM-resident and each later
  visit merges its disjoint row range into the prior ones with a masked
  add — no atomics, no second HBM pass (the same revisit contract the
  accio matmul kernels rely on, ops/matmul.py kernel_accio). Tests
  cover 8 groups landing in a single m-block.
- Phantom tiles (the static bound minus the actual tile count) re-visit
  the last real tile with an empty row range: every ref they touch is
  in range and the masked merge writes back the block unchanged, so
  they are idempotent no-ops rather than branches.

dw (the tokens-transposed contraction, out[e] = x[rows_e]^T @ dy[rows_e])
uses the same tile table with the roles swapped: the tile axis is
innermost so consecutive tiles of one group accumulate into the same
VMEM-resident (e, k, n) output block; rows are masked BEFORE the dot
because there they feed the contraction. Empty groups own no tiles, so
their (uninitialized) dw slabs are zeroed by the caller with a
broadcast `where` (grouped_matmul's VJP does this).

Rows beyond sum(group_sizes) belong to no group: their output rows are
unspecified (matching lax.ragged_dot), and they never contaminate any
group's result.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core.registry import register


def _ceil_div(a, b):
    return -(-a // b)


def _tile_table(group_sizes, T, bm, n_tiles):
    """(6, n_tiles) i32 schedule: group id, m-tile, row start, row end,
    first-visit-of-m-block, first-tile-of-group. Traced (jnp) — group
    sizes are runtime values; only the tile COUNT is static."""
    gs = group_sizes.astype(jnp.int32)
    E = gs.shape[0]
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(gs)])
    starts, ends = offs[:-1], offs[1:]
    first_blk = starts // bm
    per_group = jnp.where(gs > 0, (ends - 1) // bm - first_blk + 1, 0)
    cum = jnp.cumsum(per_group)
    total = cum[-1]

    idx = jnp.arange(n_tiles, dtype=jnp.int32)
    grp = jnp.searchsorted(cum, idx, side="right").astype(jnp.int32)
    grp = jnp.minimum(grp, E - 1)
    base = jnp.concatenate([jnp.zeros(1, jnp.int32), cum])[grp]
    m_tile = first_blk[grp] + (idx - base)

    # phantom tiles (idx >= total) re-visit the last real tile with an
    # empty row range — idempotent by construction
    last = jnp.maximum(total - 1, 0)
    phantom = idx >= total
    grp = jnp.where(phantom, grp[last], grp)
    m_tile = jnp.where(phantom, m_tile[last], m_tile)
    t_start = jnp.where(phantom, 0, starts[grp])
    t_end = jnp.where(phantom, 0, ends[grp])

    prev_m = jnp.concatenate([jnp.full((1,), -1, jnp.int32), m_tile[:-1]])
    first_visit = (m_tile != prev_m).astype(jnp.int32)
    prev_g = jnp.concatenate([jnp.full((1,), -1, jnp.int32), grp[:-1]])
    first_of_group = jnp.logical_and(grp != prev_g,
                                     jnp.logical_not(phantom))
    return jnp.stack([grp, m_tile, t_start, t_end, first_visit,
                      first_of_group.astype(jnp.int32)])


def _pick_block(dim, want):
    """Largest multiple of 128 that divides `dim` and is <= want, falling
    back to `dim` itself for small sizes."""
    if dim <= want:
        return dim
    for b in range(want, 127, -128):
        if dim % b == 0:
            return b
    return dim  # no 128-multiple divisor <= want: single block


def gmm(x, w, group_sizes, *, block_m=512, block_n=2048, block_k=512,
        trans_w=False, out_dtype=None, interpret=None):
    """y[rows_e] = x[rows_e] @ w[e] (trans_w: @ w[e]^T).

    x: (T, K) rows sorted by group; w: (E, K, N) — or (E, N, K) with
    trans_w=True; group_sizes: (E,) i32, sum <= T. Returns (T, N).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, K = x.shape
    E = group_sizes.shape[0]
    if trans_w:
        _, N, Kw = w.shape
    else:
        _, Kw, N = w.shape
    assert Kw == K, (w.shape, x.shape)
    out_dtype = out_dtype or x.dtype

    bm = min(block_m, _ceil_div(T, 1))
    # only the CONTRACTION block must divide (K tails aren't masked);
    # N-tail blocks are clipped on store, so bn can overhang — a narrow
    # dividing bn (e.g. 128 for N = 11*128) would starve the MXU, and
    # covering N in ONE block when it fits removes every x refetch and
    # second w pass (measured 112 vs 75 TFLOPS at N=1408, tools/gmm_tune)
    bk = _pick_block(K, block_k)
    bn = min(block_n, -(-N // 128) * 128)
    assert K % bk == 0, (K, bk)

    m_blocks = _ceil_div(T, bm)
    n_tiles = m_blocks + E - 1
    n_blocks = _ceil_div(N, bn)
    k_blocks = K // bk

    meta = _tile_table(group_sizes, T, bm, n_tiles)

    def kernel(meta_ref, x_ref, w_ref, o_ref, acc_ref):
        g = pl.program_id(1)
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        if trans_w:
            dn = (((1,), (1,)), ((), ()))
        else:
            dn = (((1,), (0,)), ((), ()))

        # phantom tiles (and empty groups) have an empty row range: the
        # masked write below discards acc anyway, so skip their MXU work
        @pl.when(meta_ref[2, g] < meta_ref[3, g])
        def _():
            acc_ref[...] += lax.dot_general(
                x_ref[...], w_ref[0], dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            row = meta_ref[1, g] * bm + lax.broadcasted_iota(
                jnp.int32, (bm, bn), 0)
            mask = jnp.logical_and(row >= meta_ref[2, g],
                                   row < meta_ref[3, g])
            contrib = jnp.where(mask, acc_ref[...], 0.0)
            # boundary m-blocks are visited by two consecutive tiles with
            # disjoint row masks; the block stays VMEM-resident between
            # them, so the merge is a masked add onto the prior visit
            prev = jnp.where(meta_ref[4, g] > 0, 0.0,
                             o_ref[...].astype(jnp.float32))
            o_ref[...] = (prev + contrib).astype(o_ref.dtype)

    if trans_w:
        w_spec = pl.BlockSpec((1, bn, bk),
                              lambda n, g, k, m: (m[0, g], n, k))
    else:
        w_spec = pl.BlockSpec((1, bk, bn),
                              lambda n, g, k, m: (m[0, g], k, n))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_tiles, k_blocks),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda n, g, k, m: (m[1, g], k)),
            w_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, g, k, m: (m[1, g], n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(meta, x, w)


def tgmm(x, dy, group_sizes, *, block_m=512, block_k=512, block_n=512,
         out_dtype=None, interpret=None):
    """out[e] = x[rows_e]^T @ dy[rows_e] — the dw contraction.

    x: (T, K), dy: (T, N), rows sorted by group. Returns (E, K, N).
    Empty groups' slabs are left unwritten (caller zeros them — see
    grouped_matmul's VJP).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, K = x.shape
    Td, N = dy.shape
    assert Td == T
    E = group_sizes.shape[0]
    out_dtype = out_dtype or x.dtype

    bm = min(block_m, _ceil_div(T, 1))
    # K and N are OUTPUT dims here (the contraction is the masked token
    # axis), so both blocks may overhang — tails are clipped on store
    bk = min(block_k, -(-K // 128) * 128)
    bn = min(block_n, -(-N // 128) * 128)

    m_blocks = _ceil_div(T, bm)
    n_tiles = m_blocks + E - 1
    meta = _tile_table(group_sizes, T, bm, n_tiles)

    def kernel(meta_ref, x_ref, dy_ref, o_ref):
        g = pl.program_id(2)

        # phantom tiles have an empty row range: skip entirely (the
        # block's VMEM content from the last real tile flushes as-is)
        @pl.when(meta_ref[2, g] < meta_ref[3, g])
        def _():
            # rows feed the CONTRACTION here: mask before the dot
            row = meta_ref[1, g] * bm + lax.broadcasted_iota(
                jnp.int32, (bm, bk), 0)
            mask = jnp.logical_and(row >= meta_ref[2, g],
                                   row < meta_ref[3, g])
            xb = jnp.where(mask, x_ref[...], jnp.zeros_like(x_ref))
            contrib = lax.dot_general(
                xb, dy_ref[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # consecutive tiles of one group accumulate into the same
            # VMEM-resident (e, k, n) block
            prev = jnp.where(meta_ref[5, g] > 0, 0.0,
                             o_ref[0].astype(jnp.float32))
            o_ref[0] = (prev + contrib).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // bk if K % bk == 0 else _ceil_div(K, bk),
              _ceil_div(N, bn), n_tiles),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda k, n, g, m: (m[1, g], k)),
            pl.BlockSpec((bm, bn), lambda k, n, g, m: (m[1, g], n)),
        ],
        out_specs=pl.BlockSpec((1, bk, bn),
                               lambda k, n, g, m: (m[0, g], k, n)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, K, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(meta, x, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def grouped_matmul(x, w, group_sizes, config=None):
    """Differentiable grouped GEMM: y[rows_e] = x[rows_e] @ w[e].

    Drop-in for lax.ragged_dot((T,K), (E,K,N), (E,)) with a Pallas
    forward and Pallas dx/dw kernels. `config` (optional dict) passes
    block sizes through to gmm/tgmm.
    """
    return gmm(x, w, group_sizes, **(config or {}))


def _gm_fwd(x, w, group_sizes, config):
    return gmm(x, w, group_sizes, **(config or {})), (x, w, group_sizes)


def _gm_bwd(config, res, dy):
    x, w, group_sizes = res
    cfg = dict(config or {})
    dx = gmm(dy, w, group_sizes, trans_w=True,
             out_dtype=x.dtype, **cfg)
    dw = tgmm(x, dy, group_sizes, out_dtype=w.dtype, **cfg)
    dw = jnp.where((group_sizes > 0)[:, None, None], dw,
                   jnp.zeros_like(dw))
    return dx, dw, None


grouped_matmul.defvjp(_gm_fwd, _gm_bwd)


# ---------------------------------------------------------------- registry

def _ragged_ref(x, w, group_sizes, **_):
    return lax.ragged_dot(x, w, group_sizes.astype(jnp.int32))


def _gmm_flops(x, w, group_sizes, **_):
    # FLOPs scale with the ragged row count, not the padded grid
    K = x.shape[1]
    N = w.shape[-1]
    return 2 * int(jnp.sum(group_sizes)) * K * N


def _bf16(fn):
    def wrapped(x, w, group_sizes, **kw):
        return fn(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                  group_sizes, **kw)
    return wrapped


register("grouped_matmul", "gmm_bf16", ref=_ragged_ref,
         flops=_gmm_flops)(_bf16(gmm))
register("grouped_matmul", "gmm_f32", ref=_ragged_ref,
         flops=_gmm_flops)(gmm)
register("grouped_matmul", "gmm_ragged_dot_xla", ref=_ragged_ref,
         flops=_gmm_flops, tags=("baseline",))(_ragged_ref)


def _tgmm_ref(x, dy, group_sizes, **_):
    # XLA analog of the dw contraction: one-hot row->group matmul
    E = group_sizes.shape[0]
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(group_sizes.astype(jnp.int32))])
    rows = jnp.arange(x.shape[0])
    gid = jnp.searchsorted(offs[1:], rows, side="right")
    onehot = (gid[None, :] == jnp.arange(E)[:, None]).astype(x.dtype)
    xg = jnp.einsum("et,tk->etk", onehot, x)
    return jnp.einsum("etk,tn->ekn", xg, dy)


def _tgmm_zeroed(x, dy, group_sizes, **kw):
    # tgmm leaves empty-group slabs UNWRITTEN (documented above) while
    # _tgmm_ref returns zeros there — zero them here so a --check or
    # doc run with an empty-group split compares deterministically.
    dw = tgmm(x, dy, group_sizes, **kw)
    return jnp.where((group_sizes > 0)[:, None, None], dw,
                     jnp.zeros_like(dw))


register("grouped_matmul", "tgmm_f32", ref=_tgmm_ref,
         flops=lambda x, dy, gs, **_:
         2 * int(jnp.sum(gs)) * x.shape[1] * dy.shape[1])(_tgmm_zeroed)
