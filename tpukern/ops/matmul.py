"""The GEMM ladder: naive -> K-sliced -> pipelined -> grid-swizzled MXU tiles.

Reference: the toy-hgemm library (kernels/hgemm/, ~13.3k LoC) and
kernels/sgemm/sgemm.cu. Its optimization ladder is:
naive -> sliced-K -> thread-tile vectorized -> bank-conflict-free smem ->
double-buffered cp.async multi-stage rings (hgemm_mma_stage.cu:140-210) ->
ldmatrix/HMMA16816 MMA -> block swizzle for L2 locality (:1940-1965) ->
XOR smem swizzle (mma/swizzle/).

TPU mapping (see SURVEY.md §2.4):
- tensor-core MMA tiles        -> MXU via jnp.dot/dot_general on (bm,bk)x(bk,bn)
  VMEM tiles with f32 accumulation (preferred_element_type),
- cp.async multi-stage ring    -> Pallas's implicit double-buffered grid
  pipeline over the K ("arbitrary") grid axis; the `stages` knob maps to the
  K block size (HBM transfer granularity),
- smem padding / XOR swizzle   -> unnecessary (no banked smem); Mosaic picks
  VMEM layouts,
- block swizzle (L2 locality)  -> grid band traversal via BlockSpec
  index_map remapping ("swizzled" variants): a B column band is kept
  stationary across many A row blocks, which lets Pallas's revisiting
  optimization skip HBM re-fetches,
- cuBLAS baseline              -> jnp.dot (XLA) `*_xla` variants.

sgemm = f32, hgemm = bf16 (TPU-native half type; a true-f16 variant is kept
for reference parity), qgemm = int8 -> int32.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import (cdiv, kernel_dtype, round_up,
                          to_kernel_dtype, use_interpret)
from tpukern.core.registry import register


def _pad_k(a, b, bk, trans_b):
    K = a.shape[1]
    Kp = round_up(K, bk)
    if Kp != K:
        a = jnp.pad(a, ((0, 0), (0, Kp - K)))
        b = jnp.pad(b, ((0, 0), (0, Kp - K))) if trans_b \
            else jnp.pad(b, ((0, Kp - K), (0, 0)))
    return a, b


def matmul(a, b, *, block_m=512, block_n=1024, block_k=512,
           acc_dtype=jnp.float32, out_dtype=None, trans_b=False,
           swizzle=0, eager_store=False, input_fusion=False,
           acc_in_out=False, buffer_count=None, lookahead=False,
           jitter=None, interpret=None):
    """C[M,N] = A[M,K] @ B[K,N] (or B[N,K] if trans_b) on the MXU.

    3-D grid (M, N, K blocks), K innermost with "arbitrary" semantics so
    Pallas double-buffers the A/B tile streams (the cp.async-stage analog);
    f32 (or i32) accumulator lives in VMEM scratch across K steps.
    swizzle > 0 enables band traversal: a band of `swizzle` B-column blocks
    is processed for all M row blocks before moving on (the block-swizzle
    analog of hgemm_mma_stage.cu:1940-1965). f16 is storage-only on TPU:
    upcast at the XLA boundary, computed in f32, cast back.
    buffer_count/lookahead control the A/B input pipeline depth (the
    K_STAGE knob, hgemm_mma_stage.cu:111-210): lookahead prefetches the
    next (i, j) tile's operands across the tile switch, hiding the output
    flush bubble.
    jitter: optional scalar added to the accumulator init (computes
    A@B + jitter). Benchmark loops pass a loop-index-derived epsilon here
    so the kernel call is loop-variant (XLA cannot hoist it) WITHOUT a
    materialized input-perturbation pass — an opaque kernel cannot absorb
    an input perturbation the way XLA fuses one into its own matmul, so
    perturbing inputs instead would bill ~2 full HBM passes per iteration
    against the kernel (see harness.bench.device_time).
    """
    if out_dtype is None:
        # acc_in_out's natural output IS the accumulator; only an explicit
        # lower-precision out_dtype engages the dual-output epilogue
        out_dtype = jnp.dtype(acc_dtype) if acc_in_out else a.dtype
    k_out = kernel_dtype(out_dtype)
    a, b = to_kernel_dtype(a), to_kernel_dtype(b)
    M, K = a.shape
    N = b.shape[0] if trans_b else b.shape[1]
    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    # Non-multiple K is masked IN-KERNEL on the tail step (k_len below)
    # instead of materializing zero-padded copies of A and B at the XLA
    # boundary: the old _pad_k route cost ~2 full HBM passes — ~20% of
    # the kernel's own time at the odd 4352-class sizes (VERDICT r2
    # item 6). M/N tails need no masking: undefined pad rows/columns only
    # produce output positions the grid clips on write-back.
    k_len = K if K % bk else None
    nI, nJ, nK = cdiv(M, bm), cdiv(N, bn), cdiv(K, bk)

    if trans_b:
        dn = (((1,), (1,)), ((), ()))
        b_block = lambda bn_, bk_: (bn_, bk_)
        b_idx = lambda k, j: (j, k)
    else:
        dn = (((1,), (0,)), ((), ()))
        b_block = lambda bn_, bk_: (bk_, bn_)
        b_idx = lambda k, j: (k, j)

    has_jit = jitter is not None

    def _mm_acc(a_ref, b_ref, acc_ref, k_axis):
        """acc += A_blk @ B_blk, masking the K overhang on the tail step
        only (two disjoint pl.when bodies — the same specialization trick
        as the FA causal diagonal, so full blocks pay zero mask cost)."""
        def step(tail):
            a_t, b_t = a_ref[...], b_ref[...]
            if tail:
                # the block overhangs K: zero the undefined contraction
                # columns of A and rows of B (HBM pad garbage can be
                # Inf/NaN, and 0 * Inf = NaN — so BOTH sides are masked)
                off = (pl.num_programs(k_axis) - 1) * bk
                ai = jax.lax.broadcasted_iota(jnp.int32, a_t.shape, 1) + off
                a_t = jnp.where(ai < k_len, a_t, jnp.zeros_like(a_t))
                bi = jax.lax.broadcasted_iota(
                    jnp.int32, b_t.shape, 1 if trans_b else 0) + off
                b_t = jnp.where(bi < k_len, b_t, jnp.zeros_like(b_t))
            acc_ref[...] += jax.lax.dot_general(
                a_t, b_t, dimension_numbers=dn,
                preferred_element_type=acc_dtype)

        if k_len is None:
            step(False)
        else:
            is_tail = pl.program_id(k_axis) == pl.num_programs(k_axis) - 1
            pl.when(jnp.logical_not(is_tail))(lambda: step(False))
            pl.when(is_tail)(lambda: step(True))

    def _init(ref, j_ref):
        # accumulator init: zeros, or the benchmark jitter scalar (a
        # runtime value Mosaic cannot fold — keeps timing loops honest)
        if has_jit:
            ref[...] = jnp.full_like(ref, j_ref[0, 0])
        else:
            ref[...] = jnp.zeros_like(ref)

    def kernel_accio(*refs, k_axis):
        # accumulate straight into the output block: it stays VMEM-resident
        # while (i, j) is unchanged, so this halves VMEM vs a separate
        # scratch tile AND removes the scratch->output copy (measured ~25%
        # faster than the scratch design on v5e)
        a_ref, b_ref = refs[:2]
        j_ref = refs[2] if has_jit else None
        o_ref = refs[-1]

        @pl.when(pl.program_id(k_axis) == 0)
        def _():
            _init(o_ref, j_ref)

        _mm_acc(a_ref, b_ref, o_ref, k_axis)

    def kernel_accio_dual(*refs, k_axis):
        # same, plus a low-precision second output written on the last K
        # step (f32 accumulator output + bf16 result output)
        a_ref, b_ref = refs[:2]
        j_ref = refs[2] if has_jit else None
        oacc_ref, o_ref = refs[-2:]

        @pl.when(pl.program_id(k_axis) == 0)
        def _():
            _init(oacc_ref, j_ref)

        _mm_acc(a_ref, b_ref, oacc_ref, k_axis)

        @pl.when(pl.program_id(k_axis) == pl.num_programs(k_axis) - 1)
        def _():
            o_ref[...] = oacc_ref[...].astype(o_ref.dtype)

    def kernel(*refs, k_axis):
        a_ref, b_ref = refs[:2]
        j_ref = refs[2] if has_jit else None
        o_ref, acc_ref = refs[-2:]

        @pl.when(pl.program_id(k_axis) == 0)
        def _():
            _init(acc_ref, j_ref)

        _mm_acc(a_ref, b_ref, acc_ref, k_axis)

        if eager_store:
            # unconditional store packs into the same instruction bundle as
            # the matmul (no branch); the VMEM output block is only flushed
            # to HBM when the grid moves to the next (i, j) tile
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)
        else:
            @pl.when(pl.program_id(k_axis) == pl.num_programs(k_axis) - 1)
            def _():
                o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    cost = pl.CostEstimate(
        flops=int(2 * M * N * K),
        bytes_accessed=int((M * K + K * N) * a.dtype.itemsize
                           + M * N * jnp.dtype(out_dtype).itemsize),
        transcendentals=0,
    )

    pmode = (pl.Buffered(buffer_count=buffer_count or 2,
                         use_lookahead=lookahead)
             if (buffer_count or lookahead) else None)
    if swizzle and nJ > swizzle:
        # largest divisor of nJ <= requested band width
        s = max(d for d in range(1, swizzle + 1) if nJ % d == 0)
        grid = (nJ // s, nI, s, nK)
        in_specs = [
            pl.BlockSpec((bm, bk), lambda band, i, js, k: (i, k),
                         memory_space=pltpu.VMEM, pipeline_mode=pmode),
            pl.BlockSpec(b_block(bn, bk),
                         lambda band, i, js, k, _s=s: b_idx(k, band * _s + js),
                         memory_space=pltpu.VMEM, pipeline_mode=pmode),
        ]
        out_spec = pl.BlockSpec((bm, bn),
                                lambda band, i, js, k, _s=s: (i, band * _s + js),
                                memory_space=pltpu.VMEM)
        semantics = ("arbitrary", "arbitrary", "arbitrary", "arbitrary")
        k_axis = 3
    else:
        grid = (nI, nJ, nK)
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM, pipeline_mode=pmode),
            pl.BlockSpec(b_block(bn, bk), lambda i, j, k: b_idx(k, j),
                         memory_space=pltpu.VMEM, pipeline_mode=pmode),
        ]
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                memory_space=pltpu.VMEM)
        semantics = ("parallel", "parallel", "arbitrary")
        k_axis = 2

    args = [a, b]
    if has_jit:
        in_specs.append(pl.BlockSpec(
            (1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM))
        args.append(jnp.asarray(jitter, jnp.float32).reshape(1, 1))

    cp_kwargs = dict(dimension_semantics=semantics)
    if input_fusion:
        # let XLA fuse elementwise producers into the kernel's operand reads
        cp_kwargs["allow_input_fusion"] = [True, True]
    if acc_in_out and k_out == jnp.dtype(acc_dtype):
        body = functools.partial(kernel_accio, k_axis=k_axis)
        out_shape = jax.ShapeDtypeStruct((M, N), jnp.dtype(acc_dtype))
        out_specs = out_spec
        scratch = []
        pick = None
    elif acc_in_out:
        body = functools.partial(kernel_accio_dual, k_axis=k_axis)
        out_shape = (jax.ShapeDtypeStruct((M, N), jnp.dtype(acc_dtype)),
                     jax.ShapeDtypeStruct((M, N), k_out))
        out_specs = (out_spec, out_spec)
        scratch = []
        pick = 1
    else:
        body = functools.partial(kernel, k_axis=k_axis)
        out_shape = jax.ShapeDtypeStruct((M, N), k_out)
        out_specs = out_spec
        scratch = [pltpu.VMEM((bm, bn), acc_dtype)]
        pick = None
    out = pl.pallas_call(
        body,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(**cp_kwargs),
        cost_estimate=cost,
        interpret=use_interpret() if interpret is None else interpret,
    )(*args)
    if pick is not None:
        out = out[pick]
    return out.astype(out_dtype)


def matmul_kpipe(a, b, *, block_m=1024, block_n=1024, block_k=512,
                 out_dtype=None, trans_b=False, jitter=None,
                 interpret=None):
    """K-pipelined tier: 2-D outer grid over (M, N) output tiles; the K
    loop runs INSIDE the kernel as a pltpu.emit_pipeline with
    double-buffered HBM->VMEM copies (the cp.async K_STAGE ring,
    hgemm_mma_stage.cu:111-210). Collapsing the K grid axis cuts the
    per-grid-step overhead by nK (measured ~1us/step through this stack —
    the pinned-operand diagnostic in tools/gemm_tune.py showed that
    overhead, not DMA, bounds the 3-D-grid design).

    f32 output accumulates directly in the output block; other out dtypes
    accumulate in an f32 VMEM scratch and downcast once per tile.
    """
    if out_dtype is None:
        out_dtype = a.dtype
    k_out = kernel_dtype(out_dtype)
    a, b = to_kernel_dtype(a), to_kernel_dtype(b)
    M, K = a.shape
    N = b.shape[0] if trans_b else b.shape[1]
    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    a, b = _pad_k(a, b, bk, trans_b)
    nI, nJ, nK = cdiv(M, bm), cdiv(N, bn), cdiv(a.shape[1], bk)

    if trans_b:
        dn = (((1,), (1,)), ((), ()))
        b_bs = lambda j: pl.BlockSpec((bn, bk), lambda k, _j=j: (_j, k))
    else:
        dn = (((1,), (0,)), ((), ()))
        b_bs = lambda j: pl.BlockSpec((bk, bn), lambda k, _j=j: (k, _j))

    direct = k_out == jnp.float32
    has_jit = jitter is not None

    def kernel(*refs):
        if has_jit:
            a_hbm, b_hbm, j_ref = refs[:3]
            rest = refs[3:]
        else:
            a_hbm, b_hbm = refs[:2]
            j_ref = None
            rest = refs[2:]
        o_ref = rest[0]
        maybe_acc = rest[1:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        acc = maybe_acc[0] if maybe_acc else o_ref

        if has_jit:
            acc[...] = jnp.full_like(acc, j_ref[0, 0])
        else:
            acc[...] = jnp.zeros_like(acc)

        def inner(a_vm, b_vm):
            acc[...] += jax.lax.dot_general(
                a_vm[...], b_vm[...], dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        pltpu.emit_pipeline(
            inner, grid=(nK,),
            in_specs=[pl.BlockSpec((bm, bk), lambda k, _i=i: (_i, k)),
                      b_bs(j)],
        )(a_hbm, b_hbm)

        if not direct:
            o_ref[...] = acc[...].astype(o_ref.dtype)

    args = [a, b]
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY)]
    if has_jit:
        in_specs.append(pl.BlockSpec(
            (1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM))
        args.append(jnp.asarray(jitter, jnp.float32).reshape(1, 1))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), k_out),
        grid=(nI, nJ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=([] if direct
                        else [pltpu.VMEM((bm, bn), jnp.float32)]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * M * N * K),
            bytes_accessed=int((M * K + K * N) * a.dtype.itemsize
                               + M * N * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=use_interpret() if interpret is None else interpret,
    )(*args)
    return out.astype(out_dtype)


def matmul_naive(a, b, *, block_m=256, block_n=256, out_dtype=None,
                 interpret=None):
    """Whole-K-resident naive tier (hgemm_naive_f16, hgemm.cu:23): one dot
    per output block, no K pipeline."""
    if out_dtype is None:
        out_dtype = a.dtype
    k_out = kernel_dtype(out_dtype)
    a, b = to_kernel_dtype(a), to_kernel_dtype(b)
    M, K = a.shape
    N = b.shape[1]
    bm, bn = min(block_m, M), min(block_n, N)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32
                             ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), k_out),
        grid=(cdiv(M, bm), cdiv(N, bn)),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=use_interpret() if interpret is None else interpret,
    )(a, b)
    return out.astype(out_dtype)


@functools.lru_cache(maxsize=512)
def auto_blocks(M, N, K, peak_flops=197e12, hbm_bw=819e9,
                vmem_budget=10 * 2 ** 20, step_overhead=1.2e-7):
    """Shape-aware block sizes from an analytic roofline model. Fixed
    1024-blocks collapse to 46-77% of XLA at non-multiple sizes from tail
    padding (e.g. M=2304 pads 33% of MXU rows), but pure
    padding-minimization picks tiles so small the kernel goes HBM-bound
    (operand re-reads scale with the block counts). This search scores
    every (block_m, block_n, block_k) candidate by
    max(padded FLOPs / peak, HBM bytes / bw) + grid-step overhead under
    the VMEM budget and keeps the cheapest. Granularity: block_m is only
    a sublane dim (16); block_n/block_k are lane dims (128).

    Exact tilings (zero padding in every dim) get a 1.5 MB budget bonus:
    at 3328 (=26*128) the exact (832,1664,256) config needs 10.9 MB and
    measured 144.9 TFLOPS vs 129.4 for the best under-10MB padded pick
    (88% vs 80% of XLA) — still well below the ~13 MB Mosaic
    scoped-vmem failure zone.

    The K axis searches deeper (max_n=64) when K > 12288: K blocks are
    pure streaming granularity (no operand re-reads scale with nK), and
    the 24-block cap silently excluded bk=512 at K=16384 — the measured
    ~100%-of-XLA config — leaving the flagship size at 95.8% in round 3's
    first sweep. Below 12288 the cap never binds on bk >= 512, so the
    extension is scoped to where the cap was the problem.

    Round 4 recalibration (tools/gemm_odd_probe.py): (1) block_m also
    admits EXACT divisors of M up to 1536 — the MXU only needs sublane
    (16) alignment there, and the measured 4352/5888 winners are the
    exact-quarter tilings (1088x896x256 = 97.0% and 1472-row = 95.9% of
    XLA) that the old 1024 cap excluded; (2) step_overhead drops 7e-7 ->
    1.2e-7, calibrated against the direct 0.17 us/grid-step probe
    (tools/overhead_probe.py, round 3) and the odd-class probes: the old
    value overbilled many-step exact-K tilings ~4x, steering the model
    away from measured winners. Every pick this changes (11 of 32 sizes
    on the 256..8192 fine-sweep grid) is hardware-validated old-vs-new
    in BENCH_NOTES round 4."""
    def sizes(d, gran, cap, max_n=24, exact_to=0):
        out = []
        for n in range(1, min(-(-d // gran), max_n) + 1):
            b = min(cap, -(-(-(-d // n)) // gran) * gran)
            if n * b >= d and (not out or b != out[-1]):
                out.append(b)
        for b in range(cap + gran, exact_to + 1, gran):
            if d % b == 0:
                out.append(b)
        return sorted(set(out), reverse=True)

    best = None
    for bm in sizes(M, 16, 1024, exact_to=1536):
        for bn in sizes(N, 128, 2048):
            for bk in sizes(K, 128, 2048, max_n=64 if K > 12288 else 24):
                # scratch-accumulator bf16-out budget (the general case):
                # f32 acc + bf16 out + double-buffered bf16 A/B tiles
                vmem = bm * bn * 6 + 4 * bm * bk + 4 * bk * bn
                nI, nJ, nK = cdiv(M, bm), cdiv(N, bn), cdiv(K, bk)
                Mp, Np, Kp = nI * bm, nJ * bn, nK * bk
                exact = (Mp, Np, Kp) == (M, N, K)
                # round-5 (tools/gemm_odd_probe.py at 5888): tilings
                # exact in M and K with <=5% N pad get a 2 MB bonus —
                # the measured 5888 winner (1472x1024x256, 96.3% of XLA
                # vs 95.1% for the 10 MB pick) needs 11.6 MB, still
                # under the ~13 MB Mosaic scoped-vmem failure zone. On
                # the 256..8192+flagship grid this moves ONLY the 5888
                # pick (sim in BENCH_NOTES round 5).
                mk_exact = Mp == M and Kp == K and (Np - N) / N <= 0.05
                bonus = (1_572_864 if exact
                         else 2_097_152 if mk_exact else 0)
                if vmem > vmem_budget + bonus:
                    continue
                t_mxu = 2 * Mp * Np * Kp / peak_flops
                bytes_ = 2 * (nJ * Mp * Kp + nI * Kp * Np) + 2 * Mp * Np
                # 1.25x: DMA never overlaps perfectly near the roofline
                # (measured: traffic-heavy picks undershoot the plain max)
                t_hbm = 1.25 * bytes_ / hbm_bw
                cost = max(t_mxu, t_hbm) + nI * nJ * nK * step_overhead
                if best is None or cost < best[0]:
                    best = (cost, dict(block_m=bm, block_n=bn, block_k=bk))
    return best[1]


def hgemm(a, b, **kw):
    """Flagship BF16 GEMM (toy-hgemm's hgemm_mma_...stages_dsmem role):
    1024x1024x512 MXU tiles. With f32 output (pass out_dtype=jnp.float32)
    it accumulates in the output block at ~chip peak (201 TFLOPS on v5e);
    the default bf16 output uses the scratch-accumulator epilogue (the
    dual-output variant measured slower — see BENCH_NOTES.md)."""
    M, K = a.shape
    N = b.shape[0] if kw.get("trans_b") else b.shape[1]
    auto = auto_blocks(M, N, K)
    kw.setdefault("block_m", auto["block_m"])
    kw.setdefault("block_n", auto["block_n"])
    kw.setdefault("block_k", auto["block_k"])
    if jnp.dtype(kw.get("out_dtype") or jnp.bfloat16) == jnp.float32:
        kw.setdefault("acc_in_out", True)
    return matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), **kw)


def _mm_ref(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


def _mm_tn_ref(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(a.dtype)


def _flops(a, b, **_):
    M, K = a.shape
    N = b.shape[0] if b.shape[1] == K and b.shape[0] != K else b.shape[1]
    return 2 * M * N * K


_VARIANTS = [
    # sgemm ladder (f32; reference kernels/sgemm/sgemm.cu)
    ("sgemm_naive_f32", matmul_naive, jnp.float32, {}),
    ("sgemm_ksliced_f32", matmul, jnp.float32,
     dict(block_m=256, block_n=256, block_k=256)),
    ("sgemm_pipelined_f32", matmul, jnp.float32,
     dict(block_m=256, block_n=512, block_k=512)),
    ("sgemm_swizzled_f32", matmul, jnp.float32,
     dict(block_m=256, block_n=512, block_k=512, swizzle=4)),
    # hgemm ladder (bf16; reference kernels/hgemm/)
    ("hgemm_naive_bf16", matmul_naive, jnp.bfloat16, {}),
    ("hgemm_ksliced_bf16", matmul, jnp.bfloat16,
     dict(block_m=256, block_n=256, block_k=256)),
    ("hgemm_stage_bk256_bf16", matmul, jnp.bfloat16,
     dict(block_m=512, block_n=1024, block_k=256)),
    ("hgemm_stage_bk512_bf16", matmul, jnp.bfloat16,
     dict(block_m=512, block_n=1024, block_k=512)),
    ("hgemm_stage_bk1024_bf16", matmul, jnp.bfloat16,
     dict(block_m=512, block_n=1024, block_k=1024)),
    ("hgemm_swizzled_bf16", matmul, jnp.bfloat16,
     dict(block_m=512, block_n=512, block_k=512, swizzle=4)),
    ("hgemm_accio_bf16", matmul, jnp.bfloat16,
     dict(block_m=1024, block_n=1024, block_k=512, acc_in_out=True,
          out_dtype=jnp.bfloat16)),
    ("hgemm_accio_bf16_f32acc", matmul, jnp.bfloat16,
     dict(block_m=1024, block_n=1024, block_k=512, acc_in_out=True)),
    ("sgemm_accio_f32", matmul, jnp.float32,
     dict(block_m=512, block_n=1024, block_k=512, acc_in_out=True)),
    ("hgemm_accbf16_bf16", matmul, jnp.bfloat16,
     dict(block_m=512, block_n=1024, block_k=512, acc_dtype=jnp.bfloat16)),
    ("hgemm_f16", matmul, jnp.float16,
     dict(block_m=512, block_n=1024, block_k=512)),
]

for _name, _impl, _dt, _kw in _VARIANTS:
    def _fn(a, b, _impl=_impl, _dt=_dt, _kw=_kw, **kw):
        return _impl(a.astype(_dt), b.astype(_dt), **{**_kw, **kw})
    register("matmul", _name, ref=_mm_ref, flops=_flops)(_fn)


def _tn_fn(a, b, **kw):
    cfg = dict(block_m=512, block_n=1024, block_k=512, trans_b=True)
    return matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                  **{**cfg, **kw})

register("matmul", "hgemm_tn_bf16", ref=_mm_tn_ref, flops=_flops)(_tn_fn)


def _qgemm(a, b, **kw):
    cfg = dict(block_m=512, block_n=512, block_k=512,
               acc_dtype=jnp.int32, out_dtype=jnp.int32)
    return matmul(a.astype(jnp.int8), b.astype(jnp.int8), **{**cfg, **kw})

register("matmul", "qgemm_i8_i32",
         ref=lambda a, b: jnp.dot(a.astype(jnp.int32), b.astype(jnp.int32)),
         flops=_flops)(_qgemm)

# XLA baselines (the cuBLAS role, kernels/hgemm/cublas/hgemm_cublas.cu)
register("matmul", "sgemm_xla_f32", ref=_mm_ref, flops=_flops,
         tags=("baseline",))(
    lambda a, b, **kw: jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32),
                               preferred_element_type=jnp.float32))
register("matmul", "hgemm_xla_bf16", ref=_mm_ref, flops=_flops,
         tags=("baseline",))(
    lambda a, b, **kw: jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16))
