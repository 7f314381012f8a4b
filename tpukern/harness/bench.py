"""Benchmark/test harness: the TPU analog of the reference's per-op .py
harnesses.

Reference pattern (kernels/elementwise/elementwise.py:25-56,
kernels/hgemm/hgemm.py:85-192, kernels/flash-attn/flash_attn_mma.py:230-350):
`run_benchmark(fn, *args)` does warmup -> synchronized timing loop -> prints
the first output values + mean latency (+TFLOPS for GEMM/attention), with an
opt-in correctness check against a reference implementation. We keep that
exact workflow (block_until_ready replaces cuda.synchronize) and add
roofline fraction reporting (BASELINE.json north-star: "report roofline
fraction per kernel").
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpukern.core.tolerances import check_all_close

# v5e peak numbers (per chip). Used only for roofline fractions.
PEAKS = {
    "tpu v5 lite": dict(bf16_tflops=197.0, f32_tflops=98.0, hbm_gbps=819.0),
    "tpu v5": dict(bf16_tflops=459.0, f32_tflops=229.0, hbm_gbps=2765.0),
    "tpu v6 lite": dict(bf16_tflops=918.0, f32_tflops=459.0, hbm_gbps=1640.0),
    "cpu": dict(bf16_tflops=1.0, f32_tflops=1.0, hbm_gbps=50.0),
}


def device_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in PEAKS.items():
        if key in kind:
            return peaks
    return PEAKS["cpu"]


def pretty_print_line(msg: str = "", sep: str = "-", width: int = 120):
    """Sectioned stdout dividers (reference hgemm/tools/utils.py:96-102)."""
    if not msg:
        print(sep * width)
        return
    pad = max(width - len(msg) - 2, 0)
    left = pad // 2
    print(f"{sep * left} {msg} {sep * (pad - left)}")


def _perturb(x, i):
    """Loop-index-dependent no-op-sized perturbation: defeats loop-invariant
    code motion without changing values meaningfully."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x + (i.astype(jnp.float32) * 1e-30).astype(x.dtype)
    if jnp.issubdtype(x.dtype, jnp.integer):
        # i % 2 is loop-variant and unfoldable (XLA range-analysis proves
        # i >= 0, so `i < 0` perturbations get folded away and the whole
        # kernel hoisted)
        return x + (i % 2).astype(x.dtype)
    return x


def _consume(out):
    """Reduce every float/int leaf so XLA cannot dead-code the computation."""
    total = jnp.float32(0.0)
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            total += jnp.sum(leaf).astype(jnp.float32)
    return total


def device_time(fn, *args, iters_lo=4, iters_hi=20, jitter_kw=None, **kw):
    """Per-call device seconds via an ON-DEVICE fori_loop, two-point slope.

    Host-side timing is unreliable on remote-tunneled TPUs (dispatch is
    fire-and-forget; block_until_ready has ~tens-of-ms RPC latency), so the
    repetition loop runs inside one jit program: each iteration perturbs an
    input by the loop index (prevents hoisting) and folds the full output
    into the carry (prevents dead-code elimination). Two loop lengths cancel
    the fixed RPC/dispatch overhead.

    jitter_kw: name of a scalar keyword the candidate accepts (e.g.
    matmul's `jitter`). When set, the loop passes i*1e-30 through that
    keyword INSTEAD of perturbing the first input. XLA fuses an input
    perturbation into its own ops for free, but it must materialize a
    perturbed copy (two full HBM passes) in front of an opaque Pallas
    kernel — which would bill ~10% phantom time to any kernel whose
    input size is comparable to its compute. Kernels accept the scalar
    internally (accumulator-init fill) at true zero cost.
    """
    def make(iters):
        @jax.jit
        def looped(*a):
            def body(i, carry):
                if jitter_kw is None:
                    a2 = (_perturb(a[0], i),) + tuple(a[1:])
                    kw2 = kw
                else:
                    a2 = a
                    kw2 = {**kw,
                           jitter_kw: i.astype(jnp.float32) * 1e-30}
                out = fn(*a2, **kw2)
                # The timed op must MATERIALIZE its declared outputs: the
                # barrier stops XLA from fusing the carry-reduce into the
                # op's epilogue and skipping the HBM output write — which
                # would make fusible XLA baselines look faster than any
                # opaque kernel with the same contract (the reference's
                # cuBLAS comparisons also make both sides write C).
                out = lax.optimization_barrier(out)
                return carry + _consume(out)
            return lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return looped

    def measure(lo, hi):
        times = {}
        for iters in (lo, hi):
            f = make(iters)
            np.asarray(f(*args))  # settle compile + queue
            best = float("inf")
            for _ in range(2):    # min-of-2 guards transient contention
                t0 = time.perf_counter()
                np.asarray(f(*args))
                best = min(best, time.perf_counter() - t0)
            times[iters] = best
        return times

    times = measure(iters_lo, iters_hi)
    window = times[iters_hi] - times[iters_lo]
    # RPC jitter is ~1-2 ms: grow the loop until the measured window is
    # comfortably above it (fast kernels need thousands of iterations).
    # A negative window IS jitter — estimate per-iter from the long run
    # net of the ~26 ms fixed RPC overhead and rescale from that.
    if window < 0.1:
        per_est = max(window / (iters_hi - iters_lo),
                      (times[iters_hi] - 0.026) / iters_hi, 2e-6)
        scale = min(max(int(0.15 / (per_est * (iters_hi - iters_lo))), 2),
                    1000)
        iters_lo, iters_hi = iters_lo * scale, iters_hi * scale
        times = measure(iters_lo, iters_hi)
        window = times[iters_hi] - times[iters_lo]
    sec = window / (iters_hi - iters_lo)
    if sec <= 0:  # contention artifact: fall back to the long run alone
        sec = max(times[iters_hi] - 0.026, 1e-6) / iters_hi
    return sec


def time_fn(fn, *args, warmup=3, iters=20, **kw):
    """Mean seconds per call. On TPU, uses the on-device slope timer; on
    CPU/interpret, synchronized wall-clock."""
    r = fn(*args, **kw)
    if jax.default_backend() == "tpu":
        try:
            return device_time(fn, *args, iters_lo=max(2, iters // 5),
                               iters_hi=iters, **kw), r
        except Exception:
            pass  # fall back to wall clock (e.g. non-jittable fn)
    for _ in range(warmup - 1):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters, r


@dataclasses.dataclass
class BenchResult:
    tag: str
    mean_ms: float
    tflops: float | None = None
    gbps: float | None = None
    roofline_frac: float | None = None
    max_diff: float | None = None
    mean_diff: float | None = None
    out_head: tuple = ()
    # True when every timing retry implied >103% of a hardware peak —
    # the sample is a tunnel glitch, not a real rate; consumers that
    # don't print (show=False) must check this before trusting mean_ms.
    glitch: bool = False


def run_benchmark(fn, *args, tag="", warmup=3, iters=20, flops=None,
                  bytes_moved=None, ref=None, check=False, check_dtype=None,
                  show=True, peak_tflops=None, **kw) -> BenchResult:
    """Time fn(*args), optionally check vs ref, print a reference-style row.

    flops/bytes_moved: numbers OR callables over args (registry models).
    """
    if callable(flops):
        flops = flops(*args, **kw)
    if callable(bytes_moved):
        bytes_moved = bytes_moved(*args, **kw)

    peaks = device_peaks()
    # A sample implying >103% of a hardware peak is a timing glitch (RPC
    # contention shrinking the wall-clock window through the remote
    # tunnel), not a real rate — re-measure up to twice and keep the
    # first PLAUSIBLE sample (same discard rule as bench.py). If every
    # retry stays above peak, keep the last sample but mark the result
    # glitched so non-printing consumers see it too. Frozen family-doc
    # logs must never publish impossible physics (VERDICT r2).
    glitch = True
    for attempt in range(3):
        sec, out = time_fn(fn, *args, warmup=warmup, iters=iters, **kw)
        fracs = []
        if flops:
            fracs.append(flops / sec / 1e12
                         / (peak_tflops or peaks["bf16_tflops"]))
        if bytes_moved:
            fracs.append(bytes_moved / sec / 1e9 / peaks["hbm_gbps"])
        if not fracs or max(fracs) <= 1.03:
            glitch = False
            break
    out0 = out[0] if isinstance(out, (tuple, list)) else out

    res = BenchResult(tag=tag, mean_ms=sec * 1e3, glitch=glitch)
    fracs = []
    if flops:
        res.tflops = flops / sec / 1e12
        peak = peak_tflops or peaks["bf16_tflops"]
        fracs.append(res.tflops / peak)
    if bytes_moved:
        res.gbps = bytes_moved / sec / 1e9
        fracs.append(res.gbps / peaks["hbm_gbps"])
    if fracs:
        res.roofline_frac = max(fracs)

    if check and ref is not None:
        expected = ref(*args, **kw)
        expected0 = expected[0] if isinstance(expected, (tuple, list)) else expected
        res.max_diff, res.mean_diff = check_all_close(
            out0, expected0, dtype=check_dtype or out0.dtype, name=tag)

    flat = np.asarray(out0).reshape(-1)
    res.out_head = tuple(float(v) for v in flat[:2])

    if show:
        parts = [f"{tag:<34}", f"out[:2]=[{res.out_head[0]:+.6f},"
                 f"{res.out_head[1]:+.6f}]" if len(res.out_head) >= 2 else "",
                 f"time:{res.mean_ms:9.4f} ms"]
        if res.tflops is not None:
            parts.append(f"{res.tflops:8.2f} TFLOPS")
        if res.gbps is not None:
            parts.append(f"{res.gbps:8.1f} GB/s")
        if res.roofline_frac is not None:
            parts.append(f"roofline:{100 * res.roofline_frac:5.1f}%")
            if res.glitch or res.roofline_frac > 1.03:
                parts.append("TIMING-GLITCH(>peak)")
        if res.max_diff is not None:
            parts.append(f"max_diff:{res.max_diff:.2e} mean:{res.mean_diff:.2e}")
        print(" ".join(p for p in parts if p))
    return res
