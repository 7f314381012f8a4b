"""Block autotune for the grouped-GEMM and w8a16 families on hardware.

Interleaves each candidate config with the XLA baseline in the same
pass (same-phase pairing — the tunnel's throughput drifts between
phases, BENCH_NOTES) and reports best-of-passes.

Usage: python tools/gmm_tune.py [--passes 3] [--which gmm,w8a16]

`--which splits` benchmarks gmm vs lax.ragged_dot across
balanced/skewed/empty-group token splits (the load shapes a real MoE
router produces), `--which msweep` sweeps w8a16 vs XLA's fused
dequant-dot and the bf16-weights anchor over M = 1..4096 including
forced-kernel points that pin the M>256 dispatch boundary
(VERDICT r3 item 2 / weak 7).
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpukern.harness.bench import device_time
from tpukern.ops.grouped_matmul import gmm
from tpukern.ops.matmul_w8a16 import matmul_w8a16, quantize_weights


def _t(fn, *args):
    return device_time(fn, *args, iters_lo=8, iters_hi=40)


def tune_gmm(passes):
    T, K, N, E = 8192, 2048, 1408, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((E, K, N)) * 0.05, jnp.bfloat16)
    gs = jnp.asarray([T // E] * E, jnp.int32)
    flops = 2 * T * K * N

    cands = {f"gmm_{bm}x{bn}x{bk}": (bm, bn, bk)
             for bm, bn, bk in [(512, 512, 512), (512, 1024, 512),
                                (1024, 512, 512), (1024, 1024, 512),
                                (512, 1536, 512), (256, 1024, 512),
                                (512, 1024, 1024), (1024, 1536, 512)]}
    best = {}
    for p in range(passes):
        tb = _t(jax.jit(lambda x, w, gs: lax.ragged_dot(x, w, gs)),
                x, w, gs)
        best["ragged_dot"] = min(best.get("ragged_dot", 9e9), tb)
        print(f"[pass{p}] ragged_dot {flops / tb / 1e12:7.1f} TFLOPS",
              flush=True)
        for name, (bm, bn, bk) in cands.items():
            try:
                t = _t(jax.jit(lambda x, w, gs, _b=(bm, bn, bk): gmm(
                    x, w, gs, block_m=_b[0], block_n=_b[1],
                    block_k=_b[2])), x, w, gs)
            except Exception as e:
                print(f"[pass{p}] {name} FAIL {str(e)[:80]}", flush=True)
                continue
            best[name] = min(best.get(name, 9e9), t)
            print(f"[pass{p}] {name} {flops / t / 1e12:7.1f} TFLOPS",
                  flush=True)
    print("\n== gmm best-of-passes (T=8192 K=2048 N=1408 E=8 bf16) ==")
    for name, t in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"{name:<22} {flops / t / 1e12:7.1f} TFLOPS  "
              f"{t / best['ragged_dot']:.2f}x ragged time")


def tune_w8a16(passes):
    K, N = 4096, 4096
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    q, s = quantize_weights(w)
    wb = (q.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)
    for M in (16, 4096):
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        flops = 2 * M * K * N
        cands = {f"w8a16_{bm}x{bn}x{bk}": (bm, bn, bk)
                 for bm, bn, bk in [(1024, 1024, 512), (512, 512, 512),
                                    (1024, 512, 512), (512, 1024, 512),
                                    (1024, 1024, 1024), (1024, 2048, 512),
                                    (1024, 4096, 512), (256, 4096, 512)]
                 if bm <= max(M, 256)} or {
                     "w8a16_dflt": (min(M, 1024), 1024, 512)}
        if M == 16:
            cands = {f"w8a16_16x{bn}x{bk}": (16, bn, bk)
                     for bn, bk in [(512, 512), (1024, 512), (2048, 512),
                                    (4096, 512), (1024, 1024),
                                    (2048, 1024), (512, 2048),
                                    (4096, 1024), (1024, 2048)]}
        best = {}
        for p in range(passes):
            tb = _t(jax.jit(lambda x, w: jnp.dot(
                x, w, preferred_element_type=jnp.float32
                ).astype(x.dtype)), x, wb)
            best["bf16_xla"] = min(best.get("bf16_xla", 9e9), tb)
            td = _t(jax.jit(lambda x, q, s: jnp.dot(
                x, q.astype(jnp.bfloat16) * s[None, :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(x.dtype)),
                x, q, s)
            best["dequant_xla"] = min(best.get("dequant_xla", 9e9), td)
            for name, (bm, bn, bk) in cands.items():
                try:
                    t = _t(jax.jit(lambda x, q, s, _b=(bm, bn, bk):
                                   matmul_w8a16(
                                       x, q, s, block_m=_b[0],
                                       block_n=_b[1], block_k=_b[2])),
                           x, q, s)
                except Exception as e:
                    print(f"[pass{p}] {name} FAIL {str(e)[:80]}",
                          flush=True)
                    continue
                best[name] = min(best.get(name, 9e9), t)
            print(f"[pass{p}] M={M} done", flush=True)
        print(f"\n== w8a16 best-of-passes (M={M} K={K} N={N}) ==")
        for name, t in sorted(best.items(), key=lambda kv: kv[1]):
            gbs = q.size / t / 1e9
            print(f"{name:<22} {flops / t / 1e12:7.2f} TFLOPS  "
                  f"{gbs:7.1f} GB/s(w)  {t * 1e3:7.3f} ms")


def gmm_splits(passes):
    """gmm vs lax.ragged_dot across router-realistic token splits.

    All splits sum to T so the useful-FLOPs basis is identical; what
    changes is tile-table shape (boundary blocks, phantom tiles) and,
    for ragged_dot, whatever XLA's lowering does with imbalance."""
    T, K, N, E = 8192, 2048, 1408, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((E, K, N)) * 0.05, jnp.bfloat16)
    flops = 2 * T * K * N
    splits = {
        "balanced": [1024] * 8,
        "skewed_2x": [2048, 2048, 1024, 1024, 512, 512, 512, 512],
        "hot_expert": [4096, 1536, 1024, 512, 512, 256, 128, 128],
        "two_empty": [2048, 0, 2560, 2048, 0, 1024, 256, 256],
        "one_hot": [8192, 0, 0, 0, 0, 0, 0, 0],
    }
    fns = {
        "ragged_dot": jax.jit(lambda x, w, gs: lax.ragged_dot(x, w, gs)),
        "gmm": jax.jit(lambda x, w, gs: gmm(x, w, gs)),
        "gmm_512x1024x512": jax.jit(lambda x, w, gs: gmm(
            x, w, gs, block_m=512, block_n=1024, block_k=512)),
    }
    best = {}
    for p in range(passes):
        for sname, gs_l in splits.items():
            assert sum(gs_l) == T and len(gs_l) == E
            gs = jnp.asarray(gs_l, jnp.int32)
            for fname, fn in fns.items():
                t = _t(fn, x, w, gs)
                best[sname, fname] = min(best.get((sname, fname), 9e9), t)
        print(f"[pass{p}] splits done", flush=True)
    # correctness cross-check at the worst split (phantom tiles + empties)
    gs = jnp.asarray(splits["two_empty"], jnp.int32)
    d = float(jnp.max(jnp.abs(
        fns["gmm"](x, w, gs).astype(jnp.float32)
        - fns["ragged_dot"](x, w, gs).astype(jnp.float32))))
    print(f"\n== gmm vs ragged_dot by split (T={T} K={K} N={N} E={E} "
          f"bf16; TFLOPS on the sum(group_sizes) basis) ==")
    print(f"{'split':<12} " + " ".join(f"{n:>18}" for n in fns)
          + "   gmm/ragged")
    for sname in splits:
        row = [flops / best[sname, n] / 1e12 for n in fns]
        speed = best[sname, "ragged_dot"] / min(
            best[sname, "gmm"], best[sname, "gmm_512x1024x512"])
        print(f"{sname:<12} " + " ".join(f"{v:>14.1f}" for v in row)
              + f"   {speed:>9.2f}x")
    print(f"two_empty max|gmm - ragged_dot| = {d:.2e}")


def w8a16_msweep(passes):
    """w8a16 auto-dispatch vs XLA fused dequant-dot vs bf16-weights
    anchor over the M axis; forced-kernel points at M > 256 pin the
    dispatch boundary with measurements rather than the docstring."""
    K = N = 4096
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    q, s = quantize_weights(w)
    wb = (q.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)
    bf16_xla = jax.jit(lambda x, w: jnp.dot(
        x, w, preferred_element_type=jnp.float32).astype(x.dtype))
    dq_xla = jax.jit(lambda x, q, s: jnp.dot(
        x, q.astype(jnp.bfloat16) * s[None, :].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32).astype(x.dtype))
    auto = jax.jit(lambda x, q, s: matmul_w8a16(x, q, s))
    forced = jax.jit(lambda x, q, s: matmul_w8a16(x, q, s,
                                                  force_kernel=True))
    print(f"{'M':>5} {'bf16_xla':>9} {'dequant_xla':>11} {'w8a16':>9} "
          f"{'w8a16_forced':>12} {'auto/dq':>8} {'w GB/s':>7}")
    for M in (1, 8, 16, 32, 64, 128, 256, 512, 1024, 4096):
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        flops = 2 * M * K * N
        best = {}
        for _ in range(passes):
            for name, fn, a in (("bf16", bf16_xla, (x, wb)),
                                ("dq", dq_xla, (x, q, s)),
                                ("auto", auto, (x, q, s)),
                                ("forced", forced, (x, q, s))):
                best[name] = min(best.get(name, 9e9), _t(fn, *a))
        gbs = q.size / best["auto"] / 1e9
        print(f"{M:>5} " + " ".join(
            f"{flops / best[n] / 1e12:>{w_}.2f}" for n, w_ in
            (("bf16", 9), ("dq", 11), ("auto", 9), ("forced", 12)))
            + f" {best['dq'] / best['auto']:>7.2f}x {gbs:>7.1f}",
            flush=True)


def w8a16_boundary(passes, Ms=(64, 256)):
    """Block-config probe at the measured dispatch losses (M=64 0.79x,
    M=256 0.93x vs dequant-XLA — BENCH_NOTES round 4 M-sweep; round 5
    re-targets M in {192,256,384}, the batched-decode band, per ADVICE
    r4 item 3). If no config beats dequant-XLA, the dispatch window
    narrows; if one does, it becomes the M-tier block default."""
    K = N = 4096
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    q, s = quantize_weights(w)
    dq_xla = jax.jit(lambda x, q, s: jnp.dot(
        x, q.astype(jnp.bfloat16) * s[None, :].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32).astype(x.dtype))
    for M in Ms:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        flops = 2 * M * K * N
        cands = [(bn, bk) for bn in (512, 1024, 2048, 4096)
                 for bk in (512, 1024, 2048)]
        best = {}
        for p in range(passes):
            best["dq_xla"] = min(best.get("dq_xla", 9e9),
                                 _t(dq_xla, x, q, s))
            for bn, bk in cands:
                nm = f"w8a16_{M}x{bn}x{bk}"
                try:
                    t = _t(jax.jit(lambda x, q, s, _b=(bn, bk):
                                   matmul_w8a16(x, q, s, block_n=_b[0],
                                                block_k=_b[1],
                                                force_kernel=True)),
                           x, q, s)
                except Exception as e:
                    print(f"[pass{p}] {nm} FAIL {str(e)[:60]}", flush=True)
                    continue
                best[nm] = min(best.get(nm, 9e9), t)
            print(f"[pass{p}] M={M} done", flush=True)
        print(f"\n== w8a16 boundary probe (M={M} K={K} N={N}) ==")
        for name, t in sorted(best.items(), key=lambda kv: kv[1]):
            print(f"{name:<22} {flops / t / 1e12:7.2f} TFLOPS  "
                  f"{best['dq_xla'] / t:5.2f}x dq", flush=True)


def w8a16_ab(samples, Ms, cfgs):
    """Adjacent-pair A/B for dispatch-boundary verdicts (the protocol
    that settled the round-4 M<=128 window): each sample times dq_xla
    and every candidate back-to-back in the same tunnel phase; a sample
    containing a >197 TFLOPS row (above the v5e bf16 roofline) is void.
    A boundary/default only moves on a candidate that wins its pairwise
    ratio on EVERY kept sample."""
    K = N = 4096
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
    q, s = quantize_weights(w)
    dq_xla = jax.jit(lambda x, q, s: jnp.dot(
        x, q.astype(jnp.bfloat16) * s[None, :].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32).astype(x.dtype))
    for M in Ms:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        flops = 2 * M * K * N
        fns = {"dq_xla": dq_xla}
        for bn, bk in cfgs:
            fns[f"{bn}x{bk}"] = jax.jit(
                lambda x, q, s, _b=(bn, bk): matmul_w8a16(
                    x, q, s, block_n=_b[0], block_k=_b[1],
                    force_kernel=True))
        kept = {c: [] for c in fns}
        for i in range(samples):
            row = {c: flops / _t(fn, x, q, s) / 1e12
                   for c, fn in fns.items()}
            if any(v > 197.0 for v in row.values()):
                print(f"sample {i + 1}: VOID "
                      f"({ {c: round(v, 1) for c, v in row.items() if v > 197.0} })",
                      flush=True)
                continue
            for c, v in row.items():
                kept[c].append(v)
            print("sample %d: %s" % (i + 1, "  ".join(
                f"{c} {v:6.1f}" for c, v in row.items())), flush=True)
        print(f"== w8a16 A/B M={M} ({len(kept['dq_xla'])} kept) ==",
              flush=True)
        dq = kept["dq_xla"]
        for c, vals in kept.items():
            if c == "dq_xla" or not vals:
                continue
            rs = [v / d for v, d in zip(vals, dq)]
            print(f"  {c}: ratios [{min(rs):.3f}, {max(rs):.3f}] "
                  f"med {sorted(rs)[len(rs) // 2]:.3f} "
                  f"{'WIN' if min(rs) > 1.0 else 'no'}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--which", default="gmm,w8a16")
    ap.add_argument("--Ms", default="64,256",
                    help="boundary probe M values")
    ap.add_argument("--cfgs", default="512x2048,2048x1024",
                    help="ab-mode candidate bn x bk configs")
    args = ap.parse_args()
    which = args.which.split(",")
    if "ab" in which:
        w8a16_ab(args.passes,
                 tuple(int(m) for m in args.Ms.split(",")),
                 [tuple(int(v) for v in c.split("x"))
                  for c in args.cfgs.split(",")])
    if "gmm" in which:
        tune_gmm(args.passes)
    if "w8a16" in which:
        tune_w8a16(args.passes)
    if "splits" in which:
        gmm_splits(args.passes)
    if "msweep" in which:
        w8a16_msweep(args.passes)
    if "boundary" in which:
        w8a16_boundary(args.passes,
                       tuple(int(m) for m in args.Ms.split(",")))


if __name__ == "__main__":
    main()
