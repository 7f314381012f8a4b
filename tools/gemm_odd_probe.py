"""Direct config sweep at the stubborn odd GEMM sizes (VERDICT r3
item 4): 4352 = 256*17 and 5888 = 256*23 have no 128-multiple divisor
block above 256, so every large-tile config pads M/N (clipped on
write-back) or masks K in-kernel. auto_blocks' analytic model picks from
the same candidate space; this probe measures the live contenders on
hardware, same-phase interleaved with the XLA baseline, so the pick (or
the ceiling) is evidence rather than a model output.

Usage: python tools/gemm_odd_probe.py [--sizes 4352,5888] [--passes 3]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from tpukern.harness.bench import device_peaks, device_time
from tpukern.ops.matmul import auto_blocks, matmul


# (bm, bn, bk, kwargs): exact-M tilings (1088/1472 are 16-multiples),
# low-pad N choices, canonical 1024 tiles, and accio twins
CONFIGS = [
    (1024, 1024, 512, {}),
    (1024, 1024, 512, dict(acc_in_out=True)),
    (1088, 1152, 512, {}),
    (1088, 896, 512, {}),
    (1088, 896, 256, {}),
    (1088, 1152, 256, {}),
    (896, 1152, 512, {}),
    (1088, 2176, 256, {}),
    (544, 1152, 512, {}),
    (1088, 1152, 512, dict(acc_in_out=True)),
]


def size_configs(s):
    """Size-derived candidates: exact-M sublane-aligned tilings (bm = s/4,
    s/8 when 16-multiples — the MXU only needs sublane alignment on the
    second-to-last dim), low-pad 128-multiple N blocks, and K blocks the
    in-kernel tail mask can handle."""
    out = []
    for div in (4, 8):
        bm = s // div
        if bm % 16:
            continue
        for bn in (512, 896, 1024, 1152):
            pad = (-(-s // bn) * bn - s) / s
            if pad > 0.10:
                continue
            for bk in (256, 512):
                out.append((bm, bn, bk, {}))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4352,5888")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    peak = device_peaks()["bf16_tflops"]

    for s in (int(x) for x in args.sizes.split(",")):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((s, s)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((s, s)), jnp.bfloat16)
        fl = 2 * s ** 3
        auto = auto_blocks(s, s, s)
        cands = {"auto(" + "x".join(str(auto[k]) for k in
                                    ("block_m", "block_n", "block_k"))
                 + ")": auto} | {
            f"{bm}x{bn}x{bk}" + ("A" if kw else ""):
                dict(block_m=bm, block_n=bn, block_k=bk, **kw)
            for bm, bn, bk, kw in CONFIGS + size_configs(s)}

        def t(fn, jit, a=a, b=b):
            for _ in range(2):
                v = fl / device_time(fn, a, b, iters_lo=8, iters_hi=40,
                                     jitter_kw="jitter" if jit else None
                                     ) / 1e12
                if v <= 1.03 * peak:
                    return v
            return float("nan")

        best = {}
        for p in range(args.passes):
            bx = t(lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16), False)
            best["xla"] = max(best.get("xla", 0.0), bx)
            for name, cfg in cands.items():
                try:
                    v = t(lambda a, b, _c=cfg, **kw: matmul(a, b, **_c, **kw),
                          True)
                except Exception as e:
                    print(f"  {name} FAIL {str(e)[:80]}", flush=True)
                    cands[name] = None
                    continue
                best[name] = max(best.get(name, 0.0), v)
            cands = {n: c for n, c in cands.items() if c is not None}
            print(f"[pass{p}] MNK={s} done", flush=True)

        print(f"\n== MNK={s} best-of-{args.passes} (TFLOPS, % of XLA "
              f"{best['xla']:.1f}) ==")
        for name, v in sorted(best.items(), key=lambda kv: -kv[1]):
            if name != "xla":
                print(f"  {name:<22} {v:7.1f}  {100 * v / best['xla']:6.1f}%",
                      flush=True)


if __name__ == "__main__":
    main()
