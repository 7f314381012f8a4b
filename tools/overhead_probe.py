"""Direct measurement of per-grid-step overhead (committed profiler
evidence, VERDICT r2 "missing #4").

Claims like "grid-step overhead ~0.5-0.7 us through this stack" and
"small FA blocks are overhead-bound" previously rested on inference from
end-to-end kernel timings. This probe isolates the per-step cost: one
fixed (R, C) f32 array is copied by a column-blocked kernel whose block
height splits the SAME work into 1..N grid steps — HBM traffic, VPU
work, and output size are constant, so the slope of time-vs-steps IS the
per-step overhead (DMA re-programming + scalar-core grid bookkeeping).

Usage: python tools/overhead_probe.py [--rows 4096] [--cols 4096]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def copy_blocked(x, block_rows):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    R, C = x.shape
    return pl.pallas_call(
        kernel,
        out_shape=jnp.zeros_like(x),
        grid=(R // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--cols", type=int, default=512)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from tpukern.harness.bench import device_time

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.rows, args.cols)),
                    jnp.float32)
    # keep the in/out blocks within VMEM: 2 * h * cols * 4 bytes
    heights = [h for h in (2048, 1024, 512, 256, 128, 64, 32, 16, 8)
               if args.rows % h == 0
               and 2 * h * args.cols * 4 <= 10 * 2 ** 20]
    best = {}
    for p in range(args.passes):
        for h in heights:
            steps = args.rows // h
            try:
                t = device_time(lambda x, _h=h: copy_blocked(x, _h), x,
                                iters_lo=8, iters_hi=40)
            except Exception as e:
                print(f"block_rows={h}: FAIL {str(e)[:80]}", flush=True)
                continue
            best[steps] = min(best.get(steps, 1e9), t)
            if p == args.passes - 1:
                print(f"block_rows={h:<5} steps={steps:<5} "
                      f"{best[steps] * 1e6:9.1f} us", flush=True)

    if len(best) >= 3:
        ks = sorted(best)
        xs = np.asarray(ks, np.float64)
        ys = np.asarray([best[k] for k in ks], np.float64)
        slope, icept = np.polyfit(xs, ys, 1)
        print(f"\nlinear fit: time = {icept * 1e6:.1f} us + "
              f"{slope * 1e9:.0f} ns/step over {len(ks)} points "
              f"(traffic {2 * x.size * 4 / 2 ** 20:.0f} MiB constant)")


if __name__ == "__main__":
    main()
