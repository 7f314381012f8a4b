"""Grid/tile layout visualizer — the print_swizzle_layout.py analog.

The reference visualizes XOR'd shared-memory bank layouts
(kernels/swizzle/print_swizzle_layout.py:28-40, swizzle_permuted_j =
((j/8)^(i/4)) % (col_stride/8) * 8). TPU has no banked smem; the layout
choices that matter are (a) the dtype-dependent (sublane, lane) tiling of
VMEM and (b) the grid traversal order (which controls HBM re-fetches).
This tool prints both for tpukern's GEMM/transpose configurations.

Usage: python tools/print_layout.py [--m 2048 --n 2048 --k 2048]
       [--bm 512 --bn 1024 --bk 512] [--swizzle 4] [--dtype bf16]
"""

import argparse
import sys

sys.path.insert(0, ".")

from tpukern.core import LANES, cdiv, min_tile


def print_min_tiles():
    print("dtype-dependent minimum VMEM tiles (sublane x lane):")
    for name in ("float32", "bfloat16", "int8"):
        import jax.numpy as jnp
        t = min_tile(jnp.dtype(name))
        print(f"  {name:<10} {t[0]:>3} x {t[1]}")
    print()


def print_gemm_traversal(m, n, k, bm, bn, bk, swizzle):
    nI, nJ, nK = cdiv(m, bm), cdiv(n, bn), cdiv(k, bk)
    print(f"GEMM grid for M={m} N={n} K={k}, blocks ({bm},{bn},{bk}):")
    print(f"  {nI} x {nJ} x {nK} blocks; A tile {bm}x{bk}, "
          f"B tile {bk}x{bn}, acc {bm}x{bn}")
    if swizzle and nJ % swizzle == 0:
        print(f"  band traversal, stride {swizzle} "
              f"(hgemm block-swizzle analog):")
        order = []
        for band in range(nJ // swizzle):
            for i in range(nI):
                for js in range(swizzle):
                    order.append((i, band * swizzle + js))
        grid_draw = [[-1] * nJ for _ in range(nI)]
        for step, (i, j) in enumerate(order):
            grid_draw[i][j] = step
        print("  visit order of C blocks (row=i, col=j):")
        for row in grid_draw:
            print("   " + " ".join(f"{v:4d}" for v in row))
        print("  -> each B column band stays VMEM-resident across "
              f"{nI} A-row blocks")
    else:
        print("  row-major traversal (i, then j, K innermost):")
        print("  -> B re-fetched for every (i, j); A row reused across j")
    print()


def print_transpose_diag(n_blocks):
    print(f"transpose diagonal grid remap ({n_blocks}x{n_blocks} blocks, "
          "mat_transpose diagonal2d analog):")
    print("  logical (i,j) -> physical input block ((i+j) % nI, j)")
    for i in range(n_blocks):
        row = [(i + j) % n_blocks for j in range(n_blocks)]
        print("   " + " ".join(f"{v:3d}" for v in row))
    print("  -> consecutive grid steps touch different HBM regions "
          "(channel balance)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=2048)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--k", type=int, default=2048)
    p.add_argument("--bm", type=int, default=512)
    p.add_argument("--bn", type=int, default=1024)
    p.add_argument("--bk", type=int, default=512)
    p.add_argument("--swizzle", type=int, default=2)
    args = p.parse_args()
    print_min_tiles()
    print_gemm_traversal(args.m, args.n, args.k, args.bm, args.bn,
                         args.bk, args.swizzle)
    print_transpose_diag(4)
