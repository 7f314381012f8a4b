"""Collectives benchmark driver.

The reference names ten collectives in 0-byte placeholder files
(others/pytorch/distributed/test_*.py); tpukern implements them over
shard_map/ICI (tpukern/parallel/collectives.py). This driver times each at
a given payload size over the available mesh and reports effective
algorithm bandwidth.

On a single chip this measures dispatch overhead only (collectives are
no-ops); on a pod slice the numbers are ICI bandwidth. Usage:
    python bench/collectives.py [--mb 64] [--iters 20] [--cpu-mesh 8]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpukern.harness import pretty_print_line, run_benchmark
from tpukern.parallel import collectives as coll


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=float, default=64.0,
                   help="payload megabytes (global)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cpu-mesh", type=int, default=0,
                   help="force an n-device virtual CPU mesh")
    return p.parse_args()


def main():
    args = get_args()
    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    devs = np.array(jax.devices())
    n = len(devs)
    mesh = Mesh(devs, axis_names=("x",))
    pretty_print_line(f"collectives over {n} x {devs[0].device_kind}")

    elems = int(args.mb * 1e6 / 4)
    per = max(elems // n // 128 * 128, 128)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, per)),
                    jnp.float32)
    nbytes = x.size * 4

    cases = [
        ("p2p", lambda v: coll.p2p(v, mesh, "x")),
        ("broadcast", lambda v: coll.broadcast(v, mesh, "x")),
        ("gather/all_gather", lambda v: coll.all_gather(v, mesh, "x")),
        ("reduce/all_reduce", lambda v: coll.all_reduce(v, mesh, "x")),
        ("reduce_scatter", lambda v: coll.reduce_scatter(v, mesh, "x")),
    ]
    for tag, fn in cases:
        try:
            run_benchmark(fn, x, tag=tag, bytes_moved=nbytes,
                          iters=args.iters)
        except Exception as e:
            print(f"{tag:<24} SKIP ({type(e).__name__}: {e})")

    # all_to_all needs (n, n*m) layout
    m = max(per // n // 128 * 128, 128)
    xa = jnp.asarray(np.random.default_rng(1).standard_normal((n, n * m)),
                     jnp.float32)
    try:
        run_benchmark(lambda v: coll.all_to_all(v, mesh, "x"), xa,
                      tag="all_to_all", bytes_moved=xa.size * 4,
                      iters=args.iters)
    except Exception as e:
        print(f"{'all_to_all':<24} SKIP ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
