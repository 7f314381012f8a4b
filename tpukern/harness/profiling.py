"""Profiling helpers: xprof traces + HLO dumps (the nsys/ncu workflow
analog — see docs/profiling.md for the full recipes)."""

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(logdir="/tmp/tpukern-trace"):
    """Capture an xprof trace viewable in TensorBoard's Profile tab."""
    with jax.profiler.trace(logdir):
        yield
    print(f"[trace] written to {logdir} "
          f"(tensorboard --logdir {logdir})")


def dump_hlo(fn, *args, out_dir="/tmp/tpukern-hlo"):
    """Dump optimized HLO for fn(*args) (the SASS-reading analog)."""
    os.makedirs(out_dir, exist_ok=True)
    lowered = jax.jit(fn).lower(*args)
    txt = lowered.compile().as_text()
    path = os.path.join(out_dir, f"{getattr(fn, '__name__', 'fn')}.hlo.txt")
    with open(path, "w") as f:
        f.write(txt)
    return path
