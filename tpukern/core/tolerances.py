"""Dtype-matched tolerance tables + check_all_close.

The reference's correctness gate is `torch.allclose(atol=1e-2)` plus printed
max/mean abs diff (kernels/flash-attn/flash_attn_mma.py:401-425) and the top
README's stated FA precision (max <~1e-3, mean <~1e-5, README.md:89). We
formalize that into per-dtype tolerances used by both pytest and the bench
harness `--check` mode.
"""

import jax.numpy as jnp
import numpy as np

_TOLS = {
    "float32": dict(rtol=1e-5, atol=1e-5),
    "bfloat16": dict(rtol=2e-2, atol=2e-2),
    "float16": dict(rtol=2e-3, atol=2e-3),
    "int32": dict(rtol=0, atol=0),
    "int8": dict(rtol=0, atol=0),
    "float8_e4m3fn": dict(rtol=1.5e-1, atol=1.5e-1),
    "float8_e5m2": dict(rtol=3e-1, atol=3e-1),
}


def tol(dtype) -> dict:
    return dict(_TOLS[jnp.dtype(dtype).name])


def check_all_close(out, ref, dtype=None, rtol=None, atol=None, name=""):
    """Assert closeness at dtype-matched tolerance; report max/mean abs diff.

    Returns (max_diff, mean_diff) on success so harnesses can log them the way
    the reference does (flash_attn_mma.py:415-425).
    """
    dtype = dtype if dtype is not None else out.dtype
    t = tol(dtype)
    if rtol is not None:
        t["rtol"] = rtol
    if atol is not None:
        t["atol"] = atol
    a = np.asarray(out, dtype=np.float64)
    b = np.asarray(ref, dtype=np.float64)
    diff = np.abs(a - b)
    max_diff = float(diff.max()) if diff.size else 0.0
    mean_diff = float(diff.mean()) if diff.size else 0.0
    ok = np.allclose(a, b, rtol=t["rtol"], atol=t["atol"])
    if not ok:
        bad = int((np.abs(a - b) > t["atol"] + t["rtol"] * np.abs(b)).sum())
        raise AssertionError(
            f"{name or 'check'}: {bad}/{a.size} mismatched "
            f"(dtype={jnp.dtype(dtype).name}, rtol={t['rtol']}, atol={t['atol']}, "
            f"max={max_diff:.3e}, mean={mean_diff:.3e})"
        )
    return max_diff, mean_diff
