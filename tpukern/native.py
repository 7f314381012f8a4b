"""ctypes bindings for the native C++ reference harness.

The reference ships C++ check/bench utilities compiled into standalone
bins (kernels/hgemm/utils/utils.h:7-309 + makefile). tpukern's equivalent
is native/librefcheck.so: a cache-blocked host GEMM (NN and TN) and
max/mean-diff + allclose comparators, used as an independent,
JAX/XLA-free cross-check of kernel outputs. Auto-builds with make on
first use; falls back to None if no toolchain.
"""

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _NATIVE_DIR / "librefcheck.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ref_sgemm.argtypes = [f32p, f32p, f32p] + [ctypes.c_int64] * 3
    lib.ref_sgemm_tn.argtypes = [f32p, f32p, f32p] + [ctypes.c_int64] * 3
    lib.max_mean_abs_diff.argtypes = [f32p, f32p, ctypes.c_int64, f32p]
    lib.max_mean_abs_diff.restype = ctypes.c_float
    lib.count_mismatch.argtypes = [f32p, f32p, ctypes.c_int64,
                                   ctypes.c_float, ctypes.c_float]
    lib.count_mismatch.restype = ctypes.c_int64
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_f32(x):
    a = np.ascontiguousarray(np.asarray(x), dtype=np.float32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def sgemm(a, b, trans_b=False):
    """Native C++ host GEMM (independent of JAX/XLA)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native harness unavailable (no C++ toolchain)")
    a_np, a_p = _as_f32(a)
    b_np, b_p = _as_f32(b)
    m, k = a_np.shape
    n = b_np.shape[0] if trans_b else b_np.shape[1]
    c = np.zeros((m, n), np.float32)
    c_p = c.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    (lib.ref_sgemm_tn if trans_b else lib.ref_sgemm)(a_p, b_p, c_p, m, n, k)
    return c


def max_mean_diff(x, ref):
    lib = _load()
    if lib is None:
        raise RuntimeError("native harness unavailable")
    x_np, x_p = _as_f32(x)
    r_np, r_p = _as_f32(ref)
    mean = ctypes.c_float(0.0)
    mx = lib.max_mean_abs_diff(x_p, r_p, x_np.size, ctypes.byref(mean))
    return float(mx), float(mean.value)


def allclose(x, ref, rtol=1e-5, atol=1e-5):
    lib = _load()
    if lib is None:
        raise RuntimeError("native harness unavailable")
    x_np, x_p = _as_f32(x)
    r_np, r_p = _as_f32(ref)
    return lib.count_mismatch(x_p, r_p, x_np.size, rtol, atol) == 0
