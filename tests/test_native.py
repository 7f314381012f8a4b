"""Native C++ reference harness: build, bind, cross-check a Pallas GEMM."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401
from tpukern import native
from tpukern.ops import matmul as mm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_native_sgemm_matches_numpy(rng):
    a = rng.standard_normal((64, 96)).astype(np.float32)
    b = rng.standard_normal((96, 80)).astype(np.float32)
    c = native.sgemm(a, b)
    np.testing.assert_allclose(c, a @ b, rtol=1e-5, atol=1e-4)
    c_tn = native.sgemm(a, b.T.copy(), trans_b=True)
    np.testing.assert_allclose(c_tn, a @ b, rtol=1e-5, atol=1e-4)


def test_native_cross_checks_pallas(rng):
    a = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    out = mm.matmul(a, b, block_m=128, block_n=128, block_k=128)
    ref = native.sgemm(a, b)
    mx, mean = native.max_mean_diff(out, ref)
    assert mx < 1e-3 and mean < 1e-5
    assert native.allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_perf_gemm_bin():
    """The standalone C++ timing/check bin builds and self-validates
    (the reference's makefile .bin targets, hgemm/utils/utils.h:7-97)."""
    import pathlib
    import subprocess
    nd = pathlib.Path(__file__).resolve().parent.parent / "native"
    subprocess.run(["make", "-C", str(nd), "perf_gemm.bin"], check=True,
                   capture_output=True)
    r = subprocess.run([str(nd / "perf_gemm.bin"), "256", "1"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
