"""Fused linear+CE vs the dense reference: forward, gradients, tails,
ignore_index, and the chunked-XLA baseline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpukern.ops  # noqa: F401
from tpukern.core import registry
from tpukern.ops import cross_entropy as ce


def _inputs(rng, N, D, V, dt=jnp.float32):
    x = jnp.asarray(rng.standard_normal((N, D)), dt)
    w = jnp.asarray(rng.standard_normal((D, V)) * 0.05, dt)
    tgt = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    return x, w, tgt


@pytest.mark.parametrize("name", sorted(registry.variants("cross_entropy")))
def test_variants(name, rng):
    v = registry.get("cross_entropy", name)
    x, w, tgt = _inputs(rng, 256, 128, 1024)
    out = v.fn(x, w, tgt)
    ref = ce.cross_entropy_ref(x, w, tgt)
    tol = 2e-2 if "bf16" in name else 1e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=tol, atol=tol, err_msg=name)


@pytest.mark.parametrize("N,D,V", [(256, 128, 1024), (200, 128, 1000),
                                   (512, 256, 4096)])
def test_fused_forward_shapes(N, D, V, rng):
    """Block-multiple and tail shapes (N % block_n, V % block_v != 0)."""
    x, w, tgt = _inputs(rng, N, D, V)
    out = ce.fused_cross_entropy(x, w, tgt, block_n=64, block_v=256)
    ref = ce.cross_entropy_ref(x, w, tgt)
    assert out.shape == (N,)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_lse(rng):
    x, w, tgt = _inputs(rng, 128, 64, 512)
    _, lse = ce.fused_cross_entropy(x, w, tgt, return_lse=True)
    logits = x @ w
    lse_ref = jax.scipy.special.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                               rtol=1e-5, atol=1e-5)


def test_ignore_index(rng):
    """Negative targets: zero loss AND zero gradient for those rows."""
    N, D, V = 128, 64, 512
    x, w, tgt = _inputs(rng, N, D, V)
    tgt = tgt.at[:32].set(-1)

    def mean_loss(x, w):
        return jnp.sum(ce.fused_cross_entropy(x, w, tgt, block_n=64,
                                              block_v=256))

    loss = ce.fused_cross_entropy(x, w, tgt, block_n=64, block_v=256)
    assert np.all(np.asarray(loss[:32]) == 0.0)
    dx, dw = jax.grad(mean_loss, argnums=(0, 1))(x, w)
    assert np.all(np.asarray(dx[:32]) == 0.0)

    def mean_loss_ref(x, w):
        return jnp.sum(ce.cross_entropy_ref(x, w, tgt))

    dx_r, dw_r = jax.grad(mean_loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("N,D,V", [(256, 128, 1024), (200, 128, 1000)])
def test_fused_grads(N, D, V, rng):
    """dx/dw from the Pallas backward kernels == dense autodiff, incl.
    tail shapes (padded token rows must not pollute dw)."""
    x, w, tgt = _inputs(rng, N, D, V)
    g = jnp.asarray(rng.standard_normal(N).astype(np.float32)) * 0.1

    def f(x, w):
        return jnp.vdot(ce.fused_cross_entropy(x, w, tgt, block_n=64,
                                               block_v=256), g)

    dx, dw = jax.grad(f, argnums=(0, 1))(x, w)

    def f_ref(x, w):
        return jnp.vdot(ce.cross_entropy_ref(x, w, tgt), g)

    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-5)


def test_fused_grads_bf16(rng):
    N, D, V = 256, 128, 1024
    x, w, tgt = _inputs(rng, N, D, V, jnp.bfloat16)

    def f(x, w):
        return jnp.sum(ce.fused_cross_entropy(x, w, tgt)) / N

    dx, dw = jax.grad(f, argnums=(0, 1))(x, w)

    def f_ref(x, w):
        return jnp.sum(ce.cross_entropy_ref(x, w, tgt)) / N

    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dx_r, np.float32),
                               rtol=1e-1, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dw, np.float32),
                               np.asarray(dw_r, np.float32),
                               rtol=1e-1, atol=2e-3)


def test_chunked_grads(rng):
    """The lax.scan streaming baseline is differentiable and exact."""
    N, D, V = 128, 64, 640
    x, w, tgt = _inputs(rng, N, D, V)

    def f(x, w):
        return jnp.sum(ce.chunked_cross_entropy(x, w, tgt, chunk=256))

    def f_ref(x, w):
        return jnp.sum(ce.cross_entropy_ref(x, w, tgt))

    for a, b in zip(jax.grad(f, argnums=(0, 1))(x, w),
                    jax.grad(f_ref, argnums=(0, 1))(x, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_matches_model_loss_path(rng):
    """fused CE == the flagship model's materialized log_softmax loss
    (mean over tokens, same head layout (D, V))."""
    N, D, V = 256, 128, 1024
    x, w, tgt = _inputs(rng, N, D, V)
    fused = jnp.mean(ce.fused_cross_entropy(x, w, tgt))
    logits = (x @ w).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ref = jnp.mean(-jnp.take_along_axis(logp, tgt[:, None], axis=-1))
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)
