"""Grouped (ragged) GEMM: Pallas gmm/tgmm vs lax.ragged_dot.

Edge cases the tile table must survive: group boundaries inside an
m-block (two tiles merge into one VMEM-resident output block), empty
groups, one group spanning many blocks, sum(group_sizes) < T padding,
E=1, and tiny T. VJP grads are checked against autodiff of ragged_dot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from tpukern.ops.grouped_matmul import gmm, tgmm, grouped_matmul


def _mk(T, K, N, E, sizes, dtype=jnp.float32, seed=0):
    assert sum(sizes) <= T and len(sizes) == E
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((T, K)), dtype)
    w = jnp.asarray(rng.standard_normal((E, K, N)) * 0.1, dtype)
    gs = jnp.asarray(sizes, jnp.int32)
    return x, w, gs


def _ref(x, w, gs):
    return lax.ragged_dot(x, w, gs)


CASES = [
    # (T, K, N, E, sizes, block_m)
    (256, 128, 128, 4, [64, 64, 64, 64], 64),        # aligned
    (256, 128, 128, 4, [37, 91, 3, 125], 64),        # boundaries mid-block
    (256, 128, 128, 4, [0, 200, 0, 56], 64),         # empty groups
    (256, 128, 128, 1, [256], 64),                   # E=1
    (512, 128, 128, 3, [500, 7, 5], 128),            # one group, many blocks
    (256, 128, 128, 4, [10, 20, 30, 40], 64),        # sum < T (padding tail)
    (192, 256, 384, 5, [64, 0, 65, 0, 63], 128),     # empty interleaved
    (64, 128, 128, 8, [8, 8, 8, 8, 8, 8, 8, 8], 64), # all in one block
]


@pytest.mark.parametrize("T,K,N,E,sizes,bm", CASES)
def test_gmm_matches_ragged_dot(T, K, N, E, sizes, bm):
    x, w, gs = _mk(T, K, N, E, sizes)
    got = gmm(x, w, gs, block_m=bm, block_n=128, block_k=128)
    want = _ref(x, w, gs)
    live = sum(sizes)
    np.testing.assert_allclose(np.asarray(got)[:live],
                               np.asarray(want)[:live], rtol=2e-5, atol=2e-5)


def test_gmm_under_jit_dynamic_sizes():
    # group_sizes is a traced value: one compile serves any split
    x, w, _ = _mk(256, 128, 128, 4, [64, 64, 64, 64])
    f = jax.jit(lambda x, w, gs: gmm(x, w, gs, block_m=64, block_n=128,
                                     block_k=128))
    for sizes in ([64, 64, 64, 64], [1, 254, 0, 1], [100, 0, 100, 56]):
        gs = jnp.asarray(sizes, jnp.int32)
        np.testing.assert_allclose(np.asarray(f(x, w, gs)),
                                   np.asarray(_ref(x, w, gs)),
                                   rtol=2e-5, atol=2e-5)


def test_gmm_trans_w():
    x, w, gs = _mk(256, 128, 192, 4, [37, 91, 3, 125])
    wt = jnp.swapaxes(w, 1, 2)  # (E, N, K)
    got = gmm(x, wt, gs, trans_w=True, block_m=64, block_n=128,
              block_k=128)
    want = _ref(x, w, gs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gmm_bf16():
    x, w, gs = _mk(256, 256, 256, 4, [100, 28, 64, 64], dtype=jnp.bfloat16)
    got = gmm(x, w, gs, block_m=128, block_n=128, block_k=128)
    want = _ref(x, w, gs)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("sizes", [[64, 64, 64, 64], [37, 91, 3, 125],
                                   [0, 200, 0, 56]])
def test_tgmm_matches_einsum(sizes):
    T, K, N, E = 256, 128, 192, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((T, N)), jnp.float32)
    gs = jnp.asarray(sizes, jnp.int32)
    got = tgmm(x, dy, gs, block_m=64, block_k=128, block_n=128)
    got = jnp.where((gs > 0)[:, None, None], got, 0.0)

    offs = np.concatenate([[0], np.cumsum(sizes)])
    want = np.zeros((E, K, N), np.float32)
    xn, dn = np.asarray(x), np.asarray(dy)
    for e in range(E):
        want[e] = xn[offs[e]:offs[e + 1]].T @ dn[offs[e]:offs[e + 1]]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_grouped_matmul_vjp():
    T, K, N, E = 256, 128, 128, 4
    sizes = [37, 91, 3, 125]
    x, w, gs = _mk(T, K, N, E, sizes)
    cfg = dict(block_m=64, block_n=128, block_k=128)

    def loss_kernel(x, w):
        y = grouped_matmul(x, w, gs, cfg)
        return jnp.sum(y * jnp.cos(y))

    def loss_ref(x, w):
        y = _ref(x, w, gs)
        return jnp.sum(y * jnp.cos(y))

    gx, gw = jax.grad(loss_kernel, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=2e-4, atol=2e-4)


def test_grouped_matmul_vjp_empty_group():
    # empty groups' dw slabs must come back zero, not garbage
    T, K, N, E = 192, 128, 128, 3
    sizes = [100, 0, 92]
    x, w, gs = _mk(T, K, N, E, sizes)
    cfg = dict(block_m=64, block_n=128, block_k=128)
    gw = jax.grad(lambda w: jnp.sum(grouped_matmul(x, w, gs, cfg) ** 2))(w)
    rw = jax.grad(lambda w: jnp.sum(_ref(x, w, gs) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=2e-4, atol=2e-4)
    assert np.all(np.asarray(gw)[1] == 0.0)
