"""Collectives + ring attention on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import tpukern.ops  # noqa: F401
from tpukern.parallel import collectives as coll
from tpukern.parallel.ring_attention import ring_attention
from tpukern.ops.attention import attention_ref


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices())
    return Mesh(devs, axis_names=("x",))


def test_p2p(mesh, rng):
    n = mesh.shape["x"]
    x = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
    out = coll.p2p(x, mesh, "x", shift=1)
    np.testing.assert_array_equal(np.asarray(out), np.roll(np.asarray(x), 1, 0))


def test_broadcast(mesh):
    n = mesh.shape["x"]
    x = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    out = coll.broadcast(x, mesh, "x", root=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[2]))


def test_scatter_gather(mesh, rng):
    n = mesh.shape["x"]
    x = jnp.asarray(rng.standard_normal((n * 2, 8)), jnp.float32)
    sharded = coll.scatter(x, mesh, "x")
    gathered = coll.gather(sharded, mesh, "x")
    np.testing.assert_array_equal(np.asarray(gathered), np.asarray(x))


def test_all_reduce(mesh, rng):
    n = mesh.shape["x"]
    x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    out = coll.all_reduce(x, mesh, "x", op="sum")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).sum(0),
                               rtol=1e-5, atol=1e-5)
    out = coll.reduce(x, mesh, "x", op="max")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).max(0))


def test_reduce_scatter(mesh, rng):
    n = mesh.shape["x"]
    x = jnp.asarray(rng.standard_normal((n, n * 4)), jnp.float32)
    out = coll.reduce_scatter(x, mesh, "x")
    # device i ends with sum over operands of chunk i; global out = concat
    expected = np.asarray(x).sum(0)
    np.testing.assert_allclose(np.asarray(out).reshape(-1), expected,
                               rtol=1e-5, atol=1e-5)


def test_all_to_all(mesh, rng):
    n = mesh.shape["x"]
    x = jnp.arange(n * n * 2, dtype=jnp.float32).reshape(n, n * 2)
    out = coll.all_to_all(x, mesh, "x")
    xs = np.asarray(x).reshape(n, n, 2)
    expected = xs.transpose(1, 0, 2).reshape(n * n, 2)
    np.testing.assert_array_equal(np.asarray(out).reshape(n * n, 2), expected)


def test_all_gather_object(mesh, rng):
    n = mesh.shape["x"]
    tree = {"a": jnp.arange(n * 2, dtype=jnp.float32).reshape(n, 2)}
    out = coll.all_gather_object(tree, mesh, "x")
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(tree["a"]))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention(mesh, causal, rng):
    B, H, S, D = 1, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    out = ring_attention(q, k, v, mesh, axis="x", causal=causal, block_q=64,
                         block_k=64)
    ref = attention_ref(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_backward(mesh, causal, rng):
    """Context-parallel backward: ring-attention gradients on the 8-way
    sequence-sharded mesh equal single-device XLA attention gradients."""
    B, H, S, D = 1, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)

    def loss(q, k, v):
        out = ring_attention(q, k, v, mesh, axis="x", causal=causal,
                             block_q=64, block_k=64)
        return jnp.sum(out ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(attention_ref(q, k, v, causal=causal) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, ref, name in zip(g, g_ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3, err_msg=name)


def test_ring_kernels_all_gather(mesh, rng):
    """Pallas RDMA ring all-gather (make_async_remote_copy) on the
    8-device interpret-mode mesh == lax all_gather."""
    from tpukern.parallel.ring_kernels import ring_all_gather
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    out = ring_all_gather(x, mesh, axis="x")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_ring_kernels_all_reduce(mesh, rng):
    """Pallas ring reduce-scatter + all-gather == sum over members."""
    from tpukern.parallel.ring_kernels import (ring_all_reduce_grads,
                                               ring_reduce_scatter)
    n = mesh.shape["x"]
    x = jnp.asarray(rng.standard_normal((n, 64, 128)), jnp.float32)
    rs = ring_reduce_scatter(x, mesh, axis="x")
    np.testing.assert_allclose(np.asarray(rs), np.asarray(x.sum(0)),
                               rtol=1e-5, atol=1e-5)
    ar = ring_all_reduce_grads(x, mesh, axis="x")
    np.testing.assert_allclose(np.asarray(ar), np.asarray(x.sum(0)),
                               rtol=1e-5, atol=1e-5)


def test_ulysses_matches_reference(rng):
    """Ulysses all_to_all sequence parallelism == unsharded attention
    (heads re-sharded over sp; no cross-chip softmax math at all)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from tpukern.ops.attention import attention_ref
    from tpukern.parallel.ulysses import ulysses_attention

    devs = np.array(jax.devices())
    mesh = Mesh(devs, axis_names=("sp",))
    n = len(devs)
    B, H, S, D = 1, 2 * n, 64 * n, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    for causal in (False, True):
        out = ulysses_attention(q, k, v, mesh, axis="sp", causal=causal)
        ref = attention_ref(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_ulysses_grads(rng):
    """Trainable path: grads through the two all_to_alls + Pallas
    forward/backward match the XLA reference."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from tpukern.ops.attention import attention_ref
    from tpukern.parallel.ulysses import ulysses_attention

    devs = np.array(jax.devices())
    mesh = Mesh(devs, axis_names=("sp",))
    n = len(devs)
    B, H, S, D = 1, n, 32 * n, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(ulysses_attention(q, k, v, mesh, causal=True,
                                         trainable=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_ref(q, k, v, causal=True) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


# ---- collective matmul (overlapped TP GEMM) ----

def test_all_gather_matmul(mesh, rng):
    from tpukern.parallel.collective_matmul import all_gather_matmul
    n = mesh.shape["x"]
    M, K, N = 4 * n, 32, 8 * n
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    ref = np.asarray(x) @ np.asarray(w)
    for bidi in (False, True):
        out = all_gather_matmul(x, w, mesh, "x", bidirectional=bidi)
        assert out.shape == (M, N)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                                   atol=1e-4)


def test_all_gather_matmul_odd_half(mesh, rng):
    """m_loc odd -> bidirectional silently falls back to unidirectional."""
    from tpukern.parallel.collective_matmul import all_gather_matmul
    n = mesh.shape["x"]
    M, K, N = n, 16, 8 * n  # m_loc == 1
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    out = all_gather_matmul(x, w, mesh, "x", bidirectional=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x) @ np.asarray(w),
                               rtol=1e-5, atol=1e-4)


def test_matmul_reduce_scatter(mesh, rng):
    from tpukern.parallel.collective_matmul import matmul_reduce_scatter
    n = mesh.shape["x"]
    M, K, N = 4 * n, 8 * n, 24
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    out = matmul_reduce_scatter(x, w, mesh, "x")
    assert out.shape == (M, N)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x) @ np.asarray(w),
                               rtol=1e-5, atol=1e-4)


def test_tp_mlp_matches_local(mesh, rng):
    """AG-matmul -> gelu -> matmul-RS == the unsharded two-layer MLP."""
    import jax
    from tpukern.parallel.collective_matmul import tp_mlp
    n = mesh.shape["x"]
    S, E, F = 4 * n, 32, 8 * n
    x = jnp.asarray(rng.standard_normal((S, E)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, F)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, E)) * 0.1, jnp.float32)
    out = tp_mlp(x, w1, w2, mesh, "x")
    ref = jax.nn.gelu(np.asarray(x) @ np.asarray(w1)) @ np.asarray(w2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_collective_matmul_grads(mesh, rng):
    """ppermute/dynamic-slice transposes give correct grads (no psum in
    either primitive, so the check_vma=False psum-transpose caveat does
    not apply here)."""
    import jax
    from tpukern.parallel.collective_matmul import (all_gather_matmul,
                                                    matmul_reduce_scatter)
    n = mesh.shape["x"]
    M, K, N = 2 * n, 16, 4 * n
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)

    def loss_ag(x, w):
        return jnp.sum(all_gather_matmul(x, w, mesh, "x") ** 2)

    def loss_ref(x, w):
        return jnp.sum((x @ w) ** 2)

    g = jax.grad(loss_ag, argnums=(0, 1))(x, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)

    M2, K2, N2 = 2 * n, 4 * n, 16
    x2 = jnp.asarray(rng.standard_normal((M2, K2)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((K2, N2)), jnp.float32)

    def loss_rs(x, w):
        return jnp.sum(matmul_reduce_scatter(x, w, mesh, "x") ** 2)

    g2 = jax.grad(loss_rs, argnums=(0, 1))(x2, w2)
    gr2 = jax.grad(loss_ref, argnums=(0, 1))(x2, w2)
    for a, b in zip(g2, gr2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)
