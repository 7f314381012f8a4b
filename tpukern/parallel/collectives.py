"""The ten named collectives over shard_map/ICI.

Reference intent: others/pytorch/distributed/test_{p2p,broadcast,scatter,
gather,reduce,all_reduce,all_gather,all_gather_objects,reduce_scatter,
all_to_all}.py — all 0-byte placeholders naming the NCCL collective set.

TPU design: every collective is an XLA collective under shard_map on a
named mesh axis; XLA lowers them to ICI transfers (psum -> all-reduce
rings, ppermute -> neighbor hops, all_to_all -> transposes). Unlike NCCL,
nothing here is hand-scheduled — layout is controlled by the mesh and
PartitionSpecs.

Conventions: every function takes (x, mesh, axis) where x is a GLOBAL array
whose leading dim is (or will be) sharded over `axis`. SPMD means "root"
semantics collapse: results are returned on every device; `root` selects
which shard is the source where relevant.
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _smap(fn, mesh, in_specs, out_specs):
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


def p2p(x, mesh, axis, shift=1):
    """Ring point-to-point: device i's shard moves to device (i+shift)%N."""
    n = mesh.shape[axis]
    perm = [(i, (i + shift) % n) for i in range(n)]

    def f(xs):
        return lax.ppermute(xs, axis, perm)

    return _smap(f, mesh, P(axis), P(axis))(x)


def broadcast(x, mesh, axis, root=0):
    """Every device receives shard `root`. Returns the global broadcast
    array (leading dim = one shard, replicated)."""
    def f(xs):
        idx = lax.axis_index(axis)
        contrib = jnp.where(idx == root, xs, jnp.zeros_like(xs))
        return jnp.squeeze(lax.psum(contrib, axis), axis=0)

    return _smap(f, mesh, P(axis), P())(x)


def scatter(x, mesh, axis):
    """Shard a replicated array over `axis` (the inverse of all_gather).
    In JAX this is a resharding, not a communication primitive."""
    spec = NamedSharding(mesh, P(axis))
    return jax.device_put(x, spec)


def gather(x, mesh, axis, root=0):
    """Collect all shards (SPMD: every device materializes the result;
    `root` kept for API parity)."""
    return all_gather(x, mesh, axis)


def reduce(x, mesh, axis, op="sum", root=0):
    """Reduce shards elementwise (SPMD: result replicated; `root` parity)."""
    return all_reduce(x, mesh, axis, op=op)


def all_reduce(x, mesh, axis, op="sum"):
    """Elementwise reduction across the shards of the leading dim: x is
    treated as N stacked operands (one per device)."""
    red = {"sum": lax.psum, "max": lax.pmax, "min": lax.pmin}[op]

    def f(xs):
        local = jnp.squeeze(xs, 0) if xs.shape[0] == 1 else xs.sum(axis=0)
        return red(local, axis)

    return _smap(f, mesh, P(axis), P())(x)


def all_gather(x, mesh, axis):
    """Concatenate all shards along the leading dim on every device."""
    def f(xs):
        return lax.all_gather(xs, axis, tiled=True)

    return _smap(f, mesh, P(axis), P())(x)


def all_gather_object(tree, mesh, axis):
    """all_gather over an arbitrary pytree (the all_gather_objects analog)."""
    return jax.tree.map(lambda x: all_gather(x, mesh, axis), tree)


def reduce_scatter(x, mesh, axis, op="sum"):
    """Reduce across devices, leaving each device 1/N of the result.
    x: global (N*M, ...) treated as N stacked (M, ...) operands."""
    assert op == "sum", "psum_scatter is a sum"
    n = mesh.shape[axis]
    ops = x if x.shape[0] == n else x.reshape(n, -1, *x.shape[1:])

    def f(xs):
        local = jnp.squeeze(xs, 0)
        return lax.psum_scatter(local, axis, scatter_dimension=0, tiled=True)

    return _smap(f, mesh, P(axis), P(axis))(ops)


def all_to_all(x, mesh, axis):
    """Transpose shard ownership: device i sends chunk j to device j.
    x global (N, N*M, ...): leading dim sharded; second dim chunked."""
    def f(xs):
        return lax.all_to_all(xs, axis, split_axis=1, concat_axis=0,
                              tiled=True)

    return _smap(f, mesh, P(axis), P(axis))(x)
