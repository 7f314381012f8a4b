"""Kernel-level ring collectives: Pallas RDMA over the ICI ring.

The lax-based collectives (parallel/collectives.py) are the production
path — XLA's own collectives are already ICI-optimal. These Pallas
versions exist for the same reason the reference hand-writes NCCL-style
primitives in its slide decks: to own the mechanism. Each step DMAs the
current chunk to the right neighbor with pltpu.make_async_remote_copy
while computing on the chunk that just arrived (pallas_guide.md "Ring
Collectives" pattern).

Validated in Pallas TPU interpret mode on the virtual CPU mesh (real
multi-chip hardware is not available in this environment); the kernels
compile for TPU via the same code path.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpukern.core import use_interpret


def _ag_kernel(local_ref, out_ref, comm_buf, send_sem, recv_sem, *,
               axis, n, chunk):
    my_id = lax.axis_index(axis)
    out_ref[pl.ds(my_id * chunk, chunk)] = local_ref[...]
    comm_buf[0] = local_ref[...]
    for step in range(n - 1):
        src = (my_id - step - 1) % n
        dst = (my_id + 1) % n
        s_slot, r_slot = step % 2, (step + 1) % 2
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[s_slot],
            dst_ref=comm_buf.at[r_slot],
            send_sem=send_sem.at[s_slot],
            recv_sem=recv_sem.at[r_slot],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma.start()
        rdma.wait()
        out_ref[pl.ds(src * chunk, chunk)] = comm_buf[r_slot]


def ring_all_gather(x, mesh, axis="x", interpret=None):
    """All-gather rows of x (sharded on dim 0 over `axis`) via a Pallas
    ring: n-1 neighbor hops, each chunk forwarded around the ring."""
    n = mesh.shape[axis]
    interp = use_interpret() if interpret is None else interpret

    def local_fn(xl):
        chunk = xl.shape[0]
        return pl.pallas_call(
            functools.partial(_ag_kernel, axis=axis, n=n, chunk=chunk),
            out_shape=jax.ShapeDtypeStruct((chunk * n, *xl.shape[1:]),
                                           xl.dtype),
            scratch_shapes=[pltpu.VMEM((2, *xl.shape), xl.dtype),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=0),
            interpret=interp,
        )(xl)

    return shard_map(local_fn, mesh=mesh, in_specs=P(axis),
                     out_specs=P(), check_vma=False)(x)


def _rs_kernel(local_ref, out_ref, comm_buf, send_sem, recv_sem, *,
               axis, n, chunk):
    """Reduce-scatter (sum): after n-1 hops each device holds the full
    sum of its own chunk. At step s, forward the partial sum of chunk
    (my_id + s + 1) % n accumulated so far."""
    my_id = lax.axis_index(axis)
    # start by sending our value of the LEFT neighbor's eventual chunk
    first = (my_id + n - 1) % n
    comm_buf[0] = local_ref[pl.ds(first * chunk, chunk)]
    for step in range(n - 1):
        dst = (my_id + 1) % n
        s_slot, r_slot = step % 2, (step + 1) % 2
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[s_slot],
            dst_ref=comm_buf.at[r_slot],
            send_sem=send_sem.at[s_slot],
            recv_sem=recv_sem.at[r_slot],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL)
        rdma.start()
        rdma.wait()
        # the received buffer is the partial sum of chunk
        # (my_id + n - 2 - step) % n: add our local contribution and
        # either forward it (next loop iteration) or keep it (last)
        idx = (my_id + n - 2 - step) % n
        acc = comm_buf[r_slot] + local_ref[pl.ds(idx * chunk, chunk)]
        if step < n - 2:
            comm_buf[(step + 1) % 2] = acc
        else:
            out_ref[...] = acc


def ring_reduce_scatter(x, mesh, axis="x", interpret=None):
    """Reduce-scatter (sum): x (n, R, ...) holds each member's full-length
    operand on its shard of dim 0 (e.g. per-device gradients); member i
    ends with sum_j x[j, i*chunk:(i+1)*chunk] — returned as an (R, ...)
    array sharded over `axis` on dim 0. The classic n-1-hop ring: each
    step forwards a partial chunk sum to the right neighbor while adding
    the local contribution to the one that just arrived."""
    n = mesh.shape[axis]
    assert x.shape[0] == n and x.shape[1] % n == 0
    interp = use_interpret() if interpret is None else interpret

    def local_fn(xl):
        xl = xl[0]                       # (R, ...) local operand
        chunk = xl.shape[0] // n
        return pl.pallas_call(
            functools.partial(_rs_kernel, axis=axis, n=n, chunk=chunk),
            out_shape=jax.ShapeDtypeStruct((chunk, *xl.shape[1:]),
                                           xl.dtype),
            scratch_shapes=[pltpu.VMEM((2, chunk, *xl.shape[1:]), xl.dtype),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=1),
            interpret=interp,
        )(xl)

    return shard_map(local_fn, mesh=mesh, in_specs=P(axis),
                     out_specs=P(axis), check_vma=False)(x)


def ring_all_reduce_grads(x, mesh, axis="x", interpret=None):
    """All-reduce (sum) over per-member operands x (n, R, ...) sharded on
    dim 0: ring reduce-scatter + ring all-gather, the 2(n-1)-step
    bandwidth-optimal schedule. Returns the replicated (R, ...) sum."""
    shard = ring_reduce_scatter(x, mesh, axis, interpret=interpret)
    return ring_all_gather(shard, mesh, axis, interpret=interpret)


