"""Hand-rolled Pallas ring all-reduce over ICI (demonstration collective).

The production gradient all-reduce in this framework is XLA's ``psum``
(``parallel/dp.py``) — on TPU meshes XLA already emits bandwidth-optimal ICI
collectives, so there is nothing to win by replacing it. What XLA does NOT
show is *how* the bytes move. This module demonstrates the mechanism the
compiler uses, as a Pallas kernel: a unidirectional ring of async remote DMAs
(``pltpu.make_async_remote_copy``) with double-buffered communication slots
and explicit flow control, the building block of reduce-scatter/all-gather
pipelines (cf. the scaling-book collective model; reference repo has no
collectives at all — SURVEY §2.6).

Algorithm (N devices, each holding a same-shaped shard ``x``):

    acc ← x;  slot[0] ← x
    for step in 0 .. N-2:
        send slot[step % 2] to the RIGHT neighbor's slot[(step+1) % 2]
        (the LEFT neighbor's chunk lands in our slot[(step+1) % 2])
        acc += slot[(step+1) % 2]

After N−1 hops every device holds Σ xᵢ. Traffic is (N−1)·|x| per link —
the simple ring, not the 2·|x|·(N−1)/N reduce-scatter+all-gather optimum;
this is a mechanism demo, not a psum replacement (see module docstring).

Flow control (the part XLA hides): slot ``s`` is reused as a receive target
every other step, so before the left neighbor's step-m DMA may land in
slot[(m+1) % 2], OUR step-(m−1) send *from that same slot* must have
completed. Each device therefore acks its LEFT neighbor after its send
completes, and waits for its RIGHT neighbor's ack before starting the next
send. A start-of-kernel barrier (``pltpu.get_barrier_semaphore`` — requires
``collective_id``) guarantees every neighbor's scratch exists before the
first remote write.

Testable without a pod: TPU interpret mode (``pltpu.InterpretParams``)
simulates the remote DMAs on the CPU mesh (``tests/test_ring.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def _ring_kernel(x_ref, o_ref, comm, send_sem, recv_sem, ack_sem, *, num_devices, axis):
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + 1, num_devices)
    left = lax.rem(my_id + num_devices - 1, num_devices)

    # Barrier: both neighbors have entered the kernel (their comm scratch is
    # live) before anyone issues a remote write.
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, 1, device_id=(left,))
    pltpu.semaphore_signal(barrier, 1, device_id=(right,))
    pltpu.semaphore_wait(barrier, 2)

    o_ref[...] = x_ref[...]
    comm[0, ...] = x_ref[...]

    for step in range(num_devices - 1):
        src, dst = step % 2, (step + 1) % 2
        if step >= 1:
            # our RIGHT neighbor must have drained the slot we are about to
            # overwrite on it (its send at step-1 from that slot is done)
            pltpu.semaphore_wait(ack_sem, 1)
        copy = pltpu.make_async_remote_copy(
            src_ref=comm.at[src],
            dst_ref=comm.at[dst],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=(right,),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        copy.start()
        copy.wait()  # our send is out AND the left neighbor's chunk arrived
        if step < num_devices - 2:
            # tell LEFT its next write may land (slot[src] is free here)
            pltpu.semaphore_signal(ack_sem, 1, device_id=(left,))
        o_ref[...] += comm[dst, ...]


def ring_all_reduce_shard(
    x: Array,
    *,
    axis: str,
    num_devices: int,
    interpret: bool = False,
    collective_id: int = 7,
) -> Array:
    """All-reduce-sum of a per-device shard; call INSIDE ``shard_map``.

    ``collective_id`` names the barrier semaphore; it must be UNIQUE among
    collective Pallas kernels that can be live in one program — two kernels
    sharing an id alias their barriers and can deadlock or misbarrier.
    """
    if num_devices == 1:
        return x
    kernel = partial(_ring_kernel, num_devices=num_devices, axis=axis)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, *x.shape), x.dtype),  # double-buffered ring slots
            pltpu.SemaphoreType.DMA,  # send
            pltpu.SemaphoreType.DMA,  # recv
            pltpu.SemaphoreType.REGULAR,  # slot-free ack
        ],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x)


def ring_all_reduce(x: Array, mesh: Mesh, axis: str = "data", interpret: bool = False) -> Array:
    """All-reduce ``x`` (replicated result) over a 1-D mesh axis.

    ``x`` is interpreted as device-sharded on its FIRST dimension over
    ``axis`` (the natural layout of per-device gradient shards); the result
    is the sum of all shards, replicated — i.e. ``psum`` semantics for the
    shard each device holds.
    """
    n = mesh.shape[axis]
    reduce_fn = partial(ring_all_reduce_shard, axis=axis, num_devices=n, interpret=interpret)
    out = jax.shard_map(
        reduce_fn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
        check_vma=False,
    )(x)
    # every block of out now holds the same full sum; return one replica view
    return out


def psum_reference(x: Array, mesh: Mesh, axis: str = "data") -> Array:
    """The production path: XLA's psum under the same sharding (for tests)."""
    out = jax.shard_map(
        lambda s: lax.psum(s, axis),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
        check_vma=False,
    )(x)
    return out
