"""Pallas ring collectives over ICI.

The reference has no distributed layer at all; the TPU framework's model
parallelism for large lookup tables (the pyramid's fine planes / the NGP hash
table) shards rows across the mesh and reassembles them with a **ring
all-gather written in Pallas** — chunks travel neighbor-to-neighbor over ICI
via async remote DMA, overlapping with local copies, instead of going through
a host or DCN.

``ring_all_gather`` is the Pallas kernel (used under shard_map);
``all_gather_table`` is the high-level helper with an XLA-collective fallback
(`jax.lax.all_gather`) for platforms where the Pallas path is unavailable
(CPU test meshes, interpret mode quirks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P


def _ring_all_gather_kernel(
    local_ref, out_ref, comm_buf, send_sem, recv_sem, copy_sem, ack_sem,
    *, axis_name: str
):
    """Each device contributes its [S, F] shard; out is [n, S, F].

    Unidirectional ring: at step k, forward the chunk received at step k-1 to
    the right neighbor while depositing it locally. ``local_ref``/``out_ref``
    live in ANY (HBM) and are only touched via DMA; ``comm_buf`` is the
    2-slot VMEM staging buffer the RDMAs flow through.

    Flow control: devices are NOT lockstepped — a fast left neighbor could
    overwrite a slot we are still depositing from (caught by the interpret-
    mode race detector). Each deposit therefore acks the writer
    (``ack_sem`` signal to the LEFT), and a sender must collect the ack
    before REUSING a remote slot (first reuse is step 2; the wait is skipped
    for k < 2, and the final deposits skip the ack nobody will consume).
    """
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(me + 1, n)
    left = jax.lax.rem(me - 1 + n, n)

    # Entry barrier on the collective_id-keyed system barrier semaphore:
    # neighbors must have ENTERED this kernel before any RDMA lands in their
    # comm_buf (a straggler's buffer could otherwise still belong to the
    # previous program). Mosaic requires exactly this pairing — a
    # collective_id is only legal when the custom barrier is used (the real
    # compiler rejects the r2 barrier-less kernel; interpret mode never
    # checked it).
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(
        barrier, inc=1, device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_signal(
        barrier, inc=1, device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_wait(barrier, 2)

    # stage own shard into slot 0, deposit it into out[me]
    cp_in = pltpu.make_async_copy(local_ref, comm_buf.at[0], copy_sem)
    cp_in.start()
    cp_in.wait()
    cp_own = pltpu.make_async_copy(comm_buf.at[0], out_ref.at[me], copy_sem)
    cp_own.start()
    cp_own.wait()

    def step(k, _):
        send_slot = jax.lax.rem(k, 2)
        recv_slot = jax.lax.rem(k + 1, 2)

        # backpressure: the remote slot we write at step k is the receiver's
        # SEND SOURCE at its step k-1 and its deposit source at step k-2 —
        # wait for the receiver to fully finish step k-1 before overwriting
        # (one ack per completed neighbor step)
        @pl.when(k >= 1)
        def _():
            pltpu.semaphore_wait(ack_sem, 1)

        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[send_slot],
            dst_ref=comm_buf.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        src_device = jax.lax.rem(me - k - 1 + 2 * n, n)
        cp = pltpu.make_async_copy(
            comm_buf.at[recv_slot], out_ref.at[src_device], copy_sem
        )
        cp.start()
        cp.wait()

        # step fully done (send source read + deposit) -> the left neighbor
        # may write our next recv slot (its step k+1). The final step's ack
        # has no consumer (left's last send is step n-2), so skip it.
        @pl.when(k <= n - 3)
        def _():
            pltpu.semaphore_signal(
                ack_sem, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

        return 0

    jax.lax.fori_loop(0, n - 1, step, 0)


def ring_all_gather(
    x: jnp.ndarray, axis_name: str, *, interpret: bool | object = False
) -> jnp.ndarray:
    """All-gather [S, F] shards into [n*S, F] via a Pallas ICI ring.

    Must run inside shard_map over a 1-D mesh axis ``axis_name``.
    ``interpret``: False (compiled TPU), or a ``pltpu.InterpretParams`` to run
    the SAME kernel — remote DMAs, semaphores and all — under the TPU
    interpreter on a CPU mesh (optionally with race detection).
    """
    n = jax.lax.axis_size(axis_name)
    S, F = x.shape
    if interpret is True:
        interpret = pltpu.InterpretParams()

    out = pl.pallas_call(
        functools.partial(_ring_all_gather_kernel, axis_name=axis_name),
        out_shape=jax.ShapeDtypeStruct((n, S, F), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, S, F), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7
        ),
        interpret=interpret,
    )(x)
    return out.reshape(n * S, F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def ring_all_gather_grad(x: jnp.ndarray, axis_name: str, use_pallas: bool = True):
    """Differentiable all-gather: Pallas ring forward (pallas_call has no
    autodiff rule), reduce-scatter backward (the VJP of all-gather — each
    shard's cotangent is the psum of that block over the axis). Training
    with a row-sharded table runs through this."""
    if use_pallas:
        return ring_all_gather(x, axis_name)
    return jax.lax.all_gather(x, axis_name, axis=0).reshape(-1, x.shape[-1])


def _ring_ag_fwd(x, axis_name, use_pallas):
    return ring_all_gather_grad(x, axis_name, use_pallas), None


def _ring_ag_bwd(axis_name, use_pallas, _, ct):
    return (jax.lax.psum_scatter(ct, axis_name, scatter_dimension=0, tiled=True),)


ring_all_gather_grad.defvjp(_ring_ag_fwd, _ring_ag_bwd)


def all_gather_table(
    table: jnp.ndarray, mesh: Mesh, *, use_pallas: bool | None = None
) -> jnp.ndarray:
    """Reassemble a row-sharded table on every device.

    table: global [T, F] array sharded as P(axis, None) over ``mesh``.
    Returns the fully-replicated table. Uses the Pallas ring on TPU meshes
    with >1 device; falls back to lax.all_gather elsewhere.
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    if use_pallas is None:
        use_pallas = n > 1 and mesh.devices.flatten()[0].platform == "tpu"

    return jax.shard_map(
        lambda shard: ring_all_gather_grad(shard, axis, use_pallas),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(),
        check_vma=False,  # output replication is by construction (all-gather)
    )(table)
