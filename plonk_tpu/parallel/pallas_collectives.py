"""Pallas remote-DMA ring collectives (ICI-level communication backend).

The reference has no communication layer at all (SURVEY §2.3 — plain
single-threaded C); this framework's standard cross-chip exchanges ride
XLA collectives (`lax.all_gather` / `all_to_all` in parallel/dist_*.py).
For overlap-critical hot paths the TPU-native lowest level is a Pallas
kernel issuing inter-chip RDMA directly (`pltpu.make_async_remote_copy`),
which XLA cannot fuse or schedule around: the kernel owns the
send/receive semaphores and can interleave compute between hops.

`ring_all_gather` implements the canonical bidirectional-capable ring
exchange (here unidirectional: D-1 hops, each device forwards the chunk
it just received). It is bit-exact with `lax.all_gather` over the same
mesh axis and is validated two ways on the CPU backend (tests/
test_parallel.py):

- parity with `lax.all_gather` under the TPU *interpret machine*, which
  simulates the per-device grids and the inter-device DMAs;
- a race-detection lane (`pltpu.InterpretParams(detect_races=True)`) —
  the TPU-native analog of the sanitizer lanes the reference never had
  (SURVEY §5): vector clocks over every DMA/semaphore edge flag any
  unsynchronized buffer reuse in the kernel.

On real multi-chip hardware the same `jax.jit(shard_map(...))` callable
lowers to Mosaic with the RDMAs on ICI (single-chip: the ring is a
no-op copy and the kernel reduces to `out[0] = local`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

U32 = jnp.uint32


def _ring_kernel(axis: str, n_dev: int,
                 local_ref, out_ref, comm_ref, send_sem, recv_sem):
    """Per-device body. local_ref: (rows, cols) VMEM chunk; out_ref and
    comm_ref: (n_dev, rows, cols).

    Hops go between per-source comm slots: at hop `step` every device
    forwards comm[(my_id - step) % D] — its own chunk at hop 0, the
    chunk that just arrived afterwards — into the right neighbor's SAME
    slot. Each slot is written exactly once (locally or by one incoming
    DMA) and only read after that write's recv-semaphore wait, so there
    is no buffer reuse and no flow-control hazard: a neighbor running
    ahead writes a slot nobody has touched yet. Semaphores are likewise
    one-per-hop: DMAs are not ordered across descriptors, so two hops
    sharing a semaphore lets a neighbor's hop-N+2 completion satisfy the
    local hop-N wait before hop-N's bytes have landed. (Both hazards
    were caught on the CPU backend: a first double-buffered variant by
    the interpret machine's vector-clock race detector — with 2 slots a
    fast left neighbor's hop N+2 write aliases the slot the local device
    still reads at hop N — and the 2-semaphore variant by
    nondeterministic parity failures under the interpreter's arbitrary
    DMA interleaving.)"""
    my_id = jax.lax.axis_index(axis)
    right = jax.lax.rem(my_id + 1, n_dev)
    left = jax.lax.rem(my_id + n_dev - 1, n_dev)

    comm_ref[my_id] = local_ref[:]
    if n_dev == 1:
        out_ref[0] = local_ref[:]
        return
    # Neighbor barrier: nobody starts writing into a peer's comm
    # buffer until that peer has entered the kernel (guide pattern).
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    for step in range(n_dev - 1):
        slot = jax.lax.rem(my_id + (n_dev - step), n_dev)
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[slot],
            dst_ref=comm_ref.at[slot],
            send_sem=send_sem.at[step],
            recv_sem=recv_sem.at[step],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
    out_ref[:] = comm_ref[:]


def _pad_to(x: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


@functools.lru_cache(maxsize=64)
def _make_call(axis: str, n_dev: int, rows: int, cols: int,
               dtype_name: str, interpret_mode: str | None):
    dtype = jnp.dtype(dtype_name)
    # VMEM-friendly padded chunk (8-sublane / 128-lane tiles)
    prow = -(-rows // 8) * 8
    pcol = -(-cols // 128) * 128

    kern = functools.partial(_ring_kernel, axis, n_dev)
    interpret = False
    if interpret_mode is not None:
        interpret = pltpu.InterpretParams(
            detect_races=(interpret_mode == "races"))
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_dev, prow, pcol), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_dev, prow, pcol), dtype),
            pltpu.SemaphoreType.DMA((max(n_dev - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(n_dev - 1, 1),)),
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=7, has_side_effects=True),
        interpret=interpret,
    )
    return call, prow, pcol


def gather_in_body(axis: str, n_dev: int, xl: jnp.ndarray,
                   interpret_mode: str | None = None) -> jnp.ndarray:
    """Ring all-gather usable INSIDE an existing shard_map body: local
    chunk (rows, cols) or (rows,) -> gathered (n_dev*rows, cols)/(n_dev*
    rows,), bit-exact with `lax.all_gather(xl, axis, tiled=True)`."""
    squeeze = xl.ndim == 1
    x2 = xl[:, None] if squeeze else xl
    rows, cols = x2.shape
    call, prow, pcol = _make_call(axis, n_dev, rows, cols, x2.dtype.name,
                                  interpret_mode)
    gathered = call(_pad_to(x2, prow, pcol))[:, :rows, :cols]
    gathered = gathered.reshape(n_dev * rows, cols)
    return gathered[:, 0] if squeeze else gathered


def _a2a_kernel(axis: str, n_dev: int,
                local_ref, out_ref, comm_ref, send_sem, recv_sem):
    """All-to-all: local_ref (n_dev, rows, cols) holds one chunk per
    destination; out slot s receives device s's chunk for us. Every pair
    exchanges exactly one chunk, so all D-1 RDMAs are issued CONCURRENTLY
    (started before any wait) to distinct destination slots with
    per-offset semaphores — the hardware routes non-neighbor transfers
    across the torus, and every ICI link carries traffic at once. The
    same no-aliasing discipline as _ring_kernel: slot s is written by
    exactly one party, each offset has its own semaphore pair."""
    my_id = jax.lax.axis_index(axis)
    comm_ref[my_id] = local_ref[my_id]
    if n_dev == 1:
        out_ref[:] = comm_ref[:]
        return
    # Global barrier (every pair communicates): all peers must have
    # entered the kernel before any remote write can land.
    barrier = pltpu.get_barrier_semaphore()
    for off in range(1, n_dev):
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=jax.lax.rem(my_id + off, n_dev),
            device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, n_dev - 1)

    rdmas = []
    for off in range(1, n_dev):
        dst = jax.lax.rem(my_id + off, n_dev)
        rdma = pltpu.make_async_remote_copy(
            src_ref=local_ref.at[dst],
            dst_ref=comm_ref.at[my_id],
            send_sem=send_sem.at[off - 1],
            recv_sem=recv_sem.at[off - 1],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdmas.append(rdma)
    for rdma in rdmas:
        rdma.wait()
    out_ref[:] = comm_ref[:]


@functools.lru_cache(maxsize=64)
def _make_a2a_call(axis: str, n_dev: int, rows: int, cols: int,
                   dtype_name: str, interpret_mode: str | None):
    dtype = jnp.dtype(dtype_name)
    prow = -(-rows // 8) * 8
    pcol = -(-cols // 128) * 128
    kern = functools.partial(_a2a_kernel, axis, n_dev)
    interpret = False
    if interpret_mode is not None:
        interpret = pltpu.InterpretParams(
            detect_races=(interpret_mode == "races"))
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_dev, prow, pcol), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_dev, prow, pcol), dtype),
            pltpu.SemaphoreType.DMA((max(n_dev - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(n_dev - 1, 1),)),
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=8, has_side_effects=True),
        interpret=interpret,
    )
    return call, prow, pcol


def all_to_all_in_body(axis: str, n_dev: int, x: jnp.ndarray,
                       split_axis: int, concat_axis: int,
                       interpret_mode: str | None = None) -> jnp.ndarray:
    """Drop-in for `lax.all_to_all(x, axis, split_axis, concat_axis,
    tiled=True)` inside a shard_map body, carried by the concurrent
    direct-RDMA kernel. The chunk reshuffle around the exchange is plain
    XLA (local relayout); only the cross-device movement is Pallas."""
    if x.shape[split_axis] % n_dev:
        raise ValueError("split axis must divide the mesh axis size")
    # -> (D, chunk...) with the split axis chunked
    moved = jnp.moveaxis(x, split_axis, 0)
    chunk = moved.reshape((n_dev, x.shape[split_axis] // n_dev)
                          + moved.shape[1:])
    flat = chunk.reshape(n_dev, -1)
    rows = flat.shape[1]
    # 2-D slots: fold into (rows', lanes)-friendly shape — the widest
    # power-of-two lane count (<=128) dividing the chunk
    cols = 128
    while rows % cols:
        cols //= 2
    slot = flat.reshape(n_dev, rows // cols, cols)
    call, prow, pcol = _make_a2a_call(axis, n_dev, rows // cols, cols,
                                      x.dtype.name, interpret_mode)
    pad = [(0, 0), (0, prow - slot.shape[1]), (0, pcol - cols)]
    got = call(jnp.pad(slot, pad))[:, :rows // cols, :cols]
    # slot s = the chunk source device s sent us, in `moved` layout
    # (split axis leading); restore original axis order per chunk, then
    # concatenate the D chunks source-major along concat_axis — exactly
    # tiled all_to_all's layout.
    chunks = got.reshape((n_dev, x.shape[split_axis] // n_dev)
                         + moved.shape[1:])
    chunks = jnp.moveaxis(chunks, 1, split_axis + 1)
    return jnp.concatenate([chunks[d] for d in range(n_dev)],
                           axis=concat_axis)


@functools.lru_cache(maxsize=32)
def _build(mesh: Mesh, axis: str, rows: int, cols: int, dtype_name: str,
           interpret_mode: str | None):
    n_dev = mesh.shape[axis]

    def body(xl):
        return gather_in_body(axis, n_dev, xl, interpret_mode)

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(axis), out_specs=P(), check_vma=False))


def ring_all_gather(mesh: Mesh, x: jnp.ndarray, axis: str = "sp",
                    interpret_mode: str | None = None) -> jnp.ndarray:
    """All-gather a 1-D or 2-D array sharded on its FIRST dim over
    `axis`, via the remote-DMA ring kernel. Returns the replicated
    concatenation, bit-exact with `lax.all_gather(..., tiled=True)`.

    interpret_mode: None (compiled — real TPU), "sim" (TPU interpret
    machine; runs on the CPU backend), "races" (interpret + vector-clock
    race detection).
    """
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    if x.ndim != 2:
        raise ValueError("ring_all_gather supports 1-D/2-D arrays")
    n_dev = mesh.shape[axis]
    if x.shape[0] % n_dev:
        raise ValueError("leading dim must divide the mesh axis")
    rows = x.shape[0] // n_dev
    fn = _build(mesh, axis, rows, x.shape[1], x.dtype.name, interpret_mode)
    out = fn(x).reshape(-1, x.shape[1])
    return out[:, 0] if squeeze else out
