"""Mesh construction and sharding helpers.

The distributed design (SURVEY.md §2.5 / §5): the reference's entire
distributed surface is single-host DDP over gloo; the TPU-native replacement
is a `jax.sharding.Mesh` with two logical axes:

  * ``data``  — batch data parallelism. The jitted train step shards the
    [B, L] waveform batch over it; XLA inserts the gradient all-reduce over
    ICI automatically (this replaces DistributedDataParallel).
  * ``freq``  — frequency parallelism for batched offline enhancement and
    for sharding the folded (B·F) sub-band LSTM batch when it exceeds one
    chip's HBM (a capability the reference does not have; its only analogue
    is the drop_band compute trick).

Multi-host bootstrap is `jax.distributed.initialize` + per-host data
pipelines (data/loader.py hands each host its own shard of the clean list,
replacing DistributedSampler).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bootstrap. No-op for single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(data: int | None = None, freq: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'freq') mesh over the given (default: all) devices.

    ``data=None`` uses every remaining device on the data axis. Device order
    follows jax.devices(), which orders ICI-contiguous chips adjacently, so
    the data-parallel all-reduce rides ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % freq == 0, f"{n} devices not divisible by freq={freq}"
        data = n // freq
    assert data * freq <= n, f"mesh {data}x{freq} needs {data * freq} > {n} devices"
    grid = np.asarray(devices[: data * freq]).reshape(data, freq)
    return Mesh(grid, ("data", "freq"))


def auto_mesh(batch_size: int, devices=None) -> Mesh | None:
    """Largest data-parallel mesh fed by PER-HOST batches of `batch_size`.

    Single-process: the largest device count that divides the batch (a
    prefix of jax.devices()); None when only one device exists (plain jit
    is cheaper than a 1-device mesh).

    Multi-process: all devices. globalize_batch requires every host to
    contribute exactly its local rows to uniformly-sized shards, so a
    partial device subset (non-uniform per host) is not usable — sizing
    the axis against the local batch here used to build e.g. a 6-device
    mesh over 2x4 hosts that make_array_from_process_local_data then
    rejects on the first batch. Raises when the global batch can't split
    evenly instead of producing that mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n <= 1:
        return None
    procs = jax.process_count()
    if procs > 1:
        global_batch = batch_size * procs
        if global_batch % n != 0:
            raise ValueError(
                f"global batch {global_batch} ({batch_size}/host × {procs} "
                f"hosts) must divide evenly over all {n} devices for "
                "multi-host training; adjust dataloader.batch_size"
            )
        return make_mesh(data=n, freq=1, devices=devices)
    data = n
    while data > 1 and batch_size % data != 0:
        data -= 1
    if data <= 1:
        return None
    return make_mesh(data=data, freq=1, devices=devices[:data])


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def freq_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """Shard dimension `axis` over 'freq', replicate the rest."""
    spec = [None] * ndim
    spec[axis] = "freq"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def globalize_batch(mesh: Mesh, *arrays):
    """Assemble per-host local batch shards into global device arrays.

    Single-process: returns the arrays unchanged (jit shards them itself).
    Multi-process: each host contributes its local [b_local, ...] shard of a
    global [b_local * num_processes, ...] batch sharded over 'data' — this is
    how the per-host input pipelines feed one global train step (replacing
    DistributedSampler + DDP).
    """
    if jax.process_count() == 1:
        return arrays if len(arrays) > 1 else arrays[0]
    out = []
    for arr in arrays:
        sharding = NamedSharding(mesh, P("data", *([None] * (arr.ndim - 1))))
        out.append(jax.make_array_from_process_local_data(sharding, np.asarray(arr)))
    return tuple(out) if len(out) > 1 else out[0]
