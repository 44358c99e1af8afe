"""Device mesh construction and sharding specs.

The reference has no distributed machinery at all (single Keras fit on one
GPU — SURVEY.md §2); this module is the TPU-native parallelism layer it
lacked. Design follows the standard JAX recipe: build a `jax.sharding.Mesh`
over all chips, annotate array shardings with NamedSharding/PartitionSpec,
let GSPMD insert the collectives (gradient all-reduce, sync-BN mean) over
ICI, and feed each process only its local batch shard.

Axes:
  * "data"  — batch-dimension data parallelism (the primary axis; the
              13.8M-param hourglass replicates trivially).
  * "model" — optional channel sharding of the convs for large-stack
              configs (tensor parallelism); 1 by default.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over `devices` (default: all).

    A single -1 in mesh_shape absorbs the remaining device count, numpy
    reshape style: create_mesh((-1,)) -> 1-D data mesh over every chip;
    create_mesh((-1, 2), ("data", "model")) -> 2-D mesh.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} does not cover {len(devices)} devices")
    return Mesh(devices.reshape(shape), tuple(axis_names))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a pytree of host arrays onto the mesh, batch-dim sharded.

    Single-process path: `jax.device_put` with a NamedSharding splits the
    global array across local devices. (Multi-host: each process passes its
    local shard through `jax.make_array_from_process_local_data` instead —
    see `shard_local_batch`.)
    """
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_local_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Multi-host: assemble a global array from per-process local shards.

    Each process reads a disjoint subset of record shards (mirroring the
    per-file sharding scheme of the ETL) and contributes its local batch;
    the returned jax.Arrays are globally batch-sharded over the mesh.
    """
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def pad_batch_to_devices(batch, n_devices: int):
    """Zero-pad the batch dim up to a multiple of the device count (the
    final partial eval batch otherwise cannot shard). Returns (batch, n_valid)."""
    import numpy as _np

    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    rem = n % n_devices
    if rem == 0:
        return batch, n
    pad = n_devices - rem

    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return _np.pad(_np.asarray(x), widths)

    return jax.tree.map(_pad, batch), n
