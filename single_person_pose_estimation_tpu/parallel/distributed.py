"""Multi-host (multi-process) initialization and input sharding helpers.

TPU-native counterpart of what the reference never had (single Colab GPU):
on a multi-host slice, call `initialize()` once per process before any jax
use (wraps `jax.distributed.initialize`, no-op when single-process or when
the cluster env is absent), build the mesh over `jax.devices()` (global),
and feed each process its own disjoint subset of record shards via
`shard_files_for_process` — then assemble global batches with
`parallel.mesh.shard_local_batch`.

The per-FILE round-robin split mirrors the reference's shard-file layout
(file_{split}_%02i-%i.tfrec, ~2048 examples each), so hosts stay balanced
to within one shard.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (idempotent, single-process
    safe). On TPU pods the arguments are auto-discovered from the
    environment; pass them explicitly elsewhere."""
    # Do NOT probe jax.process_count() here: it initializes the backend,
    # after which jax.distributed.initialize always fails ("must be called
    # before any JAX computations") — a bug this wrapper originally had,
    # caught by the 2-process test (tests/_multihost_worker.py). Check the
    # distributed client state directly instead.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        if explicit:
            # Caller named a coordinator: failing to join it is an error,
            # not a single-process fallback.
            raise
        # Single-process environment (no cluster variables): nothing to do.
        pass


def shard_files_for_process(filenames: Sequence[str],
                            process_index: Optional[int] = None,
                            process_count: Optional[int] = None,
                            allow_replicate: bool = False) -> List[str]:
    """Disjoint round-robin file subset for this process.

    Every shard file holds (up to) the same number of examples, so a
    round-robin split keeps per-host example counts within one shard of
    each other. With fewer files than processes, some hosts receive no
    files — raise instead, since a host contributing empty batches would
    deadlock collectives.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if process_count == 1:
        return list(filenames)
    if len(filenames) < process_count:
        if allow_replicate:
            # Acceptable for validation: every host reads the same files;
            # mean metrics over identical data are unchanged.
            return list(filenames)
        raise ValueError(
            f"{len(filenames)} shard files cannot feed {process_count} "
            "processes; regenerate records with more shards "
            "(smaller num_examples_per_record)")
    return list(filenames)[process_index::process_count]
