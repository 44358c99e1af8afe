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

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np


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


def aggregate_metrics(metrics: Dict[str, float],
                      weight: float = 1.0) -> Dict[str, float]:
    """Weighted mean of scalar metrics across all processes.

    The multi-host eval-aggregation seam (SURVEY §2 parallelism table:
    "eval metric aggregation via process_allgather"): when each host
    evaluates its own disjoint record shards (`shard_files_for_process`),
    the per-host means must be combined by example count before any
    decision is taken on them — otherwise hosts with uneven shards
    disagree on val_loss and e.g. the best-checkpoint promotion
    (training/trainer.py) diverges across the cluster.

    This is a COLLECTIVE: every process must call it, with the same keys
    (values/weights may differ). `weight` is the number of examples
    behind this process's means. Every process returns the identical
    global dict: sum_p(w_p * v_p) / sum_p(w_p) per key. Single-process:
    identity. Also correct when the metrics are already global (a
    GSPMD-sharded eval step over one global mesh): the weighted mean of
    identical values is that value.
    """
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    w = float(weight)
    local = np.array([w] + [float(metrics[k]) * w for k in keys],
                     np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    sums = gathered.sum(axis=0)  # (1 + K,): [sum_w, sum_w*v ...]
    total_w = float(sums[0])
    if total_w <= 0:
        raise ValueError("aggregate_metrics: total weight must be > 0")
    return {k: float(sums[1 + i] / total_w) for i, k in enumerate(keys)}
