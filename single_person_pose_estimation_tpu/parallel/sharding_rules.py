"""Tensor-parallel sharding rules: channel-sharded convs over a 2-D mesh.

Not required for parity (the 13.8M-param hourglass replicates trivially —
SURVEY.md §2 parallelism table) but provided as the scaling path for
large-stack/channel configs: conv kernels shard their output-channel dim
and 1-D channel vectors (biases, BN scale/bias/mean/var, Adam moments of
the same) shard their only dim over the "model" axis. GSPMD propagates the
activation shardings and inserts the all-gathers/reduce-scatters over ICI;
there is no hand-written collective plumbing to maintain.

A leaf is sharded only when the dimension is divisible by the model-axis
size (the 17-channel predict head, scalars, PRNG keys etc. replicate), so
the rules are safe to apply over the whole TrainState including optimizer
state.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, model_axis: str, axis_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if len(shape) == 4 and shape[-1] % axis_size == 0:
        # Conv kernel (H, W, I, O): shard output channels.
        return P(None, None, None, model_axis)
    if len(shape) == 1 and shape[0] % axis_size == 0 and shape[0] >= 16:
        # Channel vectors (bias/scale/mean/var and their Adam moments).
        return P(model_axis)
    return P()


def state_shardings(state: Any, mesh: Mesh,
                    model_axis: Optional[str] = None) -> Any:
    """NamedSharding pytree for a TrainState (or any param pytree).

    model_axis None -> fully replicated (pure data parallelism).
    """
    if model_axis is None or model_axis not in mesh.axis_names:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: repl, state)
    axis_size = int(mesh.shape[model_axis])

    def to_sharding(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf, model_axis, axis_size))

    return jax.tree.map(to_sharding, state)


def shard_state(state: Any, mesh: Mesh,
                model_axis: Optional[str] = None) -> Any:
    """Place a TrainState onto the mesh under the TP rules."""
    return jax.device_put(state, state_shardings(state, mesh, model_axis))
