"""Spatial parallelism: feature maps sharded across chips with halo exchange.

The reference has no sequence/context parallelism to port (pure CNN on
fixed 256x256 inputs — SURVEY.md §2); the spatial analog noted there as an
extension is implemented here: shard the activation HEIGHT dimension over a
mesh axis and exchange 1-row halos between neighbor chips so 3x3 SAME
convs compute exactly. This is the building block for scaling input
resolution beyond one chip's HBM (e.g. 1024x1024+ inputs), where a 3x3
conv's receptive field crosses shard boundaries.

Implementation: `shard_map` over the spatial axis; halos move by
`jax.lax.ppermute` with a NON-circular permutation — devices at the global
top/bottom receive zeros from the missing neighbor, which is exactly SAME
zero padding, so the sharded conv is bit-equivalent to the unsharded one.

Scope: the primitive (`conv3x3_spatial`) and pooling/upsample helpers are
provided and tested for equivalence on the spoofed CPU mesh. A fully
spatially-sharded hourglass is NOT wired in: after 4 pooling levels a
64-row map holds 4 rows per chip at 16-way sharding and the bottom 4x4
levels would under-fill every chip — the practical design (as in
production SP CNNs) re-gathers below a resolution threshold, documented
here as the follow-up for high-resolution configs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _halo_exchange_rows(x: jnp.ndarray, axis_name: str,
                        r: int = 1) -> jnp.ndarray:
    """Append r-row halos from the spatial neighbors to a local (B, h, W, C)
    block: returns (B, h + 2r, W, C). Edge shards get zero rows (SAME pad)."""
    n = jax.lax.axis_size(axis_name)
    # Rows we send DOWN to the next shard = our last r rows; they become the
    # receiver's top halo. Non-circular perm -> shard 0's top halo is zeros.
    down_perm = [(i, i + 1) for i in range(n - 1)]
    up_perm = [(i + 1, i) for i in range(n - 1)]
    top_halo = jax.lax.ppermute(x[:, -r:, :, :], axis_name, perm=down_perm)
    bottom_halo = jax.lax.ppermute(x[:, :r, :, :], axis_name, perm=up_perm)
    return jnp.concatenate([top_halo, x, bottom_halo], axis=1)


def _conv3x3_local(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: Optional[jnp.ndarray], axis_name: str) -> jnp.ndarray:
    x = _halo_exchange_rows(x, axis_name)
    # Height already padded by the halos -> VALID there; SAME on width.
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out


def conv3x3_spatial(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: Optional[jnp.ndarray], mesh: Mesh,
                    spatial_axis: str = "spatial") -> jnp.ndarray:
    """3x3 SAME conv on an activation whose H dim is sharded over
    `spatial_axis`. Bit-equivalent to the unsharded conv.

    x: (B, H, W, Cin) global array; kernel: (3, 3, Cin, Cout) replicated.
    """
    in_specs = (P(None, spatial_axis, None, None), P(), P())
    out_specs = P(None, spatial_axis, None, None)
    fn = shard_map(
        partial(_conv3x3_local, axis_name=spatial_axis),
        mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    return fn(x, kernel, bias if bias is not None else jnp.zeros(
        (kernel.shape[-1],), kernel.dtype))


def _conv_local(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray], axis_name: str,
                stride: int) -> jnp.ndarray:
    """General k x k SAME conv (odd k) with stride on an H-sharded block.

    Halo r = k//2 rows each side; for stride s with local h % s == 0, TF
    SAME pads the height by (k - s) total = (k - s)//2 on top, so the
    valid window walk over the halo-extended block starts at offset
    r - (k - s)//2 (1 for the front's 7x7/s2, 0 for any s=1 odd k)."""
    k = kernel.shape[0]
    r = k // 2
    off = r - (k - stride) // 2
    ext = _halo_exchange_rows(x, axis_name, r=r)
    if off:
        ext = ext[:, off:, :, :]
    out = jax.lax.conv_general_dilated(
        ext, kernel,
        window_strides=(stride, stride),
        padding=((0, 0), ((k - stride) // 2, (k - stride + 1) // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h_out = x.shape[1] // stride
    out = out[:, :h_out, :, :]
    if bias is not None:
        out = out + bias
    return out


def conv_spatial(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: Optional[jnp.ndarray], mesh: Mesh,
                 spatial_axis: str = "spatial",
                 stride: int = 1) -> jnp.ndarray:
    """k x k SAME conv (odd k, e.g. the front's 7x7/s2) on an H-sharded
    activation; bit-equivalent to the unsharded conv. Requires the local
    height to be a multiple of the stride."""
    fn = shard_map(
        partial(_conv_local, axis_name=spatial_axis, stride=stride),
        mesh=mesh,
        in_specs=(P(None, spatial_axis, None, None), P(), P()),
        out_specs=P(None, spatial_axis, None, None))
    return fn(x, kernel, bias if bias is not None else jnp.zeros(
        (kernel.shape[-1],), kernel.dtype))


def maxpool2x2_spatial(x: jnp.ndarray, mesh: Mesh,
                       spatial_axis: str = "spatial") -> jnp.ndarray:
    """2x2/s2 maxpool on an H-sharded activation. Requires the local height
    to be even (pooling windows never straddle a shard boundary when the
    global H and the shard count are powers of two)."""
    def local(x):
        if x.shape[1] % 2 != 0:
            raise ValueError("local height must be even for 2x2 pooling")
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
            padding="VALID")

    return shard_map(local, mesh=mesh,
                     in_specs=P(None, spatial_axis, None, None),
                     out_specs=P(None, spatial_axis, None, None))(x)


def upsample2x_spatial(x: jnp.ndarray, mesh: Mesh,
                       spatial_axis: str = "spatial") -> jnp.ndarray:
    """Nearest 2x upsample on an H-sharded activation (purely local)."""
    def local(x):
        B, h, W, C = x.shape
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (B, h, 2, W, 2, C))
        return y.reshape(B, h * 2, W * 2, C)

    return shard_map(local, mesh=mesh,
                     in_specs=P(None, spatial_axis, None, None),
                     out_specs=P(None, spatial_axis, None, None))(x)


def shard_spatial(x: jnp.ndarray, mesh: Mesh,
                  spatial_axis: str = "spatial") -> jnp.ndarray:
    """Place a (B, H, W, C) array H-sharded on the mesh."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, spatial_axis, None, None)))
