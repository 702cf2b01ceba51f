"""Halo-exchange 3D convolution for spatially-sharded volumes.

The reference never shards space — 128^3 activations must fit one GPU
(SURVEY.md §2.6 SP/CP row: "absent"). TPU-native answer: shard one spatial
axis of [B, H, W, D, C] over the 'space' mesh axis and run convolutions
locally after exchanging k-dependent halo slabs with mesh neighbours via
`lax.ppermute` (compiled to ICI sends). Boundary shards receive zeros from
the non-circular permute, which reproduces TF-'same' zero padding exactly.

Halo widths for TF-'same' stride-s kernel-k (local length divisible by s):
  pad_total = max(k - s, 0); left = pad_total // 2; right = pad_total - left
so each shard needs `left` rows from its left neighbour and `right` rows
from its right neighbour, then a VALID conv on the padded slab yields its
exact output shard. Matches the unsharded conv bit-for-bit (tests).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ldm3d.parallel.mesh import SPACE_AXIS


def _halo_widths(kernel: int, stride: int) -> Tuple[int, int]:
    pad_total = max(kernel - stride, 0)
    left = pad_total // 2
    return left, pad_total - left


def halo_exchange(x_local: jax.Array, left: int, right: int, axis: int,
                  axis_name: str = SPACE_AXIS) -> jax.Array:
    """Pad `x_local` along `axis` with `left`/`right` rows fetched from the
    mesh neighbours (zeros at the boundary shards)."""
    n = lax.axis_size(axis_name)
    parts = []
    if left > 0:
        # my left halo = last `left` rows of my left neighbour
        send = lax.slice_in_dim(x_local, x_local.shape[axis] - left,
                                x_local.shape[axis], axis=axis)
        recv = lax.ppermute(send, axis_name,
                            [(i, i + 1) for i in range(n - 1)])
        parts.append(recv)
    parts.append(x_local)
    if right > 0:
        send = lax.slice_in_dim(x_local, 0, right, axis=axis)
        recv = lax.ppermute(send, axis_name,
                            [(i + 1, i) for i in range(n - 1)])
        parts.append(recv)
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x_local


def _conv3d_local(x: jax.Array, kernel: jax.Array, stride: Tuple[int, ...],
                  shard_axis: int) -> jax.Array:
    """VALID conv along the sharded axis (halos pre-attached), TF-'same'
    padding on the two unsharded spatial axes."""
    pads = []
    for dim in range(3):
        k, s = kernel.shape[dim], stride[dim]
        if dim == shard_axis - 1:
            pads.append((0, 0))
        else:
            total = max(k - s, 0)
            pads.append((total // 2, total - total // 2))
    return lax.conv_general_dilated(
        x, kernel, window_strides=stride, padding=pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def halo_conv3d(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array],
                stride: int, mesh: Mesh, shard_axis: int = 1) -> jax.Array:
    """'same' 3D conv over a volume whose `shard_axis` is sharded over the
    'space' mesh axis. kernel: [kd, kh, kw, Cin, Cout] (flax DHWIO).

    The ppermute halo exchange + local VALID conv is numerically identical
    to the unsharded `lax.conv_general_dilated` with SAME padding."""
    strides = (stride,) * 3
    k = kernel.shape[shard_axis - 1]
    left, right = _halo_widths(k, stride)

    spec = [None] * x.ndim
    spec[shard_axis] = SPACE_AXIS
    x_spec = P(*spec)
    out_spec = x_spec

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(x_spec, P(), P() if bias is not None else None),
        out_specs=out_spec, check_vma=False)
    def run(x_local, kernel, bias):
        padded = halo_exchange(x_local, left, right, shard_axis)
        out = _conv3d_local(padded, kernel, strides, shard_axis)
        if bias is not None:
            out = out + bias
        return out

    if bias is None:
        @functools.partial(shard_map, mesh=mesh, in_specs=(x_spec, P()),
                           out_specs=out_spec, check_vma=False)
        def run_nobias(x_local, kernel):
            padded = halo_exchange(x_local, left, right, shard_axis)
            return _conv3d_local(padded, kernel, strides, shard_axis)
        return run_nobias(x, kernel)
    return run(x, kernel, bias)
