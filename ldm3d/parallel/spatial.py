"""Spatial (sequence/context) parallelism for the production model path.

The reference cannot shard space at all — a 128^3 activation must fit one
GPU (SURVEY.md §2.6 SP/CP row). Here the volume depth axis of every
[B, H, W, D, C] activation is pinned to the 'space' mesh axis with GSPMD
sharding constraints, so XLA's SPMD partitioner keeps convolutions
spatially partitioned end-to-end and exchanges kernel halos with
collective-permute over ICI instead of all-gathering the sharded axis.
The hand-written `ldm3d/parallel/halo.py` ppermute kernel is the bit-exact
specification of that halo exchange (tests/test_parallel.py); pinning
per-layer constraints lets one GSPMD program fuse the exchanges into the
surrounding convs, which a per-conv shard_map wrapper would prevent.

Usage: trainers wrap their (to-be-jitted) step bodies in
`with spatial_sharding(mesh):`; model code calls `shard_spatial(x)` after
each conv/block. Outside the context — or when the mesh has no 'space'
axis, or a shape is not divisible — `shard_spatial` is an exact no-op, so
single-chip and pure-DP paths are untouched.

Verification contract (wired into `__graft_entry__.dryrun_multichip` and
tests/test_spatial.py): at space>1 the compiled train-step HLO contains
collective-permutes, and XLA's memory analysis reports materially lower
per-device activation memory than the same global problem at space=1.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm3d.parallel.mesh import DATA_AXIS, SPACE_AXIS

# The sharded spatial dimension of [B, H, W, D, C] volumes: depth, matching
# the input placement (ldm3d/data/pipeline.py spatial_axis=3 and
# mesh.batch_sharding).
SPATIAL_AXIS = 3

_ctx = threading.local()


@contextmanager
def spatial_sharding(mesh: Optional[Mesh]):
    """Activate spatial sharding constraints for model code traced inside
    this context. A None mesh or a space-degree of 1 makes the whole
    context a no-op."""
    active = (mesh is not None
              and mesh.shape.get(SPACE_AXIS, 1) > 1)
    prev = getattr(_ctx, "mesh", None)
    _ctx.mesh = mesh if active else None
    try:
        yield
    finally:
        _ctx.mesh = prev


def active_mesh() -> Optional[Mesh]:
    return getattr(_ctx, "mesh", None)


def with_spatial(mesh: Optional[Mesh], fn):
    """Wrap a to-be-jitted step function so its trace runs inside
    `spatial_sharding(mesh)` — the one-line hook each trainer applies at
    its `jax.jit` sites."""
    def wrapped(*args, **kwargs):
        with spatial_sharding(mesh):
            return fn(*args, **kwargs)
    return wrapped


def shard_spatial(x: jax.Array, axis: int = SPATIAL_AXIS) -> jax.Array:
    """Pin a [B, ..., C] activation's batch axis to 'data' and spatial
    `axis` to 'space' when a spatial-sharding context is active and the
    shape divides evenly; identity otherwise.

    Deep levels whose spatial extent has shrunk below the space degree
    (e.g. 8^3 latents on space=16) are left unconstrained — GSPMD
    replicates them, which is the right call when the halo would exceed
    the shard."""
    mesh = active_mesh()
    if mesh is None or x.ndim < 3:
        return x
    space = mesh.shape[SPACE_AXIS]
    data = mesh.shape[DATA_AXIS]
    if x.shape[axis] % space != 0 or x.shape[axis] // space < 1:
        return x
    spec = [None] * x.ndim
    if x.shape[0] % data == 0:
        spec[0] = DATA_AXIS
    spec[axis] = SPACE_AXIS
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
