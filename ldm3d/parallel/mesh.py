"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's `tf.distribute.MirroredStrategy` (reference main.py:81-88).

Instead of a strategy object with hidden cross-device ops, parallelism is a
`jax.sharding.Mesh` with named axes and `NamedSharding` annotations; XLA
inserts the collectives (psum for grads, all-gather at shard boundaries) and
routes them over ICI. Axes:

  - "data":  synchronous data parallelism (batch axis). Gradient reduction
             happens inside jit — no manual loss/num_gpus scaling (the
             reference hand-divides, vqvae3d_monai.py:489).
  - "space": spatial sharding of the volume depth axis for 128^3+ inputs
             (SURVEY.md §2.6 SP/CP row); convs at shard edges exchange halos
             via collective-permute (see ldm3d/parallel/halo.py).
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm3d.core.config import MeshConfig

DATA_AXIS = "data"
SPACE_AXIS = "space"
MODEL_AXIS = "model"


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None,
              batch_size: Optional[int] = None) -> Mesh:
    """Build the (data, space) mesh.

    With `cfg.data == -1` (the default "use everything") and a
    `batch_size`, the data axis is clamped to the largest DP degree the
    global batch can actually be split over (gcd of batch and available
    devices) — a fixed-batch preset on a larger host then trains on a
    valid submesh instead of failing the batch sharding. An explicitly
    configured data axis is honored verbatim."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    space = 1 if cfg is None else max(cfg.space, 1)
    model = 1 if cfg is None else max(getattr(cfg, "model", 1), 1)
    if cfg is None or cfg.data == -1:
        data = n // (space * model)
        if batch_size is not None and data > 1 and batch_size % data != 0:
            import math
            data = math.gcd(batch_size, data)
    else:
        data = cfg.data
    used = data * space * model
    if used > n or used < 1:
        raise ValueError(
            f"mesh {data}x{space}x{model} does not fit on {n} devices")
    if (cfg is not None and cfg.data != -1) and used != n:
        raise ValueError(
            f"mesh {data}x{space}x{model} does not cover {n} devices")
    if used != n:
        # the batch-clamped submesh leaves devices idle; that is merely
        # wasteful on one host, but across processes a submesh can exclude
        # entire hosts, whose addressable-device maps then come back empty
        # (rows=[] in the per-host loader) — fail loudly instead
        if jax.process_count() > 1:
            raise ValueError(
                f"global batch {batch_size} only supports a "
                f"{data}x{space}x{model} mesh, which would exclude "
                f"{n - used} of {n} devices (and possibly whole hosts) "
                f"in multi-process mode; use a batch divisible by "
                f"{n // (space * model)} or set mesh axes explicitly")
        warnings.warn(
            f"batch {batch_size} is not divisible by the {n} available "
            f"devices: training on a {data}x{space}x{model} submesh, "
            f"{n - used} devices idle", stacklevel=2)
    dev_array = np.asarray(devices[:used]).reshape(data, space, model)
    return Mesh(dev_array, (DATA_AXIS, SPACE_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None
                   ) -> NamedSharding:
    """Sharding for [B, H, W, D, C] volumes: batch over 'data', optionally
    one spatial axis over 'space'."""
    spec = [None] * 5
    spec[0] = DATA_AXIS
    if spatial_axis is not None and mesh.shape[SPACE_AXIS] > 1:
        spec[spatial_axis] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial_axis: Optional[int] = None):
    """Device-put a pytree of per-host arrays with batch-sharded leaves."""
    def put(x):
        if x.ndim >= 5:
            return jax.device_put(x, batch_sharding(mesh, spatial_axis))
        spec = [None] * x.ndim
        if x.ndim >= 1:
            spec[0] = DATA_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_map(put, batch)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"data-parallel size {n}")
    return global_batch // n
