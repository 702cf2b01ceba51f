"""Multi-host (multi-process) initialization — the DCN story.

The reference is strictly single-node (every sbatch runs one node,
SURVEY.md §2.6); this module is the beyond-parity piece that makes the
same training CLI span hosts: `jax.distributed.initialize` wires the
processes into one global device set, `make_mesh` then builds the
(data, space) mesh over *global* devices, and the DataLoader feeds each
process only its own batch rows (see `pipeline.DataLoader`), assembling
global arrays with `jax.make_array_from_process_local_data`. XLA routes
collectives over ICI within a slice and DCN across slices — no
transport code here, just topology description.

Environment variables (or the matching CLI flags):
  LDM3D_COORDINATOR   host:port of process 0
  LDM3D_NUM_PROCESSES total process count
  LDM3D_PROCESS_ID    this process's rank
On TPU pods where JAX can autodetect the cluster, calling
`jax.distributed.initialize()` with no arguments also works; we only
require the env-var path because CPU/Gloo test clusters cannot
autodetect.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or LDM3D_* env vars.

    Returns True when a multi-process runtime was initialized, False when
    running single-process (no coordinator configured). Safe to call
    before any other jax API touches the backend; must not be called
    after devices are initialized.
    """
    import jax

    coordinator_address = (coordinator_address
                           or os.environ.get("LDM3D_COORDINATOR"))
    if coordinator_address is None:
        return False
    num_processes = int(num_processes
                        if num_processes is not None
                        else os.environ.get("LDM3D_NUM_PROCESSES", "1"))
    process_id = int(process_id
                     if process_id is not None
                     else os.environ.get("LDM3D_PROCESS_ID", "0"))
    if num_processes <= 1:
        # an explicit coordinator with a 1-process spec is a misconfigured
        # launch (forgotten --num_processes / LDM3D_NUM_PROCESSES); falling
        # back silently would run N independent copies of the workload that
        # clobber each other's checkpoints
        raise ValueError(
            f"coordinator {coordinator_address} configured but "
            f"num_processes={num_processes}; pass --num_processes/"
            f"LDM3D_NUM_PROCESSES >= 2 (and a unique process_id per host)")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def local_batch_rows(sharding, global_batch: int, sample_shape) -> Optional[range]:
    """Batch rows owned by this process's addressable devices under
    `sharding` — the loader reads only these (per-host input sharding,
    the multi-host analogue of AutoShardPolicy.DATA).

    Returns None in single-process mode (caller reads everything).
    Requires each process's rows to be contiguous and every addressable
    shard to span complete volumes (the 'space' axis must not cross
    process boundaries) — both hold for data-major mesh layouts over
    contiguous local device groups.
    """
    import jax

    if jax.process_count() == 1:
        return None
    shape = (global_batch,) + tuple(sample_shape)
    rows = set()
    for idx in sharding.addressable_devices_indices_map(shape).values():
        s = idx[0]
        start = 0 if s.start is None else int(s.start)
        stop = global_batch if s.stop is None else int(s.stop)
        rows.update(range(start, stop))
    rows = sorted(rows)
    if rows != list(range(rows[0], rows[-1] + 1)):
        raise ValueError(
            f"process-local batch rows {rows} are not contiguous; "
            f"use a data-major mesh layout")
    return range(rows[0], rows[-1] + 1)
