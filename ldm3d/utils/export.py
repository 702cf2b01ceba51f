"""Compact, git-committable weight snapshots (.npz).

The orbax checkpoints under runs/ are full train states (params + Adam
moments + RNG) on a gitignored, non-durable disk — twice now the trained
flagship vanished before the driver's bench ran (VERDICT r4 weak #1). This
module packs just the *sampling* state — params, EMA params, quantizer and
batch-norm statistics — into one float16 .npz plus a JSON metadata blob, so
the benched artifact can live in git (~2 bytes/param, no optimizer state).

Keys are '/'-joined flax dict paths per collection, e.g.
`params/unet/ResidualBlock_0/Conv_0/kernel`. Restore matches the template
state produced by `trainer.init_state` leaf-by-leaf (strict: missing or
extra keys raise), casting back to each template leaf's dtype.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import numpy as np

_COLLECTIONS = ("params", "ema_params", "vq_stats", "batch_stats")


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_state_npz(path: str, state: Any, meta: Optional[dict] = None,
                   dtype=np.float16) -> dict:
    """Write the sampling-relevant subtrees of `state` to `path` (.npz),
    float arrays cast to `dtype`. Returns the metadata dict written."""
    arrays = {}
    for coll in _COLLECTIONS:
        tree = getattr(state, coll, None)
        if tree is None:
            continue
        for key, arr in _flatten(jax.device_get(tree)).items():
            if np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(dtype)
            arrays[f"{coll}/{key}"] = arr
    meta = dict(meta or {})
    meta["collections"] = sorted({k.split("/", 1)[0] for k in arrays})
    meta["num_arrays"] = len(arrays)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return meta


def load_meta_npz(path: str) -> dict:
    with np.load(path) as z:
        return json.loads(bytes(z["__meta__"].tobytes()).decode())


def load_state_npz(path: str, template_state: Any) -> Any:
    """Restore a snapshot into the shape of `template_state` (from
    `trainer.init_state`). Strict per-collection matching; leaves are cast
    to the template's dtypes. opt_state / rng / step keep template values
    (the snapshot is for sampling, not resuming optimization)."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    state = template_state
    for coll in _COLLECTIONS:
        tree = getattr(template_state, coll, None)
        if tree is None:
            # snapshot must not carry a collection the template lacks
            extra = [k for k in arrays if k.startswith(coll + "/")]
            if extra:
                raise ValueError(
                    f"snapshot has {coll} ({len(extra)} arrays) but the "
                    f"template state does not — rebuild the trainer with "
                    f"matching config (e.g. ema_decay > 0)")
            continue
        leaves, treedef = jax.tree_util.tree_flatten_with_path(
            jax.device_get(tree))
        new_leaves = []
        for pth, leaf in leaves:
            key = coll + "/" + "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in pth)
            if key not in arrays:
                raise KeyError(f"snapshot missing {key}")
            arr = arrays.pop(key)
            if arr.shape != leaf.shape:
                raise ValueError(f"{key}: snapshot shape {arr.shape} != "
                                 f"template {leaf.shape}")
            new_leaves.append(arr.astype(leaf.dtype))
        state = state.replace(**{coll: jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), new_leaves)})
    stray = [k for k in arrays
             if k.split("/", 1)[0] in _COLLECTIONS]
    if stray:
        raise ValueError(f"snapshot has {len(stray)} arrays the template "
                         f"does not: {stray[:3]}...")
    return state
