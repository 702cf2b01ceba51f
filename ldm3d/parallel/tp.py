"""Tensor parallelism: conv output-channel sharding over the 'model' axis.

SURVEY.md §2.6 lists TP as the optional strategy for the 5-level VQ-VAE,
where 128^3 activations dominate HBM. The TPU-native form is declarative:
conv kernels (flax DHWIO layout) are sharded on their output-channel dim
over `Mesh` axis 'model', matching channel-dim vectors (biases, norm
scales, PReLU alphas) follow, and GSPMD propagates the channel sharding
through elementwise ops while inserting all-gathers where a conv needs its
full input channels — no manual collectives, the standard conv-TP
schedule.

Only arrays wide enough to split are sharded (`min_features`, default 64);
everything else — codebooks, small stems, time embeddings — stays
replicated. Correctness does not depend on which params are sharded (XLA
compiles the same math either way); tests assert loss parity against the
unsharded baseline.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm3d.parallel.mesh import MODEL_AXIS


def _leaf_rule(x, mesh: Mesh, min_features: int):
    size = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())
    if size == 1 or not hasattr(x, "ndim"):
        return rep
    if x.ndim == 5 and x.shape[-1] >= min_features \
            and x.shape[-1] % size == 0:
        return NamedSharding(mesh, P(None, None, None, None, MODEL_AXIS))
    if x.ndim == 1 and x.shape[0] >= min_features \
            and x.shape[0] % size == 0:
        return NamedSharding(mesh, P(MODEL_AXIS))
    return rep


def tp_param_shardings(params, mesh: Mesh, min_features: int = 64):
    """Pytree of NamedShardings for a param tree: conv kernels split on
    their last (output-channel) dim over 'model' when divisible and wide
    enough; channel vectors of matching width split too; all else
    replicated."""
    return jax.tree_util.tree_map(
        lambda x: _leaf_rule(x, mesh, min_features), params)


def tp_state_shardings(state, mesh: Mesh, min_features: int = 64):
    """Shardings for a whole TrainState: params and the optimizer moments
    (which mirror the param pytree inside the optax state) follow
    `tp_param_shardings`; step counters, RNG, codebook stats, and norm
    running stats stay replicated. Works for all three trainer states
    (VQ, diffusion, GAN — the GAN's second optimizer is sharded too)."""
    rep = NamedSharding(mesh, P())
    full = jax.tree_util.tree_map(lambda _: rep, state)
    if mesh.shape[MODEL_AXIS] == 1:
        return full
    updates = dict(
        params=tp_param_shardings(state.params, mesh, min_features),
        opt_state=tp_param_shardings(state.opt_state, mesh, min_features))
    if getattr(state, "disc_opt_state", None) is not None:
        updates["disc_opt_state"] = tp_param_shardings(
            state.disc_opt_state, mesh, min_features)
    return full.replace(**updates)
