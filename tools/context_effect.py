"""Diagnostic: how much does the context token move the denoiser?

The round-3 fidelity sweep (reports/quality_r3/fidelity_sweep_flagship.md)
shows classifier-free guidance changing latent-FID only in the 3rd decimal,
which implies eps(x,t,ctx=c) ~= eps(x,t,ctx=null). This script quantifies
that directly on a trained checkpoint: relative L2 distance between the
model's eps-space outputs under context 0 / context 1 / the null token,
averaged over random latents and a grid of timesteps.

Usage: python tools/context_effect.py [--ckpt runs/ckpt_flagship/flagship_dm]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/ckpt_flagship/flagship_dm")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/ldm3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from __graft_entry__ import _flagship_cfg
    from ldm3d.core.config import TrainConfig
    from ldm3d.diffusion.schedule import model_out_to_eps
    from ldm3d.train.checkpoint import CheckpointManager
    from ldm3d.train.dm_trainer import DiffusionTrainer

    cfg = _flagship_cfg()
    trainer = DiffusionTrainer(cfg, TrainConfig(batch_size=args.batch),
                               conditional=True)
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 128, 128, 128, 1))
    mgr = CheckpointManager(args.ckpt)
    host_state = jax.device_get(state)
    try:
        state, epoch = mgr.restore(host_state)
    except Exception:
        # --ema_decay checkpoints carry an ema_params subtree (see bench.py)
        state, epoch = mgr.restore(host_state.replace(
            ema_params=jax.tree_util.tree_map(
                lambda x: x, host_state.params["unet"])))
    state = jax.device_put(state)
    print(f"# restored epoch {epoch} from {args.ckpt}")

    ls, lc = cfg.latent_size, cfg.latent_channels
    b = args.batch
    variables = trainer._apply_variables(state, unet_params=state.ema_params)
    null_tok = cfg.unet.context_dim + 1

    @jax.jit
    def eps_for(x, t, ctx):
        out = trainer.model.apply(variables, x, t, ctx, training=False,
                                  method="denoise")
        return model_out_to_eps(trainer.sched, x, t, out,
                                cfg.prediction_type)

    print("#   t   |e0-e1|/|e0|   |e0-enull|/|e0|   |e1-enull|/|e0|")
    rng = jax.random.PRNGKey(42)
    for tval in [50, 250, 500, 750, 950]:
        rng, sub = jax.random.split(rng)
        x = jax.random.normal(sub, (b, ls, ls, ls, lc))
        t = jnp.full((b,), tval, jnp.int32)
        e0 = eps_for(x, t, jnp.zeros((b,), jnp.int32))
        e1 = eps_for(x, t, jnp.ones((b,), jnp.int32))
        en = eps_for(x, t, jnp.full((b,), null_tok, jnp.int32))
        n0 = jnp.linalg.norm(e0)
        print(f"  {tval:4d}  {jnp.linalg.norm(e0 - e1) / n0:.5f}        "
              f"{jnp.linalg.norm(e0 - en) / n0:.5f}           "
              f"{jnp.linalg.norm(e1 - en) / n0:.5f}")

    # and the embedding table itself: are the three rows distinct?
    emb = None
    params = (state.ema_params if state.ema_params is not None
              else state.params["unet"])
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        if "Embed" in name or "embedding" in name.lower():
            if leaf.ndim == 2 and leaf.shape[0] <= 8:
                emb = (name, leaf)
    if emb is not None:
        name, tab = emb
        print(f"# context embedding table {name} {tab.shape}")
        d01 = jnp.linalg.norm(tab[0] - tab[1]) / jnp.linalg.norm(tab[0])
        print(f"#   |row0-row1|/|row0| = {d01:.4f}, "
              f"row norms = {[float(jnp.linalg.norm(tab[i])) for i in range(tab.shape[0])]}")


if __name__ == "__main__":
    main()
