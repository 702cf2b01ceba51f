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
    ap.add_argument("--num_classes", type=int, default=2,
                    help="class count the checkpoint was trained with "
                         "(sizes the context embedding: context_dim = n-1)")
    ap.add_argument("--context_in_time", action="store_true",
                    help="checkpoint trained with the context-in-time "
                         "pathway (changes the parameter structure)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/ldm3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from __graft_entry__ import _flagship_cfg
    from ldm3d.core.config import TrainConfig, replace
    from ldm3d.diffusion.schedule import model_out_to_eps
    from ldm3d.train.checkpoint import CheckpointManager
    from ldm3d.train.dm_trainer import DiffusionTrainer

    cfg = _flagship_cfg()
    # always size the embedding from --num_classes (the flagship cfg
    # defaults to the 4-class corpus; a 2-class checkpoint needs 1)
    cfg = replace(cfg, unet=replace(
        cfg.unet, context_dim=args.num_classes - 1,
        context_in_time=args.context_in_time))
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

    ncls = args.num_classes
    print(f"# T={cfg.timesteps}  classes={ncls}  "
          f"context_in_time={args.context_in_time}")
    print("#   t   mean-pairwise |ec-ec'|/|e0|    mean |ec-enull|/|e0|")
    rng = jax.random.PRNGKey(42)
    T = cfg.timesteps
    for frac in [0.1, 0.25, 0.5, 0.75, 0.95]:
        tval = int(frac * (T - 1))
        rng, sub = jax.random.split(rng)
        x = jax.random.normal(sub, (b, ls, ls, ls, lc))
        t = jnp.full((b,), tval, jnp.int32)
        eps = [eps_for(x, t, jnp.full((b,), c, jnp.int32))
               for c in range(ncls)]
        en = eps_for(x, t, jnp.full((b,), null_tok, jnp.int32))
        n0 = jnp.linalg.norm(eps[0])
        pair = [float(jnp.linalg.norm(eps[a] - eps[c]) / n0)
                for a in range(ncls) for c in range(a + 1, ncls)]
        vnull = [float(jnp.linalg.norm(e - en) / n0) for e in eps]
        print(f"  {tval:4d}        {sum(pair) / len(pair):.5f}       "
              f"         {sum(vnull) / len(vnull):.5f}")

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
