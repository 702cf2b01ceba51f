"""Round-5 crawl diagnosis: why does the correctly-scaled flagship DM
plateau at noise_mse ~0.88 (latent_fid pinned at ~91, fid_class_sep ~0)?

Probes, all on the real corpus latents (stage-1 runs/ckpt_flagship_gn):
  A. t-bucket eps-MSE profile of the crawling checkpoint
     (runs/ckpt_flagship/flagship_dm): where does the remaining error
     live? eps-MSE ~1 uniformly in t = dead model; low at high t but ~1
     at low t = healthy-but-saturated (low-t eps is information-
     theoretically unrecoverable).
  B. single-batch overfit from scratch, lr 1e-4 vs 1e-3: a healthy
     architecture+step drives train MSE toward the low-t floor within
     ~1k steps on 8 fixed latents.
  C. 30 fused epochs on the full corpus at lr 1e-3 (10x the preset):
     does the plateau move, i.e. is this purely an optimization-rate
     problem?

Usage: python tools/r5_diag.py [--skip a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def get_cfg_args(extra=()):
    from ldm3d.cli import main as M
    from ldm3d.core.presets import get_preset
    argv = ["--preset", "conditional_dm3d", "--norm", "group",
            "--synthetic", "--device_data", "--num_synthetic", "1232",
            "--num_classes", "4", "--cache_dir", "runs/corpus128",
            "--val_perc", "0.1", "--lbs", "8", "--timesteps", "500",
            "--cfg_dropout", "0.1", "--ema_decay", "0.999", "--train_dm",
            "--cache_latents", "--epochs", "30",
            "--vqvae_load_ckpt", "runs/ckpt_flagship_gn/flagship_vq",
            "--suffix", "diag", "--latent_scale", "18.4713",
            "--clip_sample_range", "0", "--ckpt_dir", "runs/ckpt_diag",
            *extra]
    args = M.build_parser().parse_args(argv)
    cfg = M.apply_overrides(get_preset(args.preset), args)
    return M, cfg, args


def build_latents(M, cfg, args):
    """(trainer, state, lat_all[f32, scaled], ctx_all) on device."""
    from ldm3d.train.checkpoint import CheckpointManager
    from ldm3d.train.vq_trainer import VQTrainer
    mesh = None
    train_loader, val_loader = M._loaders(cfg, args, mesh=mesh)
    size = cfg.data.volume_size
    trainer = M._dm_trainer(cfg, args, mesh)
    vq_tr = VQTrainer(cfg.diffusion.vqvae, cfg.train, mesh=mesh)
    vq_state = vq_tr.init_state(jax.random.PRNGKey(0),
                                (cfg.train.batch_size, size, size, size,
                                 cfg.diffusion.vqvae.in_channels))
    vq_state, ep = CheckpointManager(args.vqvae_load_ckpt).restore(
        jax.device_get(vq_state))
    print(f"stage-1 weights from epoch {ep}", flush=True)
    vqvae_vars = {k: v for k, v in
                  (("params", vq_state.params),
                   ("vq_stats", vq_state.vq_stats),
                   ("batch_stats", vq_state.batch_stats)) if v is not None}
    state = trainer.init_state(
        jax.random.PRNGKey(cfg.train.seed),
        (cfg.train.batch_size, size, size, size,
         cfg.diffusion.vqvae.in_channels), vqvae_variables=vqvae_vars)
    t0 = time.time()
    lats, ctxs = [], []
    for vol, _mask, ctx in train_loader:
        lats.append(trainer.encode_latents(state, vol))
        ctxs.append(jnp.asarray(ctx))
    lat_all = jnp.concatenate(lats, axis=0)
    ctx_all = jnp.concatenate(ctxs, axis=0).reshape(-1).astype(jnp.int32)
    print(f"encoded {lat_all.shape[0]} latents in {time.time()-t0:.1f}s; "
          f"std(diffusion space)={float(jnp.std(lat_all)):.4f}", flush=True)
    return trainer, state, lat_all, ctx_all


def t_bucket_mse(trainer, state, lat, ctx, params, tag):
    """eps-MSE per t bucket with the given U-Net params."""
    sched = trainer.sched
    from ldm3d.diffusion.schedule import q_sample

    @jax.jit
    def probe(params, lat, ctx, t, rng):
        noise = jax.random.normal(rng, lat.shape, jnp.float32)
        noisy = q_sample(sched, lat.astype(jnp.float32), t, noise)
        variables = trainer._apply_variables(state, params)
        pred = trainer.model.apply(variables, noisy.astype(lat.dtype), t,
                                   ctx, training=False, method="denoise")
        return jnp.mean(jnp.square(noise - pred.astype(jnp.float32)))

    print(f"[{tag}] t-bucket eps-MSE:", flush=True)
    rows = []
    for tv in [1, 25, 50, 100, 200, 300, 400, 475, 499]:
        acc = 0.0
        for r in range(4):
            t = jnp.full((lat.shape[0],), tv, jnp.int32)
            acc += float(probe(params, lat, ctx, t,
                               jax.random.PRNGKey(100 * tv + r)))
        rows.append((tv, acc / 4))
        print(f"  t={tv:4d}  mse={acc/4:.4f}", flush=True)
    return rows


def overfit(trainer, state, lat8, ctx8, lr, steps=1200, tag=""):
    """Single-batch overfit from scratch at the given lr."""
    import optax
    from ldm3d.diffusion.schedule import q_sample
    sched = trainer.sched
    tx = optax.adam(lr)
    params = jax.tree_util.tree_map(jnp.copy, state.params["unet"])
    opt = tx.init(params)

    def loss_fn(p, rng):
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (lat8.shape[0],), 0, 500)
        noise = jax.random.normal(n_rng, lat8.shape, jnp.float32)
        noisy = q_sample(sched, lat8.astype(jnp.float32), t, noise)
        variables = trainer._apply_variables(state, p)
        mutable = ["batch_stats"] if state.batch_stats is not None else []
        pred, _ = trainer.model.apply(variables, noisy.astype(lat8.dtype), t,
                                      ctx8, training=True, method="denoise",
                                      mutable=mutable)
        return jnp.mean(jnp.square(noise - pred.astype(jnp.float32)))

    @jax.jit
    def step(p, opt, rng):
        rng, sub = jax.random.split(rng)
        loss, g = jax.value_and_grad(loss_fn)(p, sub)
        up, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, up), opt, rng, loss

    rng = jax.random.PRNGKey(7)
    t0 = time.time()
    for i in range(steps):
        params, opt, rng, loss = step(params, opt, rng)
        if i % 200 == 0 or i == steps - 1:
            print(f"[overfit {tag} lr={lr:g}] step {i:5d} "
                  f"mse={float(loss):.4f}", flush=True)
    print(f"[overfit {tag}] {steps} steps in {time.time()-t0:.1f}s",
          flush=True)
    return params


def full_corpus_arm(trainer, state, lat_all, ctx_all, lr, epochs, cfg):
    """Fused-epoch training at custom lr; prints per-epoch mse."""
    from ldm3d.core.config import replace as crep
    from ldm3d.cli import main as M  # noqa: F401
    from ldm3d.train.dm_trainer import DiffusionTrainer
    tcfg = crep(cfg.train, learning_rate=lr)
    tr = DiffusionTrainer(cfg.diffusion, tcfg, mesh=None, conditional=True)
    st = tr.init_state(jax.random.PRNGKey(cfg.train.seed + 1),
                       (cfg.train.batch_size, cfg.data.volume_size,
                        cfg.data.volume_size, cfg.data.volume_size,
                        cfg.diffusion.vqvae.in_channels),
                       vqvae_variables=None)
    # graft the frozen stage-1 params from the existing state
    st = st.replace(params={**st.params, "vqvae": state.params["vqvae"]},
                    vq_stats=state.vq_stats,
                    batch_stats=state.batch_stats)
    from ldm3d.data.pipeline import LatentLoader
    loader = LatentLoader(lat_all, ctx_all, cfg.train.batch_size,
                          seed=cfg.train.seed, mesh=None, fused=True)
    for epoch in range(epochs):
        t0 = time.time()
        logs = None
        for batch in loader:
            lat, ctx, perm = batch
            st, logs = tr.train_epoch_latents(st, lat, ctx, perm)
        msg = {k: round(float(v), 5) for k, v in logs.items()}
        print(f"[arm lr={lr:g}] epoch {epoch+1}/{epochs} "
              f"[{time.time()-t0:.1f}s] {msg}", flush=True)
    return tr, st


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--arm_lr", type=float, default=1e-3)
    ap.add_argument("--arm_epochs", type=int, default=30)
    args_d = ap.parse_args()
    skip = set(args_d.skip.split(","))

    jax.config.update("jax_compilation_cache_dir", "/tmp/ldm3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    M, cfg, args = get_cfg_args()
    trainer, state, lat_all, ctx_all = build_latents(M, cfg, args)
    lat8, ctx8 = lat_all[:8], ctx_all[:8]

    if "a" not in skip:
        # A: the crawling checkpoint's profile (latest saved epoch)
        from ldm3d.train.checkpoint import CheckpointManager
        try:
            mgr = CheckpointManager("runs/ckpt_flagship/flagship_dm")
            crawl, ep = mgr.restore(jax.device_get(state))
            crawl = jax.device_put(crawl)
            print(f"crawl checkpoint epoch {ep}", flush=True)
            t_bucket_mse(trainer, state, lat8, ctx8,
                         crawl.params["unet"], f"crawl ep{ep} raw")
            if crawl.ema_params is not None:
                t_bucket_mse(trainer, state, lat8, ctx8, crawl.ema_params,
                             f"crawl ep{ep} ema")
        except Exception as e:  # noqa: BLE001
            print(f"A skipped: {e}", flush=True)

    if "b" not in skip:
        p1 = overfit(trainer, state, lat8, ctx8, 1e-4, tag="b1")
        t_bucket_mse(trainer, state, lat8, ctx8, p1, "overfit lr1e-4")
        p2 = overfit(trainer, state, lat8, ctx8, 1e-3, tag="b2")
        t_bucket_mse(trainer, state, lat8, ctx8, p2, "overfit lr1e-3")

    if "w" not in skip:
        # WIDE arm: stem >= latent channels. The measured 0.89 plateau ==
        # 224/256: a 32-channel stem on a 256-channel latent caps eps
        # recovery at 32/256 of variance (the skips all descend from the
        # stem, so the unobserved 224-dim complement of x_t never reaches
        # the head). Standard LDM practice is stem >> latent channels.
        from ldm3d.core.config import replace as crep
        from ldm3d.train.dm_trainer import DiffusionTrainer
        diff_w = crep(cfg.diffusion,
                      unet=crep(cfg.diffusion.unet,
                                first_conv_channels=256,
                                widths=(256, 512),
                                has_attention=(False, True, True)))
        # lean probe: the first OOM run held TWO full states + the 579 MB
        # latent cache + non-donated Adam buffers. The wide net only needs
        # lat8; drop everything else and skip the EMA copy.
        lat8 = jax.device_put(jax.device_get(lat8))
        ctx8 = jax.device_put(jax.device_get(ctx8))
        del lat_all, ctx_all, state, trainer
        tcfg_l = crep(cfg.train, ema_decay=0.0)
        tr3 = DiffusionTrainer(diff_w, tcfg_l, mesh=None,
                               conditional=True)
        st3 = tr3.init_state(jax.random.PRNGKey(cfg.train.seed),
                             (cfg.train.batch_size, cfg.data.volume_size,
                              cfg.data.volume_size, cfg.data.volume_size,
                              cfg.diffusion.vqvae.in_channels),
                             vqvae_variables=None)
        p4 = overfit(tr3, st3, lat8, ctx8, 1e-4, steps=800, tag="wide")
        t_bucket_mse(tr3, st3, lat8, ctx8, p4, "overfit WIDE lr1e-4")
        return

    if "g" not in skip:
        # GroupNorm U-Net arm: same overfit with norm="group" to isolate
        # BatchNorm as the dead-gradient culprit
        from ldm3d.core.config import replace as crep
        from ldm3d.train.dm_trainer import DiffusionTrainer
        diff_gn = crep(cfg.diffusion,
                       unet=crep(cfg.diffusion.unet, norm="group"))
        tr2 = DiffusionTrainer(diff_gn, cfg.train, mesh=None,
                               conditional=True)
        st2 = tr2.init_state(jax.random.PRNGKey(cfg.train.seed),
                             (cfg.train.batch_size, cfg.data.volume_size,
                              cfg.data.volume_size, cfg.data.volume_size,
                              cfg.diffusion.vqvae.in_channels),
                             vqvae_variables=None)
        p3 = overfit(tr2, st2, lat8, ctx8, 1e-4, tag="gn")
        t_bucket_mse(tr2, st2, lat8, ctx8, p3, "overfit GN lr1e-4")

    if "c" not in skip:
        tr, st = full_corpus_arm(trainer, state, lat_all, ctx_all,
                                 args_d.arm_lr, args_d.arm_epochs, cfg)
        t_bucket_mse(tr, st, lat8, ctx8, st.params["unet"],
                     f"arm lr={args_d.arm_lr:g} raw")


if __name__ == "__main__":
    main()
