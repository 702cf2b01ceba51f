"""Unified CLI — the framework's entry-point layer (SURVEY.md §2.5).

One typed entry point replaces the reference's ten near-duplicate mains
(main.py, main_conditional_dm.py, main_nsvqvae.py, main_rnsvqvae.py,
main_exp_vqvae.py, main_exp_vqgan*.py, main_exp_nsvqvae.py): the model
family comes from a `--preset` (ldm3d/core/presets.py) and the reference's
flag surface is preserved (`--create_dataset/--train_vq/--test_vq/
--train_dm/--test_dm --dataset ... --lbs ...`, reference main.py:451-503).

Usage examples (mirroring the sbatch commands, SURVEY.md §2.5):
  python -m ldm3d.cli.main --preset vqvae_b8_all --train_vq \
      --dataset all --lbs 2 --epochs 200 --kernel_resize
  python -m ldm3d.cli.main --preset conditional_dm3d --train_dm \
      --timesteps 500 --vqvae_load_ckpt ./checkpoints/vqvae_b8_all
  python -m ldm3d.cli.main --preset vqgan_attn --train_vq --synthetic
  python -m ldm3d.cli.main --preset dm3d --test_dm --test_epoch 100
"""

from __future__ import annotations

import argparse
import functools
import os

import numpy as np


def str2bool(v):  # reference main_exp_vqgan_attn.py str2bool
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("ldm3d",
                                description="TPU-native 3D latent diffusion")
    p.add_argument("--preset", default="vqvae_b8_all")
    # mode flags (reference main.py:460-478)
    p.add_argument("--create_dataset", action="store_true")
    p.add_argument("--train_vq", action="store_true")
    p.add_argument("--test_vq", action="store_true")
    p.add_argument("--train_dm", action="store_true")
    p.add_argument("--test_dm", action="store_true")
    # data
    p.add_argument("--dataset", default=None,
                   help="CC|NFBS|HCP|BraTS|all|all-T")
    p.add_argument("--dataset_dir", default=None)
    p.add_argument("--cache_dir", default=None)
    p.add_argument("--augment", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="use generated volumes (no NIfTI data needed)")
    p.add_argument("--device_data", action="store_true",
                   help="with --synthetic: regenerate every batch on "
                        "device from PRNG keys (bit-identical to the f16 "
                        "cache, zero host->device volume transfers)")
    p.add_argument("--num_synthetic", type=int, default=24)
    p.add_argument("--num_classes", type=int, default=None,
                   help="synthetic-corpus class count (2 = original "
                        "healthy/tumor corpus; 4 adds globally distinct "
                        "classes so conditioning is learnable). Also sizes "
                        "the conditional U-Net's context embedding")
    p.add_argument("--volume_size", type=int, default=None)
    # training (reference main.py:479-502)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lbs", type=int, default=None,
                   help="batch size per device (global = lbs * data-parallel)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--val_perc", type=float, default=None)
    p.add_argument("--kernel_resize", action="store_true")
    p.add_argument("--suffix", default=None)
    p.add_argument("--test_epoch", type=int, default=None)
    p.add_argument("--save_best_only", action="store_true")
    p.add_argument("--vqvae_load_ckpt", type=str, default=None)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--norm", default=None, choices=["batch", "group"],
                   help="override the autoencoder normalization family "
                        "(stage-1 and the DM's frozen stage-1 alike)")
    p.add_argument("--resume_ckpt", type=int, default=None,
                   help="resume from this checkpoint epoch; -1 resumes the "
                        "latest if one exists and starts fresh otherwise "
                        "(idempotent relaunch for the stall watchdog)")
    p.add_argument("--test_run", action="store_true")
    p.add_argument("--vqvae_mode", type=int, default=None, choices=[1, 2],
                   help="train the legacy functional VQ-VAE instead of the "
                        "MONAI family (reference vqvae3d.py via "
                        "args.vqvae_mode; 2 = residual variant)")
    p.add_argument("--num_embeddings", type=int, default=None)
    p.add_argument("--embedding_dim", type=int, default=None)
    p.add_argument("--dtype", default=None, choices=["bfloat16", "float32"])
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--ckpt_freq", type=int, default=1,
                   help="save an orbax checkpoint every N epochs (final "
                        "epoch always saved); >1 trades recovery "
                        "granularity for wall-clock when the per-epoch "
                        "state fetch dominates (fused epochs)")
    p.add_argument("--out_dir", default="./generated_images_dm3d")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of a few steps")
    p.add_argument("--disc_threshold", type=int, default=None,
                   help="epochs before the discriminator/adversarial "
                        "losses activate (reference "
                        "main_exp_vqgan_attn.py:329)")
    p.add_argument("--adaptive_gan_weight", action="store_true",
                   default=None,
                   help="scale the generator adversarial term by the "
                        "VQGAN-paper adaptive lambda = "
                        "||grad_rec||/||grad_adv|| (stabilizes the "
                        "adversarial phase; beyond-reference)")
    p.add_argument("--adaptive_g_max", type=float, default=None,
                   help="clamp for the adaptive lambda (default 1e4; the "
                        "round-4 collapse had lambda~53, so a tight clamp "
                        "like 2.0 is a stabilizer lever)")
    p.add_argument("--g_adv_delay", type=int, default=None,
                   help="epochs after disc_threshold during which ONLY the "
                        "critics train (generator adversarial+feat terms "
                        "stay off) so lambda sees trained-critic gradients")
    p.add_argument("--r1_gamma", type=float, default=None,
                   help="R1 gradient-penalty weight on the critics' real "
                        "inputs (gamma/2 * E||grad_x D(x)||^2; Lipschitz "
                        "control for the adversarial phase; 0=off, "
                        "beyond-reference)")
    p.add_argument("--disc_lr", type=float, default=None,
                   help="discriminator Adam learning rate (defaults to "
                        "TrainConfig.disc_learning_rate)")
    p.add_argument("--auto_resume", type=int, default=0, metavar="N",
                   help="on a training crash, restore the latest "
                        "checkpoint and resume, up to N times (the "
                        "reference required manual Slurm resubmission)")
    p.add_argument("--sampler", default="ddpm",
               choices=["ddpm", "ddim", "dpmpp", "dpmpp_sde"],
                   help="test_dm sampler: full T-step DDPM chain "
                        "(reference behavior) or strided fast DDIM")
    p.add_argument("--sample_steps", type=int, default=None,
                   help="DDIM U-Net evaluations (default timesteps//20)")
    p.add_argument("--eta", type=float, default=0.0,
                   help="DDIM stochasticity (0 = deterministic ODE)")
    p.add_argument("--guidance_scale", type=float, default=None,
                   help="classifier-free guidance scale for test_dm "
                        "(requires a model trained with cfg_dropout > 0)")
    p.add_argument("--prediction_type", default=None,
                   choices=["eps", "v"],
                   help="U-Net output parameterization for --train_dm: "
                        "eps (reference) or v (Salimans & Ho 2022; pass "
                        "the same value to --test_dm so sampling converts "
                        "the model output correctly)")
    p.add_argument("--min_snr_gamma", type=float, default=None,
                   help="min-SNR-gamma loss weighting for --train_dm "
                        "(Hang et al. 2023); unset = uniform reference "
                        "weighting")
    p.add_argument("--loss_reduction", default=None,
                   choices=["mean", "ref"],
                   help="DM gradient-loss normalization: mean (default; "
                        "mean-MSE, same gradient direction) or ref (the "
                        "reference's SUM-MSE/(bs*lc^4), dm3d.py:456-459 — "
                        "floors Adam's epsilon at lc=256, kept for "
                        "bit-parity replication). The logged 'loss' is "
                        "always reference-scaled either way")
    p.add_argument("--cfg_dropout", type=float, default=None,
                   help="context-drop probability during --train_dm; > 0 "
                        "trains the null token classifier-free guidance "
                        "needs (pass the same value to --test_dm so the "
                        "checkpoint restores)")
    p.add_argument("--save_nifti", action="store_true",
                   help="with --test_dm/--test_vq: also export volumes as "
                        ".nii.gz (the reference only writes .npy)")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="EMA decay for the U-Net params during --train_dm "
                        "(e.g. 0.999); sampling and fidelity evals then "
                        "use the averaged weights. Unset/0 disables (the "
                        "reference keeps no sampling EMA). Pass the same "
                        "value to --test_dm so the checkpoint restores")
    p.add_argument("--fidelity_freq", type=int, default=0,
                   help="with --train_dm: every N epochs, generate "
                        "latent samples and log latent-FID / kernel-MMD "
                        "against held-out encoder features (the "
                        "quantitative sample-fidelity metric the "
                        "reference lacks); 0 disables")
    p.add_argument("--fidelity_samples", type=int, default=64,
                   help="generated samples per fidelity eval")
    p.add_argument("--unet_stem", type=int, default=None,
                   help="denoiser stem width (first_conv_channels). The "
                        "reference's 32-ch stem on a 256-ch latent floors "
                        "eps-MSE at ~0.875 (see presets._dm); keep stem >= "
                        "latent channels unless reproducing the reference")
    p.add_argument("--unet_widths", type=str, default=None,
                   help="comma list of denoiser level widths, e.g. "
                        "'256,512'; attention flags keep their preset "
                        "value when the level count matches, else "
                        "default to attention on the deepest level only")
    p.add_argument("--unet_attention", type=str, default=None,
                   help="comma list of 0/1 per level (middle always "
                        "attends), e.g. '0,1,1'")
    p.add_argument("--latent_scale", type=float, default=None,
                   help="SD-style scale_factor: multiply the frozen "
                        "encoder's latents before diffusion, divide "
                        "before decode (pick ~1/std of the corpus "
                        "latents — printed by --cache_latents). A "
                        "train-time invariant: restore/serve with the "
                        "same value. Default 1.0 = reference behavior")
    p.add_argument("--clip_sample_range", type=float, default=None,
                   help="half-width of the samplers' mean/x0 clipping "
                        "interval (reference hard-codes 1.0, dm3d.py:529, "
                        "wrong when latents exceed [-1,1]); <= 0 disables "
                        "clipping")
    p.add_argument("--context_in_time", action="store_true",
                   default=None,
                   help="conditional U-Net: ALSO add the context embedding "
                        "to the time embedding (ADM-style), reaching every "
                        "ResidualBlock instead of only the cross-attention "
                        "sites — the conditioning-strength lever motivated "
                        "by reports/quality_r3/context_effect.md. Parameter "
                        "tree is unchanged; pass the same flag at sampling/"
                        "serve time")
    p.add_argument("--fidelity_by_class", action="store_true",
                   help="conditional models: also report per-class FID "
                        "(ctx=c samples vs the ctx=c real slice vs the "
                        "other classes' slice) from the same generated "
                        "samples — the acceptance test for conditioning "
                        "strength (reports/quality_r3/context_effect.md). "
                        "Applies to --fidelity_freq and --fidelity_sweep")
    p.add_argument("--fidelity_sweep", action="store_true",
                   help="restore the trained DM checkpoint and score "
                        "latent-FID/kernel-MMD over a sampler x guidance "
                        "grid (--sweep_samplers x --guidance_grid); "
                        "writes a markdown + JSON report to --out_dir")
    p.add_argument("--sweep_samplers", default="ddpm,ddim:50,dpmpp:25",
                   help="comma list of sampler[:steps[:eta]] entries for "
                        "--fidelity_sweep (steps default: full T for "
                        "ddpm, T//20 for ddim/dpmpp; ddim:50:1.0 = "
                        "stochastic DDIM, the few-step diversity lever)")
    p.add_argument("--guidance_grid", default="none",
                   help="comma list of guidance scales for "
                        "--fidelity_sweep; 'none' = no classifier-free "
                        "guidance (scales > 0 need a checkpoint trained "
                        "with --cfg_dropout > 0)")
    p.add_argument("--cache_latents", action="store_true",
                   help="with --train_dm: encode the corpus through the "
                        "frozen stage-1 ONCE and train the U-Net from "
                        "HBM-resident latents (exact: the eval-mode "
                        "encode is deterministic; the reference re-"
                        "encodes every volume every step, dm3d.py:438). "
                        "Skips per-epoch augmentation of the volumes")
    p.add_argument("--image_log_freq", type=int, default=0,
                   help="save orig-vs-recon / generated-sample slice "
                        "panels every N epochs (reference "
                        "WandbImageCallback, log_freq=10); 0 disables")
    p.add_argument("--sweep", type=str, default=None,
                   help="path to a W&B-schema sweep yaml; runs train_vq "
                        "for each point (reference sweep.yaml + wandb agent)")
    p.add_argument("--sweep_count", type=int, default=None,
                   help="number of sweep points (random/bayes methods)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for multi-host training "
                        "(or set LDM3D_COORDINATOR); builds the mesh over "
                        "the global device set")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (this environment's "
                        "sitecustomize pins the TPU; --platform cpu "
                        "overrides it for smoke runs)")
    p.add_argument("--cpu_devices", type=int, default=0,
                   help="with --platform cpu: number of virtual host "
                        "devices for the mesh")
    return p


def apply_overrides(cfg, args):
    """Fold CLI flags into the preset's config tree."""
    from ldm3d.core.config import replace

    train = cfg.train
    if args.lr is not None:
        train = replace(train, learning_rate=args.lr)
    if getattr(args, "disc_lr", None) is not None:
        train = replace(train, disc_learning_rate=args.disc_lr)
    if args.epochs is not None:
        train = replace(train, epochs=args.epochs)
    if args.lbs is not None:
        import jax
        train = replace(train, batch_size=args.lbs * max(
            1, jax.device_count()))
    if args.val_perc is not None:
        train = replace(train, val_fraction=args.val_perc)
    if args.dtype is not None:
        train = replace(train, dtype=args.dtype)
    if getattr(args, "ema_decay", None) is not None:
        train = replace(train, ema_decay=args.ema_decay)
    cfg = replace(cfg, train=train)

    data = cfg.data
    if args.dataset is not None:
        data = replace(data, dataset=args.dataset)
    if args.dataset_dir is not None:
        data = replace(data, dataset_dir=args.dataset_dir)
    if args.cache_dir is not None:
        data = replace(data, cache_dir=args.cache_dir)
    if args.volume_size is not None:
        data = replace(data, volume_size=args.volume_size)
    if args.augment:
        data = replace(data, augment=True)
    if args.test_run:
        data = replace(data, test_run=True)
    if getattr(args, "num_classes", None) is not None:
        data = replace(data, num_classes=args.num_classes)
        if cfg.diffusion is not None and cfg.diffusion.unet.context_dim:
            # context token ids run 0..num_classes-1; the embedding table
            # is context_dim+1 rows (+ null when cfg_dropout>0),
            # unet3d.py:246-249
            cfg = replace(cfg, diffusion=replace(
                cfg.diffusion, unet=replace(cfg.diffusion.unet,
                                            context_dim=args.num_classes - 1)))
    cfg = replace(cfg, data=data)

    vq = cfg.vqvae
    q = vq.quantizer
    if args.num_embeddings is not None:
        q = replace(q, num_embeddings=args.num_embeddings)
    if args.embedding_dim is not None:
        q = replace(q, embedding_dim=args.embedding_dim)
    vq = replace(vq, quantizer=q)
    if args.kernel_resize:
        vq = replace(vq, kernel_resize=True)
    if args.vqvae_mode is not None:
        vq = replace(vq, family="legacy", legacy_mode=args.vqvae_mode)
    if args.norm is not None:
        # BatchNorm eval mode (running averages, Keras parity) is fragile
        # on hard-bottleneck configs — outlier volumes reconstruct wildly
        # under stale stats while train-mode stats are fine (see
        # tools/recalibrate_bn.py). GroupNorm has no train/eval gap; the
        # reference's own best VQGAN variant (vqgan_attn_cp) uses it.
        vq = replace(vq, norm=args.norm)
    cfg = replace(cfg, vqvae=vq)

    diff = cfg.diffusion
    if args.norm is not None:
        diff = replace(diff, vqvae=replace(diff.vqvae, norm=args.norm))
    if getattr(args, "unet_stem", None) is not None:
        diff = replace(diff, unet=replace(diff.unet,
                                          first_conv_channels=args.unet_stem))
    if getattr(args, "unet_widths", None) is not None:
        widths = tuple(int(w) for w in args.unet_widths.split(","))
        attn = diff.unet.has_attention
        if len(attn) != len(widths) + 1:
            # level count changed: attention on the deepest level + middle
            attn = (False,) * (len(widths) - 1) + (True, True)
        diff = replace(diff, unet=replace(diff.unet, widths=widths,
                                          has_attention=attn))
    if getattr(args, "unet_attention", None) is not None:
        attn = tuple(bool(int(v))
                     for v in args.unet_attention.split(",")) + (True,)
        diff = replace(diff, unet=replace(diff.unet, has_attention=attn))
    if args.timesteps is not None:
        diff = replace(diff, timesteps=args.timesteps)
    if getattr(args, "cfg_dropout", None) is not None:
        diff = replace(diff, unet=replace(diff.unet,
                                          cfg_dropout=args.cfg_dropout))
    if getattr(args, "context_in_time", None):
        diff = replace(diff, unet=replace(diff.unet, context_in_time=True))
    if getattr(args, "prediction_type", None) is not None:
        diff = replace(diff, prediction_type=args.prediction_type)
    if getattr(args, "min_snr_gamma", None) is not None:
        diff = replace(diff, min_snr_gamma=args.min_snr_gamma)
    if getattr(args, "latent_scale", None) is not None:
        diff = replace(diff, latent_scale=args.latent_scale)
    if getattr(args, "loss_reduction", None) is not None:
        diff = replace(diff, loss_reduction=args.loss_reduction)
    if getattr(args, "clip_sample_range", None) is not None:
        diff = replace(diff, clip_sample_range=args.clip_sample_range)
    cfg = replace(cfg, diffusion=diff)

    if args.disc_threshold is not None:
        cfg = replace(cfg, vqgan=replace(cfg.vqgan,
                                         disc_threshold=args.disc_threshold))
    if getattr(args, "adaptive_gan_weight", None):
        cfg = replace(cfg, vqgan=replace(cfg.vqgan,
                                         adaptive_g_weight=True))
    if getattr(args, "r1_gamma", None) is not None:
        cfg = replace(cfg, vqgan=replace(cfg.vqgan,
                                         r1_gamma=args.r1_gamma))
    if getattr(args, "adaptive_g_max", None) is not None:
        cfg = replace(cfg, vqgan=replace(cfg.vqgan,
                                         adaptive_g_max=args.adaptive_g_max))
    if getattr(args, "g_adv_delay", None) is not None:
        cfg = replace(cfg, vqgan=replace(cfg.vqgan,
                                         g_adv_delay=args.g_adv_delay))

    if args.ckpt_dir is not None:
        cfg = replace(cfg, ckpt_dir=args.ckpt_dir)
    if args.suffix is not None:
        cfg = replace(cfg, name=args.suffix)
    return cfg


def _loaders(cfg, args, mesh=None):
    """Build train/val loaders from the cache (or synthetic volumes).

    With a mesh, every batch the loaders yield is placed with the mesh's
    batch sharding (data axis always, one spatial axis over 'space' when
    the mesh has one) — the user-facing equivalent of the reference's
    AutoShardPolicy.DATA (reference main.py:154-173), so multi-chip DP
    works straight through the CLI rather than computing the full batch
    redundantly on every device."""
    import jax
    from ldm3d.data.pipeline import (DataLoader, VolumeCache,
                                     train_val_split, write_synthetic_cache)

    spatial_axis = 3 if (mesh is not None and mesh.shape.get("space", 1) > 1) \
        else None
    if args.synthetic and args.device_data:
        # zero-transfer path: the corpus is regenerated on device from
        # PRNG keys, bit-identical to the f16 cache for the same seed
        from ldm3d.data.pipeline import DeviceSyntheticLoader
        n = args.num_synthetic
        tr, va = train_val_split(n, cfg.train.val_fraction, cfg.train.seed)
        mk = lambda idx, train: DeviceSyntheticLoader(
            n, cfg.train.batch_size, cfg.data, corpus_seed=cfg.train.seed,
            seed=cfg.train.seed, train=train, indices=idx, mesh=mesh,
            spatial_axis=spatial_axis)
        val = mk(va, False) if len(va) >= cfg.train.batch_size else None
        return mk(tr, True), val
    cache_dir = cfg.data.cache_dir
    manifest = os.path.join(cache_dir, "manifest.json")
    if args.synthetic and not os.path.exists(manifest):
        write_synthetic_cache(cache_dir, args.num_synthetic,
                              cfg.data.volume_size, seed=cfg.train.seed,
                              num_classes=cfg.data.num_classes)
    if not os.path.exists(manifest):
        raise SystemExit(
            f"no cache at {cache_dir}: run --create_dataset first "
            f"(or pass --synthetic)")
    cache = VolumeCache(cache_dir)
    tr, va = train_val_split(cache, cfg.train.val_fraction, cfg.train.seed)
    train = DataLoader(cache, cfg.train.batch_size, cfg.data,
                       seed=cfg.train.seed, train=True, indices=tr,
                       mesh=mesh, spatial_axis=spatial_axis)
    val = DataLoader(cache, cfg.train.batch_size, cfg.data,
                     seed=cfg.train.seed, train=False, indices=va,
                     mesh=mesh, spatial_axis=spatial_axis) \
        if len(va) >= cfg.train.batch_size else None
    return train, val


def _ckpt_dir(cfg, stage: str) -> str:
    return os.path.join(cfg.ckpt_dir, f"{cfg.name}_{stage}")


def _maybe_resume(ckpt, state, resume_ckpt):
    """Restore per --resume_ckpt: None = fresh start, N >= 0 = exact epoch
    (error if missing), -1 = latest-if-present. The -1 form makes a relaunch
    of the *same* command idempotent, which is what the external stall
    watchdog (tools/with_watchdog.sh) relies on: TPU-relay hangs block
    inside a device call and never raise, so in-process recovery
    (loop.fit_with_recovery) can't see them — the process must be killed
    and relaunched, and the relaunch must resume where the checkpoints
    left off (or start fresh on the very first attempt)."""
    import jax
    if resume_ckpt is None:
        return state, 0
    try:
        state, epoch = ckpt.restore(jax.device_get(state),
                                    None if resume_ckpt < 0 else resume_ckpt)
        print(f"resumed from epoch {epoch}")
        return state, epoch
    except FileNotFoundError:
        if resume_ckpt >= 0:
            raise
        return state, 0


def run_train_vq(cfg, args):
    import jax
    from ldm3d.parallel.mesh import make_mesh
    from ldm3d.train.callbacks import (CSVLogger, DelayedReduceLROnPlateau,
                                       MetricsLogger, ReduceLROnPlateau)
    from ldm3d.train.checkpoint import CheckpointManager
    from ldm3d.train.loop import fit

    mesh = make_mesh(cfg.train.mesh, batch_size=cfg.train.batch_size)
    train_loader, val_loader = _loaders(cfg, args, mesh=mesh)
    size = cfg.data.volume_size
    n_ch = (cfg.vqgan.ae if cfg.model == "vqgan" else cfg.vqvae).in_channels
    sample = (cfg.train.batch_size, size, size, size, n_ch)

    is_gan = cfg.model == "vqgan"
    if is_gan:
        from ldm3d.train.gan_trainer import GANTrainer
        trainer = GANTrainer(cfg.vqgan, cfg.train, mesh=mesh)
        lr_sched = DelayedReduceLROnPlateau(
            start_epoch=cfg.vqgan.disc_threshold, monitor="val_loss",
            factor=0.5, patience=10)
    else:
        from ldm3d.train.vq_trainer import VQTrainer
        trainer = VQTrainer(cfg.vqvae, cfg.train, mesh=mesh)
        lr_sched = ReduceLROnPlateau(monitor="val_loss", factor=0.5,
                                     patience=10)

    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), sample)
    ckpt = CheckpointManager(_ckpt_dir(cfg, "vq"),
                             keep=cfg.train.keep_checkpoints,
                             save_best_only=args.save_best_only)
    state, initial_epoch = _maybe_resume(ckpt, state, args.resume_ckpt)

    logdir = _ckpt_dir(cfg, "vq")
    image_logger = None
    if args.image_log_freq:
        from ldm3d.train.callbacks import ImageLogger
        sample_batch = next(iter(val_loader or train_loader))

        def render(state, _batch=sample_batch):
            vol, mask = _batch[0], _batch[1]
            recon, _ = trainer.reconstruct(state, vol, mask)
            return {"original": np.asarray(vol[:2], np.float32),
                    "reconstruction": np.asarray(recon[:2, ..., :1],
                                                 np.float32)}

        image_logger = ImageLogger(os.path.join(logdir, "images"), render,
                                   log_freq=args.image_log_freq)
    from ldm3d.train.loop import fit_with_recovery
    fit_fn = fit if not args.auto_resume else functools.partial(
        fit_with_recovery, max_restarts=args.auto_resume)
    state, metrics = fit_fn(
        trainer, state, train_loader, cfg.train.epochs,
        val_loader=val_loader, ckpt=None if args.test_run else ckpt,
        image_logger=image_logger,
        csv_logger=CSVLogger(os.path.join(logdir, "training.log"),
                             append=args.resume_ckpt is not None),
        metrics_logger=MetricsLogger(os.path.join(logdir, "metrics.jsonl"),
                                     run_name=cfg.name),
        lr_schedule=lr_sched,
        replace_codebook_freq=cfg.train.replace_codebook_freq,
        initial_epoch=initial_epoch, ckpt_freq=args.ckpt_freq,
        is_gan=is_gan)
    ckpt.wait()
    print("final:", {k: round(v, 6) for k, v in metrics.items()})
    return state


def run_test_vq(cfg, args):
    """Reconstruct the held-out set, save original/recon .npy pairs and a
    running MSE (reference main.py:356-370)."""
    import jax
    import jax.numpy as jnp
    from ldm3d.parallel.mesh import make_mesh
    from ldm3d.train.checkpoint import CheckpointManager

    mesh = make_mesh(cfg.train.mesh, batch_size=cfg.train.batch_size)
    _, val_loader = _loaders(cfg, args, mesh=mesh)
    if val_loader is None:
        raise SystemExit("validation split is empty")
    size = cfg.data.volume_size
    n_ch = (cfg.vqgan.ae if cfg.model == "vqgan" else cfg.vqvae).in_channels
    sample = (cfg.train.batch_size, size, size, size, n_ch)
    if cfg.model == "vqgan":
        from ldm3d.train.gan_trainer import GANTrainer
        trainer = GANTrainer(cfg.vqgan, cfg.train, mesh=mesh)
    else:
        from ldm3d.train.vq_trainer import VQTrainer
        trainer = VQTrainer(cfg.vqvae, cfg.train, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), sample)
    ckpt = CheckpointManager(_ckpt_dir(cfg, "vq"))
    state, epoch = ckpt.restore(jax.device_get(state), args.test_epoch)
    print(f"testing epoch {epoch}")

    os.makedirs(args.out_dir, exist_ok=True)
    total_mse, n = 0.0, 0
    for i, (vol, mask, ctx) in enumerate(val_loader):
        metrics = trainer.eval_step(state, vol, mask)
        total_mse += float(metrics["reconst_loss"])
        n += 1
        # save every test batch's original/recon pair, as the reference
        # does (main.py:356-370)
        recon, _ = trainer.reconstruct(state, vol, mask)
        np.save(os.path.join(args.out_dir, f"original_{i}.npy"),
                np.asarray(vol, np.float32))
        np.save(os.path.join(args.out_dir, f"reconst_{i}.npy"),
                np.asarray(recon[..., :1], np.float32))
        if args.save_nifti:
            from ldm3d.data.nifti import save_nifti
            save_nifti(os.path.join(args.out_dir,
                                    f"reconst_{i}_0.nii.gz"),
                       np.asarray(recon[0, ..., :1], np.float32))
        print(f"batch {i}: " + " ".join(
            f"{k}={float(v):.5f}" for k, v in metrics.items()))
    print(f"mean reconst MSE over {n} batches: {total_mse / max(n, 1):.6f}")


def _dm_trainer(cfg, args, mesh):
    from ldm3d.train.dm_trainer import DiffusionTrainer
    conditional = cfg.model == "conditional_dm"
    return DiffusionTrainer(cfg.diffusion, cfg.train, mesh=mesh,
                            conditional=conditional)


def _adopt_dm_meta(cfg, args):
    """Adopt a trained DM checkpoint's sampling invariants from its
    train_meta.json (written by run_train_dm) for every flag the user did
    NOT pass: latent_scale (run-dependent under the auto default),
    clip_sample_range, timesteps, prediction_type, context_in_time,
    cfg_dropout, ema_decay. Restoring a checkpoint with a different
    latent_scale than it trained with silently degrades every sample —
    the meta file makes the correct value the default."""
    import json

    from ldm3d.core.config import replace

    path = os.path.join(_ckpt_dir(cfg, "dm"), "train_meta.json")
    if not os.path.exists(path):
        return cfg
    try:
        with open(path) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return cfg
    diff, unet, train = cfg.diffusion, cfg.diffusion.unet, cfg.train
    adopted = []
    if args.latent_scale is None and "latent_scale" in meta:
        diff = replace(diff, latent_scale=float(meta["latent_scale"]))
        adopted.append(f"latent_scale={meta['latent_scale']:.4f}")
    if args.clip_sample_range is None and "clip_sample_range" in meta:
        diff = replace(diff,
                       clip_sample_range=float(meta["clip_sample_range"]))
        adopted.append(f"clip_sample_range={meta['clip_sample_range']:g}")
    if args.timesteps is None and "timesteps" in meta:
        diff = replace(diff, timesteps=int(meta["timesteps"]))
        adopted.append(f"timesteps={meta['timesteps']}")
    if (getattr(args, "prediction_type", None) is None
            and "prediction_type" in meta):
        diff = replace(diff, prediction_type=meta["prediction_type"])
    if (getattr(args, "context_in_time", None) is None
            and meta.get("context_in_time")):
        unet = replace(unet, context_in_time=True)
        adopted.append("context_in_time")
    if getattr(args, "cfg_dropout", None) is None and "cfg_dropout" in meta:
        unet = replace(unet, cfg_dropout=float(meta["cfg_dropout"]))
    if (getattr(args, "num_classes", None) is None
            and "context_dim" in meta
            and meta["context_dim"] != unet.context_dim):
        unet = replace(unet, context_dim=int(meta["context_dim"]))
        adopted.append(f"context_dim={meta['context_dim']}")
    if getattr(args, "unet_stem", None) is None and "unet_stem" in meta:
        unet = replace(unet, first_conv_channels=int(meta["unet_stem"]))
    if getattr(args, "unet_widths", None) is None and "unet_widths" in meta:
        unet = replace(unet, widths=tuple(int(w)
                                          for w in meta["unet_widths"]))
        adopted.append("unet_widths=" + ",".join(
            str(w) for w in meta["unet_widths"]))
    if (getattr(args, "unet_attention", None) is None
            and "unet_attention" in meta):
        unet = replace(unet, has_attention=tuple(
            bool(v) for v in meta["unet_attention"]))
    if getattr(args, "ema_decay", None) is None and "ema_decay" in meta:
        train = replace(train, ema_decay=float(meta["ema_decay"]))
        if meta["ema_decay"]:
            adopted.append(f"ema_decay={meta['ema_decay']:g}")
    diff = replace(diff, unet=unet)
    if adopted:
        print("adopted from train_meta.json: " + ", ".join(adopted))
    return replace(cfg, diffusion=diff, train=train)


def run_train_dm(cfg, args):
    import jax
    from ldm3d.parallel.mesh import make_mesh
    from ldm3d.train.callbacks import CSVLogger, MetricsLogger
    from ldm3d.train.checkpoint import CheckpointManager
    from ldm3d.train.loop import fit

    mesh = make_mesh(cfg.train.mesh, batch_size=cfg.train.batch_size)
    train_loader, val_loader = _loaders(cfg, args, mesh=mesh)
    size = cfg.data.volume_size
    trainer = _dm_trainer(cfg, args, mesh)

    vqvae_vars = None
    if args.vqvae_load_ckpt:
        # load stage-1 weights (reference dm3d.py:411-414)
        from ldm3d.train.vq_trainer import VQTrainer
        vq_tr = VQTrainer(cfg.diffusion.vqvae, cfg.train, mesh=mesh)
        vq_state = vq_tr.init_state(jax.random.PRNGKey(0),
                                    (cfg.train.batch_size, size, size, size,
                                     cfg.diffusion.vqvae.in_channels))
        vq_ckpt = CheckpointManager(args.vqvae_load_ckpt)
        vq_state, vq_epoch = vq_ckpt.restore(jax.device_get(vq_state))
        print(f"loaded stage-1 VQ-VAE weights from epoch {vq_epoch}")
        # drop absent collections (GroupNorm stage-1 has no batch_stats):
        # a None subtree inside apply()'s variables crashes flax's scope
        # iteration under lifted transforms (remat)
        vqvae_vars = {k: v for k, v in
                      (("params", vq_state.params),
                       ("vq_stats", vq_state.vq_stats),
                       ("batch_stats", vq_state.batch_stats))
                      if v is not None}

    state = trainer.init_state(
        jax.random.PRNGKey(cfg.train.seed),
        (cfg.train.batch_size, size, size, size,
         cfg.diffusion.vqvae.in_channels), vqvae_variables=vqvae_vars)

    ckpt = CheckpointManager(_ckpt_dir(cfg, "dm"),
                             keep=cfg.train.keep_checkpoints)
    state, initial_epoch = _maybe_resume(ckpt, state, args.resume_ckpt)

    def step_fn(state, batch):
        vol, mask, ctx = batch
        return trainer.train_step(state, vol, ctx)

    logdir = _ckpt_dir(cfg, "dm")
    image_logger = None
    if args.image_log_freq:
        # generated mid-slices per context every N epochs (reference
        # WandbImageCallback, conditional_dm3d.py:24-61)
        from ldm3d.train.callbacks import ImageLogger
        f = cfg.diffusion.vqvae.spatial_factor
        lat = (1, size // f, size // f, size // f,
               cfg.diffusion.latent_channels)
        contexts = (list(range(cfg.diffusion.unet.context_dim + 1))
                    if cfg.model == "conditional_dm" else [None])

        def render(state):
            # the trainer caches the compiled sampler per shape, so only
            # the first log epoch pays the compile; DDIM keeps log epochs
            # cheap (a handful of U-Net evals vs the full T-step chain)
            out = {}
            for c in contexts:
                vols = trainer.generate(state, jax.random.PRNGKey(11), lat,
                                        context_value=c, sampler="ddim")
                tag = f"generated_ctx{c}" if c is not None else "generated"
                out[tag] = np.asarray(vols, np.float32)
            return out

        image_logger = ImageLogger(os.path.join(logdir, "images"), render,
                                   log_freq=args.image_log_freq)

    epoch_callback = None
    if args.fidelity_freq:
        # real-corpus features once, from the frozen stage-1 encoder (they
        # never change during stage-2 training); held-out volumes when a
        # val split exists, else the train set
        feats, ctx_rows = [], []
        for batch in (val_loader or train_loader):
            feats.append(trainer.latent_features(state, batch[0]))
            ctx_rows.append(np.asarray(batch[2]).reshape(-1))
        real_feats = np.concatenate(feats, axis=0)
        real_ctx = (np.concatenate(ctx_rows, axis=0)
                    if args.fidelity_by_class and trainer.conditional
                    else None)
        print(f"fidelity: cached {real_feats.shape[0]} real-volume "
              f"feature rows ({'val' if val_loader else 'train'} split)")

        def epoch_callback(epoch, st):
            if (epoch + 1) % args.fidelity_freq != 0:
                return {}
            scores = trainer.fidelity_eval(
                st, real_feats, jax.random.fold_in(
                    jax.random.PRNGKey(cfg.train.seed), 5000 + epoch),
                num_samples=args.fidelity_samples,
                batch=min(args.fidelity_samples, 16),
                sampler="ddim", sample_steps=args.sample_steps,
                real_ctx=real_ctx)
            out = {"latent_fid": scores["latent_fid"],
                   "latent_mmd": scores["latent_mmd"]}
            if "fid_class_sep" in scores:
                out["fid_class_sep"] = scores["fid_class_sep"]
            return out

    if args.cache_latents:
        # One frozen-encoder pass over the corpus, then the whole stage-2
        # run feeds from HBM-resident latents (LatentLoader): removes the
        # 128^3 conv encode + volume transfer from every train step.
        import time

        import jax.numpy as jnp
        if cfg.data.augment:
            # the encoding pass sees ONE augmentation draw, frozen for the
            # whole run — matching the reference's static pre-augmented
            # dataset copies (dataset_utils.py:241-258), not this
            # framework's default per-epoch draws
            print("cache_latents: augmentation frozen to a single draw "
                  "(matches the reference's static augmented copies)")
        t0 = time.time()
        # Disk-persisted latent cache: the frozen-encoder pass is minutes
        # of device time and is re-done from scratch on every
        # auto-resume/watchdog relaunch (measured ~7 min per attempt on
        # the r5 flagship — dominating recovery). The encode is
        # deterministic in (stage-1 weights, corpus), so persist the RAW
        # (unscaled) latents next to the corpus cache, keyed by the
        # stage-1 epoch; any shape mismatch falls back to re-encoding.
        import numpy as _np
        lat_disk = None
        if (args.vqvae_load_ckpt and not cfg.data.augment
                and (mesh is None or mesh.devices.size == 1)):
            os.makedirs(cfg.data.cache_dir, exist_ok=True)
            lat_disk = os.path.join(
                cfg.data.cache_dir,
                f"latents_s1ep{vq_epoch}_b{cfg.train.batch_size}.npz")
        lat_all = ctx_all = None
        if lat_disk and os.path.exists(lat_disk):
            try:
                with _np.load(lat_disk) as z:
                    lat_all = jnp.asarray(z["lat"], jnp.float32)
                    ctx_all = jnp.asarray(z["ctx"])
                print(f"cache_latents: loaded {lat_all.shape[0]} latents "
                      f"from {lat_disk}", flush=True)
            except Exception as e:  # noqa: BLE001 - corrupt cache: redo
                print(f"cache_latents: disk cache unreadable ({e}); "
                      f"re-encoding", flush=True)
                lat_all = ctx_all = None
        if lat_all is None:
            lats, ctxs = [], []
            for i, (vol, _mask, ctx) in enumerate(train_loader):
                lats.append(trainer.encode_latents(state, vol))
                ctxs.append(jnp.asarray(ctx))
                if (i + 1) % 32 == 0:
                    # heartbeat: minutes of device work with no other
                    # output — without it the stall watchdog
                    # (tools/with_watchdog.sh) cannot tell a slow relay
                    # encode from a hung one and kills mid-encode (r5)
                    print(f"cache_latents: encoded {i + 1} batches "
                          f"[{time.time() - t0:.0f}s]", flush=True)
            lat_all = jnp.concatenate(lats, axis=0)
            ctx_all = jnp.concatenate(ctxs, axis=0)
            if lat_disk:
                _np.savez(lat_disk,
                          lat=_np.asarray(jax.device_get(lat_all),
                                          _np.float16),
                          ctx=_np.asarray(jax.device_get(ctx_all)))
                print(f"cache_latents: persisted to {lat_disk}", flush=True)
        from ldm3d.data.pipeline import LatentLoader
        lat_std = float(jnp.std(lat_all.astype(jnp.float32)))
        print(f"cache_latents: {lat_all.shape[0]} latents "
              f"{tuple(lat_all.shape[1:])} resident on device "
              f"({lat_all.nbytes / 1e6:.0f} MB, encoded in "
              f"{time.time() - t0:.1f}s); latent std "
              f"{lat_std:.4f} in diffusion space (latent_scale "
              f"{cfg.diffusion.latent_scale:g} applied) — for "
              f"unit-variance latents train with --latent_scale "
              f"{cfg.diffusion.latent_scale / max(lat_std, 1e-8):.4f}")
        # AUTO latent scale (default): with the reference's raw latents
        # (std ~0.05 on the flagship stage-1) x_t is ~99.8% injected noise
        # at EVERY timestep, so eps barely depends on the data — the root
        # cause of every inert-conditioning result through round 4
        # (NOTES_r4 "Session 2", VERDICT r4 next-1). Unless --latent_scale
        # was passed explicitly (or the preset sets one), rescale the
        # cached latents to unit variance (Rombach et al. 2022's
        # scale_factor) and disable the [-1,1] sampler clip (1 sigma of a
        # unit-variance latent) unless --clip_sample_range was given.
        if (args.latent_scale is None and cfg.diffusion.latent_scale == 1.0
                and abs(lat_std - 1.0) > 0.05 and lat_std > 1e-8):
            from ldm3d.core.config import replace
            new_scale = 1.0 / lat_std
            new_clip = (args.clip_sample_range
                        if args.clip_sample_range is not None else 0.0)
            diff = replace(cfg.diffusion, latent_scale=new_scale,
                           clip_sample_range=new_clip)
            cfg = replace(cfg, diffusion=diff)
            trainer = _dm_trainer(cfg, args, mesh)  # noqa: F841 rebinds the
            # closure the fidelity epoch_callback and step_fn capture
            lat_all = lat_all * jnp.asarray(new_scale, lat_all.dtype)
            print(f"cache_latents: AUTO latent_scale {new_scale:.4f} "
                  f"(corpus-derived; clip_sample_range -> {new_clip:g}). "
                  f"Pass --latent_scale 1 to force raw reference behavior; "
                  f"restore/serve adopt the value from train_meta.json.")
        # Single device: fuse the whole epoch into ONE dispatched program
        # (lax.scan over the permutation) — per-step dispatch through the
        # TPU relay costs ~20-50x the 8^3-latent step program itself
        # (DiffusionTrainer.train_epoch_latents). Multi-device keeps the
        # per-step path (batches shard over 'data').
        fused = mesh is None or mesh.devices.size == 1
        train_loader = LatentLoader(lat_all, ctx_all, cfg.train.batch_size,
                                    seed=cfg.train.seed, mesh=mesh,
                                    fused=fused)

        def step_fn(state, batch):  # noqa: F811 - replaces the volume path
            if fused:
                lat, ctx, perm = batch
                return trainer.train_epoch_latents(state, lat, ctx, perm)
            lat, ctx = batch
            return trainer.train_step_latents(state, lat, ctx)

    # Persist the checkpoint's train-time sampling invariants so
    # --fidelity_sweep / --test_dm / serve / bench restore with the SAME
    # latent_scale etc. even when the flags are omitted (the auto scale
    # above makes the value run-dependent). See _adopt_dm_meta.
    import json as _json
    _meta = {"latent_scale": cfg.diffusion.latent_scale,
             "clip_sample_range": cfg.diffusion.clip_sample_range,
             "timesteps": cfg.diffusion.timesteps,
             "prediction_type": cfg.diffusion.prediction_type,
             "context_in_time": cfg.diffusion.unet.context_in_time,
             "cfg_dropout": cfg.diffusion.unet.cfg_dropout,
             "context_dim": cfg.diffusion.unet.context_dim,
             "ema_decay": float(cfg.train.ema_decay),
             # denoiser shape: restores must rebuild the same parameter
             # tree (the stem/width recipe changed in round 5 when the
             # reference's 32-ch stem proved an information bottleneck)
             "unet_stem": cfg.diffusion.unet.first_conv_channels,
             "unet_widths": list(cfg.diffusion.unet.widths),
             "unet_attention": list(cfg.diffusion.unet.has_attention)}
    with open(os.path.join(logdir, "train_meta.json"), "w") as f:
        _json.dump(_meta, f, indent=1)

    from ldm3d.train.loop import fit_with_recovery
    fit_fn = fit if not args.auto_resume else functools.partial(
        fit_with_recovery, max_restarts=args.auto_resume)
    state, metrics = fit_fn(
        trainer, state, train_loader, cfg.train.epochs,
        ckpt=None if args.test_run else ckpt,
        image_logger=image_logger,
        epoch_callback=epoch_callback,
        csv_logger=CSVLogger(os.path.join(logdir, "training.log"),
                             append=args.resume_ckpt is not None),
        metrics_logger=MetricsLogger(os.path.join(logdir, "metrics.jsonl"),
                                     run_name=cfg.name),
        initial_epoch=initial_epoch, ckpt_freq=args.ckpt_freq,
        step_fn=step_fn)
    ckpt.wait()
    print("final:", {k: round(float(v), 8) for k, v in metrics.items()})
    return state


def run_test_dm(cfg, args):
    """Generate samples end-to-end and save .npy volumes
    (reference DiffusionModel.test, dm3d.py:534-545)."""
    import jax
    from ldm3d.parallel.mesh import make_mesh
    from ldm3d.train.checkpoint import CheckpointManager

    cfg = _adopt_dm_meta(cfg, args)
    mesh = make_mesh(cfg.train.mesh, batch_size=cfg.train.batch_size)
    size = cfg.data.volume_size
    trainer = _dm_trainer(cfg, args, mesh)
    state = trainer.init_state(
        jax.random.PRNGKey(cfg.train.seed),
        (1, size, size, size, cfg.diffusion.vqvae.in_channels))
    ckpt = CheckpointManager(_ckpt_dir(cfg, "dm"))
    state, epoch = ckpt.restore(jax.device_get(state), args.test_epoch)
    print(f"sampling from epoch {epoch} ({cfg.diffusion.timesteps} steps)")

    f = cfg.diffusion.vqvae.spatial_factor
    lat = size // f
    shape = (4, lat, lat, lat, cfg.diffusion.latent_channels)
    os.makedirs(args.out_dir, exist_ok=True)
    contexts = (list(range(cfg.diffusion.unet.context_dim + 1))
                if cfg.model == "conditional_dm" else [None])
    for ctx in contexts:
        out = trainer.generate(state, jax.random.PRNGKey(7), shape,
                               context_value=ctx, sampler=args.sampler,
                               sample_steps=args.sample_steps, eta=args.eta,
                               guidance_scale=args.guidance_scale)
        tag = f"-ctx{ctx}" if ctx is not None else ""
        if args.sampler in ("ddim", "dpmpp", "dpmpp_sde"):
            tag = f"-{args.sampler}{args.sample_steps or ''}{tag}"
        path = os.path.join(
            args.out_dir,
            f"{cfg.name}-{cfg.diffusion.timesteps}rsteps{tag}.npy")
        np.save(path, np.asarray(out, np.float32))
        print("saved", path, out.shape)
        if args.save_nifti:
            from ldm3d.data.nifti import save_nifti
            arr = np.asarray(out, np.float32)
            for b in range(arr.shape[0]):
                nii = path.replace(".npy", f"_{b}.nii.gz")
                save_nifti(nii, arr[b])
                print("saved", nii)


def run_fidelity_sweep(cfg, args):
    """Sample-fidelity study on a trained DM checkpoint: latent-FID and
    kernel-MMD (ldm3d/ops/fid.py, vs held-out frozen-encoder features)
    over a sampler x guidance-scale grid. Quantifies what the reference
    could only eyeball (its test() saves 10 volumes, dm3d.py:534-545) and
    measures the classifier-free-guidance fidelity trade-off the
    reference cannot express at all (no null-token training)."""
    import json
    import time

    import jax
    from ldm3d.parallel.mesh import make_mesh
    from ldm3d.train.checkpoint import CheckpointManager

    cfg = _adopt_dm_meta(cfg, args)
    mesh = make_mesh(cfg.train.mesh, batch_size=cfg.train.batch_size)
    size = cfg.data.volume_size
    trainer = _dm_trainer(cfg, args, mesh)
    state = trainer.init_state(
        jax.random.PRNGKey(cfg.train.seed),
        (1, size, size, size, cfg.diffusion.vqvae.in_channels))
    ckpt = CheckpointManager(_ckpt_dir(cfg, "dm"))
    state, epoch = ckpt.restore(jax.device_get(state), args.test_epoch)
    state = jax.device_put(state)
    print(f"fidelity sweep from epoch {epoch} "
          f"(T={cfg.diffusion.timesteps}, "
          f"prediction={cfg.diffusion.prediction_type})")

    train_loader, val_loader = _loaders(cfg, args, mesh=mesh)
    feats, ctx_rows = [], []
    for batch in (val_loader or train_loader):
        feats.append(trainer.latent_features(state, batch[0]))
        ctx_rows.append(np.asarray(batch[2]).reshape(-1))
    real_feats = np.concatenate(feats, axis=0)
    real_ctx = (np.concatenate(ctx_rows, axis=0)
                if args.fidelity_by_class and trainer.conditional else None)
    print(f"cached {real_feats.shape[0]} real-volume feature rows"
          + (f" (per-class: {np.bincount(real_ctx.astype(int)).tolist()})"
             if real_ctx is not None else ""))

    samplers = []
    for entry in args.sweep_samplers.split(","):
        entry = entry.strip()
        if not entry:
            continue
        parts = entry.split(":")
        name = parts[0]
        steps = int(parts[1]) if len(parts) > 1 and parts[1] else None
        # third field: DDIM eta (ddim:50:1.0 = stochastic DDIM, the
        # few-step-DDPM diversity lever; deterministic eta=0 default)
        eta = float(parts[2]) if len(parts) > 2 and parts[2] else 0.0
        samplers.append((name, steps, eta))
    guidances = []
    for g in args.guidance_grid.split(","):
        g = g.strip().lower()
        guidances.append(None if g in ("", "none", "0") else float(g))

    rows = []
    for sampler, steps, eta in samplers:
        for g in guidances:
            t0 = time.perf_counter()
            try:
                scores = trainer.fidelity_eval(
                    state, real_feats,
                    jax.random.PRNGKey(cfg.train.seed + 9000),
                    num_samples=args.fidelity_samples,
                    batch=min(args.fidelity_samples, 16),
                    sampler=sampler, sample_steps=steps, eta=eta,
                    guidance_scale=g, real_ctx=real_ctx)
            except ValueError as e:  # e.g. guidance without cfg_dropout
                print(f"skip {sampler}:{steps} g={g}: {e}")
                continue
            dt = time.perf_counter() - t0
            name = sampler if not eta else f"{sampler}(eta={eta:g})"
            row = {"sampler": name, "steps": steps, "guidance": g,
                   "latent_fid": round(float(scores["latent_fid"]), 3),
                   "latent_mmd": round(float(scores["latent_mmd"]), 4),
                   "eval_seconds": round(dt, 1)}
            for k, v in scores.items():
                if k.startswith("fid_"):
                    row[k] = round(float(v), 3)
            rows.append(row)
            print(row, flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.join(args.out_dir, f"fidelity_sweep_{cfg.name}")
    with open(base + ".json", "w") as f:
        json.dump({"epoch": epoch, "timesteps": cfg.diffusion.timesteps,
                   "prediction_type": cfg.diffusion.prediction_type,
                   "num_samples": args.fidelity_samples, "rows": rows},
                  f, indent=1)
    by_class = any("fid_class_sep" in r for r in rows)
    extra_hdr = (" FID same(c0/c1) | FID cross(c0/c1) | class sep |"
                 if by_class else "")
    lines = [f"# Fidelity sweep — {cfg.name} (epoch {epoch}, "
             f"T={cfg.diffusion.timesteps}, "
             f"{cfg.diffusion.prediction_type}-prediction, "
             f"{args.fidelity_samples} samples/cell)", "",
             "| sampler | steps | guidance | latent-FID | kernel-MMD |"
             + extra_hdr + " eval s |",
             "|---|---|---|---|---|" + ("---|---|---|" if by_class else "")
             + "---|"]
    for r in rows:
        extra = ""
        if by_class:
            extra = (f" {r.get('fid_same_c0', '—')}/"
                     f"{r.get('fid_same_c1', '—')} "
                     f"| {r.get('fid_cross_c0', '—')}/"
                     f"{r.get('fid_cross_c1', '—')} "
                     f"| {r.get('fid_class_sep', '—')} |")
        lines.append(
            f"| {r['sampler']} | {r['steps'] or 'T'} "
            f"| {r['guidance'] if r['guidance'] is not None else '—'} "
            f"| {r['latent_fid']} | {r['latent_mmd']} |"
            + extra + f" {r['eval_seconds']} |")
    with open(base + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", base + ".md")
    return rows


def _sweep_trial(cfg, args, point, metric):
    """Train one sweep point; returns (record, metric value or None)."""
    from ldm3d.core.sweep import apply_sweep_point

    run_cfg = apply_sweep_point(cfg, point)
    print(f"--- sweep point: {run_cfg.name}")
    try:
        run_train_vq(run_cfg, args)
        # final metrics were printed by fit(); re-read from csv tail
        log = os.path.join(_ckpt_dir(run_cfg, "vq"), "training.log")
        last = {}
        if os.path.exists(log):
            import csv as _csv
            with open(log) as lf:
                rows = list(_csv.DictReader(lf))
            if rows:
                last = {k: float(v) for k, v in rows[-1].items()}
        rec = {"name": run_cfg.name, "point": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in point.items()}, "metrics": last}
        return rec, last.get(metric)
    except Exception as e:  # keep sweeping past failed points
        return {"name": run_cfg.name, "error": str(e)}, None


def run_sweep(cfg, args):
    """Sequential sweep agent: train each proposed point and record the
    result table (reference: wandb agent over sweep.yaml). `method: grid`
    and `random` expand up front; `method: bayes` runs the sequential TPE
    optimizer (ldm3d/core/sweep.py::BayesSearch), observing each trial's
    final metric before proposing the next point."""
    import json
    from ldm3d.core.sweep import (BayesSearch, expand_sweep,
                                  parse_sweep_yaml)

    with open(args.sweep) as f:
        spec = parse_sweep_yaml(f.read())
    metric = spec.get("metric", {}).get("name", "val_loss")
    goal = spec.get("metric", {}).get("goal", "minimize")
    method = spec.get("method", "grid")
    results = []
    results_path = os.path.join(cfg.ckpt_dir, "sweep_results.jsonl")
    os.makedirs(cfg.ckpt_dir, exist_ok=True)

    def record(rec):
        results.append(rec)
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    if method == "bayes":
        search = BayesSearch(spec, seed=cfg.train.seed, goal=goal)
        count = args.sweep_count or min(len(search.candidates), 20)
        print(f"sweep (bayes/TPE): up to {count} of "
              f"{len(search.candidates)} grid cells, optimizing {metric}")
        bad_value = float("inf") if not str(goal).startswith("max") \
            else float("-inf")
        for i in range(count):
            point = search.suggest()
            if point is None:
                break
            rec, value = _sweep_trial(cfg, args, point, metric)
            # failed/metricless trials are observed as worst-case so TPE
            # steers away from that region instead of re-proposing it
            search.observe(point, value if value is not None else bad_value)
            record(rec)
    else:
        points = expand_sweep(spec, count=args.sweep_count,
                              seed=cfg.train.seed)
        print(f"sweep ({method}): {len(points)} points, optimizing {metric}")
        for point in points:
            rec, _ = _sweep_trial(cfg, args, point, metric)
            record(rec)

    scored = [r for r in results if r.get("metrics", {}).get(metric)
              is not None]
    if scored:
        pick = max if str(goal).startswith("max") else min
        best = pick(scored, key=lambda r: r["metrics"][metric])
        print(f"best: {best['name']} {metric}={best['metrics'][metric]:.6f}")


def run_create_dataset(cfg, args):
    from ldm3d.data.pipeline import build_cache, write_synthetic_cache
    if args.synthetic:
        write_synthetic_cache(cfg.data.cache_dir, args.num_synthetic,
                              cfg.data.volume_size, seed=cfg.train.seed,
                              num_classes=cfg.data.num_classes)
        print(f"synthetic cache at {cfg.data.cache_dir}")
    else:
        build_cache(cfg.data)
        print(f"cache at {cfg.data.cache_dir}")


def main(argv=None):
    import sys
    if hasattr(sys.stdout, "reconfigure"):
        # Line-buffer even when stdout is a file: the external stall
        # watchdog (tools/with_watchdog.sh) detects relay hangs by log
        # growth, and one ~100-byte epoch line per ~2 min never fills a
        # block buffer — a healthy run would look identical to a hang.
        sys.stdout.reconfigure(line_buffering=True)
    args = build_parser().parse_args(argv)
    try:
        # persistent XLA compile cache: 128^3 programs take minutes to
        # compile through this environment's device relay; reruns hit disk
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("LDM3D_JAX_CACHE",
                                         "/tmp/ldm3d_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if args.platform:
        if args.cpu_devices:
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + " --xla_force_host_platform_device_count="
                    f"{args.cpu_devices}").strip()
        import jax
        jax.config.update("jax_platforms",
                          "cpu" if args.platform == "cpu" else "axon")
    from ldm3d.parallel.distributed import initialize as _dist_init
    if _dist_init(args.coordinator, args.num_processes, args.process_id):
        import jax
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} global / "
              f"{jax.local_device_count()} local devices")
    from ldm3d.core.presets import get_preset
    cfg = apply_overrides(get_preset(args.preset), args)

    if args.profile:
        import jax
        jax.profiler.start_trace(os.path.join(cfg.ckpt_dir, "trace"))

    if args.sweep:
        run_sweep(cfg, args)
        return
    if args.create_dataset:
        run_create_dataset(cfg, args)
    if args.train_vq:
        run_train_vq(cfg, args)
    if args.test_vq:
        run_test_vq(cfg, args)
    if args.train_dm:
        run_train_dm(cfg, args)
    if args.test_dm:
        run_test_dm(cfg, args)
    if args.fidelity_sweep:
        run_fidelity_sweep(cfg, args)
    if not any([args.create_dataset, args.train_vq, args.test_vq,
                args.train_dm, args.test_dm, args.fidelity_sweep]):
        print("nothing to do: pass --train_vq/--test_vq/--train_dm/"
              "--test_dm/--create_dataset")

    if args.profile:
        import jax
        jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
