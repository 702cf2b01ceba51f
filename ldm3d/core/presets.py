"""Named experiment presets — the reference's hard-coded call-site configs
as a registry (BASELINE.json configs + SURVEY.md §2.3 'Used by' column).

Each preset reproduces one canonical reference run:
  - vqvae_b8_all      <- main.py:187-212 (3-level 32/64/128, K=512, D=256,
                         128^3 -> 16^3 latents; sb_vqvae3d-monai.sbatch)
  - vqvae_5level_test <- main.py:323-348 (5-level test cfg, K=1024, D=512)
  - vqvae_dm_stage1   <- the 4-level stage-1 built inline by the diffusion
                         models (dm3d.py:386-409: K=1024, D=256, latent 8^3)
  - nsvqvae           <- main_nsvqvae.py:190-215 (4-level, K=512, D=256,
                         quantize loss alpha=1e2 nsvqvae.py:432)
  - rnsvqvae          <- main_rnsvqvae.py:187-210 (K=256, D=128, 4 stages)
  - emavqvae          <- networks/emavqvae.py VectorQuantizerEMA defaults
                         (K=512, D=128, commitment 6) — orphaned upstream
                         (main_emavqvae.py is empty), runnable here
  - vqgan_attn        <- main_exp_vqgan_attn.py + sb_vqgan.sbatch
                         (channel_list (32,64,128), K=512, D=256,
                         disc_threshold 40, Adam(0.5, 0.9))
  - vqgan_attn_sym    <- networks/vqgan_attn.py itself (the superseded
                         SYMMETRIC-pad SamePadConv3D family; no upstream
                         main imports it — runnable here)
  - dm3d / conditional_dm3d <- main.py:371-427 & main_conditional_dm.py
                         (T=300/500, widths [64,128,256],
                         attention [F,F,T,T], frozen 4-level VQ-VAE)
"""

from __future__ import annotations

from typing import Callable, Dict

from ldm3d.core.config import (DataConfig, DiffusionConfig,
                               DiscriminatorConfig, ExperimentConfig,
                               MeshConfig, QuantizerConfig, TrainConfig,
                               UNetConfig, VQGANConfig, VQVAEConfig)

_REGISTRY: Dict[str, Callable[[], ExperimentConfig]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_preset(name: str) -> ExperimentConfig:
    if name not in _REGISTRY:
        raise KeyError(f"unknown preset '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]()


def list_presets():
    return sorted(_REGISTRY)


def _levels(channels, k=4, s=2):
    n = len(channels)
    return dict(num_channels=tuple(channels),
                num_res_channels=tuple(channels),
                downsample_stride=(s,) * n, downsample_kernel=(k,) * n,
                upsample_stride=(s,) * n, upsample_kernel=(k,) * n)


@register("vqvae_b8_all")
def _vqvae_b8_all() -> ExperimentConfig:
    vq = VQVAEConfig(
        remat=True, in_channels=2, out_channels=2, num_res_layers=3,
        **_levels((32, 64, 128)),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=512,
                                  embedding_dim=256))
    return ExperimentConfig(name="vqvae_b8_all", model="vqvae", vqvae=vq,
                            train=TrainConfig(batch_size=8,
                                              learning_rate=1e-4))


@register("vqvae_5level_test")
def _vqvae_5level() -> ExperimentConfig:
    vq = VQVAEConfig(
        remat=True, in_channels=2, out_channels=2, num_res_layers=3,
        **_levels((32, 64, 128, 256, 512)),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=1024,
                                  embedding_dim=512))
    return ExperimentConfig(name="vqvae_5level_test", model="vqvae", vqvae=vq)


@register("vqvae_dm_stage1")
def _vqvae_dm_stage1() -> ExperimentConfig:
    vq = VQVAEConfig(
        remat=True, in_channels=1, out_channels=1, num_res_layers=5,
        **_levels((32, 64, 128, 256)),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=1024,
                                  embedding_dim=256))
    return ExperimentConfig(name="vqvae_dm_stage1", model="vqvae", vqvae=vq)


@register("nsvqvae")
def _nsvqvae() -> ExperimentConfig:
    vq = VQVAEConfig(
        remat=True, in_channels=1, out_channels=1, num_res_layers=3,
        **_levels((32, 64, 128, 256)), act="swish",
        quantizer=QuantizerConfig(kind="nsvq", num_embeddings=512,
                                  embedding_dim=256,
                                  discarding_threshold=0.01,
                                  quantize_loss_weight=1e2))
    return ExperimentConfig(name="nsvqvae", model="nsvqvae", vqvae=vq)


@register("rnsvqvae")
def _rnsvqvae() -> ExperimentConfig:
    vq = VQVAEConfig(
        remat=True, in_channels=1, out_channels=1, num_res_layers=3,
        **_levels((32, 64, 128)),
        quantizer=QuantizerConfig(kind="rnsvq", num_embeddings=256,
                                  embedding_dim=128, num_stages=4,
                                  discarding_threshold=0.01,
                                  quantize_loss_weight=1e2))
    return ExperimentConfig(name="rnsvqvae", model="rnsvqvae", vqvae=vq)


@register("emavqvae")
def _emavqvae() -> ExperimentConfig:
    """Skip-connection EMA VQ-VAE (reference networks/emavqvae.py +
    emavqvae_model.py; its main_emavqvae.py is empty upstream)."""
    vq = VQVAEConfig(
        in_channels=1, out_channels=1, family="ema_skip",
        **_levels((8, 16, 32, 64)),
        quantizer=QuantizerConfig(kind="ema_sonnet", num_embeddings=512,
                                  embedding_dim=128, commitment_cost=6.0))
    return ExperimentConfig(name="emavqvae", model="emavqvae", vqvae=vq)


@register("vqgan_attn")
def _vqgan_attn() -> ExperimentConfig:
    ae = VQVAEConfig(
        remat=True, in_channels=2, out_channels=2, num_res_layers=1, norm="group",
        act="silu", **_levels((32, 64, 128)),
        quantizer=QuantizerConfig(kind="ema", num_embeddings=512,
                                  embedding_dim=256))
    gan = VQGANConfig(ae=ae,
                      disc=DiscriminatorConfig(num_channels=(32, 64, 128)),
                      disc_threshold=40)
    return ExperimentConfig(
        name="vqgan_attn", model="vqgan", vqgan=gan,
        train=TrainConfig(batch_size=2, learning_rate=1e-4,
                          disc_learning_rate=1e-4, adam_b1=0.5, adam_b2=0.9))


@register("vqgan_attn_sym")
def _vqgan_attn_sym() -> ExperimentConfig:
    """The superseded SYMMETRIC-pad family (networks/vqgan_attn.py, not
    wired to any upstream main): hard-coded n_hiddens=64 encoder with one
    k4-s2 level (:584-594), VideoGPT EMA quantizer with K=128, D=64
    defaults (:541-542), ndf=64 n_layers=3 critics, vanilla disc loss,
    Adam(0.5, 0.9)."""
    ae = VQVAEConfig(
        remat=True, in_channels=2, out_channels=2, num_res_layers=1,
        norm="group", act="silu", arch="attn",
        num_channels=(64, 128), num_res_channels=(64, 128),
        quantizer=QuantizerConfig(kind="ema", num_embeddings=128,
                                  embedding_dim=64))
    gan = VQGANConfig(
        ae=ae, disc=DiscriminatorConfig(num_channels=(64, 128, 256)),
        disc_threshold=40, disc_loss_fn="vanilla")
    return ExperimentConfig(
        name="vqgan_attn_sym", model="vqgan", vqgan=gan,
        train=TrainConfig(batch_size=2, learning_rate=1e-4,
                          disc_learning_rate=1e-4, adam_b1=0.5, adam_b2=0.9))


@register("vqgan_baseline")
def _vqgan_baseline() -> ExperimentConfig:
    """reference main_exp_vqgan.py: MONAI ae + BatchNorm, Dense disc head,
    BCE generator loss, disc lr 1e-5 (main_exp_vqgan.py:59-60)."""
    ae = VQVAEConfig(
        remat=True, in_channels=2, out_channels=2, num_res_layers=3, norm="batch",
        act="prelu", arch="monai",
        **_levels((32, 64, 128)),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=512,
                                  embedding_dim=256))
    gan = VQGANConfig(
        ae=ae, disc=DiscriminatorConfig(num_channels=(32, 64, 128),
                                        head="dense"),
        disc_threshold=40, g_adv_style="bce", disc_loss_fn="vanilla")
    return ExperimentConfig(
        name="vqgan_baseline", model="vqgan", vqgan=gan,
        train=TrainConfig(batch_size=2, learning_rate=1e-4,
                          disc_learning_rate=1e-5))


@register("vqgan_gnorm")
def _vqgan_gnorm() -> ExperimentConfig:
    """reference main_exp_vqgan_gnorm.py: GroupNorm everywhere, Dense disc
    head, separate loss weights (vqgan_gnorm.py:826-828)."""
    ae = VQVAEConfig(
        remat=True, in_channels=2, out_channels=2, num_res_layers=3, norm="group",
        arch="monai", **_levels((32, 64, 128)),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=512,
                                  embedding_dim=256))
    gan = VQGANConfig(
        ae=ae, disc=DiscriminatorConfig(num_channels=(32, 64, 128),
                                        head="dense"),
        disc_threshold=40, g_adv_style="bce",
        disc_wt=0.8, lpips_wt=4.0, gan_feat_wt=4.0, g_loss_adv_wt=1.0)
    return ExperimentConfig(
        name="vqgan_gnorm", model="vqgan", vqgan=gan,
        train=TrainConfig(batch_size=2, learning_rate=1e-4))


@register("vqgan_stride")
def _vqgan_stride() -> ExperimentConfig:
    """reference main_exp_vqgan_stride.py: res-before-conv + avg-pool downs,
    UpSampling3D decoder."""
    ae = VQVAEConfig(
        remat=True, in_channels=2, out_channels=2, num_res_layers=3, norm="batch",
        arch="stride", **_levels((32, 64, 128)),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=512,
                                  embedding_dim=256))
    gan = VQGANConfig(
        ae=ae, disc=DiscriminatorConfig(num_channels=(32, 64, 128)),
        disc_threshold=40, g_adv_style="bce")
    return ExperimentConfig(
        name="vqgan_stride", model="vqgan", vqgan=gan,
        train=TrainConfig(batch_size=2, learning_rate=1e-4))


def _dm(conditional: bool, timesteps: int) -> ExperimentConfig:
    # U-Net width: the reference's conditional stem is 32 channels on a
    # 256-channel latent (conditional_dm3d.py:321 + main.py:377-383 D=256).
    # That is an information bottleneck, not a style choice: every skip
    # descends from the stem, so the head can recover at most
    # stem/latent_channels of the injected eps — measured as a hard
    # eps-MSE floor of ~224/256 = 0.875 at EVERY t on unit-variance
    # latents (tools/r5_diag.py: overfitting 8 latents plateaus at 0.89
    # for stem 32 regardless of norm or lr; a stem-256 net reaches the
    # sub-0.2 regime). Standard latent-diffusion practice keeps stem >>
    # latent channels (e.g. 320 vs 4 in Stable Diffusion). The working
    # recipe therefore widens the denoiser; pass
    # --unet_stem 32 --unet_widths 64,128,256 to reproduce the
    # reference's (information-bottlenecked) hyperparameters exactly.
    unet = UNetConfig(
        widths=(256, 512) if conditional else (64, 128, 256),
        has_attention=(False, True, True) if conditional
        else (False, False, True, True),
        num_res_blocks=2,
        first_conv_channels=256 if conditional else 64,
        context_dim=1 if conditional else None)
    vq = VQVAEConfig(
        remat=True, in_channels=1, out_channels=1, num_res_layers=5,
        **_levels((32, 64, 128, 256)),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=1024,
                                  embedding_dim=256))
    diff = DiffusionConfig(timesteps=timesteps, latent_size=8,
                           latent_channels=256, unet=unet, vqvae=vq)
    name = "conditional_dm3d" if conditional else "dm3d"
    return ExperimentConfig(name=name,
                            model="conditional_dm" if conditional else "dm",
                            diffusion=diff,
                            train=TrainConfig(batch_size=8,
                                              learning_rate=1e-4))


@register("dm3d")
def _dm3d() -> ExperimentConfig:
    return _dm(conditional=False, timesteps=300)


@register("conditional_dm3d")
def _conditional_dm3d() -> ExperimentConfig:
    # sb_cond_dm3d.sbatch: --timesteps 500 --lbs 3 --dataset all-T
    return _dm(conditional=True, timesteps=500)


@register("vqvae_legacy")
def _vqvae_legacy() -> ExperimentConfig:
    """Legacy keras-tutorial functional VQ-VAE (reference vqvae3d.py,
    selected upstream via --vqvae_mode; latent_dim 16, K=64)."""
    vq = VQVAEConfig(
        in_channels=1, out_channels=1, family="legacy", legacy_mode=1,
        legacy_down=3,
        quantizer=QuantizerConfig(kind="ste", num_embeddings=64,
                                  embedding_dim=16))
    return ExperimentConfig(name="vqvae_legacy", model="vqvae", vqvae=vq,
                            train=TrainConfig(batch_size=8,
                                              learning_rate=1e-4))


@register("smoke")
def _smoke() -> ExperimentConfig:
    """CPU-runnable smoke config (the reference's --test_run spirit)."""
    vq = VQVAEConfig(
        in_channels=2, out_channels=2, num_res_layers=1,
        **_levels((4, 8)),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    unet = UNetConfig(widths=(8, 16), has_attention=(False, True),
                      num_res_blocks=1, first_conv_channels=8,
                      context_dim=1, attention_impl="xla")
    dm_vq = VQVAEConfig(
        in_channels=1, out_channels=1, num_res_layers=1,
        **_levels((4, 8)),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    diff = DiffusionConfig(timesteps=8, latent_size=4, latent_channels=8,
                           unet=unet, vqvae=dm_vq)
    return ExperimentConfig(
        name="smoke", model="vqvae", vqvae=vq, diffusion=diff,
        train=TrainConfig(batch_size=2, epochs=2, dtype="float32"),
        data=DataConfig(volume_size=16, test_run=True))


@register("smoke_cond")
def _smoke_cond() -> ExperimentConfig:
    """Conditional counterpart of `smoke`: the CPU-runnable version of
    conditional_dm3d (context-token U-Net + classifier-free-guidance
    surface, reference main_conditional_dm.py), so the conditional CLI
    path is covered by the suite at tiny shapes."""
    import dataclasses

    cfg = _smoke()
    return dataclasses.replace(cfg, name="smoke_cond",
                               model="conditional_dm")
