"""Typed configuration tree for the TPU-native 3D latent-diffusion framework.

Replaces the reference's per-entry-point argparse duplication and hard-coded
hyper-parameters at call sites (reference: main.py:451-503, main.py:187-212,
main_exp_vqgan_attn.py:280-335, networks/dm3d.py:386-426) with one typed,
hashable config tree plus a named preset registry (`ldm3d.core.presets`).

Everything here is a frozen dataclass so configs can be closed over by
`jax.jit`-traced functions and used as static arguments.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class QuantizerConfig:
    """Config covering all five codebook-learning strategies of the reference.

    kind:
      - "ste":   straight-through VQ, commitment beta + codebook loss
                 (reference: networks/vqvae3d_monai.py:112-215)
      - "ema":   VideoGPT-style EMA with data-dependent init + random restart
                 (reference: networks/vqgan_attn_cp.py:140-248)
      - "ema_sonnet": Sonnet-style EMA, Laplace smoothing, commitment cost
                 (reference: networks/emavqvae.py:170-243)
      - "nsvq":  noise-substitution VQ (reference: networks/nsvqvae.py:117-230)
      - "rnsvq": residual multi-stage NSVQ (reference: networks/rnsvqvae.py:54-190)
    """

    kind: str = "ste"
    num_embeddings: int = 512
    embedding_dim: int = 256
    beta: float = 0.25                 # commitment weight (ste / ema)
    ema_decay: float = 0.99
    ema_epsilon: float = 1e-7          # Laplace smoothing epsilon
    commitment_cost: float = 6.0       # sonnet-style commitment weight
    restart_thres: float = 1.0         # EMA random-restart usage threshold
    no_random_restart: bool = False
    discarding_threshold: float = 0.05 # unused-code replacement threshold
    num_stages: int = 4                # rnsvq residual stages
    quantize_loss_weight: float = 1.0  # nsvq trainers use alpha=1e2 (nsvqvae.py:432)


@dataclass(frozen=True)
class VQVAEConfig:
    """MONAI-style 3D VQ-VAE (reference: networks/vqvae3d_monai.py:218-547).

    downsample/upsample parameters mirror the reference tuple convention
    (stride, kernel, dilation, padding) / (stride, kernel, dilation, padding,
    output_padding), reference vqvae3d_monai.py:396-399.
    """

    in_channels: int = 2
    out_channels: int = 2
    num_channels: Tuple[int, ...] = (32, 64, 128)
    num_res_channels: Tuple[int, ...] = (32, 64, 128)
    num_res_layers: int = 3
    downsample_stride: Tuple[int, ...] = (2, 2, 2)
    downsample_kernel: Tuple[int, ...] = (4, 4, 4)
    upsample_stride: Tuple[int, ...] = (2, 2, 2)
    upsample_kernel: Tuple[int, ...] = (4, 4, 4)
    dropout: float = 0.0
    kernel_resize: bool = False        # ICNR checkerboard-free transpose init
    norm: str = "batch"                # "batch" | "group" (vqgan_attn_cp uses group)
    act: str = "relu"                  # relu|silu|swish|leaky_relu|siren (vqgan.py:23-29)|prelu (vqgan.py:652)
    output_act: Optional[str] = None
    # autoencoder architecture family when used inside a VQ-GAN:
    #   "attn_cp": GroupNorm/SiLU k3 stem + k4-s2 downs (vqgan_attn_cp.py)
    #   "monai":   MONAI encoder/decoder + BatchNorm (vqgan.py / vqgan_gnorm.py)
    #   "stride":  res-units BEFORE stride-1 convs + AveragePooling3D downs,
    #              UpSampling3D decoder (vqgan_stride.py:323-340,454)
    #   "attn":    SYMMETRIC-pad SamePadConv3D family (vqgan_attn.py:242-412;
    #              superseded upstream by attn_cp — num_channels[0] is the
    #              stem width, one k4-s2 level per further entry)
    arch: str = "attn_cp"
    # model family when trained standalone: "monai" (vqvae3d_monai.py) or
    # "legacy" (the keras-tutorial functional VQVAE, vqvae3d.py, selected
    # upstream by --vqvae_mode; legacy_mode 2 adds the residual 1x1 adds)
    family: str = "monai"
    legacy_mode: int = 1
    legacy_down: int = 3
    # TPU bandwidth lever (VERDICT r3 next-5): reparameterize the level-0
    # k4-s2 stem conv as zero-pad + space-to-depth(2) + k2-s1 VALID conv —
    # the exact same function class (tests/test_s2d_stem.py pins kernel-
    # level equivalence both directions), but the 2-channel full-res input
    # becomes 16-channel half-res, filling the TPU's 128-wide vector lanes
    # 8x better and shrinking the stem's im2col window 64 -> 8 taps.
    # Checkpoint layouts differ (k2 kernel over 8x channels), so this is
    # opt-in per run, not a preset default.
    stem_s2d: bool = False
    # Rematerialize residual units in the backward pass (jax.checkpoint):
    # trades ~15% step-time FLOPs for the activation memory that otherwise
    # caps the 128^3 global batch at 2-3 per chip (16G HBM).
    remat: bool = False
    # Remat granularity: "full" recomputes the whole unit from its input;
    # "conv" saves conv outputs (the MXU-heavy ops) and recomputes only
    # the elementwise norm/act tail — fewer backward FLOPs, slightly more
    # HBM (the roofline lever measured in PERF.md).
    remat_policy: str = "full"
    quantizer: QuantizerConfig = field(default_factory=QuantizerConfig)

    @property
    def num_levels(self) -> int:
        return len(self.num_channels)

    @property
    def spatial_factor(self) -> int:
        f = 1
        for s in self.downsample_stride:
            f *= s
        return f


@dataclass(frozen=True)
class DiscriminatorConfig:
    """PatchGAN 2D/3D discriminators (reference: vqgan_attn_cp.py:430-566)."""

    num_channels: Tuple[int, ...] = (32, 64, 128)
    use_sigmoid: bool = False
    get_interm_feat: bool = True
    head: str = "conv"                 # "conv" (PatchGAN, vqgan_attn_cp) |
                                       # "dense" (vqgan_gnorm.py:523-536)


@dataclass(frozen=True)
class VQGANConfig:
    """VQ-GAN = autoencoder + dual discriminators + LPIPS
    (reference: networks/vqgan_attn_cp.py:569-906)."""

    ae: VQVAEConfig = field(default_factory=lambda: VQVAEConfig(
        norm="group", act="silu",
        quantizer=QuantizerConfig(kind="ema")))
    disc: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    disc_threshold: int = 40           # epochs before discriminator kicks in
    disc_loss_fn: str = "vanilla"      # "vanilla" | "hinge"
    g_adv_style: str = "wgan"          # "wgan": -mean(fake) (attn_cp :736-739)
                                       # | "bce": disc_loss(1, fake) (vqgan.py)
    disc_wt: float = 0.8
    lpips_wt: float = 4.0
    gan_feat_wt: float = 4.0
    g_loss_adv_wt: float = 1.0
    recon_loss: str = "l1"             # attn_cp uses L1 (vqgan_attn_cp.py:714)
    frame_idx_range: Tuple[int, int] = (30, 120)  # random 2D frame slice range
    lpips_image_size: int = 128
    # beyond-reference: VQGAN-paper adaptive generator weight
    # lambda = ||grad_rec|| / (||grad_adv|| + eps) (Esser et al. 2021 eq. 7),
    # computed at the generator output. The reference's fixed weights let
    # the adversarial phase overpower reconstruction (observed: round-3
    # fixed-weight run, reports/quality_r3/vqgan_report.md); opt in with
    # --adaptive_gan_weight.
    adaptive_g_weight: bool = False
    adaptive_g_max: float = 1e4        # clip for lambda (paper uses 1e4)
    # generator-side adversarial delay: g_adv (+ feature matching) stays
    # off for this many epochs AFTER the critics start at disc_threshold,
    # so lambda is computed against trained-critic gradients instead of
    # init noise (the round-4 instant-collapse fix; 0 = reference timing)
    g_adv_delay: int = 0
    # beyond-reference Lipschitz control for the critics: R1 gradient
    # penalty gamma/2 * E[||grad_x D(x)||^2] on REAL inputs (Mescheder et
    # al. 2018), applied to both the 3D and 2D critics once the
    # adversarial phase is on. Motivation: the round-3 divergence analysis
    # (reports/quality_r3/vqgan_analysis.md) showed unbounded critic logit
    # scale under the reference's fixed weights
    # (vqgan_attn_cp.py:725-766); R1 bounds the critics' local slope.
    # 0.0 = off (reference parity). Opt in with --r1_gamma.
    r1_gamma: float = 0.0


@dataclass(frozen=True)
class UNetConfig:
    """3D diffusion U-Net (reference: networks/dm3d.py:294-376 and
    networks/conditional_dm3d.py:324-415)."""

    widths: Tuple[int, ...] = (64, 128, 256)
    has_attention: Tuple[bool, ...] = (False, False, True, True)
    num_res_blocks: int = 2
    norm_groups: int = 8
    first_conv_channels: int = 64      # conditional variant uses 32
    context_dim: Optional[int] = None  # None => unconditional
    context_embed_dim: int = 128       # Embedding(context_dim+1, 4*first_conv)
    num_heads: int = 1
    norm: str = "batch"
    attention_impl: str = "auto"       # "auto" | "xla" | "pallas"
    # classifier-free guidance (beyond-reference): probability of replacing
    # the context token with a learned null token during training; > 0
    # allocates one extra embedding row (null index = context_dim + 1) and
    # enables guidance_scale at sampling time
    cfg_dropout: float = 0.0
    # beyond-reference conditioning strength lever: additionally ADD the
    # context embedding to the time embedding (ADM-style class
    # conditioning), so the token reaches every ResidualBlock's temb_proj
    # instead of only the single-token cross-attention sites. Motivation:
    # the reference-parity cross-attention-only path lets the denoiser
    # ignore the token almost entirely on sparse class differences —
    # measured |eps(c=0)-eps(c=1)|/|eps| <= 0.6% on the trained flagship
    # (reports/quality_r3/context_effect.md). Opt in with
    # --context_in_time.
    context_in_time: bool = False


@dataclass(frozen=True)
class DiffusionConfig:
    """DDPM schedule + trainer (reference: networks/dm3d.py:194-214,379-545)."""

    timesteps: int = 300
    beta_start: float = 1e-4
    beta_end: float = 0.02
    latent_size: int = 8
    latent_channels: int = 256
    # U-Net output parameterization (beyond-reference; the reference only
    # has eps-prediction, dm3d.py:453):
    #   "eps": predict the added noise (reference behavior)
    #   "v":   predict v = sqrt(abar) eps - sqrt(1-abar) x0 (Salimans &
    #          Ho 2022) — better-conditioned targets at high T where
    #          late timesteps are noise-dominated
    prediction_type: str = "eps"
    # min-SNR-gamma loss weighting (Hang et al. 2023): clamp the per-
    # timestep weight at SNR=gamma so easy high-SNR steps don't dominate;
    # None disables (reference behavior)
    min_snr_gamma: Optional[float] = None
    # Loss normalization for the gradient:
    #   "mean": mean over all error elements (default). The gradient
    #       DIRECTION is identical to the reference's; only the scale
    #       differs, and Adam normalizes scale — except through epsilon.
    #   "ref":  the reference's SUM-MSE / (global_bs * lc^4)
    #       (dm3d.py:456-459, conditional_dm3d.py:496-499 with lc=256).
    #       At the flagship shape this divides the mean loss by 32768,
    #       pushing typical per-parameter gradients to ~1e-8-1e-9 — AT or
    #       BELOW Adam's epsilon (optax 1e-8; Keras 1e-7 upstream) — so
    #       the effective step size collapses 10-100x. The reference
    #       never noticed because its raw std-0.05 latents make
    #       eps-prediction nearly the identity; with unit-variance
    #       latents (latent_scale fix) the real denoising task exposes
    #       it. Kept for bit-parity replication only.
    # The logged "loss" metric is ALWAYS reference-scaled so training.log
    # curves stay comparable across the two settings.
    loss_reduction: str = "mean"
    # beyond-reference sampling-space controls. Both are train-time
    # invariants of a checkpoint — restore with the same values.
    # latent_scale multiplies the frozen encoder's latents before
    # diffusion and divides before decode (Rombach et al. 2022's
    # scale_factor: unit-variance latents match the N(0,1) prior the
    # reverse process starts from). 1.0 = reference behavior (raw
    # quantized-codebook range). --cache_latents prints the corpus
    # latent std so 1/std can be chosen.
    latent_scale: float = 1.0
    # Half-width of the samplers' clipping interval for posterior means
    # and x0 predictions. The reference hard-codes 1.0 (dm3d.py:529),
    # which silently biases sampling whenever latents exceed [-1,1] —
    # nothing bounds the quantized codebook. <= 0 disables clipping.
    clip_sample_range: float = 1.0
    unet: UNetConfig = field(default_factory=UNetConfig)
    # frozen stage-1 autoencoder config (reference builds a 4-level VQVAE
    # inline at dm3d.py:386-409: K=1024, D=256, 1-channel)
    vqvae: VQVAEConfig = field(default_factory=lambda: VQVAEConfig(
        in_channels=1, out_channels=1,
        num_channels=(32, 64, 128, 256), num_res_channels=(32, 64, 128, 256),
        num_res_layers=5,
        downsample_stride=(2, 2, 2, 2), downsample_kernel=(4, 4, 4, 4),
        upsample_stride=(2, 2, 2, 2), upsample_kernel=(4, 4, 4, 4),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=1024,
                                  embedding_dim=256)))


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh topology. DP over 'data', spatial sharding over 'space'
    (TPU-native replacement for tf.distribute.MirroredStrategy, main.py:81)."""

    data: int = -1                     # -1 => all devices
    space: int = 1
    model: int = 1                     # tensor-parallel conv-channel sharding


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8                # global batch size
    learning_rate: float = 1e-4
    disc_learning_rate: float = 1e-4
    adam_b1: float = 0.9               # vqgan attn uses (0.5, 0.9)
    adam_b2: float = 0.999
    epochs: int = 200
    val_fraction: float = 0.1
    seed: int = 0
    dtype: str = "bfloat16"            # compute dtype; params stay float32
    replace_codebook_freq: int = 10    # epochs between unused-code replacement
    checkpoint_every: int = 1
    keep_checkpoints: int = 5
    log_every: int = 10
    mesh: MeshConfig = field(default_factory=MeshConfig)
    remat: bool = False                # jax.checkpoint the encoder/decoder
    # EMA of the trainable params, used for sampling/eval when > 0
    # (diffusion-specific; the reference never maintains sampling EMA)
    ema_decay: float = 0.0


@dataclass(frozen=True)
class DataConfig:
    """NIfTI ingest + preprocessed cache (reference: dataset_utils.py)."""

    dataset: str = "all"               # CC | NFBS | HCP | BraTS | all | all-T
    dataset_dir: str = "/data/mri"
    cache_dir: str = "./cache"
    volume_size: int = 128
    augment: bool = False
    augment_fraction: float = 0.04
    flip_chance: float = 0.6           # probability of KEEPING the original
    brightness_range: Tuple[float, float] = (0.9, 1.1)
    contrast_range: Tuple[float, float] = (0.9, 1.1)
    test_run: bool = False             # truncate to 24 files (dataset_utils.py:78-80)
    # host->device batch dtype: the cache is f16, so transferring f16 and
    # widening on device is numerically exact and halves input bandwidth
    # (PCIe on real hosts, the relay here)
    transfer_dtype: str = "float16"    # "float16" | "float32"
    # synthetic-corpus class count (ldm3d/data/synthetic.py): 2 = the
    # original healthy/tumor corpus (bit-identical); 4 adds globally
    # distinct classes so conditioning is learnable/measurable
    num_classes: int = 2


@dataclass(frozen=True)
class ExperimentConfig:
    """Top-level config: one experiment == one reference entry-point run."""

    name: str = "default"
    model: str = "vqvae"               # vqvae | vqgan | dm | conditional_dm | nsvqvae | rnsvqvae | emavqvae
    vqvae: VQVAEConfig = field(default_factory=VQVAEConfig)
    vqgan: VQGANConfig = field(default_factory=VQGANConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    ckpt_dir: str = "./checkpoints"


def replace(cfg, **kwargs):
    """dataclasses.replace that works through our frozen tree."""
    return dataclasses.replace(cfg, **kwargs)
