"""Shape/forward tests for the remaining model families of the inventory:
legacy keras-tutorial VQ-VAE, EMA skip-VQVAE + generic U-Net, and the
VQ-GAN baseline/gnorm/stride architecture variants (SURVEY.md §2.3)."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d.core.config import DiscriminatorConfig, QuantizerConfig, VQVAEConfig
from ldm3d.models.emavqvae import EMAVQVAE3D, UNet3DSegment
from ldm3d.models.vqgan import Discriminator3D, VQGANAutoencoder
from ldm3d.models.vqvae_legacy import LegacyVQVAE
from ldm3d.models.vqvae_legacy import test_loss as legacy_test_loss


@pytest.mark.parametrize("mode,down", [(1, 3), (1, 2), (2, 3)])
def test_legacy_vqvae_shapes(mode, down):
    m = LegacyVQVAE(latent_dim=8, num_embeddings=16, mode=mode, down=down,
                    dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1))
    var = m.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    recon, aux = m.apply(var, x, training=False)
    assert recon.shape == x.shape
    assert np.isfinite(float(aux.loss))


def test_legacy_test_loss_normalization():
    x = jnp.ones((2, 4, 4, 4, 1))
    r = jnp.zeros_like(x)
    assert np.isclose(float(legacy_test_loss(x, r, train_variance=0.5)), 2.0)


def test_emavqvae_skip_model():
    m = EMAVQVAE3D(num_channels=1, num_filters=4, embedding_dim=8,
                   num_embeddings=16, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1))
    var = m.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    out, updates = m.apply(var, x, training=True, mutable=["vq_stats",
                                                           "batch_stats"])
    assert out["x_out"].shape == x.shape
    assert np.isfinite(float(out["vq_loss"]))
    assert float(out["perplexity"]) >= 1.0


def test_unet3d_segment():
    m = UNet3DSegment(num_channels=1, num_filters=2, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 1))
    var = m.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    out = m.apply(var, x, training=False)
    assert out["x_out"].shape == x.shape


@pytest.mark.parametrize("arch", ["attn_cp", "monai", "stride", "attn"])
def test_vqgan_autoencoder_arch_variants(arch):
    cfg = VQVAEConfig(
        in_channels=2, out_channels=2, num_channels=(4, 8),
        num_res_channels=(4, 8), num_res_layers=1,
        downsample_stride=(1, 2) if arch == "attn_cp" else (2, 2),
        downsample_kernel=(3, 4) if arch == "attn_cp" else (4, 4),
        upsample_stride=(1, 2) if arch == "attn_cp" else (2, 2),
        upsample_kernel=(3, 4) if arch == "attn_cp" else (4, 4),
        norm="group" if arch != "monai" else "batch", arch=arch,
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    m = VQGANAutoencoder(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 16, 2))
    var = m.init({"params": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)}, x, training=False)
    recon, aux = m.apply(var, x, training=False)
    assert recon.shape == x.shape, arch


def test_discriminator_dense_head():
    d = Discriminator3D(DiscriminatorConfig(num_channels=(4, 8),
                                            head="dense"),
                        dtype=jnp.float32)
    x = jnp.zeros((2, 16, 16, 16, 1))
    var = d.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    logits, feats = d.apply(var, x, training=False)
    assert logits.shape == (2, 1)  # dense head collapses patches


def test_all_presets_construct():
    from ldm3d.core.presets import get_preset, list_presets
    names = list_presets()
    assert {"vqvae_b8_all", "vqgan_attn", "vqgan_baseline", "vqgan_gnorm",
            "vqgan_stride", "dm3d", "conditional_dm3d", "nsvqvae",
            "rnsvqvae", "emavqvae", "smoke"} <= set(names)
    for n in names:
        cfg = get_preset(n)
        assert cfg.name == n or n == "smoke"


def test_legacy_trainer_via_family_config():
    """The legacy functional VQ-VAE trains through the standard VQTrainer
    (reference selects it via --vqvae_mode, vqvae3d.py:183-188)."""
    import jax.numpy as jnp

    from ldm3d.core.config import (QuantizerConfig, TrainConfig, VQVAEConfig,
                                   replace)
    from ldm3d.train.vq_trainer import VQTrainer

    vq = VQVAEConfig(
        in_channels=1, out_channels=1, family="legacy", legacy_mode=2,
        legacy_down=2,
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    tr = VQTrainer(vq, TrainConfig(batch_size=2, dtype="float32"))
    state = tr.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    vol = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
    mask = jnp.ones_like(vol)
    l0 = None
    for i in range(4):
        state, metrics = tr.train_step(state, vol, mask)
        l0 = l0 if l0 is not None else float(metrics["loss"])
    assert float(metrics["loss"]) < l0
    recon, _ = tr.reconstruct(state, vol, mask)
    assert recon.shape == (2, 16, 16, 16, 1)


def test_ema_skip_trainer_via_family_config():
    """The skip-connection EMA VQ-VAE (reference emavqvae.py, whose main is
    empty upstream) trains through the standard VQTrainer."""
    import jax.numpy as jnp

    from ldm3d.core.config import (QuantizerConfig, TrainConfig, VQVAEConfig,
                                   replace)
    from ldm3d.train.vq_trainer import VQTrainer

    vq = VQVAEConfig(
        in_channels=1, out_channels=1, family="ema_skip",
        num_channels=(4,), num_res_channels=(4,),
        downsample_stride=(2,), downsample_kernel=(4,),
        upsample_stride=(2,), upsample_kernel=(4,),
        quantizer=QuantizerConfig(kind="ema_sonnet", num_embeddings=16,
                                  embedding_dim=8, commitment_cost=0.25))
    tr = VQTrainer(vq, TrainConfig(batch_size=2, dtype="float32",
                                   learning_rate=1e-3))
    state = tr.init_state(jax.random.PRNGKey(0), (2, 32, 32, 32, 1))
    vol = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 32, 1))
    mask = jnp.ones_like(vol)
    for _ in range(3):
        state, metrics = tr.train_step(state, vol, mask)
    assert np.isfinite(float(metrics["loss"]))
    recon, aux = tr.reconstruct(state, vol, mask)
    assert recon.shape == (2, 32, 32, 32, 1)
    assert float(aux.perplexity) >= 1.0  # >=1 by definition (may collapse
    # to a single code after 3 tiny steps)


@pytest.mark.parametrize("arch", ["monai", "stride"])
def test_prelu_activation_representable(arch):
    # reference networks/vqgan.py:650-652: the VQGAN encoder/decoder default
    # activation is a learnable PReLU; VERDICT r1 #17 flagged it as
    # unrepresentable (get_act had no "prelu" and the preset carried dead
    # code). act="prelu" must now create learnable alpha params.
    cfg = VQVAEConfig(
        in_channels=2, out_channels=2, num_channels=(4, 8),
        num_res_channels=(4, 8), num_res_layers=1, act="prelu",
        norm="batch" if arch == "monai" else "group", arch=arch,
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    m = VQGANAutoencoder(cfg, dtype=jnp.float32)
    x = jnp.full((1, 16, 16, 16, 2), -1.0)
    var = m.init({"params": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)}, x, training=False)
    flat = jax.tree_util.tree_leaves_with_path(var["params"])
    alphas = [p for p, _ in flat if any(
        getattr(k, "key", "") in ("act1", "output_act") or
        str(getattr(k, "key", "")).startswith("act_") for k in p)]
    assert alphas, "act='prelu' produced no learnable alpha parameters"
    recon, _ = m.apply(var, x, training=False)
    assert recon.shape == x.shape


def test_vqgan_baseline_preset_uses_prelu():
    from ldm3d.core.presets import get_preset
    assert get_preset("vqgan_baseline").vqgan.ae.act == "prelu"
