"""Shape, overfit, and multi-device tests for the MONAI-style VQ-VAE
(SURVEY.md §4: shape tests per config + CPU-runnable overfit test +
fake-mesh distributed test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d.core.config import MeshConfig, QuantizerConfig, TrainConfig, VQVAEConfig
from ldm3d.data.synthetic import synthetic_batch
from ldm3d.parallel.mesh import make_mesh, shard_batch
from ldm3d.train.vq_trainer import VQTrainer


def tiny_cfg(levels=2, quantizer_kind="ste"):
    ch = tuple(4 * 2 ** i for i in range(levels))
    return VQVAEConfig(
        in_channels=2, out_channels=2,
        num_channels=ch, num_res_channels=ch, num_res_layers=1,
        downsample_stride=(2,) * levels, downsample_kernel=(4,) * levels,
        upsample_stride=(2,) * levels, upsample_kernel=(4,) * levels,
        quantizer=QuantizerConfig(kind=quantizer_kind, num_embeddings=16,
                                  embedding_dim=8))


def train_cfg(**kw):
    kw.setdefault("dtype", "float32")
    kw.setdefault("learning_rate", 3e-3)
    return TrainConfig(**kw)


def test_vqvae_shapes_and_latent_factor():
    cfg = tiny_cfg(levels=2)
    trainer = VQTrainer(cfg, train_cfg())
    x = jnp.zeros((1, 16, 16, 16, 2))
    var = trainer.model.init({"params": jax.random.PRNGKey(0)}, x,
                             training=False)
    recon, aux = trainer.model.apply(var, x, training=False)
    assert recon.shape == (1, 16, 16, 16, 2)
    z = trainer.model.apply(var, x, training=False, method="encode")
    assert z.shape == (1, 4, 4, 4, 8)  # 16 / 2^2, embedding_dim channels


def test_vqvae_icnr_kernel_resize_builds():
    cfg = tiny_cfg(levels=2)
    cfg = cfg.__class__(**{**cfg.__dict__, "kernel_resize": True})
    trainer = VQTrainer(cfg, train_cfg())
    x = jnp.zeros((1, 8, 8, 8, 2))
    var = trainer.model.init({"params": jax.random.PRNGKey(0)}, x,
                             training=False)
    recon, _ = trainer.model.apply(var, x, training=False)
    assert recon.shape == x.shape


def test_vqvae_overfits_single_volume():
    """BASELINE.json config #1: recon on a small synthetic volume must
    overfit (loss drops by >5x in a few dozen steps)."""
    cfg = tiny_cfg(levels=2)
    trainer = VQTrainer(cfg, train_cfg())
    vol, mask, _ = synthetic_batch(jax.random.PRNGKey(0), 1, 16)
    state = trainer.init_state(jax.random.PRNGKey(1), (1, 16, 16, 16, 2))

    first = None
    for i in range(80):
        state, metrics = trainer.train_step(state, vol, mask)
        if first is None:
            first = float(metrics["reconst_loss"])
    last = float(metrics["reconst_loss"])
    assert np.isfinite(last)
    assert last < first / 5, (first, last)


def test_vqvae_eval_step_metrics():
    cfg = tiny_cfg(levels=2)
    trainer = VQTrainer(cfg, train_cfg())
    vol, mask, _ = synthetic_batch(jax.random.PRNGKey(0), 2, 16)
    state = trainer.init_state(jax.random.PRNGKey(1), (2, 16, 16, 16, 2))
    m = trainer.eval_step(state, vol, mask)
    for key in ("loss", "reconst_loss", "quantize_loss", "ssim", "psnr"):
        assert np.isfinite(float(m[key])), key
    assert -1.0 <= float(m["ssim"]) <= 1.0


def test_vqvae_data_parallel_8_devices():
    """DP over the fake 8-device CPU mesh: state replicated, batch sharded,
    one jitted step (replaces MirroredStrategy, SURVEY.md §2.6)."""
    assert jax.device_count() == 8
    mesh = make_mesh(MeshConfig(data=8, space=1))
    cfg = tiny_cfg(levels=2)
    trainer = VQTrainer(cfg, train_cfg(batch_size=8), mesh=mesh)
    vol, mask, _ = synthetic_batch(jax.random.PRNGKey(0), 8, 16)
    vol, mask = shard_batch(mesh, (vol, mask))
    state = trainer.init_state(jax.random.PRNGKey(1), (8, 16, 16, 16, 2))
    state, metrics = trainer.train_step(state, vol, mask)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated across the mesh
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_remat_modes_same_loss_and_grads():
    """remat off / full / conv-saveable policy are pure memory/FLOPs
    trades — loss and gradients must agree to float tolerance
    (ldm3d/models/vqvae.py::conv_saveable_policy)."""
    from ldm3d.core.config import replace
    x = synthetic_batch(jax.random.PRNGKey(3), 2, 16)
    vol, mask = x[0], x[1]
    results = {}
    for name, kw in {"off": dict(remat=False),
                     "full": dict(remat=True, remat_policy="full"),
                     "conv": dict(remat=True, remat_policy="conv")}.items():
        cfg = replace(tiny_cfg(levels=2), **kw)
        trainer = VQTrainer(cfg, train_cfg())
        state = trainer.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 2))
        state, metrics = trainer.train_step(state, vol, mask)
        results[name] = (float(metrics["loss"]),
                         jax.device_get(state.params))
    for name in ("full", "conv"):
        assert np.isclose(results[name][0], results["off"][0],
                          rtol=1e-5), name
        flat_a = jax.tree_util.tree_leaves(results[name][1])
        flat_b = jax.tree_util.tree_leaves(results["off"][1])
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_replace_unused_codebooks_roundtrip():
    cfg = tiny_cfg(levels=2)
    trainer = VQTrainer(cfg, train_cfg())
    vol, mask, _ = synthetic_batch(jax.random.PRNGKey(0), 1, 16)
    state = trainer.init_state(jax.random.PRNGKey(1), (1, 16, 16, 16, 2))
    state, _ = trainer.train_step(state, vol, mask)
    state2, n = trainer.replace_unused(state, num_batches=1,
                                       rng=jax.random.PRNGKey(2))
    assert int(jnp.sum(state2.vq_stats["quantizer"]["codebooks_used"])) == 0
    assert 0 <= int(n) <= cfg.quantizer.num_embeddings


def test_vq_trainer_single_channel_family():
    """NSVQ/RNSVQ/EMA-family configs are 1-channel: the trainer must feed
    the bare volume (reference nsvqvae.py trains without the mask channel,
    main_nsvqvae.py:190-215)."""
    from ldm3d.core.config import QuantizerConfig, TrainConfig, VQVAEConfig
    from ldm3d.train.vq_trainer import VQTrainer

    vq = VQVAEConfig(
        in_channels=1, out_channels=1, num_res_layers=1,
        num_channels=(4, 8), num_res_channels=(4, 8),
        downsample_stride=(2, 2), downsample_kernel=(4, 4),
        upsample_stride=(2, 2), upsample_kernel=(4, 4),
        quantizer=QuantizerConfig(kind="nsvq", num_embeddings=16,
                                  embedding_dim=8,
                                  quantize_loss_weight=1e2))
    tr = VQTrainer(vq, TrainConfig(batch_size=2, dtype="float32"))
    state = tr.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    vol = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
    mask = jnp.ones_like(vol)
    state, metrics = tr.train_step(state, vol, mask)   # mask ignored
    assert np.isfinite(metrics["loss"])
    recon, _ = tr.reconstruct(state, vol, mask)
    assert recon.shape == (2, 16, 16, 16, 1)


def test_recalibrate_batch_stats_forward_only():
    """BN recalibration: forward passes move running stats onto the data
    distribution without touching params/codebook/optimizer; eval loss on
    that distribution must not get worse."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldm3d.core.config import QuantizerConfig, TrainConfig, VQVAEConfig
    from ldm3d.train.vq_trainer import VQTrainer

    cfg = VQVAEConfig(
        in_channels=2, out_channels=2, num_res_layers=1, norm="batch",
        num_channels=(4, 8), num_res_channels=(4, 8),
        downsample_stride=(2, 2), downsample_kernel=(4, 4),
        upsample_stride=(2, 2), upsample_kernel=(4, 4),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    tr = VQTrainer(cfg, TrainConfig(batch_size=4, dtype="float32"))
    state = tr.init_state(jax.random.PRNGKey(0), (4, 16, 16, 16, 2))

    vol = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 16, 1))
    mask = jnp.ones_like(vol)
    for _ in range(3):
        state, _ = tr.train_step(state, vol, mask)

    # eval on a shifted distribution the running stats have never seen
    vol2 = vol * 3.0 + 1.0
    before = float(tr.eval_step(state, vol2, mask)["loss"])
    loader = [(vol2, mask, jnp.zeros((4,), jnp.int32))] * 5
    state2 = tr.recalibrate_batch_stats(state, loader, passes=30)

    assert jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: jnp.array_equal(a, b), state.params, state2.params))
    assert not jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: jnp.array_equal(a, b),
        state.batch_stats, state2.batch_stats))
    after = float(tr.eval_step(state2, vol2, mask)["loss"])
    assert np.isfinite(after) and after <= before * 1.01
