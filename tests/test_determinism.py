"""Bitwise run-to-run reproducibility.

The reference has no reproducibility story (unseeded tf.random in every
train_step, e.g. networks/dm3d.py:434-441, plus cuDNN nondeterminism);
here every source of randomness is a threaded PRNG key, so two runs from
the same seed must produce bit-identical metrics and parameters — a
property production debugging and A/B work rely on."""

import pytest

pytestmark = pytest.mark.slow

import jax
import numpy as np

from ldm3d.data.synthetic import synthetic_batch


def _run_vq(seed):
    from ldm3d.core.config import QuantizerConfig, TrainConfig, VQVAEConfig
    from ldm3d.train.vq_trainer import VQTrainer

    cfg = VQVAEConfig(
        in_channels=2, out_channels=2, num_channels=(4, 8),
        num_res_channels=(4, 8), num_res_layers=1,
        downsample_stride=(2, 2), downsample_kernel=(4, 4),
        upsample_stride=(2, 2), upsample_kernel=(4, 4), norm="group",
        quantizer=QuantizerConfig(kind="ema", num_embeddings=16,
                                  embedding_dim=8))
    tr = VQTrainer(cfg, TrainConfig(dtype="float32", batch_size=2))
    state = tr.init_state(jax.random.PRNGKey(seed), (2, 16, 16, 16, 2))
    vol, mask, _ = synthetic_batch(jax.random.PRNGKey(1), 2, 16)
    losses = []
    for _ in range(3):
        state, m = tr.train_step(state, vol, mask)
        losses.append(np.asarray(m["loss"]))
    return losses, jax.device_get(state.params)


def _run_dm(seed):
    from ldm3d.core.config import TrainConfig
    from ldm3d.train.dm_trainer import DiffusionTrainer
    from tests.test_dm_trainer import tiny_diffusion_cfg

    cfg = tiny_diffusion_cfg(conditional=True)
    tr = DiffusionTrainer(cfg, TrainConfig(dtype="float32", batch_size=2),
                          conditional=True)
    state = tr.init_state(jax.random.PRNGKey(seed), (2, 16, 16, 16, 1))
    vol, _, _ = synthetic_batch(jax.random.PRNGKey(1), 2, 16)
    import jax.numpy as jnp
    ctx = jnp.array([0, 1], jnp.int32)
    losses = []
    for _ in range(3):
        state, m = tr.train_step(state, vol, ctx)
        losses.append(np.asarray(m["loss"]))
    sample = tr.generate(state, jax.random.PRNGKey(7),
                         (1, 4, 4, 4, 8), context_value=1, sampler="ddim")
    return losses, np.asarray(sample)


def test_vq_training_bitwise_reproducible():
    l1, p1 = _run_vq(0)
    l2, p2 = _run_vq(0)
    np.testing.assert_array_equal(np.stack(l1), np.stack(l2))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), p1, p2)
    # and a different seed actually changes the trajectory
    l3, _ = _run_vq(123)
    assert float(l3[-1]) != float(l1[-1])


def test_dm_training_and_sampling_bitwise_reproducible():
    l1, s1 = _run_dm(0)
    l2, s2 = _run_dm(0)
    np.testing.assert_array_equal(np.stack(l1), np.stack(l2))
    np.testing.assert_array_equal(s1, s2)
