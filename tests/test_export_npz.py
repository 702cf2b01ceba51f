"""Compact f16 snapshot export/restore (ldm3d/utils/export.py) — the
durable committed-checkpoint path bench.py falls back to when the orbax
train states under runs/ are gone (VERDICT r4 next-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d.core.config import TrainConfig
from ldm3d.train.dm_trainer import DiffusionTrainer
from ldm3d.utils.export import load_meta_npz, load_state_npz, save_state_npz
from __graft_entry__ import _flagship_cfg


def _tiny_trainer(ema=0.999):
    cfg = _flagship_cfg(tiny=True)
    return DiffusionTrainer(cfg, TrainConfig(batch_size=2, dtype="float32",
                                             ema_decay=ema),
                            conditional=True)


def test_npz_roundtrip_bitwise_at_f16(tmp_path):
    trainer = _tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(3), (2, 16, 16, 16, 1))
    path = str(tmp_path / "snap.npz")
    meta = save_state_npz(path, state, {"epoch": 42, "latent_scale": 20.8,
                                        "ema_decay": 0.999})
    assert meta["num_arrays"] > 0 and "params" in meta["collections"]

    rmeta = load_meta_npz(path)
    assert rmeta["epoch"] == 42 and rmeta["latent_scale"] == 20.8

    template = trainer.init_state(jax.random.PRNGKey(9), (2, 16, 16, 16, 1))
    restored = load_state_npz(path, template)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(state.params))[0],
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(restored.params))[0]):
        assert pa == pb
        np.testing.assert_array_equal(
            np.asarray(a, np.float16), np.asarray(b, np.float16))
    # EMA subtree restored too (sampling uses it)
    na = jax.tree_util.tree_leaves(jax.device_get(state.ema_params))
    nb = jax.tree_util.tree_leaves(jax.device_get(restored.ema_params))
    for a, b in zip(na, nb):
        np.testing.assert_array_equal(np.asarray(a, np.float16),
                                      np.asarray(b, np.float16))
    # optimizer state deliberately NOT in the snapshot: template's kept
    for a, b in zip(jax.tree_util.tree_leaves(template.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_template_mismatch_raises(tmp_path):
    trainer = _tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(3), (2, 16, 16, 16, 1))
    path = str(tmp_path / "snap.npz")
    save_state_npz(path, state, {})
    # template without EMA (ema_decay=0) must refuse the EMA snapshot
    t2 = _tiny_trainer(ema=0.0)
    bad = t2.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    with pytest.raises(ValueError, match="ema"):
        load_state_npz(path, bad)


def test_restored_snapshot_samples_identically(tmp_path):
    """Sampling from the f16-restored state matches sampling from the
    f16-rounded original: the committed snapshot is the same model."""
    trainer = _tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(3), (2, 16, 16, 16, 1))
    path = str(tmp_path / "snap.npz")
    save_state_npz(path, state, {})
    template = trainer.init_state(jax.random.PRNGKey(11),
                                  (2, 16, 16, 16, 1))
    restored = load_state_npz(path, template)

    cfg = trainer.cfg
    lat = (2, cfg.latent_size, cfg.latent_size, cfg.latent_size,
           cfg.latent_channels)
    # round the original to f16 the same way the snapshot did
    f16 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x, np.float16), x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, state)
    ctx = jnp.zeros((2,), jnp.int32)
    a = trainer.generate(f16, jax.random.PRNGKey(5), lat, context_value=1,
                         sampler="ddim", sample_steps=4)
    b = trainer.generate(restored, jax.random.PRNGKey(5), lat,
                         context_value=1, sampler="ddim", sample_steps=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
