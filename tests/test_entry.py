"""Driver-entry consistency tests.

`__graft_entry__.entry()` is compile-checked by the driver on the real
chip; these tests catch init/apply shape mismatches cheaply on CPU via
`jax.eval_shape` (the conditional U-Net's ContextMLP params depend on the
latent spatial size, so an init at the wrong volume size fails only at
apply time — exactly the class of bug this guards against).
"""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

import __graft_entry__ as graft


def test_entry_shapes_consistent():
    from ldm3d.models.unet3d import UNet3D

    cfg = graft._flagship_cfg()
    model = UNet3D(cfg.unet, out_channels=cfg.latent_channels,
                   dtype=jnp.bfloat16)
    lat = (1, cfg.latent_size, cfg.latent_size, cfg.latent_size,
           cfg.latent_channels)
    x = jax.ShapeDtypeStruct(lat, jnp.bfloat16)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    c = jax.ShapeDtypeStruct((1,), jnp.int32)
    variables = jax.eval_shape(
        lambda r, x, t, c: model.init(r, x, t, c, training=False),
        jax.random.PRNGKey(0), x, t, c)
    out = jax.eval_shape(
        lambda v, x, t, c: model.apply(v, x, t, c, training=False),
        variables, x, t, c)
    assert out.shape == lat


def test_bench_trainer_shapes_consistent():
    """bench.py inits the full DiffusionTrainer state at the image shape and
    then samples at the latent shape — abstractly verify the two agree."""
    from ldm3d.core.config import TrainConfig
    from ldm3d.train.dm_trainer import DiffusionTrainer

    cfg = graft._flagship_cfg()
    trainer = DiffusionTrainer(cfg, TrainConfig(batch_size=1),
                               conditional=True)
    img = jax.ShapeDtypeStruct((1, 128, 128, 128, 1), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    variables = jax.eval_shape(
        lambda r, x, t: trainer.model.init(
            {"params": r, "noise": r}, x, t, t, method="init_all"),
        jax.random.PRNGKey(0), img, t)
    lat = (1, cfg.latent_size, cfg.latent_size, cfg.latent_size,
           cfg.latent_channels)
    x = jax.ShapeDtypeStruct(lat, jnp.bfloat16)
    out = jax.eval_shape(
        lambda v, x, t: trainer.model.apply(v, x, t, t, training=False,
                                            method="denoise"),
        variables, x, t)
    assert out.shape == lat


def test_dryrun_multichip_entry():
    graft.dryrun_multichip(8)
