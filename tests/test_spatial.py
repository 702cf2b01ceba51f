"""Spatial parallelism in the PRODUCTION model path (VERDICT r2 next-1).

Round-2 left `ldm3d/parallel/halo.py` as a tested library nobody called;
these tests pin the wired path: trainers activate
`ldm3d.parallel.spatial.spatial_sharding`, model code pins every conv
activation's depth axis to the 'space' mesh axis, and the compiled step
(a) matches the unsharded step numerically, (b) contains collective-permute
halo exchanges rather than all-gathers of the sharded axis, and (c) uses
materially less per-device activation memory than space=1.
"""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d.core.config import MeshConfig, TrainConfig
from ldm3d.parallel.mesh import make_mesh, shard_batch
from ldm3d.parallel.spatial import (shard_spatial, spatial_sharding,
                                    with_spatial)


def _mesh(data, space, model=1):
    n = data * space * model
    return make_mesh(MeshConfig(data=data, space=space, model=model),
                     devices=jax.devices()[:n])


def test_shard_spatial_noop_outside_context():
    x = jnp.ones((2, 8, 8, 8, 3))
    assert shard_spatial(x) is x


def test_shard_spatial_skips_indivisible_shapes():
    mesh = _mesh(2, 4)
    with spatial_sharding(mesh):
        # depth 6 not divisible by space=4 -> untouched
        x = jnp.ones((2, 8, 8, 6, 3))
        assert shard_spatial(x) is x


def test_shard_spatial_constrains_depth_axis():
    mesh = _mesh(2, 4)

    @jax.jit
    def f(x):
        with spatial_sharding(mesh):
            return shard_spatial(x) * 2.0

    out = f(jnp.ones((2, 8, 8, 8, 3)))
    spec = out.sharding.spec
    # trailing Nones are canonicalized away by jax
    assert tuple(spec)[:4] == ("data", None, None, "space")


def _vq_trainer(mesh, batch):
    from ldm3d.core.config import QuantizerConfig, VQVAEConfig
    from ldm3d.train.vq_trainer import VQTrainer

    cfg = VQVAEConfig(
        in_channels=2, out_channels=1,
        num_channels=(4, 8), num_res_channels=(4, 8), num_res_layers=1,
        downsample_stride=(2, 2), downsample_kernel=(4, 4),
        upsample_stride=(2, 2), upsample_kernel=(4, 4), norm="group",
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    return VQTrainer(cfg, TrainConfig(batch_size=batch, dtype="float32"),
                     mesh=mesh)


def _batch(batch, size=16):
    vol = jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size,
                                                     size, 1))
    mask = jnp.ones_like(vol)
    return vol, mask


def test_vq_step_space2_matches_space1():
    """Same init, same batch: the spatially-sharded step must reproduce
    the unsharded (pure-DP) step's loss AND loss gradients. (Post-Adam
    params are not compared: near-zero-gradient biases get sign-noise
    updates amplified to ±lr by the second-moment normalization, which
    is optimizer sensitivity, not a sharding defect.)"""
    batch = 4
    vol, mask = _batch(batch)

    results = []
    for data, space in ((2, 1), (2, 2)):
        mesh = _mesh(data, space)
        tr = _vq_trainer(mesh, batch)
        state = tr.init_state(jax.random.PRNGKey(0), (batch, 16, 16, 16, 2))
        v, m = shard_batch(mesh, (vol, mask),
                           spatial_axis=3 if space > 1 else None)

        def loss_fn(params):
            loss, _ = tr._loss_fn(params, state, v, m, {}, False)
            return loss

        grad_fn = jax.jit(with_spatial(tr.mesh, jax.value_and_grad(loss_fn)))
        loss, grads = jax.device_get(grad_fn(state.params))
        results.append((float(loss), grads))

    (loss1, grads1), (loss2, grads2) = results
    assert loss2 == pytest.approx(loss1, rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(grads1),
                    jax.tree_util.tree_leaves(grads2)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_vq_step_space2_hlo_has_collective_permute():
    batch = 4
    mesh = _mesh(2, 2)
    tr = _vq_trainer(mesh, batch)
    state = tr.init_state(jax.random.PRNGKey(0), (batch, 16, 16, 16, 2))
    vol, mask = _batch(batch)
    vol, mask = shard_batch(mesh, (vol, mask), spatial_axis=3)
    compiled = tr._build_train_step(state).lower(state, vol, mask).compile()
    txt = compiled.as_text()
    assert txt.count("collective-permute") > 0, \
        "no collective-permute: GSPMD is not halo-exchanging the conv"


def test_vq_step_space2_uses_less_temp_memory():
    """Per-device activation (temp) memory at space=2 must be materially
    below space=1 at the same data-parallel degree and global batch — the
    memory-scaling benefit that motivates SP (SURVEY.md §2.6)."""
    batch = 4
    sizes = {}
    for space in (1, 2):
        mesh = _mesh(2, space)
        tr = _vq_trainer(mesh, batch)
        state = tr.init_state(jax.random.PRNGKey(0), (batch, 16, 16, 16, 2))
        vol, mask = _batch(batch)
        vol, mask = shard_batch(mesh, (vol, mask),
                                spatial_axis=3 if space > 1 else None)
        compiled = (tr._build_train_step(state)
                    .lower(state, vol, mask).compile())
        mem = compiled.memory_analysis()
        if mem is None or not getattr(mem, "temp_size_in_bytes", 0):
            pytest.skip("backend reports no memory analysis")
        sizes[space] = mem.temp_size_in_bytes
    ratio = sizes[2] / sizes[1]
    assert ratio < 0.9, f"space=2 temp {sizes[2]} vs space=1 {sizes[1]} " \
                        f"(ratio {ratio:.2f})"


def test_dm_step_space2_matches_space1():
    from ldm3d.train.dm_trainer import DiffusionTrainer
    from tests.test_dm_trainer import tiny_diffusion_cfg

    batch = 4
    cfg = tiny_diffusion_cfg(conditional=True)
    vol = jax.random.uniform(jax.random.PRNGKey(1), (batch, 16, 16, 16, 1))
    ctx = jnp.array([0, 1, 0, 1], jnp.int32)

    losses = []
    for data, space in ((2, 1), (2, 2)):
        mesh = _mesh(data, space)
        tr = DiffusionTrainer(cfg, TrainConfig(batch_size=batch,
                                               dtype="float32"),
                              mesh=mesh, conditional=True)
        state = tr.init_state(jax.random.PRNGKey(0), (batch, 16, 16, 16, 1))
        v, c = shard_batch(mesh, (vol, ctx),
                           spatial_axis=3 if space > 1 else None)
        _, metrics = tr.train_step(state, v, c)
        losses.append(float(metrics["loss"]))
    assert losses[1] == pytest.approx(losses[0], rel=1e-4)


def test_gan_step_space2_runs():
    """The fused two-optimizer GAN step compiles and runs on a data x space
    mesh (the discriminators/LPIPS see full volumes via GSPMD resharding;
    the autoencoder convs stay spatially sharded)."""
    from ldm3d.train.gan_trainer import GANTrainer
    from tests.test_vqgan import tiny_gan_cfg

    batch = 4
    mesh = _mesh(2, 2)
    cfg = tiny_gan_cfg()
    tr = GANTrainer(cfg, TrainConfig(batch_size=batch, dtype="float32"),
                    mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0), (batch, 16, 16, 16, 2))
    vol, mask = _batch(batch)
    vol, mask = shard_batch(mesh, (vol, mask), spatial_axis=3)
    state, metrics = tr.train_step(state, vol, mask)
    assert np.isfinite(float(metrics["reconst_loss"]))


def test_with_spatial_restores_context():
    mesh = _mesh(2, 2)

    def body():
        from ldm3d.parallel.spatial import active_mesh
        assert active_mesh() is mesh
        return 1

    assert with_spatial(mesh, body)() == 1
    from ldm3d.parallel.spatial import active_mesh
    assert active_mesh() is None
