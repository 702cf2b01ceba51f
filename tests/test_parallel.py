"""Distributed-logic tests on the fake 8-device CPU mesh: mesh helpers,
batch sharding, and halo-exchange conv vs the unsharded reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ldm3d.core.config import MeshConfig
from ldm3d.parallel.halo import halo_conv3d
from ldm3d.parallel.mesh import (DATA_AXIS, SPACE_AXIS, batch_sharding,
                                 local_batch_size, make_mesh, shard_batch)


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=4, space=2))
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[SPACE_AXIS] == 2
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=3, space=2))


def test_local_batch_size():
    mesh = make_mesh(MeshConfig(data=8, space=1))
    assert local_batch_size(mesh, 16) == 2
    with pytest.raises(ValueError):
        local_batch_size(mesh, 9)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(MeshConfig(data=4, space=2))
    vol = jnp.zeros((4, 8, 8, 8, 1))
    (sharded,) = shard_batch(mesh, (vol,), spatial_axis=3)
    assert sharded.sharding.spec == P(DATA_AXIS, None, None, SPACE_AXIS, None)


def _ref_conv(x, kernel, bias, stride):
    out = lax.conv_general_dilated(
        x, kernel, window_strides=(stride,) * 3, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + bias if bias is not None else out


@pytest.mark.parametrize("kernel,stride", [(3, 1), (4, 2), (1, 1), (4, 1)])
def test_halo_conv_matches_unsharded(kernel, stride):
    """Spatially-sharded conv via ppermute halos == unsharded SAME conv."""
    mesh = make_mesh(MeshConfig(data=1, space=8))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 8, 8, 3))
    k = jax.random.normal(jax.random.fold_in(rng, 1),
                          (kernel, kernel, kernel, 3, 5)) * 0.1
    b = jax.random.normal(jax.random.fold_in(rng, 2), (5,)) * 0.1

    ref = _ref_conv(x, k, b, stride)

    spec = P(None, SPACE_AXIS, None, None, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    out = halo_conv3d(xs, k, b, stride, mesh, shard_axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert out.sharding.spec == spec


def test_halo_conv_inside_jit():
    mesh = make_mesh(MeshConfig(data=1, space=8))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 4, 4, 2))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 2, 2)) * 0.1
    spec = P(None, SPACE_AXIS, None, None, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))

    @jax.jit
    def f(x, k):
        return halo_conv3d(x, k, None, 1, mesh, shard_axis=1)

    out = f(xs, k)
    ref = _ref_conv(x, k, None, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vq_train_step_data_space_mesh():
    """Full VQ-VAE train step over a 4x2 data x space mesh: batch sharded
    over 'data', volume depth over 'space' (XLA SPMD inserts the halo
    exchanges and gradient all-reduce). Loss must match the same step on a
    pure data mesh."""
    from ldm3d.core.config import (QuantizerConfig, TrainConfig, VQVAEConfig,
                                   replace)
    from ldm3d.train.vq_trainer import VQTrainer

    vq = VQVAEConfig(
        in_channels=2, out_channels=2, num_res_layers=1,
        num_channels=(4, 8), num_res_channels=(4, 8),
        downsample_stride=(2, 2), downsample_kernel=(4, 4),
        upsample_stride=(2, 2), upsample_kernel=(4, 4),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    tcfg = TrainConfig(batch_size=8, dtype="float32", seed=3)
    vol = jax.random.uniform(jax.random.PRNGKey(5), (8, 16, 16, 16, 1))
    mask = jnp.ones_like(vol)

    losses = {}
    for name, mcfg, spatial in (("data", MeshConfig(data=4, space=2), 3),
                                ("flat", MeshConfig(data=8, space=1), None)):
        mesh = make_mesh(mcfg)
        tr = VQTrainer(vq, tcfg, mesh=mesh)
        state = tr.init_state(jax.random.PRNGKey(0), (8, 16, 16, 16, 2))
        v, m = shard_batch(mesh, (vol, mask), spatial_axis=spatial)
        state, metrics = tr.train_step(state, v, m)
        state, metrics = tr.train_step(state, v, m)
        losses[name] = float(metrics["loss"])
        assert np.isfinite(losses[name])
    assert np.isclose(losses["data"], losses["flat"], rtol=1e-4)


def test_make_mesh_clamps_data_axis_to_batch():
    # a fixed-batch preset (bs=2) on an 8-device host must get a feasible
    # DP degree, not an unshardable P('data') placement — loudly, since
    # the submesh idles devices
    with pytest.warns(UserWarning, match="submesh"):
        mesh = make_mesh(MeshConfig(data=-1, space=1), batch_size=2)
    assert mesh.shape[DATA_AXIS] == 2
    mesh = make_mesh(MeshConfig(data=-1, space=1), batch_size=16)
    assert mesh.shape[DATA_AXIS] == 8
    # explicit data axis is honored verbatim (and still validated)
    mesh = make_mesh(MeshConfig(data=8, space=1), batch_size=2)
    assert mesh.shape[DATA_AXIS] == 8


def test_dataloader_yields_mesh_sharded_batches(tmp_path):
    from ldm3d.core.config import DataConfig
    from ldm3d.data.pipeline import (DataLoader, VolumeCache,
                                     write_synthetic_cache)
    write_synthetic_cache(str(tmp_path), 8, 16, seed=0)
    cache = VolumeCache(str(tmp_path))
    mesh = make_mesh(MeshConfig(data=4, space=2))
    loader = DataLoader(cache, 4, DataConfig(volume_size=16), train=True,
                        mesh=mesh, spatial_axis=3)
    vol, mask, ctx = next(iter(loader))
    assert vol.sharding.spec == P(DATA_AXIS, None, None, SPACE_AXIS, None)
    assert mask.sharding.spec == P(DATA_AXIS, None, None, SPACE_AXIS, None)
    assert ctx.sharding.spec == P(DATA_AXIS)
    assert len(vol.sharding.device_set) == 8
    assert vol.dtype == jnp.float32


def test_make_mesh_submesh_raises_multiprocess(monkeypatch):
    # a batch-clamped submesh can exclude whole hosts in multi-process
    # mode (their addressable-device maps come back empty) — refuse
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="exclude"):
        make_mesh(MeshConfig(data=-1, space=1), batch_size=2)


def test_distributed_initialize_rejects_one_process_coordinator():
    from ldm3d.parallel.distributed import initialize
    with pytest.raises(ValueError, match="num_processes"):
        initialize(coordinator_address="localhost:9999", num_processes=1)
