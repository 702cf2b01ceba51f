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
