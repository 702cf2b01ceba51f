"""LPIPS weight conversion: torch-layout state dict -> .npz -> param tree
compatible with ldm3d.models.lpips.LPIPS."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tools")

from export_lpips_weights import (_BLOCKS, _TORCH_CONV_IDX, convert_lins,
                                  convert_vgg)
from ldm3d.models.lpips import LPIPS, load_lpips_params


def _fake_torch_state():
    rng = np.random.default_rng(0)
    state = {}
    cin = 3
    li = 0
    for block, n_convs in _BLOCKS:
        ch = [64, 128, 256, 512, 512][block - 1]
        for _ in range(n_convs):
            idx = _TORCH_CONV_IDX[li]
            li += 1
            state[f"features.{idx}.weight"] = rng.normal(
                size=(ch, cin, 3, 3)).astype(np.float32) * 0.01
            state[f"features.{idx}.bias"] = np.zeros(ch, np.float32)
            cin = ch
    lins = {}
    for i, ch in enumerate([64, 128, 256, 512, 512]):
        lins[f"lin{i}.model.1.weight"] = np.abs(rng.normal(
            size=(1, ch, 1, 1))).astype(np.float32)
    return state, lins


def test_converted_weights_load_into_lpips(tmp_path):
    vgg_sd, lin_sd = _fake_torch_state()
    flat = {**convert_vgg(vgg_sd), **convert_lins(lin_sd)}
    out = tmp_path / "lpips.npz"
    np.savez(out, **flat)

    params = load_lpips_params(str(out))
    assert params is not None

    model = LPIPS()
    x = jnp.ones((1, 32, 32, 3))
    init = model.init(jax.random.PRNGKey(0), x, x)
    # converted tree must exactly match the module's parameter structure
    assert (jax.tree_util.tree_structure(init["params"])
            == jax.tree_util.tree_structure(params))
    shapes_ok = jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, init["params"], params)
    assert all(jax.tree_util.tree_leaves(shapes_ok))

    d_same = model.apply({"params": params}, x, x)
    d_diff = model.apply({"params": params}, x, jnp.zeros_like(x))
    assert float(d_same[0]) < 1e-6
    assert float(d_diff[0]) > float(d_same[0])
