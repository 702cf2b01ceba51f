"""Sweep subsystem tests: yaml parse, expansion, config folding."""

import numpy as np

from ldm3d.core.presets import get_preset
from ldm3d.core.sweep import apply_sweep_point, expand_sweep, parse_sweep_yaml

YAML = """
program: exp_main.py
method: bayes
metric:
  name: val_loss
  goal: minimize
parameters:
  channel_list:
    values: ["(32,64,128)", "(32,64,128,256)"]
  num_embedding:
    values: [64, 512]
  embedding_dim:
    value: 256
  lr:
    value: 0.0001
  lbs:
    values: [3, 4]
  epochs:
    value: 70
"""


def test_parse_sweep_yaml():
    spec = parse_sweep_yaml(YAML)
    assert spec["method"] == "bayes"
    assert spec["metric"]["name"] == "val_loss"
    p = spec["parameters"]
    assert p["channel_list"]["values"] == [(32, 64, 128), (32, 64, 128, 256)]
    assert p["num_embedding"]["values"] == [64, 512]
    assert p["embedding_dim"]["value"] == 256
    assert p["lr"]["value"] == 0.0001


def test_expand_grid_and_random():
    spec = parse_sweep_yaml(YAML)
    full = expand_sweep(spec)                      # 2 * 2 * 2 = 8
    assert len(full) == 8
    assert all(pt["embedding_dim"] == 256 for pt in full)
    sampled = expand_sweep(spec, count=3, seed=1)
    assert len(sampled) == 3
    # deterministic
    assert expand_sweep(spec, count=3, seed=1) == sampled


def test_apply_sweep_point():
    cfg = get_preset("vqvae_b8_all")
    point = {"channel_list": (32, 64), "num_embedding": 64,
             "embedding_dim": 128, "lr": 3e-4, "lbs": 4, "epochs": 7}
    out = apply_sweep_point(cfg, point)
    assert out.vqvae.num_channels == (32, 64)
    assert out.vqvae.quantizer.num_embeddings == 64
    assert out.vqvae.quantizer.embedding_dim == 128
    assert np.isclose(out.train.learning_rate, 3e-4)
    assert out.train.batch_size == 4
    assert out.train.epochs == 7
    assert "num_embedding64" in out.name


def test_malicious_channel_list_rejected():
    """The reference eval()s channel_list (main_exp_vqgan_attn.py:71);
    ours must reject non-tuple-of-int literals."""
    import pytest
    bad = YAML.replace('"(32,64,128)"', '"(__import__,)"')
    with pytest.raises(Exception):
        parse_sweep_yaml(bad)
