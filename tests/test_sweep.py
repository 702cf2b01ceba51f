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


def test_bayes_search_proposes_unique_points_and_exhausts():
    from ldm3d.core.sweep import BayesSearch
    spec = parse_sweep_yaml(YAML)
    search = BayesSearch(spec, seed=0, n_init=2)
    seen = set()
    for _ in range(8):  # grid is 2*2*2 = 8 cells
        p = search.suggest()
        assert p is not None
        assert p["embedding_dim"] == 256  # fixed params folded in
        cell = (p["channel_list"], p["num_embedding"], p["lbs"])
        assert cell not in seen
        seen.add(cell)
        search.observe(p, 1.0)
    assert search.suggest() is None  # exhausted


def test_bayes_search_concentrates_on_good_region():
    """TPE must find the optimum of a separable discrete objective in far
    fewer trials than the grid size (25 cells, budget 12)."""
    from ldm3d.core.sweep import BayesSearch
    spec = {
        "method": "bayes",
        "metric": {"name": "val_loss", "goal": "minimize"},
        "parameters": {
            "a": {"values": [0, 1, 2, 3, 4]},
            "b": {"values": [0, 1, 2, 3, 4]},
        },
    }
    def run(seed):
        search = BayesSearch(spec, seed=seed, n_init=4)
        init_vals, guided_vals = [], []
        for i in range(12):
            p = search.suggest()
            if p is None:
                break
            v = (p["a"] - 3) ** 2 + (p["b"] - 1) ** 2  # optimum at (3, 1)
            search.observe(p, v)
            (init_vals if i < 4 else guided_vals).append(v)
        best = search.best()
        return (best["a"] - 3) ** 2 + (best["b"] - 1) ** 2, init_vals, \
            guided_vals

    for seed in range(4):
        best_val, init_vals, guided_vals = run(seed)
        # within the immediate neighborhood of the optimum in 12/25 trials
        assert best_val <= 2, (seed, best_val)
        # guided proposals are better on average than the random seeding
        assert (sum(guided_vals) / len(guided_vals)
                < sum(init_vals) / len(init_vals)), seed


def test_bayes_search_maximize_goal():
    from ldm3d.core.sweep import BayesSearch
    spec = {
        "method": "bayes",
        "metric": {"name": "val_psnr", "goal": "maximize"},
        "parameters": {"a": {"values": [0, 1, 2, 3]}},
    }
    search = BayesSearch(spec, seed=0, n_init=2)
    for _ in range(4):
        p = search.suggest()
        search.observe(p, float(p["a"]))  # bigger is better
    assert search.best()["a"] == 3
