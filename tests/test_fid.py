"""Latent-space sample-fidelity metrics (ldm3d/ops/fid.py) — the
quantitative measurement the reference lacks (its only sample "eval" saves
10 volumes for eyeballing, reference networks/dm3d.py:534-545)."""

import jax
import numpy as np
import pytest

from ldm3d.ops.fid import (frechet_distance, kernel_mmd, latent_fidelity,
                           pool_latent_features)


def gaussian(rng, n, d, mu=0.0, sigma=1.0):
    return rng.standard_normal((n, d)) * sigma + mu


def test_frechet_identical_distribution_near_zero():
    rng = np.random.default_rng(0)
    a = gaussian(rng, 500, 8)
    b = gaussian(rng, 500, 8)
    assert frechet_distance(a, b) < 0.5
    assert abs(frechet_distance(a, a)) < 1e-8


def test_frechet_analytic_mean_shift():
    """For equal covariances, FID reduces to |mu_a - mu_b|^2: two
    isotropic unit Gaussians shifted by delta along each of d axes give
    d * delta^2."""
    rng = np.random.default_rng(1)
    d, delta = 4, 3.0
    a = gaussian(rng, 4000, d)
    b = gaussian(rng, 4000, d, mu=delta)
    expected = d * delta ** 2
    assert frechet_distance(a, b) == pytest.approx(expected, rel=0.1)


def test_frechet_scale_sensitivity():
    """FID between N(0, I) and N(0, s^2 I) in d dims is d*(1-s)^2."""
    rng = np.random.default_rng(2)
    d, s = 6, 2.0
    a = gaussian(rng, 8000, d)
    b = gaussian(rng, 8000, d, sigma=s)
    assert frechet_distance(a, b) == pytest.approx(d * (1 - s) ** 2, rel=0.15)


def test_mmd_orders_distances():
    rng = np.random.default_rng(3)
    a = gaussian(rng, 300, 8)
    same = kernel_mmd(a, gaussian(rng, 300, 8))
    near = kernel_mmd(a, gaussian(rng, 300, 8, mu=0.5))
    far = kernel_mmd(a, gaussian(rng, 300, 8, mu=3.0))
    assert abs(same) < 0.05
    assert same < near < far


def test_pool_latent_features_shape_and_values():
    lat = np.ones((3, 4, 4, 4, 5), np.float32)
    f = pool_latent_features(lat)
    assert f.shape == (3, 10)  # mean ++ std per channel
    np.testing.assert_allclose(f[:, :5], 1.0)   # means
    np.testing.assert_allclose(f[:, 5:], 0.0)   # stds of constant field


def test_latent_fidelity_reports_counts():
    rng = np.random.default_rng(4)
    out = latent_fidelity(gaussian(rng, 64, 6), gaussian(rng, 32, 6))
    assert set(out) == {"latent_fid", "latent_mmd", "n_real", "n_gen"}
    assert out["n_real"] == 64 and out["n_gen"] == 32


def test_trainer_fidelity_eval_end_to_end():
    """latent_features + fidelity_eval on the tiny conditional DM: scores
    are finite, counts are as requested, and an untrained sampler scores
    measurably worse against real features than the real features score
    against themselves."""
    from ldm3d.train.dm_trainer import DiffusionTrainer
    from tests.test_dm_trainer import tiny_diffusion_cfg, train_cfg

    cfg = tiny_diffusion_cfg(conditional=True, timesteps=4)
    tr = DiffusionTrainer(cfg, train_cfg(), conditional=True)
    state = tr.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))

    vols = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 16, 1))
    feats = np.concatenate(
        [np.asarray(tr.latent_features(state, vols[i:i + 2]))
         for i in range(0, 8, 2)], axis=0)
    assert feats.shape == (8, 2 * cfg.latent_channels)

    scores = tr.fidelity_eval(state, feats, jax.random.PRNGKey(2),
                              num_samples=8, batch=4, sampler="ddim",
                              sample_steps=2)
    assert scores["n_gen"] == 8  # 4 per context value x 2 contexts
    assert np.isfinite(scores["latent_fid"])
    assert np.isfinite(scores["latent_mmd"])
    self_fid = frechet_distance(feats[:4], feats[4:])
    assert scores["latent_fid"] > self_fid


def test_fidelity_eval_by_class_reports_separation():
    """--fidelity_by_class: per-class FID from the SAME generated samples.
    With real features whose classes are far apart, a generator that only
    ever produces class-0-like features must score fid_same_c0 << 
    fid_cross_c0; the keys and fid_class_sep must appear only when
    real_ctx is given. Uses a monkeypatched `generate` so the geometry is
    controlled exactly (the end-to-end path is covered by
    test_trainer_fidelity_eval_end_to_end)."""
    from ldm3d.train.dm_trainer import DiffusionTrainer
    from tests.test_dm_trainer import tiny_diffusion_cfg, train_cfg

    cfg = tiny_diffusion_cfg(conditional=True, timesteps=4)
    tr = DiffusionTrainer(cfg, train_cfg(), conditional=True)
    state = tr.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))

    rng = np.random.default_rng(0)
    d = 2 * cfg.latent_channels
    real0 = gaussian(rng, 32, d, mu=0.0, sigma=0.05)
    real10 = gaussian(rng, 32, d, mu=10.0, sigma=0.05)
    real_feats = np.concatenate([real0, real10], axis=0)
    real_ctx = np.concatenate([np.zeros(32), np.ones(32)])

    ls, lc = cfg.latent_size, cfg.latent_channels

    def fake_generate(state, sub, shape, context_value=None, **kw):
        # constant latents -> pooled features (mean=v, std=0); both
        # contexts emit class-0-like features (v=0): conditioning is OFF
        return jax.numpy.zeros(shape)

    tr.generate = fake_generate
    scores = tr.fidelity_eval(state, real_feats, jax.random.PRNGKey(1),
                              num_samples=8, batch=4, real_ctx=real_ctx)
    # class-0 samples near the class-0 slice, far from class-1
    assert scores["fid_same_c0"] < 1.0
    assert scores["fid_cross_c0"] > 50.0
    # "class-1" samples are ALSO class-0-like: same >> cross asymmetry
    assert scores["fid_same_c1"] > 50.0
    assert scores["fid_cross_c1"] < 1.0
    # net separation ~0: (cross0-same0) + (cross1-same1) cancels
    assert abs(scores["fid_class_sep"]) < 5.0

    # a generator that RESPECTS the token: emit mean-10 features for c=1
    def cond_generate(state, sub, shape, context_value=None, **kw):
        return jax.numpy.full(shape, 10.0 * float(context_value or 0))

    tr.generate = cond_generate
    s2 = tr.fidelity_eval(state, real_feats, jax.random.PRNGKey(1),
                          num_samples=8, batch=4, real_ctx=real_ctx)
    assert s2["fid_class_sep"] > 50.0  # cross >> same for both classes

    # without real_ctx the per-class keys must be absent
    s3 = tr.fidelity_eval(state, real_feats, jax.random.PRNGKey(1),
                          num_samples=8, batch=4)
    assert not any(k.startswith("fid_") for k in s3)


def test_fidelity_eval_covers_every_class():
    """Multi-class conditional model: fidelity_eval must sample EVERY
    class id the embedding knows (0..context_dim), not the hard-coded
    [0, 1] that silently dropped classes >= 2 on the 4-class corpus and
    biased fid_class_sep negative (runs/r4_c4_sweep_B.log)."""
    from ldm3d.core.config import replace
    from ldm3d.train.dm_trainer import DiffusionTrainer
    from tests.test_dm_trainer import tiny_diffusion_cfg, train_cfg

    cfg = tiny_diffusion_cfg(conditional=True, timesteps=4)
    cfg = replace(cfg, unet=replace(cfg.unet, context_dim=3))  # 4 classes
    tr = DiffusionTrainer(cfg, train_cfg(), conditional=True)
    state = tr.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))

    rng = np.random.default_rng(0)
    d = 2 * cfg.latent_channels
    real_feats = np.concatenate(
        [gaussian(rng, 16, d, mu=5.0 * c, sigma=0.05) for c in range(4)])
    real_ctx = np.repeat(np.arange(4), 16)

    seen = []

    def fake_generate(state, sub, shape, context_value=None, **kw):
        seen.append(int(context_value))
        return jax.numpy.full(shape, 5.0 * float(context_value))

    tr.generate = fake_generate
    scores = tr.fidelity_eval(state, real_feats, jax.random.PRNGKey(1),
                              num_samples=8, batch=2, real_ctx=real_ctx)
    assert sorted(set(seen)) == [0, 1, 2, 3]
    for c in range(4):
        assert f"fid_same_c{c}" in scores and f"fid_cross_c{c}" in scores
    # the token-respecting fake generator separates all four classes
    assert scores["fid_class_sep"] > 10.0


def test_latent_features_scale_free():
    """FID feature space must not move with latent_scale: Frechet distance
    scales ~ feature_scale^2, so scaled features would make FID numbers
    incomparable across latent_scale recipes (the round-4 conditioning-v3
    runs train at scale 20.834 and are compared against scale-1 rows)."""
    from ldm3d.core.config import replace
    from ldm3d.train.dm_trainer import DiffusionTrainer
    from tests.test_dm_trainer import tiny_diffusion_cfg, train_cfg

    cfg1 = tiny_diffusion_cfg(conditional=True, timesteps=4)
    cfg20 = replace(cfg1, latent_scale=20.0)
    tr1 = DiffusionTrainer(cfg1, train_cfg(), conditional=True)
    tr20 = DiffusionTrainer(cfg20, train_cfg(), conditional=True)
    state = tr1.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))

    vols = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
    f1 = np.asarray(tr1.latent_features(state, vols))
    f20 = np.asarray(tr20.latent_features(state, vols))
    np.testing.assert_allclose(f20, f1, rtol=1e-5, atol=1e-6)
