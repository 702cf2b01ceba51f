"""End-to-end latent-diffusion trainer tests: frozen VQ-VAE + U-Net train
step, fused scan sampling + decode, and the multi-device path."""

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d.core.config import (DiffusionConfig, MeshConfig, QuantizerConfig,
                               TrainConfig, UNetConfig, VQVAEConfig)
from ldm3d.data.synthetic import synthetic_batch
from ldm3d.parallel.mesh import make_mesh, shard_batch
from ldm3d.train.dm_trainer import DiffusionTrainer
from ldm3d.train.state import TrainState


def tiny_diffusion_cfg(conditional=False, timesteps=5):
    vq = VQVAEConfig(
        in_channels=1, out_channels=1,
        num_channels=(4, 8), num_res_channels=(4, 8), num_res_layers=1,
        downsample_stride=(2, 2), downsample_kernel=(4, 4),
        upsample_stride=(2, 2), upsample_kernel=(4, 4),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=8))
    unet = UNetConfig(widths=(8, 16), has_attention=(False, True),
                      num_res_blocks=1, first_conv_channels=8,
                      context_dim=1 if conditional else None,
                      attention_impl="xla")
    return DiffusionConfig(timesteps=timesteps, latent_size=4,
                           latent_channels=8, unet=unet, vqvae=vq)


def train_cfg(**kw):
    kw.setdefault("dtype", "float32")
    kw.setdefault("batch_size", 2)
    return TrainConfig(**kw)


def test_dm_train_step_updates_unet_only():
    cfg = tiny_diffusion_cfg()
    trainer = DiffusionTrainer(cfg, train_cfg())
    state = trainer.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    vol, _, _ = synthetic_batch(jax.random.PRNGKey(1), 2, 16)
    import flax

    vq_before = jax.tree_util.tree_map(lambda x: np.asarray(x),
                                       state.params["vqvae"])
    unet_before = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(lambda x: np.asarray(x),
                               state.params["unet"]))
    # several steps: zero-init convs (reference dm3d.py:374) gate upstream
    # gradients until they become nonzero.
    for _ in range(3):
        state, metrics = trainer.train_step(state, vol)
    assert np.isfinite(float(metrics["loss"]))
    # frozen VQ-VAE untouched (reference dm3d.py:418-420, :461-464)
    vq_after = jax.tree_util.tree_map(lambda x: np.asarray(x),
                                      state.params["vqvae"])
    jax.tree_util.tree_map(np.testing.assert_array_equal, vq_before, vq_after)
    unet_after = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(lambda x: np.asarray(x),
                               state.params["unet"]))
    changed = sum(1 for k in unet_before
                  if not np.array_equal(unet_before[k], unet_after[k]))
    assert changed > len(unet_before) // 2, (changed, len(unet_before))


def test_dm_ema_params_track_and_sample():
    """--ema_decay: EMA follows the warm-up ramp min(d, (1+n)/(10+n)),
    and generate() samples from the averaged weights by default while
    use_ema=False forces the raw ones."""
    cfg = tiny_diffusion_cfg()
    trainer = DiffusionTrainer(cfg, train_cfg(ema_decay=0.999))
    state = trainer.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    assert state.ema_params is not None
    vol, _, _ = synthetic_batch(jax.random.PRNGKey(1), 2, 16)

    prev_params = jax.device_get(state.params["unet"])
    prev_ema = jax.device_get(state.ema_params)
    state, _ = trainer.train_step(state, vol)
    new_params = jax.device_get(state.params["unet"])
    new_ema = jax.device_get(state.ema_params)
    # step 0: ramp gives d = 1/10 -> ema = 0.1*init + 0.9*new_params
    flat = jax.tree_util.tree_leaves
    for e_new, e_prev, p_new in zip(flat(new_ema), flat(prev_ema),
                                    flat(new_params)):
        np.testing.assert_allclose(
            e_new, 0.1 * e_prev + 0.9 * p_new, rtol=1e-5, atol=1e-6)
    del prev_params

    # several more steps so EMA and raw weights diverge measurably
    for _ in range(3):
        state, _ = trainer.train_step(state, vol)
    shape = (1, 4, 4, 4, 8)
    ema_lat = trainer.generate(state, jax.random.PRNGKey(5), shape,
                               decode=False)
    raw_lat = trainer.generate(state, jax.random.PRNGKey(5), shape,
                               decode=False, use_ema=False)
    assert not np.allclose(np.asarray(ema_lat), np.asarray(raw_lat))

    # disabled EMA keeps the old state tree (old ckpts stay restorable)
    tr2 = DiffusionTrainer(cfg, train_cfg())
    st2 = tr2.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    assert st2.ema_params is None


def test_dm_generate_fused_scan_and_decode():
    cfg = tiny_diffusion_cfg()
    trainer = DiffusionTrainer(cfg, train_cfg())
    state = trainer.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    out = trainer.generate(state, jax.random.PRNGKey(2),
                           latent_shape=(2, 4, 4, 4, 8))
    assert out.shape == (2, 16, 16, 16, 1)  # decoded back to image space
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_dm_conditional_generate_contexts_differ():
    cfg = tiny_diffusion_cfg(conditional=True)
    trainer = DiffusionTrainer(cfg, train_cfg())
    state = trainer.init_state(jax.random.PRNGKey(0), (1, 16, 16, 16, 1))
    vol, _, ctx = synthetic_batch(jax.random.PRNGKey(1), 1, 16)
    state, m = trainer.train_step(state, vol, ctx)
    assert np.isfinite(float(m["loss"]))
    out0 = trainer.generate(state, jax.random.PRNGKey(3),
                            latent_shape=(1, 4, 4, 4, 8), context_value=0)
    out1 = trainer.generate(state, jax.random.PRNGKey(3),
                            latent_shape=(1, 4, 4, 4, 8), context_value=1)
    assert out0.shape == out1.shape == (1, 16, 16, 16, 1)
    assert not np.allclose(np.asarray(out0, np.float32),
                           np.asarray(out1, np.float32))


def test_dm_data_parallel_mesh_step():
    mesh = make_mesh(MeshConfig(data=8, space=1))
    cfg = tiny_diffusion_cfg()
    trainer = DiffusionTrainer(cfg, train_cfg(batch_size=8), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (8, 16, 16, 16, 1))
    vol, _, ctx = synthetic_batch(jax.random.PRNGKey(1), 8, 16)
    vol, ctx = shard_batch(mesh, (vol, ctx))
    state, metrics = trainer.train_step(state, vol, ctx)
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_classifier_free_guidance():
    """cfg_dropout trains a null token; guided sampling runs, and
    guidance_scale=1 reproduces plain conditional sampling exactly
    (eps_u + 1*(eps_c - eps_u) == eps_c)."""
    from ldm3d.core.config import replace
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg(tiny=True)
    cfg = replace(cfg, unet=replace(cfg.unet, cfg_dropout=0.2))
    tr = DiffusionTrainer(cfg, TrainConfig(batch_size=2, dtype="float32"),
                          conditional=True)
    state = tr.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    vol = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
    ctx = jnp.ones((2,), jnp.int32)
    state, metrics = tr.train_step(state, vol, ctx)
    assert np.isfinite(float(metrics["loss"]))

    lat = (2, 4, 4, 4, cfg.latent_channels)
    guided = tr.generate(state, jax.random.PRNGKey(2), lat, context_value=1,
                         guidance_scale=3.0, decode=False)
    assert guided.shape == lat and np.isfinite(np.asarray(guided)).all()
    plain = tr.generate(state, jax.random.PRNGKey(2), lat, context_value=1,
                        decode=False)
    scale1 = tr.generate(state, jax.random.PRNGKey(2), lat, context_value=1,
                         guidance_scale=1.0, decode=False)
    np.testing.assert_allclose(np.asarray(scale1), np.asarray(plain),
                               rtol=2e-4, atol=2e-4)
    assert not np.allclose(np.asarray(guided), np.asarray(plain))


def test_guidance_without_cfg_dropout_raises():
    # ADVICE r1: --guidance_scale on a model trained with cfg_dropout == 0
    # silently produced unguided samples; it must raise instead.
    cfg = tiny_diffusion_cfg(conditional=True)
    tr = DiffusionTrainer(cfg, train_cfg(), conditional=True)
    import pytest
    with pytest.raises(ValueError, match="cfg_dropout"):
        tr.generate_fn((1, 4, 4, 4, 8), guidance_scale=2.0)


def test_generate_fn_program_cache_reused():
    # per-epoch image logging must not recompile the sampler every call
    cfg = tiny_diffusion_cfg(conditional=True)
    tr = DiffusionTrainer(cfg, train_cfg(), conditional=True)
    f1 = tr.generate_fn((1, 4, 4, 4, 8), sampler="ddim", sample_steps=2)
    f2 = tr.generate_fn((1, 4, 4, 4, 8), sampler="ddim", sample_steps=2)
    assert f1 is f2
    f3 = tr.generate_fn((2, 4, 4, 4, 8), sampler="ddim", sample_steps=2)
    assert f3 is not f1


def test_cached_latent_step_matches():
    """--cache_latents is exact: a step on precomputed frozen-encoder
    latents must produce bit-identical loss and parameters to the volume
    path (the stage-1 encode is deterministic in eval mode, so per-step
    re-encoding — reference dm3d.py:438 — is pure redundant compute)."""
    cfg = tiny_diffusion_cfg(conditional=True)
    vol, _, _ = synthetic_batch(jax.random.PRNGKey(1), 2, 16)
    ctx = jnp.array([0, 1], jnp.int32)

    tr_a = DiffusionTrainer(cfg, train_cfg(), conditional=True)
    state_a = tr_a.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    new_a, m_a = tr_a.train_step(state_a, vol, ctx)

    tr_b = DiffusionTrainer(cfg, train_cfg(), conditional=True)
    state_b = tr_b.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    lat = tr_b.encode_latents(state_b, vol)
    assert lat.shape == (2, 4, 4, 4, 8)
    new_b, m_b = tr_b.train_step_latents(state_b, lat, ctx)

    np.testing.assert_array_equal(np.asarray(m_a["loss"]),
                                  np.asarray(m_b["loss"]))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        (new_a.params["unet"], new_a.opt_state, new_a.ema_params),
        (new_b.params["unet"], new_b.opt_state, new_b.ema_params))


def test_latent_loader_shuffles_and_drops_tail():
    from ldm3d.data.pipeline import LatentLoader
    lat = jnp.arange(7, dtype=jnp.float32).reshape(7, 1, 1, 1, 1)
    ctx = jnp.arange(7, dtype=jnp.int32)
    loader = LatentLoader(lat, ctx, batch_size=2, seed=3)
    assert len(loader) == 3
    seen = []
    for lb, cb in loader:
        assert lb.shape == (2, 1, 1, 1, 1) and cb.shape == (2,)
        # latent/context pairing preserved under shuffling
        np.testing.assert_array_equal(np.asarray(lb[:, 0, 0, 0, 0]),
                                      np.asarray(cb, np.float32))
        seen.extend(np.asarray(cb).tolist())
    assert len(seen) == 6 and len(set(seen)) == 6
    # a second epoch reshuffles
    order2 = [int(c) for _, cb in loader for c in np.asarray(cb)]
    assert sorted(order2)[:6] != seen or order2 != seen


def test_cached_latent_step_on_mesh():
    """LatentLoader + train_step_latents under a data x space mesh: batches
    come out sharded over 'data' and the compiled latent step runs them."""
    from ldm3d.data.pipeline import LatentLoader
    mesh = make_mesh(MeshConfig(data=4, space=2))
    cfg = tiny_diffusion_cfg()
    trainer = DiffusionTrainer(cfg, train_cfg(batch_size=4), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (4, 16, 16, 16, 1))
    vol, _, ctx = synthetic_batch(jax.random.PRNGKey(1), 8, 16)
    lat = trainer.encode_latents(state, vol)
    loader = LatentLoader(lat, ctx, batch_size=4, seed=0, mesh=mesh)
    for lb, cb in loader:
        assert not lb.sharding.is_fully_replicated  # data-sharded
        state, metrics = trainer.train_step_latents(state, lb, cb)
    assert np.isfinite(float(metrics["loss"]))


def test_latent_scale_roundtrip_and_training_space():
    """--latent_scale (SD scale_factor): encode_latents multiplies,
    decode divides — decode(encode(x)) is invariant to the scale, while
    the diffusion space (what the U-Net sees) is scaled exactly."""
    import numpy as np

    from ldm3d.core.config import replace

    cfg1 = tiny_diffusion_cfg(timesteps=4)
    cfg2 = replace(cfg1, latent_scale=4.0)
    tr1 = DiffusionTrainer(cfg1, train_cfg())
    tr2 = DiffusionTrainer(cfg2, train_cfg())
    state1 = tr1.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    state2 = tr2.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))

    vols = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
    l1 = np.asarray(tr1.encode_latents(state1, vols))
    l2 = np.asarray(tr2.encode_latents(state2, vols))
    np.testing.assert_allclose(l2, 4.0 * l1, rtol=1e-5, atol=1e-6)

    # decode inverts the scale: same reconstruction either way
    v1 = tr1.model.apply(tr1._apply_variables(state1),
                         jnp.asarray(l1), method="decode")
    v2 = tr2.model.apply(tr2._apply_variables(state2),
                         jnp.asarray(l2), method="decode")
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-4, atol=1e-5)


def test_clip_sample_range_changes_samples():
    """clip_sample_range reaches the fused samplers: with latents whose
    scale exceeds 1, a wide/disabled clip must produce different samples
    than the reference's hard [-1,1], and the disabled clip's output must
    escape the [-1,1] box."""
    import numpy as np

    from ldm3d.core.config import replace

    base = tiny_diffusion_cfg(timesteps=8)
    shape = (2, 4, 4, 4, base.latent_channels)

    def sample_with(clip):
        cfg = replace(base, clip_sample_range=clip)
        tr = DiffusionTrainer(cfg, train_cfg())
        state = tr.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
        # bias the denoiser's input scale by sampling from a wide prior:
        # the untrained net's eps is small, so x0 predictions track x and
        # exceed [-1,1] regularly
        return np.asarray(tr.generate(state, jax.random.PRNGKey(3), shape,
                                      decode=False, sampler="ddim",
                                      sample_steps=4))

    s_ref = sample_with(1.0)
    s_off = sample_with(0.0)
    assert np.max(np.abs(s_ref - s_off)) > 1e-4
    assert np.max(np.abs(s_off)) > np.max(np.abs(s_ref))


def test_fused_epoch_matches_sequential():
    """train_epoch_latents (one lax.scan dispatch per epoch) is exact: the
    same permutation driven through per-step train_step_latents calls must
    produce the same final params/EMA/opt-state (to 1-2 ulp: the scan body
    and the standalone step compile to different XLA programs, so fusion
    may reassociate float ops) and the same mean metrics. (The fused path
    exists because per-step dispatch through the TPU relay costs ~20-50x
    the cached-latent step program, runs/r3_flagship_q10.log.)"""
    cfg = tiny_diffusion_cfg(conditional=True)
    vol, _, _ = synthetic_batch(jax.random.PRNGKey(1), 6, 16)
    ctx = jnp.array([0, 1, 0, 1, 1, 0], jnp.int32)
    perm = jnp.array([[4, 1], [0, 5], [3, 2]], jnp.int32)   # 3 steps, bs 2

    tr_a = DiffusionTrainer(cfg, train_cfg(), conditional=True)
    state_a = tr_a.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    lat = tr_a.encode_latents(state_a, vol)
    ms = []
    for idx in perm:
        state_a, m = tr_a.train_step_latents(
            state_a, jnp.take(lat, idx, axis=0), jnp.take(ctx, idx, axis=0))
        ms.append(m)
    mean_a = {k: float(np.mean([float(m[k]) for m in ms])) for k in ms[0]}

    tr_b = DiffusionTrainer(cfg, train_cfg(), conditional=True)
    state_b = tr_b.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    state_b, m_b = tr_b.train_epoch_latents(state_b, lat, ctx, perm)

    assert int(state_b.step) == int(state_a.step) == 3
    # atol 5e-7: zero-init subtrees (the head conv, first Adam moments)
    # hold pure round-off after 3 steps — magnitudes ~5e-8 where rtol is
    # meaningless; the two XLA programs legitimately reassociate those
    # sums. Observed violation 1.3e-7 on XLA:CPU (r5). Signal-carrying
    # parameters are O(1e-2..1) and still bound tightly by rtol.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=5e-7),
        (state_a.params["unet"], state_a.opt_state, state_a.ema_params,
         state_a.rng),
        (state_b.params["unet"], state_b.opt_state, state_b.ema_params,
         state_b.rng))
    for k in mean_a:
        np.testing.assert_allclose(float(m_b[k]), mean_a[k], rtol=1e-6)


def test_fused_latent_loader_yields_epoch_perm():
    from ldm3d.data.pipeline import LatentLoader
    lat = jnp.arange(7, dtype=jnp.float32).reshape(7, 1, 1, 1, 1)
    ctx = jnp.arange(7, dtype=jnp.int32)
    loader = LatentLoader(lat, ctx, batch_size=2, seed=3, fused=True)
    items = list(loader)
    assert len(items) == 1
    l_all, c_all, perm = items[0]
    assert l_all is lat and c_all is ctx
    assert perm.shape == (3, 2) and perm.dtype == jnp.int32
    flat = np.asarray(perm).ravel()
    assert len(set(flat.tolist())) == 6          # distinct indices
    # same seed, non-fused path: identical epoch order
    seq = LatentLoader(lat, ctx, batch_size=2, seed=3)
    seen = np.concatenate([np.asarray(cb) for _, cb in seq])
    np.testing.assert_array_equal(flat, seen)


def test_loss_reduction_mean_vs_ref():
    """loss_reduction="mean" (default) must (a) log the SAME reference-
    scaled "loss" metric as loss_reduction="ref" (curve parity,
    dm3d.py:456-459) and (b) take LARGER parameter updates when the ref
    scaling floors Adam's epsilon. The floor is ratio-driven: ref loss =
    mean-MSE * (latent_size/lc)^3, so lc=256 at latent_size 4 divides
    every gradient by 262144, pushing |g| to ~1e-9-1e-10 — below optax
    Adam's eps=1e-8 — and even the step-1 update g/(|g|+eps) collapses.
    At lc=8 (the other tiny tests) the ratio is only 1/8 and the two
    modes step identically (Adam is scale-invariant above the floor) —
    which is exactly why r1-r4 never caught this at flagship lc=256."""
    import dataclasses

    vq = VQVAEConfig(
        in_channels=1, out_channels=1,
        num_channels=(4, 256), num_res_channels=(4, 256), num_res_layers=1,
        downsample_stride=(2, 2), downsample_kernel=(4, 4),
        upsample_stride=(2, 2), upsample_kernel=(4, 4),
        quantizer=QuantizerConfig(kind="ste", num_embeddings=16,
                                  embedding_dim=256))
    unet = UNetConfig(widths=(8, 16), has_attention=(False, True),
                      num_res_blocks=1, first_conv_channels=8,
                      attention_impl="xla")
    cfg_mean = DiffusionConfig(timesteps=5, latent_size=4,
                               latent_channels=256, unet=unet, vqvae=vq)
    assert cfg_mean.loss_reduction == "mean"  # the default
    cfg_ref = dataclasses.replace(cfg_mean, loss_reduction="ref")
    lat = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 4, 4, 256))

    results = {}
    for name, cfg in [("mean", cfg_mean), ("ref", cfg_ref)]:
        trainer = DiffusionTrainer(cfg, train_cfg())
        state = trainer.init_state(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
        before = jax.tree_util.tree_map(np.asarray, state.params["unet"])
        state, metrics = trainer.train_step_latents(state, lat)
        deltas = jax.tree_util.tree_map(
            lambda a, b: np.abs(np.asarray(a) - b).ravel(),
            state.params["unet"], before)
        alld = np.concatenate(jax.tree_util.tree_leaves(deltas))
        results[name] = (float(metrics["loss"]), float(alld.mean()))

    # (a) identical logged loss (same rng path, same forward)
    np.testing.assert_allclose(results["mean"][0], results["ref"][0],
                               rtol=1e-5)
    # (b) mean mode takes a full-size Adam step (mean |update| ~ lr);
    # ref mode's updates are eps-floored far below it
    assert results["mean"][1] > 3.0 * results["ref"][1], results
