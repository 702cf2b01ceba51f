"""Unit tests for the five quantizer variants (SURVEY.md §4 test pyramid:
STE gradient check, EMA update math, NSVQ noise norm, usage counting)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d.core.config import QuantizerConfig
from ldm3d.models.quantizers import (
    NSVQ, RNSVQ, VectorQuantizerEMA, VectorQuantizerEMASonnet,
    VectorQuantizerSTE, make_quantizer, replace_unused_codebooks)
from ldm3d.ops.quantize import (
    codebook_usage_counts, nearest_codebook_indices, perplexity_from_counts)

K, D = 32, 16


def _data(shape=(4, 2, 2, 2, D), seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape)


def test_nearest_indices_matches_bruteforce():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, D))
    cb = jax.random.normal(jax.random.PRNGKey(1), (K, D))
    idx = nearest_codebook_indices(x, cb)
    dists = jnp.sum((x[:, None, :] - cb[None, :, :]) ** 2, axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), np.argmin(dists, axis=1))


def test_usage_counts_and_perplexity():
    idx = jnp.array([0, 0, 1, 2], jnp.int32)
    counts = codebook_usage_counts(idx, 4)
    np.testing.assert_array_equal(np.asarray(counts), [2, 1, 1, 0])
    # uniform usage => perplexity == num used codes
    p = perplexity_from_counts(jnp.array([1.0, 1.0, 1.0, 1.0]))
    assert np.isclose(float(p), 4.0, rtol=1e-5)


def test_ste_gradient_passthrough():
    """Straight-through: d quantized / d x == identity."""
    m = VectorQuantizerSTE(K, D)
    x = _data()
    var = m.init({"params": jax.random.PRNGKey(0)}, x, training=False)

    def f(xin):
        q, _ = m.apply(var, xin, training=False)
        return jnp.sum(q)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(x), rtol=1e-5)


def test_ste_loss_and_shape():
    m = VectorQuantizerSTE(K, D)
    x = _data()
    var = m.init({"params": jax.random.PRNGKey(0)}, x)
    (q, aux), updates = m.apply(var, x, training=True, mutable=["vq_stats"])
    assert q.shape == x.shape
    assert aux.loss.shape == ()
    assert float(aux.loss) > 0
    assert aux.indices.shape == x.shape[:-1]
    total = int(np.asarray(updates["vq_stats"]["codebooks_used"]).sum())
    assert total == int(np.prod(x.shape[:-1]))


def test_ema_data_dependent_init_and_update():
    m = VectorQuantizerEMA(K, D, restart_thres=0.0)
    x = _data((8, 4, 4, 1, D))
    var = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                 x, training=False)
    assert bool(var["vq_stats"]["need_init"])
    (q, aux), updates = m.apply(
        var, x, training=True, mutable=["vq_stats"],
        rngs={"noise": jax.random.PRNGKey(2)})
    stats = updates["vq_stats"]
    assert not bool(stats["need_init"])
    # After data-dependent init, codes are batch rows => quantization error
    # should be small-ish and cluster sizes positive.
    assert float(jnp.sum(stats["ema_cluster_size"])) > 0
    assert q.shape == x.shape

    # Second step: EMA must move ema_w toward assignment sums.
    (q2, _), updates2 = m.apply(
        {**var, "vq_stats": stats}, x, training=True, mutable=["vq_stats"],
        rngs={"noise": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(updates2["vq_stats"]["ema_w"]),
                           np.asarray(stats["ema_w"]))


def test_ema_eval_does_not_mutate():
    m = VectorQuantizerEMA(K, D)
    x = _data()
    var = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                 x, training=False)
    (q, aux), updates = m.apply(var, x, training=False, mutable=["vq_stats"])
    np.testing.assert_allclose(np.asarray(updates["vq_stats"]["codebook"]),
                               np.asarray(var["vq_stats"]["codebook"]))


def test_sonnet_ema_laplace_update():
    m = VectorQuantizerEMASonnet(K, D, decay=0.5)
    x = _data()
    var = m.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    (q, aux), updates = m.apply(var, x, training=True, mutable=["vq_stats"])
    n = float(jnp.sum(updates["vq_stats"]["ema_cluster_size"]))
    assert n > 0
    assert aux.loss.shape == ()


def test_nsvq_noise_substitution_norm():
    """Training-mode output must satisfy ||q - x|| == ||x - hard_q|| per
    vector (noise is rescaled to the residual norm, nsvqvae.py:169-179)."""
    m = NSVQ(K, D)
    x = _data()
    var = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    (q_train, aux), _ = m.apply(var, x, training=True, mutable=["vq_stats"],
                                rngs={"noise": jax.random.PRNGKey(2)})
    q_eval, _ = m.apply(var, x, training=False)
    res_train = np.linalg.norm(np.asarray(q_train - x), axis=-1)
    res_hard = np.linalg.norm(np.asarray(q_eval - x), axis=-1)
    np.testing.assert_allclose(res_train, res_hard, rtol=1e-4)


def test_nsvq_gradients_flow_without_ste():
    m = NSVQ(K, D)
    x = _data()
    var = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)

    def f(xin):
        q, aux = m.apply(var, xin, training=True,
                         rngs={"noise": jax.random.PRNGKey(2)})
        return jnp.sum(q ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_rnsvq_residual_stages_reduce_error():
    """More stages => hard quantization error must not increase."""
    x = _data((16, 1, 1, 1, D), seed=5)
    errs = []
    for s in (1, 4):
        m = RNSVQ(num_stages=s, num_embeddings=K, embedding_dim=D)
        var = m.init({"params": jax.random.PRNGKey(0),
                      "noise": jax.random.PRNGKey(1)}, x)
        q, _ = m.apply(var, x, training=False)
        errs.append(float(jnp.mean((q - x) ** 2)))
    assert errs[1] <= errs[0] + 1e-6


def test_replace_unused_codebooks():
    cb = jax.random.normal(jax.random.PRNGKey(0), (K, D))
    usage = jnp.zeros((K,)).at[:4].set(100.0)  # only first 4 codes used
    new_cb, new_usage, num_replaced = replace_unused_codebooks(
        cb, usage, num_batches=10, rng=jax.random.PRNGKey(1), threshold=0.05)
    assert int(num_replaced) == K - 4
    # used codes untouched
    np.testing.assert_allclose(np.asarray(new_cb[:4]), np.asarray(cb[:4]))
    # unused codes re-seeded near used rows
    d = jnp.min(jnp.sum((new_cb[4:, None, :] - cb[None, :4, :]) ** 2, axis=-1),
                axis=1)
    assert float(jnp.max(d)) < 1e-6
    assert float(jnp.sum(new_usage)) == 0


@pytest.mark.parametrize("kind", ["ste", "ema", "ema_sonnet", "nsvq", "rnsvq"])
def test_factory_covers_all_kinds(kind):
    cfg = QuantizerConfig(kind=kind, num_embeddings=K, embedding_dim=D)
    m = make_quantizer(cfg)
    x = _data()
    var = m.init({"params": jax.random.PRNGKey(0),
                  "noise": jax.random.PRNGKey(1)}, x)
    (q, aux), _ = m.apply(var, x, training=True, mutable=["vq_stats"],
                          rngs={"noise": jax.random.PRNGKey(2)})
    assert q.shape == x.shape
    assert np.isfinite(float(aux.loss))


def test_replace_unused_codebooks_staged():
    """rnsvq replacement is per stage: a dead code in stage 1 is re-seeded
    from stage 1's used rows, not stage 0's (reference rnsvqvae.py:142-190,
    threshold 0.01)."""
    from ldm3d.models.quantizers import replace_unused_codebooks_staged

    s, k, d = 3, 8, 4
    rng = jax.random.PRNGKey(0)
    # stage i's codebook values live around offset 10*i so donor provenance
    # is detectable
    codebooks = (jax.random.normal(rng, (s, k, d))
                 + 10.0 * jnp.arange(s)[:, None, None])
    usage = jnp.ones((s, k)) * 100.0
    usage = usage.at[1, 3].set(0.0)   # dead code in stage 1
    usage = usage.at[2, 5].set(0.0)   # dead code in stage 2

    new_cb, new_usage, n = replace_unused_codebooks_staged(
        codebooks, usage, num_batches=10, rng=rng, threshold=0.01)
    assert int(n) == 2
    assert new_usage.shape == (s, k) and float(new_usage.sum()) == 0.0
    # untouched stages/rows identical
    np.testing.assert_array_equal(np.asarray(new_cb[0]),
                                  np.asarray(codebooks[0]))
    # replaced rows moved, and their donor came from the same stage
    # (values near offset 10*stage, not another stage's offset)
    for stage, row in ((1, 3), (2, 5)):
        assert not np.allclose(np.asarray(new_cb[stage, row]),
                               np.asarray(codebooks[stage, row]))
        assert abs(float(new_cb[stage, row].mean()) - 10.0 * stage) < 5.0


def test_vq_trainer_rnsvq_replace_unused_reseeds_dead_stage_code():
    """VERDICT r2 weak-5: a --preset rnsvqvae run with codebook replacement
    must actually re-seed dead stage codes through the trainer hook."""
    from ldm3d.core.config import QuantizerConfig, TrainConfig, VQVAEConfig
    from ldm3d.train.vq_trainer import VQTrainer

    cfg = VQVAEConfig(
        in_channels=1, out_channels=1, num_channels=(8, 16),
        num_res_channels=(8, 16), num_res_layers=1,
        downsample_stride=(2, 2), downsample_kernel=(4, 4),
        upsample_stride=(2, 2), upsample_kernel=(4, 4),
        quantizer=QuantizerConfig(kind="rnsvq", num_embeddings=8,
                                  embedding_dim=4, num_stages=2,
                                  discarding_threshold=0.01))
    tr = VQTrainer(cfg, TrainConfig(batch_size=2, dtype="float32"))
    state = tr.init_state(jax.random.PRNGKey(0), (2, 8, 8, 8, 1))

    # mark every code heavily used except one dead code in stage 1
    usage = jnp.full((2, 8), 1000.0).at[1, 2].set(0.0)
    state = state.replace(vq_stats={
        **state.vq_stats,
        "quantizer": {**state.vq_stats["quantizer"],
                      "codebooks_used": usage}})
    before = np.asarray(state.params["quantizer"]["codebooks"])

    state, n = tr.replace_unused(state, num_batches=10,
                                 rng=jax.random.PRNGKey(1))
    after = np.asarray(state.params["quantizer"]["codebooks"])
    assert int(n) == 1
    assert not np.allclose(after[1, 2], before[1, 2])
    mask = np.ones_like(before, bool)
    mask[1, 2] = False
    np.testing.assert_array_equal(after[mask], before[mask])
    assert float(state.vq_stats["quantizer"]["codebooks_used"].sum()) == 0.0
