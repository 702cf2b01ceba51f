"""SYMMETRIC-pad `vqgan_attn` family (reference networks/vqgan_attn.py:
242-412) — TF `tf.pad(mode='SYMMETRIC')` golden semantics, SamePadConv3D
border behavior vs zero-pad SAME, transpose shape restoration, and the
full `arch='attn'` autoencoder round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d.core.config import QuantizerConfig, VQVAEConfig
from ldm3d.models.layers import symmetric_pad3d
from ldm3d.models.vqgan import (AttnDecoder, AttnEncoder, SamePadConv3D,
                                SamePadConvTranspose3D, VQGANAutoencoder)


def test_symmetric_pad_tf_golden():
    """TF SYMMETRIC is the edge-INCLUSIVE mirror: tf.pad([1,2,3], [[2,2]],
    'SYMMETRIC') == [2,1,1,2,3,3,2] (golden computed from the documented TF
    semantics; REFLECT would give [3,2,1,2,3,2,1]). The 3-D path must apply
    the VideoGPT split (p//2, p//2 + p%2) with p = k - s per spatial dim."""
    row = jnp.asarray([1.0, 2.0, 3.0])
    x = row.reshape(1, 3, 1, 1, 1)
    # k=5, s=1 -> p=4 -> (2, 2) on the first spatial dim only
    out = symmetric_pad3d(x, (5, 1, 1), (1, 1, 1))
    np.testing.assert_array_equal(
        np.asarray(out[0, :, 0, 0, 0]), [2, 1, 1, 2, 3, 3, 2])
    # odd total pad p=3 splits (1, 2): [1,2,3] -> [1,1,2,3,3,2]
    out = symmetric_pad3d(x, (4, 1, 1), (1, 1, 1))
    np.testing.assert_array_equal(
        np.asarray(out[0, :, 0, 0, 0]), [1, 1, 2, 3, 3, 2])
    # p=0 (k==s) is the identity
    out = symmetric_pad3d(x, (2, 1, 1), (2, 1, 1))
    assert out.shape == x.shape


def test_samepad_conv_interior_matches_zero_pad_border_differs():
    """k4-s2 TF zero-pad SAME and the SYMMETRIC SamePad recipe place
    windows identically ((1,1) per dim for even n) — with the same kernel
    the interior outputs are bit-equal and ONLY border voxels differ (by
    mirrored- vs zero-padding). This pins the layer to the reference's
    border semantics rather than just its shape."""
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 3))

    sym = SamePadConv3D(4, kernel=4, stride=2, dtype=jnp.float32)
    var = sym.init({"params": rng}, x)
    y_sym = sym.apply(var, x)

    zero = nn.Conv(4, (4, 4, 4), strides=(2, 2, 2), padding="SAME")
    y_zero = zero.apply(
        {"params": {"kernel": var["params"]["conv"]["kernel"],
                    "bias": var["params"]["conv"]["bias"]}}, x)

    assert y_sym.shape == y_zero.shape == (1, 4, 4, 4, 4)
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(np.asarray(y_sym[interior]),
                               np.asarray(y_zero[interior]), rtol=1e-5)
    border_delta = np.abs(np.asarray(y_sym - y_zero))
    assert border_delta.max() > 1e-3, "symmetric pad never changed a border"


def test_samepad_transpose_restores_stride_n():
    """The reference layer (vqgan_attn.py:270-294) omits the crop after its
    VALID transpose, producing s*n + (k-s)*(s+1) voxels — 64^3 would decode
    to 134^3 and the recon loss could not be formed (why the family was
    superseded). Our documented fix center-crops back to exactly s*n."""
    x = jnp.zeros((1, 6, 6, 6, 3))
    for k, s in [(4, 2), (3, 1), (2, 2)]:
        m = SamePadConvTranspose3D(5, kernel=k, stride=s, dtype=jnp.float32)
        var = m.init({"params": jax.random.PRNGKey(0)}, x)
        y = m.apply(var, x)
        assert y.shape == (1, 6 * s, 6 * s, 6 * s, 5), (k, s)


def _attn_cfg():
    return VQVAEConfig(
        in_channels=2, out_channels=2, num_channels=(4, 8),
        num_res_channels=(4, 8), num_res_layers=1, norm="group",
        act="silu", arch="attn",
        quantizer=QuantizerConfig(kind="ema", num_embeddings=16,
                                  embedding_dim=8))


def test_attn_encoder_decoder_shapes():
    cfg = _attn_cfg()
    x = jnp.zeros((1, 16, 16, 16, 2))
    enc = AttnEncoder(cfg, dtype=jnp.float32)
    var = enc.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    z = enc.apply(var, x, training=False)
    # one k4-s2 level: 16^3 -> 8^3, pre-VQ projected to embedding_dim
    assert z.shape == (1, 8, 8, 8, 8)
    dec = AttnDecoder(cfg, dtype=jnp.float32)
    dvar = dec.init({"params": jax.random.PRNGKey(0)}, z, training=False)
    y = dec.apply(dvar, z, training=False)
    assert y.shape == x.shape


def test_attn_autoencoder_roundtrip():
    m = VQGANAutoencoder(_attn_cfg(), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 16, 2))
    var = m.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    recon, aux = m.apply(var, x, training=False)
    assert recon.shape == x.shape
    assert np.isfinite(float(aux.loss))
    assert float(aux.perplexity) >= 1.0


def test_vqgan_attn_sym_preset_constructs():
    from ldm3d.core.presets import get_preset
    cfg = get_preset("vqgan_attn_sym")
    assert cfg.vqgan.ae.arch == "attn"
    assert cfg.vqgan.ae.num_channels == (64, 128)
    assert cfg.vqgan.ae.quantizer.kind == "ema"
    assert cfg.vqgan.ae.quantizer.num_embeddings == 128
    assert cfg.vqgan.ae.quantizer.embedding_dim == 64
