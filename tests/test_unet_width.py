"""Round-5 regression guards for the denoiser width fix.

The reference's conditional U-Net stem is 32 channels on a 256-channel
latent (conditional_dm3d.py:321 + main.py:377-383). Because every skip
connection descends from the stem, the head can recover at most
stem/latent_channels of the injected eps: measured as a hard eps-MSE
floor of ~224/256 = 0.875 at every t (tools/r5_diag.py — overfitting 8
latents plateaus at 0.89 for stem 32 under any norm/lr). The working
flagship recipe widens the stem past the latent channel count; these
tests pin the recipe, the CLI override plumbing, and the train_meta
round-trip that lets restores rebuild the right parameter tree.
"""

import json
import os

from ldm3d.cli.main import _adopt_dm_meta, apply_overrides, build_parser
from ldm3d.core.presets import get_preset


def _cfg(argv):
    args = build_parser().parse_args(argv)
    return apply_overrides(get_preset(args.preset), args), args


def test_flagship_stem_clears_latent_channels():
    # the information-bottleneck guard: stem >= latent channels on every
    # diffusion preset meant to produce samples (conditional flagship)
    cfg = get_preset("conditional_dm3d")
    assert (cfg.diffusion.unet.first_conv_channels
            >= cfg.diffusion.latent_channels), (
        "conditional flagship stem narrower than the latent — recreates "
        "the reference's 0.875 eps-MSE floor (presets._dm docstring)")
    # and the graft entry's flagship recipe agrees with the preset
    from __graft_entry__ import _flagship_cfg
    fc = _flagship_cfg()
    assert fc.unet.first_conv_channels >= fc.latent_channels
    assert fc.unet.widths == cfg.diffusion.unet.widths


def test_unet_flags_propagate():
    cfg, _ = _cfg(["--preset", "conditional_dm3d", "--unet_stem", "32",
                   "--unet_widths", "64,128,256",
                   "--unet_attention", "0,0,1"])
    u = cfg.diffusion.unet
    assert u.first_conv_channels == 32          # reference reproduction
    assert u.widths == (64, 128, 256)
    assert u.has_attention == (False, False, True, True)


def test_unet_widths_rederive_attention_flags():
    # level count changes without --unet_attention: deepest level + middle
    cfg, _ = _cfg(["--preset", "conditional_dm3d",
                   "--unet_widths", "64,128,256,512"])
    u = cfg.diffusion.unet
    assert u.widths == (64, 128, 256, 512)
    assert u.has_attention == (False, False, False, True, True)
    # same level count: preset attention flags preserved
    base = get_preset("conditional_dm3d").diffusion.unet
    cfg, _ = _cfg(["--preset", "conditional_dm3d", "--unet_widths",
                   ",".join(str(w * 2) for w in base.widths)])
    assert cfg.diffusion.unet.has_attention == base.has_attention


def test_train_meta_roundtrip_rebuilds_unet_shape(tmp_path):
    # a checkpoint trained with a custom denoiser shape must restore with
    # that shape even when the preset default differs
    from ldm3d.core.config import replace
    cfg, args = _cfg(["--preset", "conditional_dm3d",
                      "--ckpt_dir", str(tmp_path), "--suffix", "t"])
    os.makedirs(tmp_path / "t_dm", exist_ok=True)
    meta = {"latent_scale": 18.47, "clip_sample_range": 0.0,
            "unet_stem": 32, "unet_widths": [64, 128],
            "unet_attention": [False, True, True]}
    with open(tmp_path / "t_dm" / "train_meta.json", "w") as f:
        json.dump(meta, f)
    cfg2 = _adopt_dm_meta(cfg, args)
    u = cfg2.diffusion.unet
    assert u.first_conv_channels == 32
    assert u.widths == (64, 128)
    assert u.has_attention == (False, True, True)
    assert cfg2.diffusion.latent_scale == 18.47
    # explicit flags win over the meta file
    cfg3, args3 = _cfg(["--preset", "conditional_dm3d",
                        "--ckpt_dir", str(tmp_path), "--suffix", "t",
                        "--unet_stem", "256"])
    cfg3 = replace(cfg3, ckpt_dir=str(tmp_path))
    cfg3 = _adopt_dm_meta(cfg3, args3)
    assert cfg3.diffusion.unet.first_conv_channels == 256


def test_bench_apply_meta_rebuilds_unet_shape():
    from bench import _apply_meta
    from __graft_entry__ import _flagship_cfg
    meta = {"unet_stem": 32, "unet_widths": [64, 128, 256],
            "unet_attention": [False, False, True, True],
            "context_dim": 1, "timesteps": 300}
    diff = _apply_meta(_flagship_cfg(), meta)
    assert diff.unet.first_conv_channels == 32
    assert diff.unet.widths == (64, 128, 256)
    assert diff.unet.has_attention == (False, False, True, True)
    assert diff.unet.context_dim == 1
    assert diff.timesteps == 300
