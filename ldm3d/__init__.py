"""ldm3d — TPU-native 3D conditional latent diffusion.

Public API (lazy imports so `import ldm3d` stays cheap and never pulls
jax before the caller configures platforms):

    from ldm3d import (VQVAE, UNet3D, VQTrainer, GANTrainer,
                       DiffusionTrainer, get_preset, make_mesh, fit)
"""

__version__ = "0.1.0"

_EXPORTS = {
    "VQVAE": "ldm3d.models.vqvae",
    "UNet3D": "ldm3d.models.unet3d",
    "LPIPS": "ldm3d.models.lpips",
    "make_quantizer": "ldm3d.models.quantizers",
    "VQTrainer": "ldm3d.train.vq_trainer",
    "GANTrainer": "ldm3d.train.gan_trainer",
    "DiffusionTrainer": "ldm3d.train.dm_trainer",
    "CheckpointManager": "ldm3d.train.checkpoint",
    "fit": "ldm3d.train.loop",
    "fit_with_recovery": "ldm3d.train.loop",
    "make_schedule": "ldm3d.diffusion.schedule",
    "sample_latents": "ldm3d.diffusion.ddpm",
    "sample_latents_ddim": "ldm3d.diffusion.ddpm",
    "make_mesh": "ldm3d.parallel.mesh",
    "shard_batch": "ldm3d.parallel.mesh",
    "get_preset": "ldm3d.core.presets",
    "list_presets": "ldm3d.core.presets",
    "ExperimentConfig": "ldm3d.core.config",
    "DataLoader": "ldm3d.data.pipeline",
    "VolumeCache": "ldm3d.data.pipeline",
    "GenerationService": "ldm3d.serve",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'ldm3d' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
