"""Recalibrate a trained VQ-VAE checkpoint's BatchNorm running statistics.

BN eval mode uses running averages (momentum .99) that can lag the final
parameters' activation distribution — observed as val-loss spikes while
train loss is smooth on the 4-level 8^3-bottleneck config. This restores a
stage-1 checkpoint, runs forward-only passes over the training corpus to
re-estimate batch_stats (params / codebook / optimizer untouched), and
saves the result as epoch <orig> into --out_dir (default: <ckpt_dir>_bnr).

Run: python tools/recalibrate_bn.py --preset vqvae_dm_stage1 \
         --ckpt_dir runs/ckpt_flagship/flagship_vq \
         --cache_dir runs/corpus128 --num_synthetic 1232 --passes 3
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--cache_dir", required=True)
    ap.add_argument("--num_synthetic", type=int, default=None,
                    help="use the zero-transfer on-device synthetic "
                         "source with this corpus size")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--lbs", type=int, default=8)
    args = ap.parse_args(argv)

    from bench import _enable_compile_cache
    _enable_compile_cache()

    import jax

    from ldm3d.core.config import replace
    from ldm3d.core.presets import get_preset
    from ldm3d.train.checkpoint import CheckpointManager
    from ldm3d.train.vq_trainer import VQTrainer

    cfg = get_preset(args.preset)
    tcfg = replace(cfg.train, batch_size=args.lbs)
    size = cfg.data.volume_size

    if args.num_synthetic:
        from ldm3d.data.pipeline import DeviceSyntheticLoader, train_val_split
        tr, _ = train_val_split(args.num_synthetic, tcfg.val_fraction,
                                tcfg.seed)
        loader = DeviceSyntheticLoader(
            args.num_synthetic, args.lbs, cfg.data,
            corpus_seed=tcfg.seed, seed=tcfg.seed, train=False, indices=tr)
    else:
        from ldm3d.data.pipeline import (DataLoader, VolumeCache,
                                         train_val_split)
        cache = VolumeCache(args.cache_dir)
        tr, _ = train_val_split(cache, tcfg.val_fraction, tcfg.seed)
        loader = DataLoader(cache, args.lbs, cfg.data, seed=tcfg.seed,
                            train=False, indices=tr)

    trainer = VQTrainer(cfg.vqvae, tcfg)
    state = trainer.init_state(
        jax.random.PRNGKey(tcfg.seed),
        (args.lbs, size, size, size, cfg.vqvae.in_channels))
    state, epoch = CheckpointManager(args.ckpt_dir).restore(
        jax.device_get(state), args.epoch)
    print(f"restored epoch {epoch} from {args.ckpt_dir}")

    state = trainer.recalibrate_batch_stats(state, loader,
                                            passes=args.passes)

    out_dir = args.out_dir or args.ckpt_dir.rstrip("/") + "_bnr"
    mgr = CheckpointManager(out_dir, keep=2)
    mgr.save(epoch, jax.device_get(state))
    mgr.wait()
    print(f"recalibrated batch_stats ({args.passes} passes) -> "
          f"{out_dir} (epoch {epoch})")


if __name__ == "__main__":
    main()
