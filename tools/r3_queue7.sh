#!/bin/bash
# Round-3 TPU run queue, phase 7: flagship stage-2 upgrade.
#
# The r3 DM comparison (reports/quality_r3/dm_comparison.md) showed the
# T=1000 eps flagship has the worst sample fidelity of the three recipes
# (latent-FID 205.8 vs 109.5 for v-pred+minSNR at the same T). This phase
# retrains the flagship conditional DM with the best-known recipe and the
# two trainer features built for it this round:
#   - v-prediction + min-SNR-5 loss weighting
#   - classifier-free guidance (cfg_dropout 0.1 -> null token trained)
#   - EMA 0.999 sampling weights
#   - --cache_latents (exact; lets 200 epochs fit where 50 did before)
# then runs the sampler x guidance fidelity sweep on the result.
#
# Blocking flock: starts as soon as phase 6 (vqgan resume) releases.
set -u
cd /root/repo

exec 9>/tmp/r3_queue.lock
flock 9

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"
DM="--preset conditional_dm3d --norm group $COMMON --lbs 8 \
    --timesteps 1000 --prediction_type v --min_snr_gamma 5 \
    --cfg_dropout 0.1 --ema_decay 0.999"

# keep the old eps flagship around for reference; train fresh
if [ -d runs/ckpt_flagship/flagship_dm ] && [ ! -d runs/ckpt_flagship_eps ]; then
  mv runs/ckpt_flagship runs/ckpt_flagship_eps
fi

echo "[queue7] flagship v-pred retrain start $(date -u +%H:%M:%S)"
timeout 10800 python -m ldm3d.cli.main $DM --train_dm --cache_latents \
  --epochs 200 --fidelity_freq 25 --fidelity_samples 64 \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq \
  --ckpt_dir runs/ckpt_flagship --suffix flagship \
  > runs/r3_flagship_vpred.log 2>&1
echo "[queue7] flagship retrain rc=$? at $(date -u +%H:%M:%S)"
touch /tmp/r3_flagship_done

echo "[queue7] fidelity sweep start $(date -u +%H:%M:%S)"
timeout 7200 python -m ldm3d.cli.main $DM --fidelity_sweep \
  --fidelity_samples 64 \
  --sweep_samplers "ddpm,ddim:50,dpmpp:25" \
  --guidance_grid "none,1.5,2.0,3.0,5.0" \
  --ckpt_dir runs/ckpt_flagship --suffix flagship \
  --out_dir reports/quality_r3 \
  > runs/r3_fidelity_sweep.log 2>&1
echo "[queue7] fidelity sweep rc=$? at $(date -u +%H:%M:%S)"
touch /tmp/r3_queue7_done
