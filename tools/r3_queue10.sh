#!/bin/bash
# Round-3 TPU run queue, phase 10: checkpoint recovery after VM reset.
#
# A session reset wiped runs/ (all orbax checkpoints + XLA compile cache).
# The quality evidence from phases 4-7 is committed under
# reports/quality_r3/; what is NOT recoverable in the remaining wall-clock
# is the full 60-epoch stage-1 + 200-epoch stage-2 flagship. This phase
# retrains a COMPRESSED flagship with the identical recipe (v-pred +
# min-SNR-5 + CFG dropout + EMA 0.999, GroupNorm stage-1, TF-exact
# transpose semantics) so that the driver's end-of-round bench.py measures
# sampling throughput from trained weights rather than random init.
# Epoch counts are the only difference from tools/r3_queue{4,7}.sh; the
# committed reports remain the quality record.
set -u
cd /root/repo

exec 9>/tmp/r3_queue.lock
flock 9

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"

echo "[queue10] stage-1 GN compressed retrain start $(date -u +%H:%M:%S)"
timeout 2700 python -m ldm3d.cli.main --preset vqvae_dm_stage1 --norm group \
  --train_vq $COMMON --ckpt_dir runs/ckpt_flagship_gn --epochs 14 --lbs 8 \
  --suffix flagship > runs/r3_stage1_q10.log 2>&1
echo "[queue10] stage-1 rc=$? at $(date -u +%H:%M:%S)"
touch /tmp/r3_q10_stage1_done

DM="--preset conditional_dm3d --norm group $COMMON --lbs 8 \
    --timesteps 1000 --prediction_type v --min_snr_gamma 5 \
    --cfg_dropout 0.1 --ema_decay 0.999"

echo "[queue10] stage-2 flagship compressed retrain start $(date -u +%H:%M:%S)"
timeout 1800 python -m ldm3d.cli.main $DM --train_dm --cache_latents \
  --epochs 120 \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq \
  --ckpt_dir runs/ckpt_flagship --suffix flagship \
  > runs/r3_flagship_q10.log 2>&1
echo "[queue10] stage-2 rc=$? at $(date -u +%H:%M:%S)"
touch /tmp/r3_queue10_done
