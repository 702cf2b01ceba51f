#!/bin/bash
# Round-3 TPU run queue, phase 4 (fresh environment — runs/ was wiped by
# the session reset, so every checkpoint must be retrained from scratch).
#
# Ordering is chosen for cut-off tolerance: the flagship DM refresh runs
# right after its stage-1 dependency so bench.py measures trained weights
# even if the round ends early; the GAN convergence run goes last with
# the largest timeout because it checkpoints per epoch and its report
# reads training.log regardless of where it stops.
#   1. stage-1 GN retrain (fresh Conv3DTranspose semantics), 60 epochs.
#   2. DM T=1000 eps (flagship; bench.py target), 50 epochs.
#   3. DM T=500 eps (reference apples-to-apples), 50 epochs.
#   4. DM T=1000 v-pred + min-SNR-5, 50 epochs.
#   5. vqgan_attn convergence: lbs 2 (adversarial OOMs at 4+, measured
#      r2), disc_threshold 10 so adversarial epochs actually happen.
set -u
cd /root/repo

exec 9>/tmp/r3_queue.lock
flock -n 9 || { echo "[queue4] another instance holds the lock; exiting"; exit 1; }

mkdir -p runs
COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"

echo "[queue4] stage-1 GN retrain start $(date -u +%H:%M:%S)"
timeout 10800 python -m ldm3d.cli.main --preset vqvae_dm_stage1 --norm group \
  --train_vq $COMMON --ckpt_dir runs/ckpt_flagship_gn --epochs 60 --lbs 8 \
  --suffix flagship > runs/r3_stage1.log 2>&1
echo "[queue4] stage-1 rc=$? at $(date -u +%H:%M:%S)"
touch /tmp/r3_stage1_done

DM="--preset conditional_dm3d --norm group --train_dm $COMMON --lbs 8 \
    --epochs 50 --fidelity_freq 10 --fidelity_samples 64 --ema_decay 0.999 \
    --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq"

echo "[queue4] dm T=1000 eps (flagship) start $(date -u +%H:%M:%S)"
timeout 5400 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --ckpt_dir runs/ckpt_flagship --suffix flagship > runs/r3_dm1000.log 2>&1
echo "[queue4] dm T=1000 rc=$?"
touch /tmp/r3_dm1000_done

echo "[queue4] dm T=500 eps start $(date -u +%H:%M:%S)"
timeout 5400 python -m ldm3d.cli.main $DM --timesteps 500 \
  --ckpt_dir runs/ckpt_dm_t500 --suffix dm500 > runs/r3_dm500.log 2>&1
echo "[queue4] dm T=500 rc=$?"

echo "[queue4] dm T=1000 v-pred start $(date -u +%H:%M:%S)"
timeout 5400 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --prediction_type v --min_snr_gamma 5 \
  --ckpt_dir runs/ckpt_dm_vpred --suffix dmv > runs/r3_dmv.log 2>&1
echo "[queue4] dm v-pred rc=$?"
touch /tmp/r3_dm_all_done

echo "[queue4] vqgan_attn start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 18000 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
  $COMMON --ckpt_dir runs/ckpt_vqgan_r3 --epochs 34 --lbs 2 \
  --disc_threshold 10 --suffix vqgan --image_log_freq 10 \
  > runs/r3_vqgan.log 2>&1
echo "[queue4] vqgan_attn rc=$? after $(( $(date +%s) - t0 ))s"

echo "[queue4] ALL DONE $(date -u +%H:%M:%S)"
touch /tmp/r3_queue4_done
