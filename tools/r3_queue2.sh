#!/bin/bash
# Round-3 TPU run queue, phase 2 (after the rooflines).
#
#   1. vqgan_attn convergence run (VERDICT r2 next-3): 60 epochs =
#      40 warm-up + 20 adversarial on the 1232-volume corpus. The
#      adversarial program OOMs at lbs 8 (27 GB > 15.75 GB HBM, measured
#      runs/r3_roofline.log), so start at the probed lbs given in $1.
#   2. Stage-2 comparison runs (VERDICT r2 next-4), flagship first so
#      bench.py gets trained weights even if the round ends early:
#      T=1000 eps -> T=500 eps -> T=1000 v-pred + min-SNR-5; 50 epochs,
#      EMA 0.999, latent-FID/MMD every 10 epochs.
set -u
cd /root/repo

exec 9>/tmp/r3_queue.lock
flock -n 9 || { echo "[queue2] another instance holds the lock; exiting"; exit 1; }

GAN_LBS="${1:-4}"
COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"

for lbs in $GAN_LBS 2; do
  t0=$(date +%s)
  echo "[queue2] vqgan_attn lbs=$lbs start $(date -u +%H:%M:%S)"
  timeout 14400 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
    $COMMON --ckpt_dir runs/ckpt_vqgan_r3 --epochs 60 --lbs $lbs \
    --suffix vqgan --image_log_freq 20 >> runs/r3_vqgan.log 2>&1
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  echo "[queue2] vqgan_attn lbs=$lbs rc=$rc after ${dt}s"
  [ $rc -eq 0 ] && break
  [ $dt -gt 7200 ] && break   # died deep in: keep the ckpts, move on
  rm -rf runs/ckpt_vqgan_r3
done

DM="--preset conditional_dm3d --norm group --train_dm $COMMON --lbs 8 \
    --epochs 50 --fidelity_freq 10 --fidelity_samples 64 --ema_decay 0.999 \
    --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq"

echo "[queue2] dm T=1000 eps (flagship refresh) start $(date -u +%H:%M:%S)"
# the round-2 flagship ckpt predates the Conv3DTranspose semantics fix
# (stale stage-1) and lacks the EMA subtree — clear it so orbax does not
# refuse the new run's epoch numbers
rm -rf runs/ckpt_flagship/flagship_dm
timeout 7200 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --ckpt_dir runs/ckpt_flagship --suffix flagship > runs/r3_dm1000.log 2>&1
echo "[queue2] dm T=1000 rc=$?"

echo "[queue2] dm T=500 eps start $(date -u +%H:%M:%S)"
timeout 7200 python -m ldm3d.cli.main $DM --timesteps 500 \
  --ckpt_dir runs/ckpt_dm_t500 --suffix dm500 > runs/r3_dm500.log 2>&1
echo "[queue2] dm T=500 rc=$?"

echo "[queue2] dm T=1000 v-pred start $(date -u +%H:%M:%S)"
timeout 7200 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --prediction_type v --min_snr_gamma 5 \
  --ckpt_dir runs/ckpt_dm_vpred --suffix dmv > runs/r3_dmv.log 2>&1
echo "[queue2] dm v-pred rc=$?"

echo "[queue2] ALL DONE $(date -u +%H:%M:%S)"
touch /tmp/r3_queue2_done
