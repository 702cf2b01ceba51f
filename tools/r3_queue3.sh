#!/bin/bash
# Round-3 TPU run queue, phase 3 (restructured mid-round).
#
# Why the restructure: at the measured ~500 s/epoch (lbs 2, 554 steps),
# the phase-2 GAN run would have hit its 4 h timeout near epoch 28 —
# before the preset's disc_threshold=40 — so the adversarial phase would
# never have trained. This queue:
#   1. Refreshes the flagship DM first (bench.py measures trained weights;
#      the round-2 ckpt predates the Conv3DTranspose semantics fix).
#   2. Resumes the GAN run from its last warm-up epoch with
#      --disc_threshold 10 so ~16 adversarial epochs actually happen
#      within the wall clock (VERDICT r2 next-3).
#   3. Runs the T=500 eps and T=1000 v-pred comparison runs
#      (VERDICT r2 next-4).
set -u
cd /root/repo

exec 9>/tmp/r3_queue.lock
flock -n 9 || { echo "[queue3] another instance holds the lock; exiting"; exit 1; }

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"
DM="--preset conditional_dm3d --norm group --train_dm $COMMON --lbs 8 \
    --epochs 50 --fidelity_freq 10 --fidelity_samples 64 --ema_decay 0.999 \
    --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq"

echo "[queue3] dm T=1000 eps (flagship refresh) start $(date -u +%H:%M:%S)"
# round-2 flagship DM ckpt is stale (pre-transpose-fix stage-1, no EMA
# subtree) — clear so orbax does not refuse the new run's epoch numbers
rm -rf runs/ckpt_flagship/flagship_dm
timeout 5400 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --ckpt_dir runs/ckpt_flagship --suffix flagship > runs/r3_dm1000.log 2>&1
echo "[queue3] dm T=1000 rc=$?"
touch /tmp/r3_dm1000_done

LAST=$(ls runs/ckpt_vqgan_r3/vqgan_vq | grep -E '^[0-9]+$' | sort -n | tail -1)
echo "[queue3] vqgan_attn resume from epoch $LAST, disc_threshold 10, start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 21600 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
  $COMMON --ckpt_dir runs/ckpt_vqgan_r3 --epochs 26 --lbs 2 \
  --disc_threshold 10 --resume_ckpt "$LAST" \
  --suffix vqgan --image_log_freq 10 >> runs/r3_vqgan.log 2>&1
echo "[queue3] vqgan_attn rc=$? after $(( $(date +%s) - t0 ))s"
touch /tmp/r3_vqgan_done

echo "[queue3] dm T=500 eps start $(date -u +%H:%M:%S)"
timeout 5400 python -m ldm3d.cli.main $DM --timesteps 500 \
  --ckpt_dir runs/ckpt_dm_t500 --suffix dm500 > runs/r3_dm500.log 2>&1
echo "[queue3] dm T=500 rc=$?"

echo "[queue3] dm T=1000 v-pred start $(date -u +%H:%M:%S)"
timeout 5400 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --prediction_type v --min_snr_gamma 5 \
  --ckpt_dir runs/ckpt_dm_vpred --suffix dmv > runs/r3_dmv.log 2>&1
echo "[queue3] dm v-pred rc=$?"

echo "[queue3] ALL DONE $(date -u +%H:%M:%S)"
touch /tmp/r3_queue3_done
