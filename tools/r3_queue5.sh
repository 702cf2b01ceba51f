#!/bin/bash
# Round-3 TPU run queue, phase 5: resume after the relay wedge.
#
# The phase-4 stage-1 retrain lost ~50 min to a TPU-relay hang (epoch 33
# took ~3000 s with both trainer and relay idle — upstream stall, not
# host contention) and would have been cut by its own timeout at epoch
# ~37/60, so the queue was stopped at epoch 35 and this script:
#   1. resumes stage-1 from epoch 35 to the planned 60;
#   2. runs the same DM T=1000 / T=500 / v-pred comparisons as phase 4;
#   3. runs the vqgan_attn convergence last (checkpoints per epoch; the
#      report reads training.log wherever it stops).
set -u
cd /root/repo

exec 9>/tmp/r3_queue.lock
flock -n 9 || { echo "[queue5] another instance holds the lock; exiting"; exit 1; }

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"

echo "[queue5] stage-1 resume (36..60) start $(date -u +%H:%M:%S)"
timeout 7200 python -m ldm3d.cli.main --preset vqvae_dm_stage1 --norm group \
  --train_vq $COMMON --ckpt_dir runs/ckpt_flagship_gn --epochs 60 --lbs 8 \
  --suffix flagship --resume_ckpt 35 >> runs/r3_stage1.log 2>&1
echo "[queue5] stage-1 rc=$? at $(date -u +%H:%M:%S)"
touch /tmp/r3_stage1_done

DM="--preset conditional_dm3d --norm group --train_dm $COMMON --lbs 8 \
    --epochs 50 --fidelity_freq 10 --fidelity_samples 64 --ema_decay 0.999 \
    --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq"

echo "[queue5] dm T=1000 eps (flagship) start $(date -u +%H:%M:%S)"
timeout 5400 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --ckpt_dir runs/ckpt_flagship --suffix flagship > runs/r3_dm1000.log 2>&1
echo "[queue5] dm T=1000 rc=$?"
touch /tmp/r3_dm1000_done

echo "[queue5] dm T=500 eps start $(date -u +%H:%M:%S)"
timeout 5400 python -m ldm3d.cli.main $DM --timesteps 500 \
  --ckpt_dir runs/ckpt_dm_t500 --suffix dm500 > runs/r3_dm500.log 2>&1
echo "[queue5] dm T=500 rc=$?"

echo "[queue5] dm T=1000 v-pred start $(date -u +%H:%M:%S)"
timeout 5400 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --prediction_type v --min_snr_gamma 5 \
  --ckpt_dir runs/ckpt_dm_vpred --suffix dmv > runs/r3_dmv.log 2>&1
echo "[queue5] dm v-pred rc=$?"
touch /tmp/r3_dm_all_done

echo "[queue5] vqgan_attn start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 18000 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
  $COMMON --ckpt_dir runs/ckpt_vqgan_r3 --epochs 34 --lbs 2 \
  --disc_threshold 10 --suffix vqgan --image_log_freq 10 \
  > runs/r3_vqgan.log 2>&1
echo "[queue5] vqgan_attn rc=$? after $(( $(date +%s) - t0 ))s"

echo "[queue5] ALL DONE $(date -u +%H:%M:%S)"
touch /tmp/r3_queue5_done
