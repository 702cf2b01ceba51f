#!/bin/bash
# Round-3 TPU run queue (VERDICT r2 next-3 and next-4).
#
# Waits for the in-flight stage-1 GN retrain (fresh Conv3DTranspose
# semantics), then serially:
#   1. vqgan_attn convergence run: 70 epochs = 40 warm-up + 30 adversarial
#      ("well past disc_threshold"), 1232-volume corpus. Largest batch
#      that fits wins (OOM fails fast -> retry smaller).
#   2. Three stage-2 comparison runs on the frozen stage-1: T=500 eps
#      (reference apples-to-apples), T=1000 eps (refreshes the bench
#      flagship ckpt), T=1000 v-pred + min-SNR-5 — each logging
#      latent-FID/MMD every 10 epochs.
set -u
cd /root/repo

# single-instance guard: two queues would fight over the one TPU chip
exec 9>/tmp/r3_queue.lock
flock -n 9 || { echo "[queue] another instance holds the lock; exiting"; exit 1; }

STAGE1_PID="${1:-}"
if [ -n "$STAGE1_PID" ]; then
  while kill -0 "$STAGE1_PID" 2>/dev/null; do sleep 30; done
fi
echo "[queue] stage-1 done at $(date -u +%H:%M:%S)"

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"

# -- 0. Roofline benches (VERDICT r2 next-6) ------------------------------
# GAN warm + adversarial step rooflines at bs8 double as the memory probe
# for the convergence run; VQ remat A/B is MFU lever #1.
{
  echo "== roofline $(date -u +%H:%M:%S) =="
  timeout 900 python tools/bench_train.py --only gan --batch 8 --runs 3
  gan_rc=$?
  echo "gan_bench_rc=$gan_rc"
  timeout 600 python tools/bench_train.py --only vq --batch 8 --runs 3
  timeout 600 python tools/bench_train.py --only vq --batch 8 --runs 3 --no_remat
  timeout 600 python tools/bench_train.py --only vq --batch 8 --runs 3 --remat_policy conv
  timeout 600 python tools/bench_train.py --only dm --batch 8 --runs 3
} >> runs/r3_roofline.log 2>&1

# -- 1. VQGAN convergence -------------------------------------------------
for lbs in 8 4 2; do
  t0=$(date +%s)
  echo "[queue] vqgan_attn lbs=$lbs start $(date -u +%H:%M:%S)"
  timeout 16200 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
    $COMMON --ckpt_dir runs/ckpt_vqgan_r3 --epochs 70 --lbs $lbs \
    --suffix vqgan --image_log_freq 10 >> runs/r3_vqgan.log 2>&1
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  echo "[queue] vqgan_attn lbs=$lbs rc=$rc after ${dt}s"
  [ $rc -eq 0 ] && break
  # long-lived failure/timeout: keep whatever converged, move on
  [ $dt -gt 900 ] && break
done

# -- 2. DM comparison runs ------------------------------------------------
DM="--preset conditional_dm3d --norm group --train_dm $COMMON --lbs 8 \
    --epochs 60 --fidelity_freq 10 --fidelity_samples 64 --ema_decay 0.999 \
    --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq"

echo "[queue] dm T=500 eps start $(date -u +%H:%M:%S)"
timeout 7200 python -m ldm3d.cli.main $DM --timesteps 500 \
  --ckpt_dir runs/ckpt_dm_t500 --suffix dm500 > runs/r3_dm500.log 2>&1
echo "[queue] dm T=500 rc=$?"

echo "[queue] dm T=1000 eps (flagship refresh) start $(date -u +%H:%M:%S)"
timeout 7200 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --ckpt_dir runs/ckpt_flagship --suffix flagship > runs/r3_dm1000.log 2>&1
echo "[queue] dm T=1000 rc=$?"

echo "[queue] dm T=1000 v-pred start $(date -u +%H:%M:%S)"
timeout 7200 python -m ldm3d.cli.main $DM --timesteps 1000 \
  --prediction_type v --min_snr_gamma 5 \
  --ckpt_dir runs/ckpt_dm_vpred --suffix dmv > runs/r3_dmv.log 2>&1
echo "[queue] dm v-pred rc=$?"

echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
touch /tmp/r3_queue_done
