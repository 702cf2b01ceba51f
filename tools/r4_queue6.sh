#!/bin/bash
# Round-4 queue 6, serialized behind queue5:
#   1. 2-class scaled parity arm: the reference's exact conditioning setup
#      (context_dim=1, networks/conditional_dm3d.py:334) trained with the
#      latent-scale fix — does unit-variance diffusion space rescue
#      conditioning even when the class signal is a 0.1%-of-voxels lesion?
#   2. VQ-GAN stabilizer run (VERDICT r3 next-3, rescheduled from the
#      never-started queue4): all three levers together after the r4 A/B
#      showed fixed weights diverge slowly and adaptive-alone collapses
#      instantly (reports/quality_r4/vqgan_ab.md).
set -u
cd /root/repo
mkdir -p runs reports/quality_r4

exec 9>/tmp/r4_queue6.lock
flock -n 9 || { echo "another queue6 holds the lock"; exit 1; }

echo "[r4q6] waiting for queue5 (/tmp/r4_queue5_done_rc) $(date -u +%H:%M:%S)"
while [ ! -f /tmp/r4_queue5_done_rc ]; do sleep 60; done
echo "[r4q6] starting $(date -u +%H:%M:%S)"

COMMON2="--synthetic --device_data --num_synthetic 1232 \
  --cache_dir runs/corpus128 --val_perc 0.1"
SCALED="--latent_scale 20.8340 --clip_sample_range 0"
DM2="--preset conditional_dm3d --norm group $COMMON2 --lbs 8 \
  --timesteps 500 --cfg_dropout 0.1 --ema_decay 0.999 $SCALED \
  --train_dm --cache_latents --epochs 100 --ckpt_freq 25 \
  --fidelity_freq 25 --fidelity_samples 64 --fidelity_by_class \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq --suffix flagship"

echo "[r4q6] 2-class scaled parity arm $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 2700 python -m ldm3d.cli.main $DM2 --ckpt_dir runs/ckpt_c2s \
  > runs/r4_c2s.log 2>&1
echo "[r4q6] c2s rc=$? after $(( $(date +%s) - t0 ))s"
if [ -d runs/ckpt_c2s/flagship_dm ]; then
  timeout 900 python tools/context_effect.py --ckpt runs/ckpt_c2s/flagship_dm \
    > reports/quality_r4/conditioning_v3/context_effect_c2s.md 2>&1 || true
fi
echo 0 > /tmp/r4_c2s_rc

echo "[r4q6] VQ-GAN stabilizer run $(date -u +%H:%M:%S)"
timeout 14400 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
  --synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 \
  --val_perc 0.1 --ckpt_dir runs/ckpt_vqgan_stab --epochs 24 --lbs 2 \
  --disc_threshold 8 --adaptive_gan_weight --adaptive_g_max 2.0 \
  --g_adv_delay 3 --r1_gamma 10.0 --suffix vqgan \
  --image_log_freq 8 --auto_resume 2 --ckpt_freq 4 \
  > runs/r4_vqgan_stab.log 2>&1
rc=$?
echo "[r4q6] vqgan_stab rc=$rc $(date -u +%H:%M:%S)"

G=runs/ckpt_vqgan_stab/vqgan_vq/training.log
[ -f "$G" ] && timeout 300 python tools/quality_report.py "$G" \
  --out reports/quality_r4/vqgan_stab_report.md \
  --png reports/quality_r4/vqgan_stab_curves.png || true

echo "[r4q6] DONE $(date -u +%H:%M:%S)"
echo 0 > /tmp/r4_queue6_done_rc
