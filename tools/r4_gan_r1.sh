#!/bin/bash
# Round-4 escalation (VERDICT r3 next-3, decided from the phase-4 A/B):
# if --adaptive_gan_weight alone does not hold val SSIM >= ~0.8 through the
# adversarial phase, add critic Lipschitz control via the R1 gradient
# penalty and rerun a shortened epoch-for-epoch arm (the r3 divergence
# showed SSIM collapse within ~6 epochs of disc_threshold, so 16 epochs
# with threshold 8 exposes the failure mode).
set -u
cd /root/repo
mkdir -p runs reports/quality_r4

exec 9>/tmp/r4_gan_r1.lock
flock -n 9 || { echo "another queue holds the lock"; exit 1; }

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"

echo "[r4-r1] vqgan adaptive+R1 start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 10800 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
  $COMMON --ckpt_dir runs/ckpt_vqgan_r1 --epochs 16 --lbs 2 \
  --disc_threshold 8 --adaptive_gan_weight --r1_gamma 10.0 --suffix vqgan \
  --image_log_freq 8 --auto_resume 2 \
  > runs/r4_vqgan_r1.log 2>&1
rc=$?
echo "[r4-r1] rc=$rc after $(( $(date +%s) - t0 ))s"
echo $rc > /tmp/r4_gan_r1_rc

G=runs/ckpt_vqgan_r1/vqgan_vq/training.log
[ -f "$G" ] && timeout 300 python tools/quality_report.py "$G" \
  --out reports/quality_r4/vqgan_r1_report.md \
  --png reports/quality_r4/vqgan_r1_curves.png || true
echo "[r4-r1] DONE $(date -u +%H:%M:%S)"
