#!/bin/bash
# Round-4 GAN escalation, serialized behind queue3 (VERDICT r3 next-3).
#
# Phase-4 A/B verdict: fixed weights diverge slowly (r3: SSIM 0.88 -> 0.24
# over 20 adversarial epochs); --adaptive_gan_weight ALONE diverges
# instantly (r4: SSIM 0.88 -> 0.0004 within 2 epochs, lambda ~= 53 against
# untrained critics). Escalation stack, all three levers together:
#   --g_adv_delay 3       critics train 3 epochs before the generator
#                         listens to them (lambda sees real gradients)
#   --adaptive_g_max 2.0  tight lambda clamp
#   --r1_gamma 10         critic Lipschitz control (R1 on real inputs)
set -u
cd /root/repo
mkdir -p runs reports/quality_r4

exec 9>/tmp/r4_queue4.lock
flock -n 9 || { echo "another queue4 holds the lock"; exit 1; }

echo "[r4q4] waiting for queue3 (/tmp/r4_queue3_done_rc) $(date -u +%H:%M:%S)"
while [ ! -f /tmp/r4_queue3_done_rc ]; do sleep 60; done
echo "[r4q4] starting $(date -u +%H:%M:%S)"

timeout 14400 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
  --synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 \
  --val_perc 0.1 --ckpt_dir runs/ckpt_vqgan_stab --epochs 24 --lbs 2 \
  --disc_threshold 8 --adaptive_gan_weight --adaptive_g_max 2.0 \
  --g_adv_delay 3 --r1_gamma 10.0 --suffix vqgan \
  --image_log_freq 8 --auto_resume 2 --ckpt_freq 4 \
  > runs/r4_vqgan_stab.log 2>&1
rc=$?
echo "[r4q4] rc=$rc after training"

G=runs/ckpt_vqgan_stab/vqgan_vq/training.log
[ -f "$G" ] && timeout 300 python tools/quality_report.py "$G" \
  --out reports/quality_r4/vqgan_stab_report.md \
  --png reports/quality_r4/vqgan_stab_curves.png || true
echo "[r4q4] DONE $(date -u +%H:%M:%S)"
echo 0 > /tmp/r4_queue4_done_rc
