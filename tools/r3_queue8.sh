#!/bin/bash
# Round-3 TPU run queue, phase 8: adaptive-generator-weight VQ-GAN A/B.
#
# The fixed-weight vqgan_attn convergence run (runs/r3_vqgan.log,
# reports/quality_r3/vqgan_report.md) shows the adversarial phase
# overpowering reconstruction: val_ssim 0.88 at warm-up end (epoch 10)
# decays to 0.2-0.4 once the WGAN generator term activates, with gen_loss
# drifting 11 -> 20+. This phase reruns the exact same recipe with
# --adaptive_gan_weight (Esser et al. 2021 eq. 7 lambda =
# ||grad_rec||/||grad_adv||, ldm3d/train/gan_trainer.py) for 24 epochs
# (10 warm + 14 adversarial) — epoch-for-epoch comparable to the fixed
# run, which had already collapsed to val_ssim 0.42 by epoch 24 — then
# regenerates the quality_r3 reports with an A/B table.
#
# Blocking flock: starts when queue7 (flagship v-pred retrain + fidelity
# sweep) releases. Gated on the adaptive-weight unit test so a red test
# can't burn 3 h of chip time.
set -u
cd /root/repo

exec 9>/tmp/r3_queue.lock
flock 9

echo "[queue8] gate: adaptive-weight unit test $(date -u +%H:%M:%S)"
if ! timeout 900 python -m pytest \
    "tests/test_vqgan.py::test_adaptive_gan_weight_scales_adversarial_term" \
    -x -q > runs/r3_queue8_gate.log 2>&1; then
  echo "[queue8] GATE FAILED — see runs/r3_queue8_gate.log; aborting"
  touch /tmp/r3_queue8_gate_failed
  exit 1
fi
echo "[queue8] gate green"

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"

echo "[queue8] vqgan_attn adaptive run start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 14400 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
  $COMMON --ckpt_dir runs/ckpt_vqgan_adaptive --epochs 24 --lbs 2 \
  --disc_threshold 10 --adaptive_gan_weight --suffix vqgan \
  --image_log_freq 10 \
  > runs/r3_vqgan_adaptive.log 2>&1
echo "[queue8] vqgan adaptive rc=$? after $(( $(date +%s) - t0 ))s"

echo "[queue8] reports $(date -u +%H:%M:%S)"
bash tools/r3_report.sh > runs/r3_report8.log 2>&1 || true
GANA=runs/ckpt_vqgan_adaptive/vqgan_vq/training.log
GANF=runs/ckpt_vqgan_r3/vqgan_vq/training.log
if [ -f "$GANA" ]; then
  timeout 300 python tools/quality_report.py "$GANA" \
    --out reports/quality_r3/vqgan_adaptive_report.md \
    --png reports/quality_r3/vqgan_adaptive_curves.png || true
  timeout 300 python tools/gan_ab.py \
    "fixed=$GANF" "adaptive=$GANA" --threshold 10 \
    --out reports/quality_r3/vqgan_ab.md \
    --png reports/quality_r3/vqgan_ab.png || true
fi

echo "[queue8] bench on retrained flagship $(date -u +%H:%M:%S)"
timeout 900 python bench.py >> runs/r3_final2.log 2>&1 || true

echo "[queue8] ALL DONE $(date -u +%H:%M:%S)"
touch /tmp/r3_queue8_done
