#!/bin/bash
# Round-3 TPU run queue, phase 6: finish the vqgan_attn convergence run.
#
# Phase 5 was cut at vqgan epoch 14/34 (adversarial phase had just begun
# at disc_threshold=10). Resume from the epoch-14 checkpoint to the
# planned 34 epochs; the report reads training.log wherever it stops.
set -u
cd /root/repo

exec 9>/tmp/r3_queue.lock
flock -n 9 || { echo "[queue6] another instance holds the lock; exiting"; exit 1; }

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"

echo "[queue6] vqgan_attn resume (15..34) start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 14400 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
  $COMMON --ckpt_dir runs/ckpt_vqgan_r3 --epochs 34 --lbs 2 \
  --disc_threshold 10 --suffix vqgan --image_log_freq 10 \
  --resume_ckpt 14 >> runs/r3_vqgan.log 2>&1
echo "[queue6] vqgan_attn rc=$? after $(( $(date +%s) - t0 ))s"
touch /tmp/r3_vqgan_done
