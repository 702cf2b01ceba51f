#!/bin/bash
# Round-3 endgame (run after stopping the GAN run; chip must be free):
# headline bench on the retrained flagship, the two new bench_train
# probes, and the VQ-GAN convergence report. Each step is independently
# skippable under time pressure — priority order as listed.
set -u
cd /root/repo
{
  echo "== bench.py (trained r3 flagship) $(date -u +%H:%M:%S)"
  timeout 900 python bench.py
  echo "== dm cached-latents step roofline"
  timeout 600 python tools/bench_train.py --only dm --dm_latents \
    --batch 8 --runs 5
  echo "== gan step (fake-forward CSE) roofline"
  timeout 900 python tools/bench_train.py --only gan --batch 2 --runs 3
  echo "== done $(date -u +%H:%M:%S)"
} >> runs/r3_final.log 2>&1
timeout 300 python tools/quality_report.py \
  runs/ckpt_vqgan_r3/vqgan_vq/training.log \
  --out reports/quality_r3/vqgan_report.md \
  --png reports/quality_r3/vqgan_curves.png
tail -20 runs/r3_final.log
