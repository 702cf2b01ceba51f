#!/bin/bash
# Round-3 MFU lever sweep (run AFTER the r3_queue4 training queue frees the
# chip — /tmp/r3_queue4_done exists). VERDICT r2 next-6 "done" bar: >16% MFU
# on the VQ step or a measured >=80%-of-HBM-BW ceiling; levers here:
#   1. remat granularity (full / conv-saveable / off)
#   2. XLA latency-hiding scheduler flag
#   3. batch scaling (padding amortization on thin-channel convs)
#   4. the cached-latents DM step (removes the frozen encode entirely)
#   5. sampling-program roofline (attributes the headline bench)
set -u
cd /root/repo
exec 9>/tmp/r3_queue.lock
flock -n 9 || { echo "[mfu] queue still holds the chip; exiting"; exit 1; }

{
  echo "== r3 MFU levers $(date -u +%H:%M:%S) =="
  for ARGS in "" "--no_remat" "--remat_policy conv"; do
    timeout 600 python tools/bench_train.py --only vq --batch 8 --runs 3 $ARGS
  done
  timeout 600 python tools/bench_train.py --only vq --batch 16 --runs 3 \
    --remat_policy conv
  timeout 600 python tools/bench_train.py --only vq --batch 8 --runs 3 \
    --no_remat --xla_flags "--xla_tpu_enable_latency_hiding_scheduler=true"
  timeout 600 python tools/bench_train.py --only dm --batch 8 --runs 3
  timeout 600 python tools/bench_train.py --only dm --batch 8 --runs 5 \
    --dm_latents
  timeout 600 python tools/bench_train.py --only dm --batch 32 --runs 5 \
    --dm_latents
  timeout 900 python tools/bench_train.py --only gan --batch 2 --runs 3
  timeout 900 python tools/bench_train.py --only sample --batch 16 --runs 2
  timeout 900 python tools/bench_train.py --only sample --batch 32 --runs 2
  echo "== done $(date -u +%H:%M:%S) =="
} >> runs/r3_mfu.log 2>&1
echo "[mfu] results in runs/r3_mfu.log"
