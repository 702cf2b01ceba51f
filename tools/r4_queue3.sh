#!/bin/bash
# Round-4 tail: conv-padding lever measurement (VERDICT r3 next-5) +
# end-of-round verification, serialized behind queue2.
set -u
cd /root/repo
mkdir -p runs reports/quality_r4

exec 9>/tmp/r4_queue3.lock
flock -n 9 || { echo "another queue3 holds the lock"; exit 1; }

echo "[r4q3] waiting for queue2 (/tmp/r4_queue2_done_rc) $(date -u +%H:%M:%S)"
while [ ! -f /tmp/r4_queue2_done_rc ]; do sleep 60; done
echo "[r4q3] starting $(date -u +%H:%M:%S)"

# --- s2d stem A/B on the chip (same batch/remat grid as the r3 roofline)
{
  echo "== vq baseline (remat full) =="
  timeout 1200 python tools/bench_train.py --only vq --runs 5
  echo "== vq + s2d stem =="
  timeout 1200 python tools/bench_train.py --only vq --runs 5 --s2d_stem
  echo "== vq no-remat baseline =="
  timeout 1200 python tools/bench_train.py --only vq --runs 5 --no_remat
  echo "== vq no-remat + s2d stem =="
  timeout 1200 python tools/bench_train.py --only vq --runs 5 --no_remat --s2d_stem
} > runs/r4_s2d_ab.log 2>&1
grep '"metric"' runs/r4_s2d_ab.log || true
echo 0 > /tmp/r4_s2d_rc

# --- end-of-round verification: entry compile (TPU), multichip dryrun (CPU)
timeout 900 python __graft_entry__.py > runs/r4_entry_check.log 2>&1
echo "entry rc=$?"
timeout 900 python __graft_entry__.py dryrun 8 >> runs/r4_entry_check.log 2>&1
echo "dryrun rc=$?"

# --- fast test tier (warm compile cache)
t0=$(date +%s)
timeout 1800 python -m pytest tests/ -q -m 'not slow' -p no:cacheprovider \
  > runs/r4_fasttier.log 2>&1
echo "fast tier rc=$? in $(( $(date +%s) - t0 ))s"
tail -1 runs/r4_fasttier.log

# --- final headline bench (best-FID flagship restore)
timeout 1800 python bench.py > runs/r4_bench_final.log 2>&1
tail -1 runs/r4_bench_final.log

echo "[r4q3] DONE $(date -u +%H:%M:%S)"
echo 0 > /tmp/r4_queue3_done_rc
