#!/bin/bash
# Round-5 queue, take 5 — resume the widened-flagship retrain after a
# relay stall ate take 4's phase budget (watchdog killed+relaunched at
# 03:28; the 5400 s deadline would have stranded training at epoch ~25).
# Same recipe, leaner fidelity cadence (full-T probes every 25 epochs),
# fresh budget; then export+bench (acceptance gate), probes, chip A/Bs.
set -u
cd /root/repo
mkdir -p runs reports/quality_r5

exec 9>/tmp/r5_queue.lock
flock -n 9 || { echo "another r5 queue holds the lock"; exit 1; }

log() { echo "[r5q5] $1 $(date -u +%H:%M:%S)"; }
WD="bash tools/with_watchdog.sh 1500"

COMMON4="--synthetic --device_data --num_synthetic 1232 --num_classes 4 \
  --cache_dir runs/corpus128 --val_perc 0.1"

# ---- B3: resume widened flagship DM ---------------------------------------
DM="--preset conditional_dm3d --norm group $COMMON4 --lbs 8 \
  --timesteps 500 --cfg_dropout 0.1 --ema_decay 0.999 \
  --train_dm --cache_latents --epochs 150 --ckpt_freq 25 \
  --fidelity_freq 25 --fidelity_samples 64 --fidelity_by_class \
  --image_log_freq 150 --auto_resume 2 --resume_ckpt -1 \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq --suffix flagship"
log "B3 resume widened flagship DM"
t0=$(date +%s)
$WD 4500 runs/r5_flagship_dm_wide.log python -m ldm3d.cli.main $DM \
  --ckpt_dir runs/ckpt_flagship
rc=$?
log "B3 rc=$rc after $(( $(date +%s) - t0 ))s"
echo $rc > /tmp/r5_B3_rc

# ---- D: durable snapshot + sanity bench (the acceptance gate) -------------
if [ -d runs/ckpt_flagship/flagship_dm ]; then
  log "D export committed snapshot"
  timeout 1800 python tools/export_flagship.py > runs/r5_export.log 2>&1
  log "D export rc=$?"
  log "D sanity bench (trained weights)"
  timeout 3000 python bench.py > runs/r5_bench_check.json \
    2> runs/r5_bench_check.log
  log "D bench rc=$?"
  tail -1 runs/r5_bench_check.json || true
fi
echo 0 > /tmp/r5_D_rc

# ---- C: probes ------------------------------------------------------------
if [ -d runs/ckpt_flagship/flagship_dm ]; then
  log "C context-effect probe"
  timeout 1500 python tools/context_effect.py \
    --ckpt runs/ckpt_flagship/flagship_dm --num_classes 4 \
    > reports/quality_r5/context_effect_flagship.md 2>&1 || true
  log "C by-class fidelity sweep"
  timeout 2700 python -m ldm3d.cli.main --preset conditional_dm3d \
    --norm group $COMMON4 --lbs 8 --cfg_dropout 0.1 --ema_decay 0.999 \
    --fidelity_sweep --fidelity_by_class --fidelity_samples 64 \
    --sweep_samplers "ddpm,ddim:50" --guidance_grid "none,3.0" \
    --ckpt_dir runs/ckpt_flagship --suffix flagship \
    --out_dir reports/quality_r5/flagship \
    > runs/r5_sweep_flagship.log 2>&1 || true
fi
echo 0 > /tmp/r5_C_rc

# ---- G: owed chip A/Bs -----------------------------------------------------
log "G s2d stem A/B"
timeout 2400 python tools/bench_train.py --s2d_stem \
  > reports/quality_r5/s2d_stem_ab.txt 2>&1 || true
log "G channel-padding A/B"
timeout 2400 python tools/bench_train.py --pad_channels \
  > reports/quality_r5/pad_channels_ab.txt 2>&1 || true
echo 0 > /tmp/r5_G_rc

log "QUEUE DONE"
echo 0 > /tmp/r5_queue5_done_rc
