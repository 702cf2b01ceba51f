#!/bin/bash
# Round-5 queue, take 6 — fresh VM again (runs/ wiped before take 5's
# export phase ran, so the trained widened flagship was lost AGAIN).
# This take is sized to a ~1 h session and makes the artifact durable
# EARLY: the flagship DM trains in two chunks with an export + committed
# f16 snapshot between them, so a mid-session reset can no longer strand
# the round without trained weights.
#   A   4-class corpus + stage-1 GN VQ-VAE (12 epochs — PSNR ~31 dB is
#       plenty to carry the conditioning proof; 45-ep polish does not fit)
#   B1  widened flagship conditional DM, chunk 1 (24 epochs)
#   D1  export committed f16 snapshot + trained-weights bench check
#   B2  resume to 54 epochs (best-FID pinning keeps the best epoch)
#   D2  re-export (only keeps the better checkpoint)
#   C   probes: context effect + by-class sampler x guidance sweep
#   G   owed chip A/Bs: s2d stem + channel padding
#   F   VQ-GAN stabilizer (short)
# Every training phase runs under tools/with_watchdog.sh (relay hangs are
# killed by exact PID and resumed via --resume_ckpt -1).
set -u
cd /root/repo
mkdir -p runs reports/quality_r5

exec 9>/tmp/r5_queue.lock
flock -n 9 || { echo "another r5 queue holds the lock"; exit 1; }

log() { echo "[r5q6] $1 $(date -u +%H:%M:%S)"; }
WD="bash tools/with_watchdog.sh 1200"

COMMON4="--synthetic --device_data --num_synthetic 1232 --num_classes 4 \
  --cache_dir runs/corpus128 --val_perc 0.1"

# ---- A: corpus + stage-1 ---------------------------------------------------
log "A stage-1 start"
t0=$(date +%s)
$WD 2800 runs/r5_stage1.log python -m ldm3d.cli.main \
  --preset vqvae_dm_stage1 --norm group --train_vq $COMMON4 \
  --ckpt_dir runs/ckpt_flagship_gn --epochs 12 --lbs 8 --suffix flagship \
  --resume_ckpt -1 --auto_resume 3 --ckpt_freq 3
rc=$?
log "A stage-1 rc=$rc after $(( $(date +%s) - t0 ))s"
echo $rc > /tmp/r5_A_rc
if [ ! -d runs/ckpt_flagship_gn/flagship_vq ]; then
  log "A FAILED - no stage-1 checkpoint; aborting queue"
  exit 1
fi

DM="--preset conditional_dm3d --norm group $COMMON4 --lbs 8 \
  --timesteps 500 --cfg_dropout 0.1 --ema_decay 0.999 \
  --train_dm --cache_latents --ckpt_freq 6 \
  --fidelity_freq 6 --fidelity_samples 48 --fidelity_by_class \
  --image_log_freq 150 --auto_resume 2 --resume_ckpt -1 \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq --suffix flagship"

export_and_check() {
  log "D export committed snapshot"
  timeout 1200 python tools/export_flagship.py >> runs/r5_export.log 2>&1
  log "D export rc=$?"
  log "D sanity bench (trained weights)"
  timeout 2400 python bench.py > runs/r5_bench_check.json \
    2> runs/r5_bench_check.log
  log "D bench rc=$?"
  tail -1 runs/r5_bench_check.json || true
}

# ---- B1: widened flagship DM, chunk 1 -------------------------------------
log "B1 flagship DM chunk 1 (24 ep)"
t0=$(date +%s)
$WD 2000 runs/r5_flagship_dm.log python -m ldm3d.cli.main $DM \
  --epochs 24 --ckpt_dir runs/ckpt_flagship
log "B1 rc=$? after $(( $(date +%s) - t0 ))s"
echo 0 > /tmp/r5_B1_rc

# ---- D1: durable snapshot NOW (acceptance gate insurance) -----------------
if [ -d runs/ckpt_flagship/flagship_dm ]; then
  export_and_check
  touch /tmp/r5_D1_done
fi

# ---- B2: resume to 54 epochs ----------------------------------------------
log "B2 flagship DM chunk 2 (to 54 ep)"
t0=$(date +%s)
$WD 2200 runs/r5_flagship_dm.log python -m ldm3d.cli.main $DM \
  --epochs 54 --ckpt_dir runs/ckpt_flagship
log "B2 rc=$? after $(( $(date +%s) - t0 ))s"
echo 0 > /tmp/r5_B2_rc

# ---- D2: re-export the better checkpoint ----------------------------------
if [ -d runs/ckpt_flagship/flagship_dm ]; then
  export_and_check
  touch /tmp/r5_D2_done
fi

# ---- C: probes ------------------------------------------------------------
if [ -d runs/ckpt_flagship/flagship_dm ]; then
  log "C context-effect probe"
  timeout 1200 python tools/context_effect.py \
    --ckpt runs/ckpt_flagship/flagship_dm --num_classes 4 \
    > reports/quality_r5/context_effect_flagship.md 2>&1 || true
  log "C by-class fidelity sweep"
  timeout 2400 python -m ldm3d.cli.main --preset conditional_dm3d \
    --norm group $COMMON4 --lbs 8 --cfg_dropout 0.1 --ema_decay 0.999 \
    --fidelity_sweep --fidelity_by_class --fidelity_samples 48 \
    --sweep_samplers "ddpm,ddim:50" --guidance_grid "none,3.0" \
    --ckpt_dir runs/ckpt_flagship --suffix flagship \
    --out_dir reports/quality_r5/flagship \
    > runs/r5_sweep_flagship.log 2>&1 || true
fi
echo 0 > /tmp/r5_C_rc

# ---- G: owed chip A/Bs -----------------------------------------------------
log "G s2d stem A/B"
timeout 2000 python tools/bench_train.py --s2d_stem \
  > reports/quality_r5/s2d_stem_ab.txt 2>&1 || true
log "G channel-padding A/B"
timeout 2000 python tools/bench_train.py --pad_channels \
  > reports/quality_r5/pad_channels_ab.txt 2>&1 || true
echo 0 > /tmp/r5_G_rc

# ---- F: VQ-GAN stabilizer --------------------------------------------------
log "F VQ-GAN stabilizer start"
t0=$(date +%s)
$WD 3600 runs/r5_vqgan_stab.log python -m ldm3d.cli.main \
  --preset vqgan_attn --train_vq $COMMON4 \
  --ckpt_dir runs/ckpt_vqgan_stab --epochs 15 --lbs 2 \
  --disc_threshold 5 --adaptive_gan_weight --adaptive_g_max 2.0 \
  --g_adv_delay 3 --r1_gamma 10.0 --suffix vqgan \
  --image_log_freq 6 --auto_resume 2 --resume_ckpt -1 --ckpt_freq 3
log "F vqgan_stab rc=$? after $(( $(date +%s) - t0 ))s"
G=runs/ckpt_vqgan_stab/vqgan_vq/training.log
[ -f "$G" ] && timeout 600 python tools/quality_report.py "$G" \
  --out reports/quality_r5/vqgan_stab_report.md \
  --png reports/quality_r5/vqgan_stab_curves.png || true
echo 0 > /tmp/r5_F_rc

log "QUEUE DONE"
echo 0 > /tmp/r5_queue6_done_rc
