#!/bin/bash
# Round-5 queue, take 3 (fresh VM — runs/ wiped again, so take 2's resume
# targets are gone). Retrain everything from scratch with both round-5
# fixes active by default (AUTO latent scale + mean-MSE loss), sized to
# fit one session's wall clock:
#   A  4-class corpus + stage-1 GN VQ-VAE (45 epochs, ~1.5h)
#   B  flagship conditional DM, 4-class (200 ep cap / 2h deadline;
#      best-FID pinning makes overtraining safe to cut short)
#   C  probes: context effect + by-class sampler x guidance sweep
#   D  export committed f16 snapshot + sanity bench from trained weights
#   G  owed chip A/Bs: s2d stem + channel padding (moved BEFORE F: short,
#      guaranteed PERF signal)
#   F  VQ-GAN stabilizer (18 ep, disc_threshold 6 -> 12 adversarial epochs)
#   E  2-class parity arm: run manually afterwards if time remains.
# Every phase runs under tools/with_watchdog.sh (relay hangs are killed by
# exact PID and resumed via --resume_ckpt -1). Phases B..F proceed even if
# the previous phase timed out, as long as its checkpoint exists.
set -u
cd /root/repo
mkdir -p runs reports/quality_r5

exec 9>/tmp/r5_queue.lock
flock -n 9 || { echo "another r5 queue holds the lock"; exit 1; }

log() { echo "[r5q3] $1 $(date -u +%H:%M:%S)"; }
WD="bash tools/with_watchdog.sh 900"

COMMON4="--synthetic --device_data --num_synthetic 1232 --num_classes 4 \
  --cache_dir runs/corpus128 --val_perc 0.1"

# ---- A: corpus + stage-1 ---------------------------------------------------
log "A stage-1 start"
t0=$(date +%s)
$WD 9000 runs/r5_stage1.log python -m ldm3d.cli.main \
  --preset vqvae_dm_stage1 --norm group --train_vq $COMMON4 \
  --ckpt_dir runs/ckpt_flagship_gn --epochs 45 --lbs 8 --suffix flagship \
  --resume_ckpt -1 --auto_resume 3
rc=$?
log "A stage-1 rc=$rc after $(( $(date +%s) - t0 ))s"
echo $rc > /tmp/r5_A_rc
if [ ! -d runs/ckpt_flagship_gn/flagship_vq ]; then
  log "A FAILED - no stage-1 checkpoint; aborting queue"
  exit 1
fi

# ---- B: flagship conditional DM (mean loss + AUTO latent scale) ------------
DM="--preset conditional_dm3d --norm group $COMMON4 --lbs 8 \
  --timesteps 500 --cfg_dropout 0.1 --ema_decay 0.999 \
  --train_dm --cache_latents --epochs 200 --ckpt_freq 20 \
  --fidelity_freq 10 --fidelity_samples 64 --fidelity_by_class \
  --image_log_freq 100 --auto_resume 2 --resume_ckpt -1 \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq --suffix flagship"
log "B flagship DM start"
t0=$(date +%s)
$WD 7200 runs/r5_flagship_dm.log python -m ldm3d.cli.main $DM \
  --ckpt_dir runs/ckpt_flagship
rc=$?
log "B flagship DM rc=$rc after $(( $(date +%s) - t0 ))s"
echo $rc > /tmp/r5_B_rc

# ---- C: probes ------------------------------------------------------------
if [ -d runs/ckpt_flagship/flagship_dm ]; then
  log "C context-effect probe"
  timeout 1800 python tools/context_effect.py \
    --ckpt runs/ckpt_flagship/flagship_dm --num_classes 4 \
    > reports/quality_r5/context_effect_flagship.md 2>&1 || true
  log "C by-class fidelity sweep"
  timeout 4200 python -m ldm3d.cli.main --preset conditional_dm3d \
    --norm group $COMMON4 --lbs 8 --cfg_dropout 0.1 --ema_decay 0.999 \
    --fidelity_sweep --fidelity_by_class --fidelity_samples 64 \
    --sweep_samplers "ddpm,ddim:50,dpmpp:25" \
    --guidance_grid "none,1.5,3.0" --ckpt_dir runs/ckpt_flagship \
    --suffix flagship --out_dir reports/quality_r5/flagship \
    > runs/r5_sweep_flagship.log 2>&1 || true
fi
echo 0 > /tmp/r5_C_rc

# ---- D: durable snapshot + sanity bench -----------------------------------
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

# ---- G: owed chip A/Bs (before F: short + guaranteed signal) ---------------
log "G s2d stem A/B"
timeout 2400 python tools/bench_train.py --s2d_stem \
  > reports/quality_r5/s2d_stem_ab.txt 2>&1 || true
log "G channel-padding A/B"
timeout 2400 python tools/bench_train.py --pad_channels \
  > reports/quality_r5/pad_channels_ab.txt 2>&1 || true
echo 0 > /tmp/r5_G_rc

# ---- F: VQ-GAN stabilizer --------------------------------------------------
log "F VQ-GAN stabilizer start"
t0=$(date +%s)
$WD 7200 runs/r5_vqgan_stab.log python -m ldm3d.cli.main \
  --preset vqgan_attn --train_vq $COMMON4 \
  --ckpt_dir runs/ckpt_vqgan_stab --epochs 18 --lbs 2 \
  --disc_threshold 6 --adaptive_gan_weight --adaptive_g_max 2.0 \
  --g_adv_delay 3 --r1_gamma 10.0 --suffix vqgan \
  --image_log_freq 6 --auto_resume 2 --resume_ckpt -1 --ckpt_freq 3
log "F vqgan_stab rc=$? after $(( $(date +%s) - t0 ))s"
G=runs/ckpt_vqgan_stab/vqgan_vq/training.log
[ -f "$G" ] && timeout 600 python tools/quality_report.py "$G" \
  --out reports/quality_r5/vqgan_stab_report.md \
  --png reports/quality_r5/vqgan_stab_curves.png || true
echo 0 > /tmp/r5_F_rc

log "QUEUE DONE"
echo 0 > /tmp/r5_queue_done_rc
