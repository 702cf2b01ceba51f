#!/bin/bash
# Round-5 phase E — 2-class reference-parity arm (VERDICT r4 next-1 second
# half). Run manually after tools/r5_queue3.sh finishes if wall clock
# remains. Own 2-class corpus (healthy/tumor, the reference's actual
# setting, sb_cond_dm3d.sbatch), same stage-1, mean loss + AUTO latent
# scale. EPOCHS trimmed via $1 (default 100).
set -u
cd /root/repo
mkdir -p runs reports/quality_r5
EPOCHS=${1:-100}
log() { echo "[r5E] $1 $(date -u +%H:%M:%S)"; }
WD="bash tools/with_watchdog.sh 900"

COMMON2="--synthetic --device_data --num_synthetic 1232 \
  --cache_dir runs/corpus128_c2 --val_perc 0.1"
DM2="--preset conditional_dm3d --norm group $COMMON2 --lbs 8 \
  --timesteps 500 --cfg_dropout 0.1 --ema_decay 0.999 \
  --train_dm --cache_latents --epochs $EPOCHS --ckpt_freq 20 \
  --fidelity_freq 10 --fidelity_samples 64 --fidelity_by_class \
  --auto_resume 2 --resume_ckpt -1 \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq --suffix flagship"
log "E 2-class parity arm start ($EPOCHS epochs)"
t0=$(date +%s)
$WD 5400 runs/r5_c2s.log python -m ldm3d.cli.main $DM2 \
  --ckpt_dir runs/ckpt_c2s
log "E c2s rc=$? after $(( $(date +%s) - t0 ))s"
if [ -d runs/ckpt_c2s/flagship_dm ]; then
  timeout 1500 python tools/context_effect.py --ckpt runs/ckpt_c2s/flagship_dm \
    --num_classes 2 \
    > reports/quality_r5/context_effect_c2s.md 2>&1 || true
  timeout 2400 python -m ldm3d.cli.main --preset conditional_dm3d \
    --norm group $COMMON2 --lbs 8 --cfg_dropout 0.1 --ema_decay 0.999 \
    --fidelity_sweep --fidelity_by_class --fidelity_samples 64 \
    --sweep_samplers "ddpm,ddim:50" --guidance_grid "none,3.0" \
    --ckpt_dir runs/ckpt_c2s --suffix flagship \
    --out_dir reports/quality_r5/c2s \
    > runs/r5_sweep_c2s.log 2>&1 || true
fi
log "E done"
echo 0 > /tmp/r5_E_rc
