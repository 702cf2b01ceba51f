#!/bin/bash
# Round-4 follow-up: conditioning v2 on the 4-class corpus.
#
# Phase-3 post-mortem (reports/quality_r4/conditioning_ab.md): BOTH arms
# (xattn-only and +context_in_time) track identical fidelity trajectories
# with fid_class_sep ~= 0 at every probe — because the 2-class corpus's
# only class signal is a lesion covering ~0.1% of voxels, a near-zero
# eps-loss gradient. The corpus, not the conditioning pathway, was the
# bottleneck. --num_classes 4 makes classes GLOBALLY distinct (texture
# band, multi-focal lesions, brain shape; ldm3d/data/synthetic.py), so
# conditioning is learnable and fid_class_sep is measurable.
#
# Waits for the main r4 queue (phase 4 + bench) to finish, then trains
# the winning T500-eps recipe on the 4-class corpus: arm A2 xattn-only
# (the reference pathway), arm B2 +context_in_time.
set -u
cd /root/repo
mkdir -p runs reports/quality_r4/conditioning_v2

exec 9>/tmp/r4_queue2.lock
flock -n 9 || { echo "another queue2 holds the lock"; exit 1; }

echo "[r4q2] waiting for main queue (/tmp/r4_all_rc) $(date -u +%H:%M:%S)"
while [ ! -f /tmp/r4_all_rc ]; do sleep 60; done
echo "[r4q2] main queue done, starting $(date -u +%H:%M:%S)"

# Redo of the phase-3 arm-A by-class sweep: the original failed on a
# mixed-version import (the long-lived queue process lazily imported the
# newly-edited pipeline.py against an already-imported old config.py,
# runs/r4_byclass_A.log AttributeError). Fresh process = consistent code.
echo "[r4q2] arm A (2-class) sweep redo $(date -u +%H:%M:%S)"
timeout 4500 python -m ldm3d.cli.main --preset conditional_dm3d \
  --norm group --synthetic --device_data --num_synthetic 1232 \
  --cache_dir runs/corpus128 --val_perc 0.1 --lbs 8 --timesteps 500 \
  --cfg_dropout 0.1 --ema_decay 0.999 --fidelity_sweep \
  --fidelity_by_class --fidelity_samples 64 \
  --sweep_samplers "ddpm,ddim:50" --guidance_grid "none,3.0" \
  --ckpt_dir runs/ckpt_flagship --suffix flagship \
  --out_dir reports/quality_r4/conditioning/armA \
  > runs/r4_byclass_A_redo.log 2>&1 || true
timeout 300 python tools/conditioning_ab.py \
  "xattn-only=reports/quality_r4/conditioning/armA/fidelity_sweep_flagship.json" \
  "context-in-time=reports/quality_r4/conditioning/armB/fidelity_sweep_flagship.json" \
  --out reports/quality_r4/conditioning_ab.md 2>/dev/null || true

COMMON="--synthetic --device_data --num_synthetic 1232 --num_classes 4 \
  --cache_dir runs/corpus128 --val_perc 0.1"
DM="--preset conditional_dm3d --norm group $COMMON --lbs 8 \
  --timesteps 500 --cfg_dropout 0.1 --ema_decay 0.999 \
  --train_dm --cache_latents --epochs 100 --ckpt_freq 25 \
  --fidelity_freq 25 --fidelity_samples 64 --fidelity_by_class \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq --suffix flagship"

echo "[r4q2] arm A2 (xattn-only, 4-class) start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 4500 python -m ldm3d.cli.main $DM \
  --ckpt_dir runs/ckpt_flagship_c4 > runs/r4_c4_A.log 2>&1
echo "[r4q2] arm A2 rc=$? after $(( $(date +%s) - t0 ))s"

echo "[r4q2] arm B2 (+context_in_time, 4-class) start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 4500 python -m ldm3d.cli.main $DM --context_in_time \
  --ckpt_dir runs/ckpt_flagship_c4_cit > runs/r4_c4_B.log 2>&1
echo "[r4q2] arm B2 rc=$? after $(( $(date +%s) - t0 ))s"
echo 0 > /tmp/r4_c4_trained_rc

for arm in A B; do
  ckpt=runs/ckpt_flagship_c4; cit=""
  [ $arm = B ] && { ckpt=runs/ckpt_flagship_c4_cit; cit="--context_in_time"; }
  [ -d $ckpt/flagship_dm ] || continue
  echo "[r4q2] context-effect probe arm $arm $(date -u +%H:%M:%S)"
  timeout 900 python tools/context_effect.py --ckpt $ckpt/flagship_dm \
    --num_classes 4 $cit \
    > reports/quality_r4/conditioning_v2/context_effect_$arm.md 2>&1 || true
  echo "[r4q2] by-class sweep arm $arm $(date -u +%H:%M:%S)"
  timeout 2700 python -m ldm3d.cli.main --preset conditional_dm3d \
    --norm group $COMMON --lbs 8 --timesteps 500 --cfg_dropout 0.1 \
    --ema_decay 0.999 $cit --fidelity_sweep --fidelity_by_class \
    --fidelity_samples 64 --sweep_samplers "ddpm,ddim:50" \
    --guidance_grid "none,3.0" --ckpt_dir $ckpt --suffix flagship \
    --out_dir reports/quality_r4/conditioning_v2/arm$arm \
    > runs/r4_c4_sweep_$arm.log 2>&1 || true
done

timeout 300 python tools/conditioning_ab.py \
  "c4-xattn=reports/quality_r4/conditioning_v2/armA/fidelity_sweep_flagship.json" \
  "c4-context-in-time=reports/quality_r4/conditioning_v2/armB/fidelity_sweep_flagship.json" \
  --out reports/quality_r4/conditioning_v2/ab.md 2>/dev/null || true

echo "[r4q2] DONE $(date -u +%H:%M:%S)"
echo 0 > /tmp/r4_queue2_done_rc
