#!/bin/bash
# Round-4 conditioning v3: the latent-scale fix.
#
# Post-mortem of conditioning v2 (runs/r4_c4_{A,B}.log): the 4-class
# corpus runs produced noise_mse trajectories BIT-IDENTICAL to the
# 2-class flagship and fid_class_sep < 0. Root cause is not the corpus or
# the pathway: the frozen stage-1 latents have std 0.0480, so with
# latent_scale 1 (reference behavior) x_t is ~99.8% injected noise at
# every timestep — eps(x_t) barely depends on the data, let alone the
# class token (the CLI itself prints "for unit-variance latents train
# with --latent_scale 20.8340"). Two measurement bugs compounded it:
# fidelity_eval hard-coded contexts [0,1] (classes 2/3 never sampled on
# the 4-class corpus -> fid_class_sep biased negative) and FID features
# scaled with latent_scale (cross-recipe numbers incomparable). Both
# fixed in this commit.
#
# This queue trains the same two pathway arms with unit-variance latents
# (SD-style scale_factor, Rombach et al. 2022) and clipping disabled
# (clip 1.0 would clamp unit-variance latents at 1 sigma):
#   arm A: cross-attention only (reference pathway)
#   arm B: + context_in_time (ADM-style, additive time-embedding)
# then probes both: eps-space context effect + sampler x guidance
# by-class fidelity sweep. Acceptance (VERDICT r3 next-1):
# fid_class_sep >> 0, context effect >> 1%, guidance moves FID.
set -u
cd /root/repo
mkdir -p runs reports/quality_r4/conditioning_v3

exec 9>/tmp/r4_queue5.lock
flock -n 9 || { echo "another queue5 holds the lock"; exit 1; }

COMMON="--synthetic --device_data --num_synthetic 1232 --num_classes 4 \
  --cache_dir runs/corpus128 --val_perc 0.1"
SCALED="--latent_scale 20.8340 --clip_sample_range 0"
DM="--preset conditional_dm3d --norm group $COMMON --lbs 8 \
  --timesteps 500 --cfg_dropout 0.1 --ema_decay 0.999 $SCALED \
  --train_dm --cache_latents --epochs 100 --ckpt_freq 25 \
  --fidelity_freq 25 --fidelity_samples 64 --fidelity_by_class \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq --suffix flagship"

for arm in A B; do
  ckpt=runs/ckpt_c4s_$arm; cit=""
  [ $arm = B ] && cit="--context_in_time"
  echo "[r4q5] arm $arm train start $(date -u +%H:%M:%S)"
  t0=$(date +%s)
  timeout 2700 python -m ldm3d.cli.main $DM $cit --ckpt_dir $ckpt \
    > runs/r4_c4s_$arm.log 2>&1
  rc=$?
  echo "[r4q5] arm $arm rc=$rc after $(( $(date +%s) - t0 ))s"
  if [ $rc -ne 0 ] && ! grep -q "epoch 100/100" runs/r4_c4s_$arm.log; then
    # one retry: the v2 arm-A run died on a transient relay
    # FAILED_PRECONDITION during checkpoint restore
    echo "[r4q5] arm $arm retry $(date -u +%H:%M:%S)"
    timeout 2700 python -m ldm3d.cli.main $DM $cit --ckpt_dir $ckpt \
      > runs/r4_c4s_$arm.log 2>&1
    echo "[r4q5] arm $arm retry rc=$?"
  fi
done
echo 0 > /tmp/r4_c4s_trained_rc

for arm in A B; do
  ckpt=runs/ckpt_c4s_$arm; cit=""
  [ $arm = B ] && cit="--context_in_time"
  [ -d $ckpt/flagship_dm ] || continue
  echo "[r4q5] context-effect probe arm $arm $(date -u +%H:%M:%S)"
  timeout 900 python tools/context_effect.py --ckpt $ckpt/flagship_dm \
    --num_classes 4 $cit \
    > reports/quality_r4/conditioning_v3/context_effect_$arm.md 2>&1 || true
  echo "[r4q5] by-class sweep arm $arm $(date -u +%H:%M:%S)"
  timeout 2700 python -m ldm3d.cli.main --preset conditional_dm3d \
    --norm group $COMMON --lbs 8 --timesteps 500 --cfg_dropout 0.1 \
    --ema_decay 0.999 $SCALED $cit --fidelity_sweep --fidelity_by_class \
    --fidelity_samples 64 --sweep_samplers "ddpm,ddim:50" \
    --guidance_grid "none,1.5,3.0" --ckpt_dir $ckpt --suffix flagship \
    --out_dir reports/quality_r4/conditioning_v3/arm$arm \
    > runs/r4_c4s_sweep_$arm.log 2>&1 || true
done

timeout 300 python tools/conditioning_ab.py \
  "scaled-xattn=reports/quality_r4/conditioning_v3/armA/fidelity_sweep_flagship.json" \
  "scaled-context-in-time=reports/quality_r4/conditioning_v3/armB/fidelity_sweep_flagship.json" \
  --out reports/quality_r4/conditioning_v3/ab.md 2>/dev/null || true

echo "[r4q5] DONE $(date -u +%H:%M:%S)"
echo 0 > /tmp/r4_queue5_done_rc
