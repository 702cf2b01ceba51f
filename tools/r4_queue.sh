#!/bin/bash
# Round-4 TPU run queue — the VERDICT r3 "next round" chip jobs, serialized.
#
# Phase 1  stage-1 completion: resume the GN flagship VQ-VAE from the
#          queue10 epoch-14 checkpoint to the full 60-epoch budget.
# Phase 2  DM recipe sweep (VERDICT next-2): T in {500,1000} x {eps,
#          v-pred+minSNR5} at equal 60-epoch budget on cached latents
#          (fused epochs), each with end-of-run latent-FID; the best-FID
#          arm is auto-selected as the flagship recipe.
# Phase 3  conditioning A/B (VERDICT next-1): the winning recipe trained
#          200 epochs without (arm A) and with (arm B) --context_in_time,
#          both scored with per-class fidelity; by-class fidelity sweeps
#          + conditioning_ab report.
# Phase 4  VQ-GAN stability A/B (VERDICT next-3): 24-epoch
#          --adaptive_gan_weight rerun of the r3 fixed-weight divergence
#          recipe (escalation to --r1_gamma decided from the A/B).
#
# ADVICE r3 items applied: mkdir -p runs up front; later phases gate on
# their dependency's checkpoint; markers encode the exit code.
set -u
cd /root/repo
mkdir -p runs reports/quality_r4/conditioning

exec 9>/tmp/r4_queue.lock
flock -n 9 || { echo "another queue holds the lock"; exit 1; }

mark() { echo "$2" > "/tmp/r4_${1}_rc"; }

echo "[r4] gate: targeted unit tests $(date -u +%H:%M:%S)"
if ! timeout 1800 python -m pytest \
    "tests/test_vqgan.py::test_adaptive_gan_weight_scales_adversarial_term" \
    "tests/test_vqgan.py::test_r1_penalty_bounds_critic_slope" \
    "tests/test_dm_trainer.py::test_fused_epoch_matches_sequential" \
    "tests/test_dm_trainer.py::test_fused_latent_loader_yields_epoch_perm" \
    "tests/test_diffusion.py::test_context_in_time_strengthens_conditioning" \
    "tests/test_fid.py::test_fidelity_eval_by_class_reports_separation" \
    -q > runs/r4_gate.log 2>&1; then
  echo "[r4] GATE FAILED — see runs/r4_gate.log; aborting"
  mark gate 1; exit 1
fi
mark gate 0
echo "[r4] gate green $(date -u +%H:%M:%S)"

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"

# ---- Phase 1: stage-1 GN completion (resume 14 -> 60) ----------------------
echo "[r4] phase 1: stage-1 resume 14->60 start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 9000 python -m ldm3d.cli.main --preset vqvae_dm_stage1 --norm group \
  --train_vq $COMMON --ckpt_dir runs/ckpt_flagship_gn --epochs 60 --lbs 8 \
  --suffix flagship --resume_ckpt 14 --auto_resume 3 \
  > runs/r4_stage1.log 2>&1
rc=$?
echo "[r4] phase 1 rc=$rc after $(( $(date +%s) - t0 ))s"
mark stage1 $rc
# later phases restore the LATEST stage-1 epoch; require at least epoch 20
# so a phase-1 crash can't silently hand phase 2 the old 14-epoch ckpt
ls runs/ckpt_flagship_gn/flagship_vq/ | grep -qE '^(2[0-9]|[3-9][0-9])$' || {
  echo "[r4] stage-1 below epoch 20 — aborting queue"; exit 1; }

timeout 300 python tools/quality_report.py \
  runs/ckpt_flagship_gn/flagship_vq/training.log \
  --out reports/quality_r4/stage1_report.md \
  --png reports/quality_r4/stage1_curves.png || true

# ---- Phase 2: DM recipe sweep (equal budget, fused cached-latent) ----------
DMBASE="--preset conditional_dm3d --norm group $COMMON --lbs 8 \
  --cfg_dropout 0.1 --ema_decay 0.999 --train_dm --cache_latents \
  --epochs 60 --ckpt_freq 30 --fidelity_freq 30 --fidelity_samples 64 \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq --suffix flagship"

run_arm() {  # name extra-flags
  local name=$1; shift
  echo "[r4] phase 2 arm $name start $(date -u +%H:%M:%S)"
  local t=$(date +%s)
  timeout 3600 python -m ldm3d.cli.main $DMBASE "$@" \
    --ckpt_dir "runs/ckpt_dm_$name" > "runs/r4_dm_$name.log" 2>&1
  echo "[r4] arm $name rc=$? after $(( $(date +%s) - t ))s"
}

run_arm t500_eps  --timesteps 500
run_arm t500_v    --timesteps 500  --prediction_type v --min_snr_gamma 5
run_arm t1000_eps --timesteps 1000
run_arm t1000_v   --timesteps 1000 --prediction_type v --min_snr_gamma 5
mark phase2 0

timeout 300 python tools/dm_comparison.py \
  "T500-eps=runs/ckpt_dm_t500_eps/flagship_dm/training.log" \
  "T500-v=runs/ckpt_dm_t500_v/flagship_dm/training.log" \
  "T1000-eps=runs/ckpt_dm_t1000_eps/flagship_dm/training.log" \
  "T1000-v=runs/ckpt_dm_t1000_v/flagship_dm/training.log" \
  --out reports/quality_r4/dm_recipe_sweep.md || true

# winner = min final latent_fid across arms (metrics.jsonl)
python - <<'EOF' > runs/r4_winner.env
import json
best, cfgs = None, {
    "t500_eps":  "--timesteps 500",
    "t500_v":    "--timesteps 500 --prediction_type v --min_snr_gamma 5",
    "t1000_eps": "--timesteps 1000",
    "t1000_v":   "--timesteps 1000 --prediction_type v --min_snr_gamma 5",
}
for name, flags in cfgs.items():
    fid = None
    try:
        for row in open(f"runs/ckpt_dm_{name}/flagship_dm/metrics.jsonl"):
            rec = json.loads(row)
            if "latent_fid" in rec:
                fid = rec["latent_fid"]
    except OSError:
        continue
    if fid is not None and (best is None or fid < best[1]):
        best = (name, fid, flags)
if best is None:
    best = ("t500_v", float("nan"),
            "--timesteps 500 --prediction_type v --min_snr_gamma 5")
print(f'WINNER_NAME={best[0]}')
print(f'WINNER_FID={best[1]}')
print(f'WINNER_FLAGS="{best[2]}"')
EOF
cat runs/r4_winner.env
. runs/r4_winner.env

# ---- Phase 3: conditioning A/B on the winning recipe -----------------------
DMWIN="--preset conditional_dm3d --norm group $COMMON --lbs 8 \
  --cfg_dropout 0.1 --ema_decay 0.999 $WINNER_FLAGS"

echo "[r4] phase 3 arm A (xattn-only, 200 ep) start $(date -u +%H:%M:%S)"
rm -rf runs/ckpt_flagship/flagship_dm   # stale queue10 partial (18/120 ep)
t0=$(date +%s)
timeout 7200 python -m ldm3d.cli.main $DMWIN --train_dm --cache_latents \
  --epochs 200 --ckpt_freq 25 \
  --fidelity_freq 50 --fidelity_samples 64 --fidelity_by_class \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq \
  --ckpt_dir runs/ckpt_flagship --suffix flagship \
  > runs/r4_flagship_A.log 2>&1
echo "[r4] arm A rc=$? after $(( $(date +%s) - t0 ))s"

echo "[r4] phase 3 arm B (+context_in_time, 200 ep) start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 7200 python -m ldm3d.cli.main $DMWIN --train_dm --cache_latents \
  --context_in_time --epochs 200 --ckpt_freq 25 \
  --fidelity_freq 50 --fidelity_samples 64 --fidelity_by_class \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq \
  --ckpt_dir runs/ckpt_flagship_cit --suffix flagship \
  > runs/r4_flagship_B.log 2>&1
echo "[r4] arm B rc=$? after $(( $(date +%s) - t0 ))s"
mark phase3 0

for arm in A B; do
  ckpt=runs/ckpt_flagship; cit=""
  [ $arm = B ] && { ckpt=runs/ckpt_flagship_cit; cit="--context_in_time"; }
  [ -d $ckpt/flagship_dm ] || continue
  echo "[r4] phase 3 by-class sweep arm $arm $(date -u +%H:%M:%S)"
  timeout 4500 python -m ldm3d.cli.main $DMWIN --fidelity_sweep $cit \
    --fidelity_by_class --fidelity_samples 64 \
    --sweep_samplers "ddpm,ddim:50" --guidance_grid "none,3.0" \
    --ckpt_dir $ckpt --suffix flagship \
    --out_dir reports/quality_r4/conditioning/arm$arm \
    > runs/r4_byclass_$arm.log 2>&1
  echo "[r4] sweep arm $arm rc=$?"
done

timeout 300 python tools/conditioning_ab.py \
  "xattn-only=reports/quality_r4/conditioning/armA/fidelity_sweep_flagship.json" \
  "context-in-time=reports/quality_r4/conditioning/armB/fidelity_sweep_flagship.json" \
  --out reports/quality_r4/conditioning_ab.md || true
timeout 600 python tools/context_effect.py \
  --ckpt runs/ckpt_flagship_cit/flagship_dm \
  > reports/quality_r4/context_effect_cit.md 2>&1 || true
mark phase3_reports 0

# ---- Phase 4: VQ-GAN adaptive-weight A/B (VERDICT next-3) ------------------
echo "[r4] phase 4: vqgan adaptive run start $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 14400 python -m ldm3d.cli.main --preset vqgan_attn --train_vq \
  $COMMON --ckpt_dir runs/ckpt_vqgan_adaptive --epochs 24 --lbs 2 \
  --disc_threshold 10 --adaptive_gan_weight --suffix vqgan \
  --image_log_freq 10 --auto_resume 2 \
  > runs/r4_vqgan_adaptive.log 2>&1
rc=$?
echo "[r4] phase 4 rc=$rc after $(( $(date +%s) - t0 ))s"
mark phase4 $rc

GANA=runs/ckpt_vqgan_adaptive/vqgan_vq/training.log
if [ -f "$GANA" ]; then
  timeout 300 python tools/quality_report.py "$GANA" \
    --out reports/quality_r4/vqgan_adaptive_report.md \
    --png reports/quality_r4/vqgan_adaptive_curves.png || true
fi
# NOTE: the r3 fixed-weight run's raw training.log was wiped by the VM
# reset; the epoch-for-epoch A/B table vs its committed summary
# (reports/quality_r3/vqgan_report.md) is written by hand into
# reports/quality_r4/vqgan_ab.md after this phase.

echo "[r4] bench on trained flagship $(date -u +%H:%M:%S)"
timeout 1200 python bench.py > runs/r4_bench.log 2>&1 || true
tail -1 runs/r4_bench.log

echo "[r4] ALL DONE $(date -u +%H:%M:%S)"
mark all 0
