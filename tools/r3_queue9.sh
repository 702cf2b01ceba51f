#!/bin/bash
# Round-3 TPU run queue, phase 9: conditioning-strength A/B.
#
# reports/quality_r3/context_effect.md measured the trained flagship's
# denoiser moving <=0.6% when its context token changes — the
# reference-parity single-token cross-attention path carries almost no
# class signal, so classifier-free guidance is inert. This phase closes
# the study with the acceptance metric built for it (per-class FID,
# --fidelity_by_class):
#   A) score the EXISTING v-pred flagship (cross-attention only) —
#      expected fid_class_sep ~ 0;
#   B) retrain the same recipe with --context_in_time (ADM-style additive
#      context-into-time-embedding, opt-in, parameter tree unchanged) and
#      score it — the lever is validated iff fid_class_sep(B) >> A.
#
# Blocking flock: chains after queue8 (adaptive-GAN A/B). Gated on the
# new unit tests so a red test can't burn chip hours.
set -u
cd /root/repo

# Order: queue8 first. The flock alone can't guarantee ordering (whoever
# grabs it first wins), so wait for queue8's terminal marker — done, gate
# failure, or a 6h cap (covers the TPU-relay outage queue8 itself waits
# through).
for i in $(seq 1 360); do
  if [ -f /tmp/r3_queue8_done ] || [ -f /tmp/r3_queue8_gate_failed ]; then
    break
  fi
  sleep 60
done

exec 9>/tmp/r3_queue.lock
flock 9

echo "[queue9] gate: context/fidelity unit tests $(date -u +%H:%M:%S)"
if ! timeout 1200 python -m pytest \
    "tests/test_diffusion.py::test_context_in_time_strengthens_conditioning" \
    "tests/test_fid.py::test_fidelity_eval_by_class_reports_separation" \
    "tests/test_cli.py::test_cli_context_in_time_propagates" \
    -q > runs/r3_queue9_gate.log 2>&1; then
  echo "[queue9] GATE FAILED — see runs/r3_queue9_gate.log; aborting"
  touch /tmp/r3_queue9_gate_failed
  exit 1
fi
echo "[queue9] gate green"

COMMON="--synthetic --device_data --num_synthetic 1232 --cache_dir runs/corpus128 --val_perc 0.1"
DM="--preset conditional_dm3d --norm group $COMMON --lbs 8 \
    --timesteps 1000 --prediction_type v --min_snr_gamma 5 \
    --cfg_dropout 0.1 --ema_decay 0.999"

mkdir -p reports/quality_r3/conditioning

echo "[queue9] arm A: by-class fidelity + sampler frontier on existing flagship $(date -u +%H:%M:%S)"
# sampler frontier rides along on arm A (same checkpoint, no retrain):
# stochastic DDIM (eta>0) tests the diversity hypothesis for the
# DDIM-50 FID 106 vs DDPM-1000 FID 62 gap; 100-step cells test step-count
# convergence.
timeout 5400 python -m ldm3d.cli.main $DM --fidelity_sweep \
  --fidelity_by_class --fidelity_samples 64 \
  --sweep_samplers "ddpm,ddim:50,ddim:50:0.5,ddim:50:1.0,ddim:100,ddim:100:1.0,dpmpp:50,dpmpp_sde:25,dpmpp_sde:50" \
  --guidance_grid "none,3.0" \
  --ckpt_dir runs/ckpt_flagship --suffix flagship \
  --out_dir reports/quality_r3/conditioning/armA \
  > runs/r3_byclass_A.log 2>&1
echo "[queue9] arm A rc=$? $(date -u +%H:%M:%S)"

echo "[queue9] arm A': clip-range ablation (reference's [-1,1] vs none) $(date -u +%H:%M:%S)"
timeout 2700 python -m ldm3d.cli.main $DM --fidelity_sweep \
  --clip_sample_range 0 --fidelity_samples 64 \
  --sweep_samplers "ddpm,ddim:50,ddim:100:1.0" --guidance_grid "none" \
  --ckpt_dir runs/ckpt_flagship --suffix flagship \
  --out_dir reports/quality_r3/conditioning/armA_noclip \
  > runs/r3_noclip_A.log 2>&1
echo "[queue9] arm A' rc=$? $(date -u +%H:%M:%S)"

echo "[queue9] arm B: retrain flagship recipe with --context_in_time $(date -u +%H:%M:%S)"
t0=$(date +%s)
timeout 12600 python -m ldm3d.cli.main $DM --train_dm --cache_latents \
  --context_in_time --epochs 200 \
  --fidelity_freq 25 --fidelity_samples 64 --fidelity_by_class \
  --vqvae_load_ckpt runs/ckpt_flagship_gn/flagship_vq \
  --ckpt_dir runs/ckpt_flagship_cit --suffix flagship \
  > runs/r3_flagship_cit.log 2>&1
echo "[queue9] arm B train rc=$? after $(( $(date +%s) - t0 ))s"

echo "[queue9] arm B: by-class fidelity $(date -u +%H:%M:%S)"
timeout 3600 python -m ldm3d.cli.main $DM --fidelity_sweep \
  --context_in_time --fidelity_by_class --fidelity_samples 64 \
  --sweep_samplers "ddpm,ddim:50" --guidance_grid "none,3.0" \
  --ckpt_dir runs/ckpt_flagship_cit --suffix flagship \
  --out_dir reports/quality_r3/conditioning/armB \
  > runs/r3_byclass_B.log 2>&1
echo "[queue9] arm B sweep rc=$? $(date -u +%H:%M:%S)"

echo "[queue9] comparison report $(date -u +%H:%M:%S)"
timeout 300 python tools/conditioning_ab.py \
  "xattn-only=reports/quality_r3/conditioning/armA/fidelity_sweep_flagship.json" \
  "context-in-time=reports/quality_r3/conditioning/armB/fidelity_sweep_flagship.json" \
  --out reports/quality_r3/conditioning_ab.md || true
timeout 300 python tools/quality_report.py \
  runs/ckpt_flagship_cit/flagship_dm/training.log \
  --out reports/quality_r3/flagship_cit_report.md \
  --png reports/quality_r3/flagship_cit_curves.png || true

echo "[queue9] ALL DONE $(date -u +%H:%M:%S)"
touch /tmp/r3_queue9_done
