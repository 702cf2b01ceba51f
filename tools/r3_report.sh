#!/bin/bash
# Round-3 reporting: turn the queue4 run artifacts into reports/quality_r3.
# Safe to run incrementally — each section is skipped until its inputs
# exist, so it can be invoked after any queue phase completes.
#
# Inputs (produced by tools/r3_queue4.sh):
#   runs/ckpt_flagship_gn/flagship_vq/training.log   stage-1 GN retrain
#   runs/ckpt_flagship/flagship_dm/training.log      DM T=1000 eps (flagship)
#   runs/ckpt_dm_t500/dm500_dm/training.log          DM T=500 eps
#   runs/ckpt_dm_vpred/dmv_dm/training.log           DM T=1000 v-pred
#   runs/ckpt_vqgan_r3/vqgan_vq/training.log         VQ-GAN convergence
set -u
cd /root/repo
mkdir -p reports/quality_r3

S1=runs/ckpt_flagship_gn/flagship_vq/training.log
if [ -f "$S1" ]; then
  echo "== stage-1 report"
  timeout 300 python tools/quality_report.py "$S1" \
    --out reports/quality_r3/stage1_report.md \
    --png reports/quality_r3/stage1_curves.png
fi

GAN=runs/ckpt_vqgan_r3/vqgan_vq/training.log
if [ -f "$GAN" ]; then
  echo "== vqgan report"
  timeout 300 python tools/quality_report.py "$GAN" \
    --out reports/quality_r3/vqgan_report.md \
    --png reports/quality_r3/vqgan_curves.png
fi

# queue7 moves the eps flagship aside (runs/ckpt_flagship_eps) and
# retrains runs/ckpt_flagship with the v-pred + min-SNR + CFG recipe; the
# comparison labels follow whichever layout is on disk.
DM1000=runs/ckpt_flagship/flagship_dm/training.log
DM1000_EPS=runs/ckpt_flagship_eps/flagship_dm/training.log
DM500=runs/ckpt_dm_t500/dm500_dm/training.log
DMV=runs/ckpt_dm_vpred/dmv_dm/training.log
SPECS=()
[ -f "$DM500" ] && SPECS+=("T500-eps=$DM500")
if [ -f "$DM1000_EPS" ]; then
  SPECS+=("T1000-eps=$DM1000_EPS")
  [ -f "$DM1000" ] && SPECS+=("T1000-vpred-cfg-flagship=$DM1000")
else
  [ -f "$DM1000" ] && SPECS+=("T1000-eps=$DM1000")
fi
[ -f "$DMV" ] && SPECS+=("T1000-vpred-minSNR5=$DMV")
if [ ${#SPECS[@]} -gt 0 ]; then
  echo "== dm comparison (${#SPECS[@]} runs)"
  timeout 300 python tools/dm_comparison.py "${SPECS[@]}" \
    --out reports/quality_r3/dm_comparison.md
  for spec in "${SPECS[@]}"; do
    timeout 300 python tools/quality_report.py "${spec#*=}" \
      --png "reports/quality_r3/dm_${spec%%=*}_curves.png" \
      --out /dev/null || true
  done
fi

echo "== done; artifacts:"
ls -la reports/quality_r3/
