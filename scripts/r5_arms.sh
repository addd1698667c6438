#!/bin/bash
# Round-5 controlled f0_cond campaign (VERDICT r4 item 1): two matched arms
# at r4's budget on the SAME sigma=0.2 corpus (reused from campaign_r4b so
# the arms and r4b are directly comparable), disc-on 2000, 20k steps,
# lambda_pitch/lr from the r5 sweep (sweeps/r5_f0cond.yaml winner).
# Usage: bash scripts/r5_arms.sh LAMBDA_PITCH LR [ARM]
#   ARM: a (f0_cond=true), b (control f0_cond=false), c (no-detach extra)
set -euo pipefail
cd "$(dirname "$0")/.."
LP=${1:?lambda_pitch}
LR=${2:?lr}
ARM=${3:-a}

seed_workdir() {  # share the r4b corpus/features/paks: matched arms, no rework
  local W=$1
  mkdir -p "$W"
  for f in stats.json train.pak val.pak; do
    [ -e "$W/$f" ] || cp -l "runs/campaign_r4b/$f" "$W/$f" 2>/dev/null || cp "runs/campaign_r4b/$f" "$W/$f"
  done
  [ -e "$W/corpus" ] || cp -al runs/campaign_r4b/corpus "$W/corpus"
  [ -e "$W/pre" ] || cp -al runs/campaign_r4b/pre "$W/pre"
  # gate calibration is a pure function of the corpus (runs/calib_r5 was
  # computed on this exact corpus) — share it so arms don't recompute
  [ -e "$W/gate_calibration.json" ] || \
    cp runs/calib_r5/gate_calibration.json "$W/gate_calibration.json" 2>/dev/null || true
}

COMMON=(--n-utterances 600 --f0-jitter 0.2 --max-steps 20000 --disc-on-step 2000)
OVR=(
  "train_args.pretraining_steps=2000"
  "scheduler.num_training_steps=20000"
  "generator.loss_coeffs.lambda_pitch=${LP}"
  "optimizer.lr=${LR}"
  "ckpt_every_n_steps=1000"
)

case "$ARM" in
  a)
    seed_workdir runs/campaign_r5a
    python scripts/campaign.py --work-dir runs/campaign_r5a \
      --evidence-dir docs/evidence/campaign_r5/f0cond \
      "${COMMON[@]}" "generator.vocoder.f0_cond=true" "${OVR[@]}"
    ;;
  b)
    seed_workdir runs/campaign_r5b
    python scripts/campaign.py --work-dir runs/campaign_r5b \
      --evidence-dir docs/evidence/campaign_r5/control \
      "${COMMON[@]}" "generator.vocoder.f0_cond=false" "${OVR[@]}"
    ;;
  c)
    seed_workdir runs/campaign_r5c
    python scripts/campaign.py --work-dir runs/campaign_r5c \
      --evidence-dir docs/evidence/campaign_r5/nodetach \
      "${COMMON[@]}" "generator.vocoder.f0_cond=true" \
      "generator.detach_vocoder_input=false" "${OVR[@]}"
    ;;
esac
