#!/bin/bash
# Round-3 zoo deepening, wave 3: every family that was still improving
# at its previous horizon gets more epochs, each run supervised by
# tools/supervise_resume.py (auto-relaunch with --resume True on the
# watchdog's stall-exit 42 — the failure-recovery path in production
# use, not just in tests):
#   FullSubNet 12 -> 20   (best dev was the FINAL epoch of fsn_r7)
#   GTSA        8 -> 12   (epochs 2-8 quadrupled the WB-PESQ delta)
#   GB          6 -> 8    (epochs 2-6 lifted every axis; ~55 min/epoch
#                          caps this one at +2)
# Re-evals at both protocols into *_r8 artifacts after each family.
set -x
cd "$(dirname "$0")/.."

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

sup python train_fullsubnet.py ./config_fullsubnet.yaml \
  --user_defined_name fsn_r3 --resume True \
  > runs/fsn_r8_train.log 2>&1
echo "FSN_TRAIN rc=$?"
python predict_fullsubnet.py ./config_fullsubnet.yaml \
  --user_defined_name fsn_r3 --num_items 100 \
  --out_json runs/eval_fsn_r8.json > runs/eval_fsn_r8.log 2>&1
echo "FSN_EVAL rc=$?"
python predict_fullsubnet.py ./config_fullsubnet.yaml \
  --user_defined_name fsn_r3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_fsn_r8_stress.json > runs/eval_fsn_r8_stress.log 2>&1
echo "FSN_STRESS rc=$?"

sup python train.py GTSA ./config_gtsa.yaml \
  --user_defined_name gtsa_r5 --resume True \
  > runs/gtsa_r8_train.log 2>&1
echo "GTSA_TRAIN rc=$?"
python predict.py ./config_gtsa.yaml GTSA \
  --user_defined_name gtsa_r5 --num_items 100 \
  --out_json runs/eval_gtsa_r8.json > runs/eval_gtsa_r8.log 2>&1
echo "GTSA_EVAL rc=$?"
python predict.py ./config_gtsa.yaml GTSA \
  --user_defined_name gtsa_r5 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_gtsa_r8_stress.json > runs/eval_gtsa_r8_stress.log 2>&1
echo "GTSA_STRESS rc=$?"

sup python train.py GeneralBeamformer ./config_gb.yaml \
  --user_defined_name gb_r5 --resume True \
  > runs/gb_r8_train.log 2>&1
echo "GB_TRAIN rc=$?"
python predict.py ./config_gb.yaml GeneralBeamformer \
  --user_defined_name gb_r5 --num_items 100 \
  --out_json runs/eval_gb_r8.json > runs/eval_gb_r8.log 2>&1
echo "GB_EVAL rc=$?"
python predict.py ./config_gb.yaml GeneralBeamformer \
  --user_defined_name gb_r5 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_gb_r8_stress.json > runs/eval_gb_r8_stress.log 2>&1
echo "GB_STRESS rc=$?"

echo ZOO_R8_DONE
