#!/bin/bash
# Standard-regimen student extension (round 3): dillations/denoise/
# parity_r3 deepened 48 -> 64 epochs with the reference recipe
# unchanged (config_distill_ext.yaml), then re-evaluated at both
# protocols. Targets the last absolute gap vs BASELINE.md: student
# WB-PESQ 2.588 here vs 2.7373 reference (different corpora — deltas
# stay the like-for-like comparison, but headroom is headroom).
# Waits for the low-SNR specialist chain to release the TPU tunnel.
set -x
cd "$(dirname "$0")/.."

while ! grep -q LOWSNR_SPEC_DONE runs/lowsnr_chain.log 2>/dev/null; do
  sleep 60
done

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

sup python train_distillation.py ./config_distill_ext.yaml \
  --user_defined_name parity_r3 --resume True \
  > runs/distill_ext_train.log 2>&1
echo "EXT_TRAIN rc=$?"
python predict_distillation.py ./config_distill_ext.yaml \
  --user_defined_name parity_r3 --num_items 100 \
  --out_json runs/eval_distill_r9.json > runs/eval_distill_r9.log 2>&1
echo "EXT_EVAL rc=$?"
python predict_distillation.py ./config_distill_ext.yaml \
  --user_defined_name parity_r3 --num_items 100 --quantize \
  --out_json runs/eval_distill_r9_int8.json \
  > runs/eval_distill_r9_int8.log 2>&1
echo "EXT_EVAL_INT8 rc=$?"
python predict_distillation.py ./config_distill_ext.yaml \
  --user_defined_name parity_r3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_distill_r9_stress.json \
  > runs/eval_distill_r9_stress.log 2>&1
echo "EXT_STRESS rc=$?"

echo STUDENT_EXT_DONE
