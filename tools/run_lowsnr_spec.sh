#!/bin/bash
# Low-SNR specialist wave (round 3): quality evidence AT the stress
# operating point (-5..+5 dB), where the round-2 verdict's
# reference-magnitude targets (dSI-SDR >= +8 / dSTOI >= +0.03 /
# dPESQ >= +0.5) are defined. The reference-regimen checkpoints
# (parity_r3 + its student) stay untouched; this wave FINE-TUNES
# copies with the train mixing range narrowed to -5..+10 dB:
#   1. flagship TemporalCRN  48 -> 60 epochs (full resume, parity_lowsnr)
#   2. student re-distilled  48 -> 64 epochs (weights-only warm start,
#      teacher = the specialist flagship)
# Each model re-evaluated at BOTH protocols on the same 100 held-out
# items. Waits for the post-zoo bench queue to release the TPU tunnel.
set -x
cd "$(dirname "$0")/.."

while ! grep -q POST_ZOO_R8_DONE runs/post_zoo_r8.log 2>/dev/null; do
  sleep 60
done

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

sup python train.py TemporalCRN ./config_lowsnr.yaml \
  --user_defined_name parity_lowsnr --resume True \
  > runs/lowsnr_train.log 2>&1
echo "LOWSNR_TRAIN rc=$?"
python predict.py ./config_lowsnr.yaml TemporalCRN \
  --user_defined_name parity_lowsnr --num_items 100 \
  --out_json runs/eval_lowsnr.json > runs/eval_lowsnr.log 2>&1
echo "LOWSNR_EVAL rc=$?"
python predict.py ./config_lowsnr.yaml TemporalCRN \
  --user_defined_name parity_lowsnr --num_items 100 \
  --snr_low -5 --snr_high 5 \
  --out_json runs/eval_lowsnr_stress.json > runs/eval_lowsnr_stress.log 2>&1
echo "LOWSNR_STRESS rc=$?"

sup python train_distillation.py ./config_distill_lowsnr.yaml \
  --user_defined_name parity_lowsnr --resume True \
  > runs/lowsnr_distill_train.log 2>&1
echo "LOWSNR_DISTILL rc=$?"
python predict_distillation.py ./config_distill_lowsnr.yaml \
  --user_defined_name parity_lowsnr --num_items 100 \
  --out_json runs/eval_lowsnr_student.json > runs/eval_lowsnr_student.log 2>&1
echo "LOWSNR_STUDENT_EVAL rc=$?"
python predict_distillation.py ./config_distill_lowsnr.yaml \
  --user_defined_name parity_lowsnr --num_items 100 \
  --snr_low -5 --snr_high 5 \
  --out_json runs/eval_lowsnr_student_stress.json \
  > runs/eval_lowsnr_student_stress.log 2>&1
echo "LOWSNR_STUDENT_STRESS rc=$?"

echo LOWSNR_SPEC_DONE
