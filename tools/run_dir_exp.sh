#!/bin/bash
# Directional-feature experiment (round 3, beyond-reference): train
# TemporalCRN_dir — the flagship with cos/sin IPD + ILD input maps —
# from scratch at the exact parity regimen (48 epochs x 20k utterances,
# bf16, dev_criterion stoi; config_dir.yaml == config_parity.yaml plus
# the model section), then evaluate at BOTH protocols and run the
# per-masker failure-mode analysis. The controlled comparison is
# against modules/denoise/parity_r3 (identical recipe, baseline
# features): the hypothesis from BENCHMARKS "Failure-mode analysis" is
# that explicit spatial conditioning moves the talker-babble rows
# (~+1 dB for every reference architecture; oracle +39.7 dB) while the
# non-speech rows stay at parity. Waits for the low-SNR specialist
# chain to release the TPU tunnel.
set -x
cd "$(dirname "$0")/.."

while ! grep -q STUDENT_EXT_DONE runs/student_ext_chain.log 2>/dev/null; do
  sleep 60
done

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

sup python train.py TemporalCRN_dir ./config_dir.yaml \
  --user_defined_name dir_r3 \
  > runs/dir_r3_train.log 2>&1
echo "DIR_TRAIN rc=$?"
python predict.py ./config_dir.yaml TemporalCRN_dir \
  --user_defined_name dir_r3 --num_items 100 \
  --out_json runs/eval_dir_r3.json > runs/eval_dir_r3.log 2>&1
echo "DIR_EVAL rc=$?"
python predict.py ./config_dir.yaml TemporalCRN_dir \
  --user_defined_name dir_r3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_dir_r3_stress.json > runs/eval_dir_r3_stress.log 2>&1
echo "DIR_STRESS rc=$?"
PALLAS_AXON_POOL_IPS= python tools/analyze_eval.py runs/eval_dir_r3_stress.json \
  > runs/analyze_dir_r3_stress.log 2>&1
echo "DIR_ANALYZE rc=$?"

echo DIR_EXP_DONE
