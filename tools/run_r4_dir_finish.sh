#!/bin/bash
# Round-4 step 1: finish the round-3 directional probe that died at
# epoch 7/12 when the round ended (runs/dir_r3_train.log), then run
# the +2 dB babble gate and both-protocol evals — identical to the
# tail of tools/run_dir_probe.sh, minus the FLAGSHIP_EXT_DONE wait
# (parity_ext completed 64/64 before round 3 ended).
set -x
cd "$(dirname "$0")/.."

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

PALLAS_AXON_POOL_IPS= python tools/ensure_corpus.py \
  >> runs/ensure_corpus.log 2>&1 || { echo "CORPUS check failed"; exit 1; }

sup python train.py TemporalCRN_dir ./config_dir_probe.yaml \
  --user_defined_name dir_r3 --resume True \
  >> runs/dir_r3_train.log 2>&1
echo "DIR_PROBE_TRAIN rc=$?"
python predict.py ./config_dir_probe.yaml TemporalCRN_dir \
  --user_defined_name dir_r3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_dir_probe_stress.json \
  > runs/eval_dir_probe_stress.log 2>&1
echo "DIR_PROBE_EVAL rc=$?"

if PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/dir_gate.py \
    runs/eval_dir_probe_stress.json > runs/dir_gate.log 2>&1; then
  echo "DIR_GATE extend"
  sup python train.py TemporalCRN_dir ./config_dir.yaml \
    --user_defined_name dir_r3 --resume True \
    >> runs/dir_r3_train.log 2>&1
  echo "DIR_FULL_TRAIN rc=$?"
  EVAL_CFG=./config_dir.yaml
else
  echo "DIR_GATE stop"
  EVAL_CFG=./config_dir_probe.yaml
fi

python predict.py $EVAL_CFG TemporalCRN_dir \
  --user_defined_name dir_r3 --num_items 100 \
  --out_json runs/eval_dir_r3.json > runs/eval_dir_r3.log 2>&1
echo "DIR_EVAL rc=$?"
python predict.py $EVAL_CFG TemporalCRN_dir \
  --user_defined_name dir_r3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_dir_r3_stress.json > runs/eval_dir_r3_stress.log 2>&1
echo "DIR_STRESS rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_eval.py \
  runs/eval_dir_r3_stress.json > runs/analyze_dir_r3_stress.log 2>&1
echo "DIR_ANALYZE rc=$?"

echo DIR_EXP_DONE
