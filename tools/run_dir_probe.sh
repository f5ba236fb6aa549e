#!/bin/bash
# Directional-feature PROBE (round 3, beyond-reference, gated): the
# directional-oracle ceiling (BENCHMARKS "Directional-oracle ceiling")
# predicts IPD/ILD input maps cannot move the babble rows at this
# corpus geometry, so the original 48-epoch plan is replaced by a
# 12-epoch probe + measured gate:
#   1. train TemporalCRN_dir 12 epochs (config_dir_probe.yaml;
#      regimen otherwise identical to config_parity.yaml)
#   2. stress-protocol eval + per-masker gate (tools/dir_gate.py)
#   3. babble row >= +2 dB  -> resume to the full 48 (config_dir.yaml)
#      else                 -> stop; the probe IS the controlled result
#   4. both-protocol evals + failure-mode analysis of whatever final
# Replaces tools/run_dir_exp.sh (same trigger + DIR_EXP_DONE token so
# the queued flagship-extension chain is undisturbed).
set -x
cd "$(dirname "$0")/.."

while ! grep -q FLAGSHIP_EXT_DONE runs/flagship_ext_chain.log 2>/dev/null; do
  sleep 60
done

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

PALLAS_AXON_POOL_IPS= python tools/ensure_corpus.py \
  >> runs/ensure_corpus.log 2>&1 || { echo "CORPUS check failed"; exit 1; }

sup python train.py TemporalCRN_dir ./config_dir_probe.yaml \
  --user_defined_name dir_r3 \
  > runs/dir_r3_train.log 2>&1
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
