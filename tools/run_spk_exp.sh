#!/bin/bash
# Speaker-conditioning experiment (round 3, beyond-reference): train
# TemporalCRN_spk — the flagship + enrollment channel + time-pooled
# voice embedding + zero-init bottleneck FiLM — from scratch at the
# exact parity regimen (config_spk.yaml == config_parity.yaml plus the
# model section). This is the TARGET-IDENTITY route to the measured
# babble gap: the cIRM oracle shows +39.7 dB headroom on the babble
# items, the directional oracle capped spatial cues at +0.24 dB, and
# low-SNR exposure moved nothing — identity conditioning is the
# remaining lever (BENCHMARKS "Directional-oracle ceiling"). The
# controlled comparison is modules/denoise/parity_r3 (identical recipe;
# zero-init FiLM starts the spk model exactly AT the flagship).
# Waits for the directional probe to release the TPU tunnel.
set -x
cd "$(dirname "$0")/.."

while ! grep -q DIR_EXP_DONE runs/dir_exp_chain.log 2>/dev/null; do
  sleep 60
done

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

sup python train.py TemporalCRN_spk ./config_spk.yaml \
  --user_defined_name spk_r3 \
  > runs/spk_r3_train.log 2>&1
echo "SPK_TRAIN rc=$?"
python predict.py ./config_spk.yaml TemporalCRN_spk \
  --user_defined_name spk_r3 --num_items 100 \
  --out_json runs/eval_spk_r3.json > runs/eval_spk_r3.log 2>&1
echo "SPK_EVAL rc=$?"
python predict.py ./config_spk.yaml TemporalCRN_spk \
  --user_defined_name spk_r3 --num_items 100 --snr_low -5 --snr_high 5 \
  --out_json runs/eval_spk_r3_stress.json \
  > runs/eval_spk_r3_stress.log 2>&1
echo "SPK_STRESS rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_eval.py \
  runs/eval_spk_r3_stress.json > runs/analyze_spk_r3_stress.log 2>&1
echo "SPK_ANALYZE rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_parity_r3_stress.json runs/eval_spk_r3_stress.json \
  > runs/compare_spk_r3_stress.log 2>&1
echo "SPK_COMPARE rc=$?"

echo SPK_EXP_DONE
