#!/bin/bash
# Speaker-conditioning experiment, warm-start form (round 3): the
# from-scratch 48-epoch plan (tools/run_spk_exp.sh) is replaced by a
# 12-epoch fine-tune from the parity_r3 flagship — the zero-init FiLM
# makes the warm start functionally identical to the flagship
# (tools/warmstart_spk.py verifies max-abs 0.0), and the low-SNR
# specialist wave already measured what 12 unconditioned fine-tune
# epochs do (nothing, BENCHMARKS "Low-SNR specialist wave"), so this
# isolates the conditioning signal at a quarter of the TPU cost.
set -x
cd "$(dirname "$0")/.."

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

PALLAS_AXON_POOL_IPS= python tools/ensure_corpus.py \
  > runs/ensure_corpus.log 2>&1 || { echo "CORPUS check failed"; exit 1; }
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/warmstart_spk.py \
  > runs/warmstart_spk.log 2>&1 || { echo "WARMSTART failed"; exit 1; }

sup python train.py TemporalCRN_spk ./config_spk.yaml \
  --user_defined_name spk_r3 --resume True \
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
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_lowsnr_stress.json runs/eval_spk_r3_stress.json \
  > runs/compare_spk_vs_lowsnr_stress.log 2>&1
echo "SPK_COMPARE_LOWSNR rc=$?"

echo SPK_FT_DONE
