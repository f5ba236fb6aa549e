#!/bin/bash
# Round-5 recovery chain: the phase-A train leg finished through epoch
# 98 with best-dev saved (dev STOI 0.8669 at ~ep 90); the epoch-99
# relaunch hit a wedged relay claim that outlived the watchdog kill.
# Resume from the EVAL steps, then run phase B.
set -x
cd "$(dirname "$0")/.."

python predict.py ./config_spk_deep.yaml TemporalCRN_spk_deep \
  --user_defined_name spk_deep --num_items 300 --snr_low -5 --snr_high 5 \
  --enroll_mode separate --out_json runs/eval_spk_deep_n300_stress.json \
  > runs/eval_spk_deep_n300_stress.log 2>&1
echo "SPK_DEEP_STRESS rc=$?"

python predict.py ./config_spk_deep.yaml TemporalCRN_spk_deep \
  --user_defined_name spk_deep --num_items 100 --snr_low -5 --snr_high 5 \
  --enroll_mode nontarget --out_json runs/eval_spk_deep_nontarget.json \
  > runs/eval_spk_deep_nontarget.log 2>&1
echo "SPK_DEEP_NONTARGET rc=$?"

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_parity_v3_n300_stress.json runs/eval_spk_deep_n300_stress.json \
  > runs/compare_spk_deep_vs_parity.log 2>&1
echo "COMPARE_PARITY rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_spk_v3_n300_stress.json runs/eval_spk_deep_n300_stress.json \
  > runs/compare_spk_deep_vs_spkv3.log 2>&1
echo "COMPARE_SPKV3 rc=$?"
for art in spk_deep_n300_stress spk_deep_nontarget; do
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_eval.py \
    runs/eval_$art.json --config ./config_spk_deep.yaml --csv_dir data_v3 \
    > runs/analyze_$art.log 2>&1
  echo "ANALYZE_$art rc=$?"
done

echo SPK_DEEP_DONE

exec bash tools/run_r5_phase_b.sh
