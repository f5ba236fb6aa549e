#!/bin/bash
# Eval tail of tools/run_r6_spk_xattn.sh, re-run after the first
# attempt crashed on a partially-regenerated corpus (the gitignored
# data_v3 wavs existed only as far as TRAINING had touched them on this
# round's fresh disk; tools/ensure_corpus.py rebuilt the rest against
# the committed fingerprint). Training itself completed rc=0.
set -x
cd "$(dirname "$0")/.."

python predict.py ./config_spk_xattn.yaml TemporalCRN_spk_xattn \
  --user_defined_name spk_xattn --num_items 300 --snr_low -5 --snr_high 5 \
  --enroll_mode separate --out_json runs/eval_spk_xattn_n300_stress.json \
  > runs/eval_spk_xattn_n300_stress.log 2>&1
echo "SPK_XATTN_STRESS rc=$?"

python predict.py ./config_spk_xattn.yaml TemporalCRN_spk_xattn \
  --user_defined_name spk_xattn --num_items 100 --snr_low -5 --snr_high 5 \
  --enroll_mode nontarget --out_json runs/eval_spk_xattn_nontarget.json \
  > runs/eval_spk_xattn_nontarget.log 2>&1
echo "SPK_XATTN_NONTARGET rc=$?"

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_spk_deep_n300_stress.json runs/eval_spk_xattn_n300_stress.json \
  > runs/compare_spk_xattn_vs_spk_deep.log 2>&1
echo "COMPARE_SPKDEEP rc=$?"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/compare_evals.py \
  runs/eval_parity_v3_n300_stress.json runs/eval_spk_xattn_n300_stress.json \
  > runs/compare_spk_xattn_vs_parity.log 2>&1
echo "COMPARE_PARITY rc=$?"
for art in spk_xattn_n300_stress spk_xattn_nontarget; do
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_eval.py \
    runs/eval_$art.json --config ./config_spk_xattn.yaml --csv_dir data_v3 \
    > runs/analyze_$art.log 2>&1
  echo "ANALYZE_$art rc=$?"
done

echo SPK_XATTN_EVALS_DONE
