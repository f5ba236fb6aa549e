#!/bin/bash
# Round-5 final phase: pull the cross-attention-enrollment lever
# (ROADMAP open item #1; VERDICT r4 next #1's "if deep FiLM plateaus"
# branch — it plateaued at +1.79 dB stress babble, bar was >= +4 dB).
#
#   1. TemporalCRNSpkXAttn warm-started from the TRAINED spk_deep
#      best checkpoint (done before this script: zero-init output
#      projection => function-identical at step 0, identity check
#      printed 0.0e+00) — 10 extra epochs (98 -> 108) on corpus v3,
#      enroll_mode=separate, zero target leakage.
#   2. evals: stress protocol (-5..5) at N=300 (same sample as the
#      spk_deep / parity_v3 rows -> per-item pairing), nontarget
#      negative control at N=100 (an identity-USING model must degrade
#      under wrong-speaker enrollment).
#   3. paired per-item comparisons vs spk_deep (deep FiLM control)
#      and parity_v3 (unconditioned control) + per-masker babble rows.
#
# One TPU process at a time (CLAUDE.md); CPU-side analyses skip the
# tunnel claim with PALLAS_AXON_POOL_IPS=.
set -x
cd "$(dirname "$0")/.."

sup() { python tools/supervise_resume.py --retries 3 -- "$@"; }

sup python train.py TemporalCRN_spk_xattn ./config_spk_xattn.yaml \
  --user_defined_name spk_xattn --resume True \
  > runs/spk_xattn_train.log 2>&1
echo "SPK_XATTN_TRAIN rc=$?"

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

echo SPK_XATTN_DONE
